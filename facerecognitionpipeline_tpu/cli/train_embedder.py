"""train_embedder CLI: produce AdaFace/ArcFace/CosFace backbone checkpoints.

The reference only CONSUMES pretrained checkpoints; this closes the loop:
identity-folder dataset (or --synthetic) -> sharded margin-softmax training
(DP over batch x class-sharded partial-FC TP) -> orbax checkpoints with
resume -> .npz backbone export loadable by FaceEmbedder(model_path=...).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from facerecognitionpipeline_tpu.models.irse import BACKBONE_CONFIGS


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a face-embedding backbone")
    p.add_argument("--data_dir", type=str, default=None,
                   help="Dataset root: one folder of aligned 112x112 crops "
                        "per identity")
    p.add_argument("--synthetic_classes", type=int, default=0,
                   help="Train on synthetic per-class patterns instead of "
                        "--data_dir (smoke tests / benchmarking)")
    p.add_argument("--architecture", type=str, default="ir_50",
                   choices=sorted(BACKBONE_CONFIGS))
    p.add_argument("--loss", type=str, default="adaface",
                   choices=["adaface", "arcface", "cosface"])
    p.add_argument("--margin", type=float, default=0.4)
    p.add_argument("--scale", type=float, default=64.0)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--prefetch", type=int, default=0,
                   help="device-staging depth for input batches (default 0 "
                        "= upload synchronously per step). Set 2 on real "
                        "PCIe/TPU hosts to overlap H2D with compute; keep 0 "
                        "on hosts whose device link serializes transfers "
                        "with execution (measured slower there - "
                        "PERFORMANCE.md 'Training throughput')")
    p.add_argument("--learning_rate", type=float, default=0.1)
    p.add_argument("--lr_schedule", choices=("constant", "cosine", "step"),
                   default="constant",
                   help="'step' follows the AdaFace x0.1 milestones scaled "
                        "to --steps; 'cosine' decays to 0 over --steps")
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="Mesh data axis (0 = all devices / model axis)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="Mesh model axis (partial-FC class shards)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay f32)")
    p.add_argument("--optax_optimizer", action="store_true",
                   help="use the optax add_decayed_weights+sgd chain "
                        "instead of the fused one-pass SGD update (same "
                        "trajectory, tests pin parity). Needed to RESUME "
                        "checkpoints saved before the fused update became "
                        "the default: the opt_state pytree structure "
                        "differs, and orbax restores against the current "
                        "structure")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints/embedder")
    p.add_argument("--checkpoint_every", type=int, default=500)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--export_path", type=str, default=None,
                   help="Write the final backbone .npz here")
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from facerecognitionpipeline_tpu.parallel.mesh import make_mesh
    from facerecognitionpipeline_tpu.train.checkpoint import (
        export_backbone,
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from facerecognitionpipeline_tpu.train.data import (
        FolderDataset,
        folder_batches,
        prefetch_to_device,
        synthetic_batches,
    )
    from facerecognitionpipeline_tpu.train.trainer import TrainConfig, Trainer

    n_model = max(1, args.model_parallel)
    # make_mesh validates device counts with a clear error (vs a cryptic
    # reshape failure from a hand-rolled Mesh here)
    mesh = make_mesh(data=args.data_parallel or None, model=n_model)
    n_data = mesh.shape["data"]
    print(f"Mesh: data={n_data} x model={n_model}")

    if args.synthetic_classes:
        num_classes = args.synthetic_classes
    else:
        if not args.data_dir:
            raise SystemExit("Provide --data_dir or --synthetic_classes")
        dataset = FolderDataset(args.data_dir)
        num_classes = dataset.num_classes
        print(f"Dataset: {len(dataset)} images / {num_classes} identities")

    # partial-FC wants num_classes divisible by the model axis
    padded_classes = ((num_classes + n_model - 1) // n_model) * n_model
    cfg = TrainConfig(
        architecture=args.architecture,
        num_classes=padded_classes,
        loss=args.loss,
        margin=args.margin,
        scale=args.scale,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        lr_schedule=args.lr_schedule,
        total_steps=args.steps,
        warmup_steps=args.warmup_steps,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        fused_optimizer=not args.optax_optimizer,
    )
    trainer = Trainer(cfg, mesh)
    state = trainer.init_state(args.seed)

    start_step = 0
    if args.resume:
        step = latest_step(args.checkpoint_dir)
        if step is not None:
            state = restore_checkpoint(args.checkpoint_dir, state)
            start_step = int(state["step"])
            print(f"Resumed from step {start_step}")

    # The data stream starts AFTER resume so a resumed run does not replay
    # the epoch-0 shuffle under renumbered steps: offsetting the stream seed
    # by the resumed step continues on fresh batches (exact skip-forward
    # would decode and discard start_step batches for nothing).
    stream_seed = args.seed + start_step
    if args.synthetic_classes:
        batches = synthetic_batches(num_classes, args.batch_size, stream_seed)
    else:
        batches = folder_batches(dataset, args.batch_size, seed=stream_seed)
    if args.prefetch > 0:
        # Overlap H2D with compute: upload batches `depth` ahead, landing
        # them already data-sharded. On hosts whose device link serializes
        # transfers with execution (this image's tunnel), overlap buys
        # nothing and --prefetch 0 avoids the producer-thread contention;
        # on real PCIe/TPU hosts DMA overlaps and this hides the upload
        # (PERFORMANCE.md "Training throughput").
        from jax.sharding import NamedSharding, PartitionSpec

        batches = prefetch_to_device(
            batches,
            depth=args.prefetch,
            sharding=NamedSharding(mesh, PartitionSpec("data")),
        )

    rng = jax.random.PRNGKey(args.seed)
    t0 = time.perf_counter()
    losses = []
    pending = []  # device-array metrics; fetched once per log window
    for step_i, (images, labels) in enumerate(batches, start=start_step):
        if step_i >= args.steps:
            break
        state, metrics = trainer.train_step(state, images, labels, rng)
        # keep the loss ON DEVICE: a per-step float() forces a host sync
        # through the device tunnel every iteration, serializing the loop
        pending.append(metrics["loss"])
        if (step_i + 1) % args.log_every == 0:
            losses.extend(float(v) for v in pending)
            pending = []
            rate = args.log_every * args.batch_size / (time.perf_counter() - t0)
            print(
                f"step {step_i + 1}/{args.steps} "
                f"loss {np.mean(losses[-args.log_every:]):.4f} "
                f"({rate:.0f} img/s)"
            )
            t0 = time.perf_counter()
        if (step_i + 1) % args.checkpoint_every == 0:
            save_checkpoint(args.checkpoint_dir, jax.device_get(state), step_i + 1)
            print(f"checkpoint @ step {step_i + 1}")

    losses.extend(float(v) for v in pending)  # flush a partial log window
    final_step = int(state["step"])
    save_checkpoint(args.checkpoint_dir, jax.device_get(state), final_step)
    if args.export_path:
        export_backbone(state, args.export_path)
        print(f"Exported backbone -> {args.export_path}")
    last = f"{losses[-1]:.4f}" if losses else "n/a (no steps ran)"
    print(f"Training done at step {final_step}; final loss {last}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
