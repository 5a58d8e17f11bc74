"""One-command import-parity check for a real zoo checkpoint.

Imports a torch `.ckpt`/statedict into the flax IR/IR-SE backbone, runs the
SAME seeded batch through both frameworks, and reports max |delta| and
per-sample cosine. PASS bar matches tests/test_irse.py: cosine >= 1-1e-6,
|delta feature| <= 2e-4. See docs/weights.md.

Usage:
  python examples/verify_checkpoint_parity.py \
      --checkpoint pretrained/adaface_ir101_ms1mv3.ckpt --architecture ir_101
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--architecture", default="ir_101",
                   help="ir_18/34/50/101/152, ir_se_*, or 'auto' to infer")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--trusted", action="store_true",
                   help="allow torch.load without weights_only (only for "
                        "files you obtained yourself)")
    p.add_argument("--fold_bn", action="store_true",
                   help="also check the BN-folded inference module")
    args = p.parse_args()

    import torch

    import jax.numpy as jnp

    from facerecognitionpipeline_tpu.models.irse import (
        BACKBONE_CONFIGS,
        build_backbone,
    )
    from facerecognitionpipeline_tpu.models.torch_import import (
        convert_statedict,
        detect_architecture,
        strip_prefix,
    )
    from tests.torch_ref import make_reference

    try:
        blob = torch.load(args.checkpoint, map_location="cpu",
                          weights_only=True)
    except (FileNotFoundError, IsADirectoryError, PermissionError):
        raise  # not a pickle-safety problem; --trusted would not help
    except Exception as e:
        if not args.trusted:
            raise SystemExit(
                f"{args.checkpoint}: not loadable with weights_only=True.\n"
                f"  {type(e).__name__}: {e}\n"
                "If the error above is about pickled non-tensor objects AND "
                "this checkpoint comes from a source you trust, re-run with "
                "--trusted."
            )
        blob = torch.load(args.checkpoint, map_location="cpu",
                          weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    sd = strip_prefix(sd)

    arch = args.architecture
    if arch == "auto":
        arch = detect_architecture(sd)
        print(f"inferred architecture: {arch}")

    # convert from the ALREADY-loaded statedict: load_adaface_checkpoint
    # would torch.load the multi-hundred-MB file a second time
    variables = convert_statedict(sd, arch)

    # torch side: reassemble the zoo module and load the same statedict
    cfg = BACKBONE_CONFIGS[arch]
    ref = make_reference(tuple(cfg["units"]), use_se=cfg["use_se"], seed=0)
    missing, unexpected = ref.load_state_dict(
        {k: torch.as_tensor(np.asarray(v, np.float32)) for k, v in sd.items()
         if k in ref.state_dict()},
        strict=False,
    )
    if missing:
        print(f"WARNING: torch reference missing {len(missing)} keys "
              f"(first: {missing[:3]})")

    rng = np.random.default_rng(args.seed)
    x = rng.uniform(-1, 1, size=(args.batch, 112, 112, 3)).astype(np.float32)

    model = build_backbone(arch)
    feat, norm = model.apply(variables, jnp.asarray(x))
    feat = np.asarray(feat)

    with torch.no_grad():
        tfeat, tnorm = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    tfeat = tfeat.numpy()

    max_delta = float(np.abs(feat - tfeat).max())
    cos = np.sum(feat * tfeat, axis=1)
    print(f"max |delta feature| = {max_delta:.3e}")
    print(f"cosine(jax, torch)  = {np.round(cos, 8).tolist()}")
    ok = max_delta <= 2e-4 and np.all(cos >= 1 - 1e-6)

    if args.fold_bn:
        from facerecognitionpipeline_tpu.models.fold import (
            fold_inference_variables,
        )

        folded = build_backbone(arch, folded=True)
        ffeat, _ = folded.apply(fold_inference_variables(variables), jnp.asarray(x))
        fcos = np.sum(np.asarray(ffeat) * tfeat, axis=1)
        print(f"cosine(folded, torch) = {np.round(fcos, 8).tolist()}")
        ok = ok and np.all(fcos >= 1 - 1e-6)

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
