"""Train data pipeline, checkpoint/resume, backbone export -> embedder load."""

import os

import cv2
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from facerecognitionpipeline_tpu.train.checkpoint import (
    export_backbone,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from facerecognitionpipeline_tpu.train.data import (
    FolderDataset,
    folder_batches,
    synthetic_batches,
)
from facerecognitionpipeline_tpu.train.trainer import TrainConfig, Trainer


def test_folder_dataset_and_batches(tmp_path, rng):
    for cls in ("anna", "ben", "cara"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(4):
            img = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), img)
    ds = FolderDataset(str(tmp_path))
    assert ds.num_classes == 3
    assert len(ds) == 12

    it = folder_batches(ds, batch_size=4, epochs=1, num_workers=1)
    batches = list(it)
    assert len(batches) == 3  # 12 images / 4
    images, labels = batches[0]
    assert images.shape == (4, 112, 112, 3)
    assert images.min() >= -1.0 and images.max() <= 1.0
    assert labels.dtype == np.int32 and (labels < 3).all()


def test_synthetic_batches_learnable():
    it = synthetic_batches(num_classes=4, batch_size=8, seed=0)
    images, labels = next(it)
    assert images.shape == (8, 112, 112, 3)
    # same class -> near-identical images (low noise)
    i0 = np.where(labels == labels[0])[0]
    if len(i0) > 1:
        assert np.abs(images[i0[0]] - images[i0[1]]).mean() < 0.2


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model"))


@pytest.mark.slow
def test_checkpoint_resume_and_export(tmp_path, mesh, rng):
    cfg = TrainConfig(architecture="ir_micro", num_classes=16, learning_rate=0.01)
    trainer = Trainer(cfg, mesh)
    state = trainer.init_state(0)

    images = rng.uniform(-1, 1, size=(4, 112, 112, 3)).astype(np.float32)
    labels = rng.integers(0, 16, size=(4,)).astype(np.int32)
    state, _ = trainer.train_step(state, images, labels, jax.random.PRNGKey(0))
    state, _ = trainer.train_step(state, images, labels, jax.random.PRNGKey(0))

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, jax.device_get(state), int(state["step"]))
    assert latest_step(ckpt_dir) == 2

    fresh = trainer.init_state(0)
    restored = restore_checkpoint(ckpt_dir, jax.device_get(fresh))
    assert int(np.asarray(restored["step"])) == 2
    np.testing.assert_allclose(
        np.asarray(restored["params"]["classifier"]),
        np.asarray(state["params"]["classifier"]),
        rtol=1e-6,
    )
    # resumed state keeps training
    state2, m = trainer.train_step(
        jax.device_put(restored, trainer.state_sharding(restored)),
        images, labels, jax.random.PRNGKey(1),
    )
    assert int(state2["step"]) == 3
    assert np.isfinite(float(m["loss"]))

    # export -> FaceEmbedder loads it and produces unit embeddings
    export_path = str(tmp_path / "weights" / "ir_micro.npz")
    export_backbone(state, export_path)
    from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder

    emb = FaceEmbedder(architecture="ir_micro", model_path=export_path)
    assert emb.pretrained
    e = emb.extract_embedding(
        rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
    )
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, atol=1e-5)


@pytest.mark.slow
def test_train_cli_synthetic_smoke(tmp_path):
    """Drive the real CLI end-to-end on synthetic data (tiny mesh/model)."""
    from facerecognitionpipeline_tpu.cli.train_embedder import main

    export = str(tmp_path / "out" / "backbone.npz")
    rc = main([
        "--synthetic_classes", "8",
        "--architecture", "ir_micro",
        "--batch_size", "8",
        "--steps", "3",
        "--learning_rate", "0.01",
        "--data_parallel", "2",
        "--model_parallel", "2",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--checkpoint_every", "100",
        "--export_path", export,
        "--log_every", "2",
    ])
    assert rc == 0
    assert os.path.exists(export)
    assert latest_step(str(tmp_path / "ckpt")) == 3


def test_folder_batches_rejects_too_small_dataset(tmp_path, rng):
    """A dataset smaller than the batch size must fail fast, not spin a
    producer thread forever yielding nothing."""
    d = tmp_path / "only"
    d.mkdir()
    img = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
    cv2.imwrite(str(d / "0.png"), img)
    ds = FolderDataset(str(tmp_path))
    with pytest.raises(ValueError, match="batch_size"):
        folder_batches(ds, batch_size=8)


def test_folder_batches_abandoned_consumer_stops_producer(tmp_path, rng):
    """Breaking out of the generator must let the producer thread exit even
    if it is blocked on a full prefetch queue."""
    import threading
    import time

    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(8):
            img = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), img)
    ds = FolderDataset(str(tmp_path))
    # track the SPECIFIC thread the generator spawns BY NAME — a
    # before/after threading.enumerate() diff would also capture any
    # unrelated library thread (cv2/BLAS/JAX pools) that happens to start
    # during next(it) and then spuriously fail the liveness assert below
    before = set(threading.enumerate())
    it = folder_batches(ds, batch_size=4, epochs=None, prefetch=1)
    next(it)  # producer now racing to fill the size-1 queue
    spawned = [
        t for t in threading.enumerate()
        if t not in before and t.name == "folder_batches_producer"
    ]
    assert spawned, "folder_batches spawned no producer thread?"
    it.close()  # abandon: fires the generator's finally -> stop.set()
    for t in spawned:
        t.join(timeout=5.0)
    assert not any(t.is_alive() for t in spawned)


def test_prefetch_to_device_preserves_stream():
    """prefetch_to_device yields the same batches in order, as device
    arrays, and shuts its producer down when the consumer abandons it."""
    import itertools
    import threading as _threading
    import time

    import jax

    from facerecognitionpipeline_tpu.train.data import (
        prefetch_to_device,
        synthetic_batches,
    )

    src = list(itertools.islice(synthetic_batches(4, 8, seed=3), 5))
    out = list(prefetch_to_device(iter(src), depth=2))
    assert len(out) == 5
    for (si, sl), (di, dl) in zip(src, out):
        assert isinstance(di, jax.Array) and isinstance(dl, jax.Array)
        np.testing.assert_array_equal(np.asarray(di), si)
        np.testing.assert_array_equal(np.asarray(dl), sl)

    # early abandonment must not leave the producer thread alive
    gen = prefetch_to_device(synthetic_batches(4, 8, seed=4), depth=2)
    next(gen)
    gen.close()
    time.sleep(0.5)
    assert not any(
        t.name == "prefetch_to_device" and t.is_alive()
        for t in _threading.enumerate()
    )


def test_prefetch_to_device_propagates_errors():
    from facerecognitionpipeline_tpu.train.data import prefetch_to_device

    def bad_stream():
        yield (np.zeros((2, 4), np.float32), np.zeros((2,), np.int32))
        raise RuntimeError("decode exploded")

    gen = prefetch_to_device(bad_stream(), depth=2)
    next(gen)
    with pytest.raises(RuntimeError, match="decode exploded"):
        list(gen)
