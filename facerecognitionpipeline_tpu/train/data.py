"""Training data pipeline: identity-folder datasets -> device-ready batches.

Face-recognition training sets (MS1M-style) are directories of pre-aligned
112x112 crops, one folder per identity. The loader builds the class index,
shuffles globally per epoch, decodes+normalizes on host threads, and
prefetches batches so the device step never waits on IO. A synthetic mode
generates deterministic per-class patterns for smoke tests and benchmarks
without any dataset.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from facerecognitionpipeline_tpu.utils.io import imread_rgb, list_images


class FolderDataset:
    """`root/<identity>/*.jpg` -> (paths, labels, num_classes)."""

    def __init__(self, root: str, min_images_per_class: int = 1):
        self.root = root
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_names: list[str] = []
        self.paths: list[str] = []
        self.labels: list[int] = []
        for cls in classes:
            images = list_images(os.path.join(root, cls))
            if len(images) < min_images_per_class:
                continue
            idx = len(self.class_names)
            self.class_names.append(cls)
            self.paths.extend(images)
            self.labels.extend([idx] * len(images))
        if not self.paths:
            raise ValueError(f"No training images under {root}")
        self.labels_np = np.asarray(self.labels, np.int32)

    @property
    def num_classes(self) -> int:
        return len(self.class_names)

    def __len__(self) -> int:
        return len(self.paths)


def _load_normalized(path: str) -> Optional[np.ndarray]:
    """RGB file -> [112,112,3] float32 BGR in [-1,1] (embedder convention)."""
    img = imread_rgb(path)
    if img is None:
        return None
    if img.shape[:2] != (112, 112):
        try:
            import cv2

            img = cv2.resize(img, (112, 112), interpolation=cv2.INTER_LINEAR)
        except ImportError:  # pragma: no cover
            return None
    bgr = img[:, :, ::-1].astype(np.float32)
    return (bgr - 127.5) / 127.5


def folder_batches(
    dataset: FolderDataset,
    batch_size: int,
    seed: int = 0,
    epochs: Optional[int] = None,
    augment_flip: bool = True,
    num_workers: int = 4,
    prefetch: int = 4,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yields (images [B,112,112,3] f32, labels [B] i32) forever (or for
    `epochs`). Decode happens in worker threads; batches are prefetched.
    Raises ValueError EAGERLY (at call time, not first next()) when no full
    batch can ever be formed."""
    if len(dataset) < batch_size:
        raise ValueError(
            f"dataset has {len(dataset)} images < batch_size {batch_size}; "
            f"no full batch can ever be formed"
        )
    return _folder_batches_iter(
        dataset, batch_size, seed, epochs, augment_flip, num_workers, prefetch
    )


def _put_or_stop(q: "queue.Queue", stop: threading.Event, item) -> bool:
    """Queue-put that a consumer abandonment can unblock: a plain put() on a
    full queue blocks forever even after the consumer walks away (stop.set()
    can't interrupt it) — poll so the producer thread can actually exit."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.2)
            return True
        except queue.Full:
            continue
    return False


def _folder_batches_iter(
    dataset, batch_size, seed, epochs, augment_flip, num_workers, prefetch
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    rng = np.random.default_rng(seed)
    out_q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def put_or_stop(item) -> bool:
        return _put_or_stop(out_q, stop, item)

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=max(1, num_workers))

    def producer():
        epoch = 0
        while not stop.is_set() and (epochs is None or epoch < epochs):
            order = rng.permutation(len(dataset))
            produced = 0
            for start in range(0, len(order) - batch_size + 1, batch_size):
                if stop.is_set():
                    return
                idx = order[start : start + batch_size]
                # cv2 decode releases the GIL, so the pool gives real
                # parallel JPEG/PNG decode on multi-core hosts
                decoded = list(
                    pool.map(lambda i: _load_normalized(dataset.paths[i]), idx)
                )
                imgs, labels = [], []
                for i, img in zip(idx, decoded):
                    if img is None:
                        continue
                    if augment_flip and rng.random() < 0.5:
                        img = img[:, ::-1, :]
                    imgs.append(img)
                    labels.append(dataset.labels_np[i])
                if len(imgs) < batch_size:
                    # top up with round-robin repeats over the images that
                    # DID decode, to keep the shape static without skewing
                    # sample weights (indexing off the growing list repeated
                    # only imgs[1], triple-weighting it on every short batch)
                    n_real = len(imgs)
                    while len(imgs) < batch_size and imgs:
                        k = len(imgs) % n_real
                        imgs.append(imgs[k])
                        labels.append(labels[k])
                if imgs:
                    if not put_or_stop(
                        (np.stack(imgs), np.asarray(labels, np.int32))
                    ):
                        return
                    produced += 1
            if produced == 0:
                # every image failed to decode: end the stream with a clear
                # signal instead of spinning on permutations forever
                break
            epoch += 1
        put_or_stop(None)

    thread = threading.Thread(
        target=producer, daemon=True, name="folder_batches_producer"
    )
    thread.start()
    try:
        while True:
            item = out_q.get()
            if item is None:
                return
            yield item
    finally:
        stop.set()
        pool.shutdown(wait=False)


def synthetic_batches(
    num_classes: int,
    batch_size: int,
    seed: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic learnable synthetic data: each class is a fixed random
    pattern + small noise. Lets the full training loop run (and demonstrably
    reduce loss) with no dataset on disk."""
    rng = np.random.default_rng(seed)
    prototypes = rng.uniform(-1, 1, size=(num_classes, 112, 112, 3)).astype(np.float32)
    while True:
        labels = rng.integers(0, num_classes, size=batch_size).astype(np.int32)
        noise = rng.normal(0, 0.05, size=(batch_size, 112, 112, 3)).astype(np.float32)
        images = np.clip(prototypes[labels] + noise, -1, 1)
        yield images, labels


def prefetch_to_device(
    batches: Iterator[Tuple[np.ndarray, np.ndarray]],
    depth: int = 2,
    sharding=None,
) -> Iterator[Tuple]:
    """Stage host batches on device `depth` ahead of consumption.

    The host iterators above keep DECODE off the training thread, but the
    H2D transfer itself still happens synchronously at dispatch — measured
    at B=64/ir_101 the blocking upload costs more than the train step
    (216 vs 43.5 ms/step on this image's tunneled link; PERFORMANCE.md
    "Training throughput"). This wrapper is the train-side equivalent of
    the serving batcher's transfer stage: a thread issues `jax.device_put`
    up to `depth` batches ahead, so the transfer of batch N+1 overlaps the
    step on batch N.

    sharding: optional `jax.sharding.Sharding` for multi-chip meshes
    (e.g. NamedSharding(mesh, P('data', ...)) so the upload lands already
    data-sharded instead of device-0-then-reshard).
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    done = object()
    errors: list = []

    def producer():
        try:
            for batch in batches:
                dev = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, sharding), batch
                )
                if not _put_or_stop(q, stop, dev):
                    return
        except BaseException as e:  # surfaced on the consumer thread
            errors.append(e)
        _put_or_stop(q, stop, done)

    thread = threading.Thread(
        target=producer, daemon=True, name="prefetch_to_device"
    )
    thread.start()
    try:
        while True:
            item = q.get()
            if item is done:
                if errors:
                    raise errors[0]
                return
            yield item
    finally:
        stop.set()
