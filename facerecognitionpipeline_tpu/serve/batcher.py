"""Device batcher: coalesce concurrent client frames into one fused step.

The BASELINE.json north star: "the server path batches incoming client frames
into fixed-shape device buffers so detection+embedding amortize across
streams". Request threads submit frames and block on a Future; a single
dispatch thread drains the queue, pads to the next power-of-two batch, runs
the ONE jitted detect->align->gate->embed->match program
(`pipeline/engine.py`), and fans results back out. The reference instead ran
the full python pipeline inline per request under Flask's thread pool
(`face_recognition_server.py:939-969`).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional

import jax
import numpy as np


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class DeviceBatcher:
    """Single-dispatcher batching front of the jitted recognition step."""

    def __init__(
        self,
        engine,
        gallery_provider,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        top_k: int = 3,
    ):
        """gallery_provider() -> (templates, valid) device arrays, or
        (templates, valid, ids) — with ids, each result carries the id-list
        snapshot captured at dispatch as ``result["gallery_ids"]`` so
        consumers can resolve match indices race-free against a concurrently
        mutating gallery."""
        self.engine = engine
        self.gallery_provider = gallery_provider
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self.top_k = top_k
        self._queue: "queue.Queue[tuple[np.ndarray, Future]]" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self) -> None:
        if self._thread is None:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None

    def submit(self, frame: np.ndarray) -> Future:
        """frame [H,W,3] uint8 at the engine's det_size. Returns a Future
        resolving to this frame's slice of the engine output (host arrays)."""
        fut: Future = Future()
        self._queue.put((frame, fut))
        return fut

    # ------------------------------------------------------------- dispatch

    def _drain(self) -> list:
        items = []
        try:
            items.append(self._queue.get(timeout=0.1))
        except queue.Empty:
            return items
        deadline = self.max_wait_s
        t0 = time.perf_counter()
        while len(items) < self.max_batch:
            remaining = deadline - (time.perf_counter() - t0)
            if remaining <= 0:
                break
            try:
                items.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _run(self) -> None:
        while not self._stop.is_set():
            items = self._drain()
            if not items:
                continue
            try:
                frames = np.stack([f for f, _ in items])
                n = frames.shape[0]
                # Always pad to max_batch: ONE compiled program for every
                # traffic level (power-of-two buckets would each pay a full
                # compile the first time they occur under live traffic).
                b = self.max_batch
                if b > n:
                    frames = np.concatenate(
                        [frames, np.zeros((b - n, *frames.shape[1:]), frames.dtype)]
                    )
                snapshot = self.gallery_provider()
                templates, valid = snapshot[0], snapshot[1]
                gallery_ids = snapshot[2] if len(snapshot) > 2 else None
                out = self.engine.process_frames(
                    frames, templates, valid, gallery_k=self.top_k
                )
                # Fetch only the small per-face fields eagerly; the aligned
                # crop tensor ([B,F,112,112,3] — megabytes) stays on device
                # and consumers np.asarray() individual valid faces lazily.
                aligned = out.pop("aligned")
                host = jax.device_get(out)
                for i, (_, fut) in enumerate(items):
                    result = jax.tree.map(lambda a, i=i: a[i], host)
                    result["aligned"] = aligned[i]
                    if gallery_ids is not None:
                        result["gallery_ids"] = gallery_ids
                    fut.set_result(result)
            except Exception as e:  # propagate to all waiters
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
