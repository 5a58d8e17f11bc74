"""Device batcher: coalesce concurrent client frames into one fused step.

The BASELINE.json north star: "the server path batches incoming client frames
into fixed-shape device buffers so detection+embedding amortize across
streams". The reference instead ran the full python pipeline inline per
request under Flask's thread pool (`face_recognition_server.py:939-969`).

Three-stage pipeline, one thread per stage, so the (slow: ~32 MB/s through
this image's device tunnel) host<->device transfers overlap device compute:

  submit()  -> ingress queue
  transfer  -> jax.device_put each frame as it arrives (H2D overlaps the
               running step and other clients' uploads)
  dispatch  -> drain ready frames, stack ON DEVICE, pad to a compiled
               bucket, issue the jitted step (async dispatch, NO blocking)
  complete  -> device_get the small result fields, fan futures out (D2H
               overlaps the next step's compute)

Batch buckets: a single compiled shape per bucket size. Default buckets are
(1, max_batch): a lone client pays a B=1 step instead of 8x padded compute,
while concurrent traffic coalesces into the max_batch program. With a data-
parallel mesh, buckets are filtered to multiples of the 'data' axis so the
sharded step always divides evenly.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional, Sequence

import jax
import numpy as np


def _fail_futures(futs, err: BaseException) -> None:
    """Set `err` on every unresolved future, tolerating races: stop() and a
    stage thread may both try to fail the same future (done() checks are
    TOCTOU against another setter)."""
    from concurrent.futures import InvalidStateError

    for fut in futs:
        if not fut.done():
            try:
                fut.set_exception(err)
            except InvalidStateError:
                pass


class _LazySlice:
    """Zero-dispatch view of a slice of a device-resident batch tensor.

    Indexing just extends the index tuple (no device op); `np.asarray` /
    `__array__` runs ONE gather + fetch for exactly the requested slice.
    Serving hands these out for the bulky per-batch tensors so the hot
    path issues no device work at all for fields nobody reads — each
    device dispatch through a tunneled host costs real milliseconds, and
    most aligned crops are never persisted. The view pins the underlying
    batch tensor in HBM until dropped (bounded by the tracker's frame
    buffers; a batch's aligned block is ~4.6 MB uint8 against 16 GB HBM).
    """

    def __init__(self, dev, idx=()):
        self._dev = dev
        self._idx = tuple(idx)

    def __getitem__(self, i):
        return _LazySlice(self._dev, self._idx + (i,))

    @property
    def shape(self):
        if not self._idx:
            return tuple(self._dev.shape)
        # exact numpy indexing semantics (ints consume dims, slices/None
        # keep or add them) WITHOUT touching device data: index a
        # zero-stride host probe of the same shape. Naively dropping
        # len(idx) leading dims mis-reports slice indices, and a consumer
        # branching on .shape/ndim (imwrite/resize guards) takes the wrong
        # path.
        probe = np.broadcast_to(
            np.empty((), np.uint8), tuple(self._dev.shape)
        )
        return probe[self._idx].shape

    @property
    def dtype(self):
        return self._dev.dtype

    def __array__(self, dtype=None, copy=None):
        if copy is False:
            # numpy 2.x protocol: materializing a device tensor is always a
            # copy; honoring copy=False silently would hand back an array
            # whose in-place edits are lost
            raise ValueError(
                "_LazySlice materializes a device fetch; a zero-copy view "
                "(copy=False) cannot be honored"
            )
        arr = np.asarray(self._dev[self._idx] if self._idx else self._dev)
        return arr.astype(dtype) if dtype is not None else arr


class DeviceBatcher:
    """Pipelined batching front of the jitted recognition step."""

    def __init__(
        self,
        engine,
        gallery_provider,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        top_k: int = 3,
        bucket_sizes: Optional[Sequence[int]] = None,
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

        buckets = sorted(set(bucket_sizes or (1, max_batch)))
        mesh = getattr(engine, "mesh", None)
        if mesh is not None and "data" in mesh.shape:
            d = mesh.shape["data"]
            if max_batch % d:
                raise ValueError(
                    f"max_batch={max_batch} must be a multiple of the mesh "
                    f"'data' axis size ({d})"
                )
            buckets = [b for b in buckets if b % d == 0 and b <= max_batch]
            self.bucket_sizes = buckets or [max_batch]
        else:
            self.bucket_sizes = [min(b, max_batch) for b in buckets]
        if self.max_batch not in self.bucket_sizes:
            self.bucket_sizes.append(self.max_batch)

        self._ingress: "queue.Queue[tuple[np.ndarray, object]]" = queue.Queue()
        self._ready: "queue.Queue[tuple[object, object]]" = queue.Queue()
        self._done: "queue.Queue[tuple[object, object, list]]" = queue.Queue()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._zero_frame = None
        self._frame_shape = None  # canonical per-frame shape, set by warmup
        self._carry = None  # overflow group held for the next dispatch
        # embed-budget fairness: the engine slides its per-frame budget
        # window by this counter so a static scene cycles faces through
        # the budget (traced input — no recompile as it changes)
        self._dispatch_count = 0

    # ----------------------------------------------------------- lifecycle

    def start(self) -> None:
        if self._threads:
            return
        if self._stop.is_set():
            # Not restartable: stop() may have left timed-out stage threads
            # alive that still watch this event — clearing it would revive
            # them alongside the new set. Fail loudly instead of returning a
            # batcher whose fresh threads exit their loops immediately.
            raise RuntimeError(
                "DeviceBatcher cannot restart after stop(); "
                "create a new DeviceBatcher"
            )
        for target, name in (
            (self._transfer_run, "batcher-transfer"),
            (self._dispatch_run, "batcher-dispatch"),
            (self._complete_run, "batcher-complete"),
        ):
            t = threading.Thread(target=target, name=name, daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)
        self._threads = []
        # Fail any futures stranded in flight (ingress queue, uploaded
        # groups, the dispatch carry slot) instead of leaving their client
        # threads blocked in fut.result(timeout=...).
        err = RuntimeError("DeviceBatcher stopped before this frame ran")
        _fail = lambda futs: _fail_futures(futs, err)  # noqa: E731

        if self._carry is not None:
            _fail(self._carry[1])
            self._carry = None
        while True:
            try:
                _, futs = self._ready.get_nowait()
            except queue.Empty:
                break
            _fail(futs)
        while True:
            try:
                _, fut = self._ingress.get_nowait()
            except queue.Empty:
                break
            _fail([fut])
        # Batches whose device step already ran but whose completion stage
        # never fanned them out are stranded too.
        while True:
            try:
                _, _, futs = self._done.get_nowait()
            except queue.Empty:
                break
            _fail(futs)

    def submit(self, frame: np.ndarray):
        """frame [H,W,3] uint8 at the engine's det_size. Returns a Future
        resolving to this frame's slice of the engine output (host arrays).

        Safe to race with stop(): a submit that lands after shutdown fails
        its future immediately instead of stranding the caller — stop()'s
        queue drain cannot see an entry enqueued after the drain ran."""
        from concurrent.futures import Future

        fut: Future = Future()
        err = RuntimeError("DeviceBatcher stopped before this frame ran")
        if self._stop.is_set():
            fut.set_exception(err)
            return fut
        self._ingress.put((frame, fut))
        if self._stop.is_set():
            # raced with stop(): its drain may already have passed this entry
            _fail_futures([fut], err)
        return fut

    def warmup(self, det_size: tuple[int, int]) -> None:
        """Compile every bucket's program before accepting traffic. Calls
        the engine directly (not through the queue) so each bucket shape is
        compiled deterministically — staggered queue arrivals could dispatch
        everything as B=1."""
        h, w = det_size
        snapshot = self.gallery_provider()
        frame_shape = (
            self.engine.host_frame_shape(h, w)
            if hasattr(self.engine, "host_frame_shape")
            else (h, w, 3)
        )
        self._frame_shape = tuple(frame_shape)
        for b in self.bucket_sizes:
            out = self.engine.process_frames(
                np.zeros((b, *frame_shape), np.uint8),
                snapshot[0], snapshot[1], gallery_k=self.top_k,
            )
            np.asarray(out["match_scores"][0, 0])  # fetch-verified settle

    # ------------------------------------------------------------- stage 1

    def _transfer_run(self) -> None:
        """H2D uploads, decoupled from dispatch so they overlap compute.

        Frames upload in GROUPS: every `jax.device_put` pays a fixed
        per-transfer cost on top of bandwidth (measured 45 ms for one
        0.61 MB i420 frame vs 16.2 ms/frame for eight stacked — a ~33 ms
        fixed overhead through this image's device tunnel, which alone
        capped multi-client serving at ~22 req/s). We take whatever is
        already queued without waiting (waiting would add latency; even
        2-frame groups nearly halve the overhead), stack on host, and
        ship ONE transfer."""
        while not self._stop.is_set():
            try:
                frame, fut = self._ingress.get(timeout=0.1)
            except queue.Empty:
                continue
            frames, futs = [frame], [fut]
            while len(frames) < self.max_batch:
                try:
                    f2, u2 = self._ingress.get_nowait()
                except queue.Empty:
                    break
                frames.append(f2)
                futs.append(u2)
            # Scope malformed frames to their OWN futures: np.stack over
            # the group is all-or-nothing, so one client's wrong-shape
            # frame would otherwise fail every co-batched client. The
            # warmup-recorded shape is authoritative when present (it also
            # covers frames[0] itself being the malformed one).
            ref = self._frame_shape or frames[0].shape
            bad = [
                k for k, f in enumerate(frames)
                if f.shape != ref or f.dtype != np.uint8
            ]
            if bad:
                err = ValueError(
                    f"frame shape/dtype mismatch in transfer group: "
                    f"expected {ref} uint8"
                )
                for k in bad:
                    _fail_futures([futs[k]], err)
                frames = [f for k, f in enumerate(frames) if k not in bad]
                futs = [u for k, u in enumerate(futs) if k not in bad]
                if not frames:
                    continue
            try:
                dev = jax.device_put(np.stack(frames))
                # put-then-recheck (same shape as submit() and the dispatch
                # stage): stop()'s _ready drain may already have run (e.g.
                # this upload outlived the 2 s thread join) — a check BEFORE
                # the put leaves a window stop() can slip through, after
                # which nothing would ever fail these futures.
                self._ready.put((dev, futs))
                if self._stop.is_set():
                    err = RuntimeError(
                        "DeviceBatcher stopped before this frame ran"
                    )
                    while True:
                        try:
                            _, futs2 = self._ready.get_nowait()
                        except queue.Empty:
                            break
                        _fail_futures(futs2, err)
            except Exception as e:
                _fail_futures(futs, e)

    # ------------------------------------------------------------- stage 2

    def _drain(self) -> list:
        """Collect uploaded GROUPS (device [n,...] batch + futures) until
        max_batch frames are in hand or the batching window closes.

        A group that would push the total past max_batch is CARRIED to the
        next dispatch instead of joined — combined batches must never
        exceed max_batch, or the engine jit-compiles a brand-new shape
        mid-traffic (a group is at most max_batch frames by construction,
        so the carry slot never holds an oversized group either)."""
        import time

        groups = []
        if self._carry is not None:
            groups.append(self._carry)
            self._carry = None
        else:
            try:
                groups.append(self._ready.get(timeout=0.1))
            except queue.Empty:
                return groups
        n = int(groups[0][0].shape[0])
        deadline = self.max_wait_s
        t0 = time.perf_counter()
        while n < self.max_batch:
            remaining = deadline - (time.perf_counter() - t0)
            if remaining <= 0:
                break
            try:
                g = self._ready.get(timeout=remaining)
            except queue.Empty:
                break
            gn = int(g[0].shape[0])
            if n + gn > self.max_batch:
                self._carry = g
                break
            groups.append(g)
            n += gn
        return groups

    def _bucket(self, n: int) -> int:
        for b in self.bucket_sizes:
            if b >= n:
                return b
        return self.max_batch

    def _dispatch_run(self) -> None:
        import jax.numpy as jnp

        while not self._stop.is_set():
            groups = self._drain()
            if not groups:
                continue
            items = [fut for _, futs in groups for fut in futs]
            try:
                n = sum(int(g[0].shape[0]) for g in groups)
                b = self._bucket(n)
                parts = [g[0] for g in groups]
                if b > n:
                    # cache ONE single-frame zeros and repeat it: keying a
                    # cache on the pad COUNT would re-allocate device
                    # zeros whenever drained sizes fluctuate (n=7, n=5,
                    # ...) — an extra per-dispatch device op
                    one = (1, *parts[0].shape[1:])
                    if (
                        self._zero_frame is None
                        or self._zero_frame.shape != one
                        or self._zero_frame.dtype != parts[0].dtype
                    ):
                        self._zero_frame = jnp.zeros(one, parts[0].dtype)
                    parts.extend([self._zero_frame] * (b - n))
                # groups arrive pre-stacked on device; one device-side
                # concat only when several groups or padding combine
                batch = (
                    parts[0] if len(parts) == 1 else jnp.concatenate(parts)
                )
                snapshot = self.gallery_provider()
                templates, valid = snapshot[0], snapshot[1]
                gallery_ids = snapshot[2] if len(snapshot) > 2 else None
                # wrap far below int32: the engine casts rotation with
                # jnp.asarray(..., int32), which would raise OverflowError
                # at 2**31 dispatches on a long-lived server; the budget
                # window arithmetic is modular, so a wrap only resets the
                # fairness phase once per ~1e9 dispatches
                self._dispatch_count = (self._dispatch_count + 1) % (1 << 30)
                kwargs = {}
                if getattr(self.engine, "embed_budget", None) is not None:
                    # budget fairness: slide the engine's per-frame budget
                    # window each dispatch (dense engines — and engine
                    # stand-ins in tests — don't take the kwarg)
                    kwargs["rotation"] = self._dispatch_count
                out = self.engine.process_frames(
                    batch, templates, valid, gallery_k=self.top_k, **kwargs
                )
                # async dispatch: hand to the completion stage WITHOUT
                # blocking, so the next batch's drain/stack/dispatch
                # overlaps this step's device compute
                self._done.put((out, gallery_ids, items))
                if self._stop.is_set():
                    # raced with stop(): process_frames can outlive stop()'s
                    # 2 s thread join (a new bucket shape compiles for
                    # minutes), after which stop()'s _done drain has already
                    # run and the completion thread has exited — the put
                    # above would strand every future in the batch. Same
                    # put-then-recheck pattern as submit(): a pre-put check
                    # would leave a check-to-put window stop() can slip
                    # through. Draining here is safe — this thread is the
                    # only producer into _done, and _fail_futures tolerates
                    # entries the completion thread already resolved.
                    err = RuntimeError(
                        "DeviceBatcher stopped before this frame ran"
                    )
                    while True:
                        try:
                            _, _, futs = self._done.get_nowait()
                        except queue.Empty:
                            break
                        _fail_futures(futs, err)
            except Exception as e:
                _fail_futures(items, e)
        # Loop exit on stop: the carry slot is owned by this thread, and a
        # group carried AFTER stop()'s drain already ran (possible when
        # this thread outlived the 2 s join blocked in _drain's get and
        # then won the race for transfer's final group) would otherwise
        # strand its clients until their result(timeout=...) expires.
        if self._carry is not None:
            _fail_futures(
                self._carry[1],
                RuntimeError("DeviceBatcher stopped before this frame ran"),
            )
            self._carry = None

    # ------------------------------------------------------------- stage 3

    def _complete_run(self) -> None:
        while not self._stop.is_set():
            try:
                out, gallery_ids, items = self._done.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                # Fetch only the small per-face fields eagerly; the bulky
                # tensors (aligned crops [B,F,112,112,3], embeddings
                # [B,F,512] — megabytes per batch) stay on device behind
                # ZERO-DISPATCH lazy views and cross the link only when a
                # consumer materializes one (np.asarray at persist time).
                # The serving path never reads embeddings/landmarks/norms,
                # so on link-constrained hosts this halves D2H per batch.
                # (Per-item device slices here were measured to COST
                # throughput: every slice is its own dispatch through the
                # device tunnel, ~32+ extra per batch.)
                out = dict(out)
                lazy = {
                    k: out.pop(k)
                    for k in (
                        "aligned", "embeddings", "landmarks",
                        "embedding_norms",
                    )
                    if k in out
                }
                host = jax.device_get(out)
                from concurrent.futures import InvalidStateError

                for i, fut in enumerate(items):
                    result = jax.tree.map(lambda a, i=i: a[i], host)
                    for k, v in lazy.items():
                        result[k] = _LazySlice(v, (i,))
                    if gallery_ids is not None:
                        result["gallery_ids"] = gallery_ids
                    try:
                        fut.set_result(result)
                    except InvalidStateError:
                        # this client cancelled (raw Futures always accept
                        # cancel()) or lost the submit()/stop() race — its
                        # slot is dead, but the OTHER clients' computed
                        # results must still fan out
                        pass
            except Exception as e:
                _fail_futures(items, e)
