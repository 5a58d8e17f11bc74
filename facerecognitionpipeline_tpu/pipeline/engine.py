"""RecognitionEngine: the fused detect->align->gate->embed->match device step.

This is the latency-critical path the reference spreads over Python loops,
ONNX, torch and numpy (`face_recognition_server.py:586-739` calls detect, a
per-face b64 encode, per-face embed, per-query gallery search). Here it is
ONE jitted XLA program per (batch, det_size) shape:

    frames [B,H,W,3] u8 ──> cascade ──> batched warp-align ──> quality gate
        ──> IR backbone over [B*F,112,112,3] ──> gallery matmul + top-k

so concurrent client streams amortize the MXU work (BASELINE.json north
star). Host code only decodes images into the fixed-shape input buffer and
reads back small result arrays.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from facerecognitionpipeline_tpu.gallery.search import (
    cosine_topk,
    dp_sharded_cosine_topk,
)
from facerecognitionpipeline_tpu.ops.image import normalize_face_batch
from facerecognitionpipeline_tpu.ops.quality import QualityConfig, quality_check
from facerecognitionpipeline_tpu.ops.warp import (
    align_faces,
    align_faces_batch_pallas,
    align_faces_matmul,
    reference_template,
)


class RecognitionEngine:
    """Owns the jitted full-pipeline step; state (weights, gallery) in HBM."""

    def __init__(
        self,
        detector,
        embedder,
        quality_config: Optional[QualityConfig] = None,
        top_k: int = 3,
        align_size: int = 112,
        mesh=None,
        align_impl: str = "auto",
        align_patch: int = 128,
        align_chunk: int = 8,
        input_format: str = "rgb",
        embed_budget: Optional[int] = None,
        shard_gallery: bool = False,
        gallery_impl: str = "auto",
        gallery_chunk: int = 4096,
        gallery_streaming_threshold: int = 32768,
    ):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — the frame
        batch shards across it (multi-chip serving: weights/gallery
        replicated, frames data-parallel; B must divide the axis).

        align_impl: 'pallas' (fused stage-B VMEM kernel,
        ops/pallas_warp.warp_patches — the fastest path), 'matmul' (MXU
        two-stage warp, no gathers; see ops/warp.warp_affine_single_matmul)
        or 'gather' (the exact-bilinear gather formulation; ~3x slower on
        TPU, kept as the semantic reference). 'auto' (default) picks
        'pallas' on a TPU backend — under a mesh the kernel runs per shard
        inside a `jax.shard_map` over the 'data' axis (the SPMD partitioner
        cannot split a bare pallas_call) — and 'matmul' on CPU
        (interpret-mode Pallas is slower than XLA) and GPU (Mosaic targets
        TPU only). align_patch tunes the stage-A window: faces whose source
        extent fits it are bit-exact bilinear; larger faces get an
        antialiased two-stage resample; align_chunk applies to the 'matmul'
        path only.

        input_format: 'rgb' (frames [B,H,W,3] uint8) or 'i420' (frames
        [B, H*3//2, W] uint8 planar YUV, converted to RGB ON DEVICE —
        halves host->device bytes per frame, the serving ceiling on
        bandwidth-constrained links; see ops/image.i420_to_rgb).

        embed_budget: None (default) embeds EVERY face slot — B*max_faces
        backbone forwards per step, the honest fixed-shape worst case. An
        int K <= max_faces compacts per frame: the K highest-det_score
        slots that pass detection validity AND the quality gate are
        gathered (static shapes — this is the TPU-idiomatic sparse path),
        embedded and matched, and results scatter back into the [B, F]
        layout. Real camera traffic rarely fills 32 slots, and the
        backbone is ~84% of the fused step (PERFORMANCE.md), so serving
        with a budget sized to the realistic per-frame face count cuts
        step time several-fold. Slots outside the budget (or failing the
        gate) report embedded=False with zero embeddings and match score
        -1; consumers must gate on the result's "embedded" mask (the
        server treats them as detected-but-not-recognized this frame and
        the track retries). Per-frame (not cross-batch) compaction keeps
        the step shardable over a 'data' mesh axis.

        shard_gallery: row-shard the gallery template matrix over the mesh
        'data' axis inside the step (requires `mesh`). Weights stay
        replicated and frames stay data-parallel, but the gallery — the
        tensor that actually stresses HBM at production identity counts
        (1M ids x 512 f32 = 2 GB replicated) — splits across chips, so
        gallery capacity AND gallery-read bandwidth scale with the mesh.
        Matching becomes: all-gather the (small) normalized queries over
        ICI, score against the local shard, merge per-shard top-k
        candidates (see gallery.search.dp_sharded_cosine_topk). Pass
        templates already sharded (DeviceGallery(mesh=...) /
        GalleryManager(mesh=...) place them) to avoid a per-dispatch
        reshard.

        gallery_impl: 'dense' (one matmul + lax.top_k — XLA materializes
        the [Q, G] similarity block), 'streaming' (the fused Pallas kernel
        of ops/pallas_gallery: bf16-friendly template chunks double-buffered
        through VMEM with a running top-k in scratch — HBM traffic is ONE
        read of the gallery, no [Q, G] intermediate), or 'auto' (default):
        streaming on a TPU backend once the padded gallery reaches
        `gallery_streaming_threshold` rows (and divides `gallery_chunk`),
        dense otherwise. Composes with both mesh modes: under plain DP the
        kernel runs per shard on the replicated gallery via shard_map;
        under shard_gallery each shard streams its own rows inside the
        candidate-merge path. Serve bf16 templates at scale
        (GalleryManager.device_snapshot does) to halve the gallery reads —
        or an (int8 codes [G,D], per-row scales [G]) pair
        (ops.pallas_gallery.quantize_templates / DeviceGallery
        quantize='int8') to halve them AGAIN: quantized pairs override
        gallery_impl and stream whenever the per-device rows divide
        `gallery_chunk`, falling back to a dense dequantizing matmul
        otherwise; top-1 decisions are parity-pinned either way.

        Budget fairness: selection is det-score-ranked, which on a static
        scene would pick the SAME faces every step and starve the rest
        forever. The step therefore takes a `rotation` scalar (a traced
        input — no recompile as it changes) that slides the K-wide budget
        window over the det-ranked eligible slots: rotation=0 is exactly
        top-K-by-det; each increment advances the window by K, so every
        eligible face is embedded within ceil(n_eligible/K) steps. The
        serving batcher passes its dispatch counter."""
        self.detector = detector
        self.embedder = embedder
        self.quality_config = quality_config or QualityConfig(
            min_det_score=0.5, min_face_size=40, check_blur=True, blur_threshold=50.0
        )
        self.top_k = top_k
        self.align_size = align_size
        self.mesh = mesh
        if align_impl == "auto":
            align_impl = "pallas" if jax.default_backend() == "tpu" else "matmul"
        if align_impl not in ("pallas", "matmul", "gather"):
            raise ValueError(f"unknown align_impl {align_impl!r}")
        if align_impl == "pallas" and jax.default_backend() not in ("tpu", "cpu"):
            raise ValueError(
                f"align_impl='pallas' needs a TPU backend (or CPU, where it "
                f"runs in interpret mode); this process is on "
                f"{jax.default_backend()!r} — use 'matmul'"
            )
        self.align_impl = align_impl
        self.align_patch = align_patch
        self.align_chunk = align_chunk
        if embed_budget is not None:
            max_faces = getattr(detector, "max_faces", None)
            if embed_budget < 1 or (
                max_faces is not None and embed_budget > max_faces
            ):
                raise ValueError(
                    f"embed_budget={embed_budget} must be in [1, "
                    f"max_faces={max_faces}]"
                )
            if max_faces is not None and embed_budget == max_faces:
                embed_budget = None  # full budget == the dense path
        self.embed_budget = embed_budget
        if shard_gallery and (mesh is None or "data" not in mesh.shape):
            raise ValueError(
                "shard_gallery=True needs a mesh with a 'data' axis "
                "(the gallery shards over the same axis the frames do)"
            )
        self.shard_gallery = shard_gallery
        if gallery_impl not in ("auto", "dense", "streaming"):
            raise ValueError(f"unknown gallery_impl {gallery_impl!r}")
        self.gallery_impl = gallery_impl
        self.gallery_chunk = gallery_chunk
        self.gallery_streaming_threshold = gallery_streaming_threshold
        # 'auto' only streams on TPU: Mosaic compiles for TPU, and the
        # interpreter fallback (used by explicit 'streaming' in CPU tests)
        # is far slower than the XLA matmul.
        self._stream_on_auto = jax.default_backend() == "tpu"
        if input_format not in ("rgb", "i420"):
            raise ValueError(f"unknown input_format {input_format!r}")
        if input_format == "i420":
            dh, dw = getattr(detector, "det_size", (0, 0))
            if dh % 4 or dw % 2:
                raise ValueError(
                    f"i420 input needs det height % 4 == 0 and width % 2 "
                    f"== 0, got det_size {(dh, dw)}"
                )
        self.input_format = input_format
        self._template = jnp.asarray(reference_template(align_size))
        self._compiled_shapes: set = set()
        self._step = jax.jit(self._step_impl, static_argnames=("gallery_k",))

    def host_frame_shape(self, h: int, w: int) -> tuple[int, ...]:
        """Per-frame host array shape the engine expects at det size (h, w)."""
        return (h * 3 // 2, w) if self.input_format == "i420" else (h, w, 3)

    # ------------------------------------------------------------ device step

    def _align_batch(self, frames_f32, landmarks):
        """[B,H,W,3] x [B,F,5,2] -> aligned [B,F,out,out,3] (impl dispatch)."""
        if self.align_impl == "pallas":
            fn = lambda fr, lm: align_faces_batch_pallas(  # noqa: E731
                fr, lm, self._template, self.align_size,
                patch_size=self.align_patch,
            )
            if self.mesh is not None:
                # A bare pallas_call can't be split by the SPMD partitioner;
                # run the kernel per shard over the 'data' axis instead so
                # DP serving keeps the fast align path.
                from jax.sharding import PartitionSpec as P

                fn = jax.shard_map(
                    fn,
                    mesh=self.mesh,
                    in_specs=(P("data"), P("data")),
                    out_specs=P("data"),
                    # pallas_call doesn't annotate varying-mesh-axes metadata
                    check_vma=False,
                )
            return fn(frames_f32, landmarks)
        if self.align_impl == "matmul":
            per_frame = lambda img, lmk: align_faces_matmul(
                img, lmk, self._template, self.align_size,
                patch_size=self.align_patch, face_chunk=self.align_chunk,
            )
        else:
            per_frame = lambda img, lmk: align_faces(
                img, lmk, self._template, self.align_size
            )
        return jax.vmap(per_frame)(frames_f32, landmarks)

    def _match(self, feats, templates, valid, k):
        """[B, X, d] features -> (scores [B, X, k], idx [B, X, k]).

        Dense: one replicated-gallery matmul + top-k (GSPMD splits it over
        the query rows under a mesh). shard_gallery: per-shard scoring with
        an ICI candidate merge — G never materializes on one chip. At
        streaming scale (gallery_impl) the per-device scoring is the fused
        Pallas streaming kernel instead of the dense matmul."""
        from facerecognitionpipeline_tpu.gallery.search import template_rows

        g = template_rows(templates)
        quantized = isinstance(templates, tuple)  # (int8 codes, row scales)
        if quantized:
            # int8 pairs route through the streaming kernel (that's where
            # the HBM halving pays) whenever the per-device rows satisfy
            # its chunk divisibility; otherwise the dense dequantizing
            # matmul arm (_local_topk) scores them — correct either way,
            # e.g. the tiny shards of the multi-chip dry run.
            rows = g
            if self.shard_gallery and self.mesh is not None:
                rows = g // self.mesh.shape["data"]
            streaming = rows >= self.gallery_chunk and (
                rows % self.gallery_chunk == 0
            )
        elif self.gallery_impl == "streaming":
            streaming = True
        elif self.gallery_impl == "dense":
            streaming = False
        else:
            # bf16-only on auto: an f32 chunk pair (2 x 4096 x 512 x 4 B)
            # hits the 16 MB scoped-VMEM ceiling; the provider serves bf16
            # templates at streaming scale (GalleryManager.device_snapshot)
            streaming = (
                self._stream_on_auto
                and templates.dtype == jnp.bfloat16
                and g >= self.gallery_streaming_threshold
                and g % self.gallery_chunk == 0
            )
        if streaming and not self.shard_gallery and g % self.gallery_chunk:
            raise ValueError(
                f"gallery_impl='streaming' needs padded rows % gallery_chunk "
                f"== 0, got {g} rows with chunk {self.gallery_chunk}"
            )
        if self.shard_gallery:
            return dp_sharded_cosine_topk(
                self.mesh, feats, templates, valid, k, axis="data",
                streaming=streaming, chunk=self.gallery_chunk,
            )
        b, x, d = feats.shape
        if streaming:
            from facerecognitionpipeline_tpu.ops.pallas_gallery import (
                streaming_cosine_topk,
                streaming_cosine_topk_int8,
            )

            def stream(q3, t, v):
                if isinstance(t, tuple):
                    s, i = streaming_cosine_topk_int8(
                        q3.reshape(-1, d), t[0], t[1], v,
                        top_k=k, chunk=self.gallery_chunk,
                    )
                else:
                    s, i = streaming_cosine_topk(
                        q3.reshape(-1, d), t, v,
                        top_k=k, chunk=self.gallery_chunk,
                    )
                return (
                    s.reshape(q3.shape[0], x, k),
                    i.reshape(q3.shape[0], x, k),
                )

            if self.mesh is not None:
                # a bare pallas_call can't be split by the SPMD partitioner
                # (same constraint as the align kernel): run it per shard —
                # queries data-parallel, the gallery replicated per chip
                from jax.sharding import PartitionSpec as P

                tspec = (P(), P()) if quantized else P()
                return jax.shard_map(
                    stream,
                    mesh=self.mesh,
                    in_specs=(P("data"), tspec, P()),
                    out_specs=(P("data"), P("data")),
                    check_vma=False,
                )(feats, templates, valid)
            return stream(feats, templates, valid)
        if quantized:
            # dense dequantizing arm for int8 pairs (chunk-infeasible sizes)
            from facerecognitionpipeline_tpu.gallery.search import _local_topk

            scores, idx = _local_topk(
                feats.reshape(b * x, d), templates, valid, k,
                streaming=False, chunk=self.gallery_chunk,
            )
        else:
            scores, idx = cosine_topk(
                feats.reshape(b * x, d), templates, valid, k
            )
        return scores.reshape(b, x, k), idx.reshape(b, x, k)

    def _per_frame_quality(self, det, aligned):
        return quality_check(
            det["scores"],
            det["bboxes"],
            det["landmarks"],
            self.quality_config,
            aligned_faces=aligned if self.quality_config.check_blur else None,
            valid_mask=det["valid"],
        )

    def _step_impl(
        self,
        det_vars,
        emb_vars,
        templates,
        templates_valid,
        frames,
        gallery_k,
        rotation=0,
    ):
        """frames (raw RGB [B,H,W,3] or planar I420 [B,H*3//2,W], per
        `input_format`) -> everything, no host round-trips."""
        if self.input_format == "i420":
            from facerecognitionpipeline_tpu.ops.image import i420_to_rgb

            h, w = frames.shape[1] * 2 // 3, frames.shape[2]
            frames_f32 = i420_to_rgb(frames, h, w)
        else:
            frames_f32 = frames.astype(jnp.float32)
        if self.mesh is not None:
            # DP serving: frames shard over the 'data' axis; weights/gallery
            # replicate; XLA partitions the whole fused step accordingly.
            from jax.sharding import NamedSharding, PartitionSpec as P

            frames_f32 = jax.lax.with_sharding_constraint(
                frames_f32, NamedSharding(self.mesh, P("data"))
            )
        detect = self.detector._detect_batch
        if self.mesh is not None and getattr(
            self.detector, "crop_impl", "matmul"
        ) == "pallas":
            # Same constraint as the pallas align below: the SPMD
            # partitioner can't split a bare pallas_call, so run the whole
            # cascade per shard over the 'data' axis (vars replicated).
            from jax.sharding import PartitionSpec as P

            detect = jax.shard_map(
                detect,
                mesh=self.mesh,
                in_specs=(P(), P("data")),
                out_specs=P("data"),
                check_vma=False,
            )
        det = detect(det_vars, frames_f32)

        aligned = self._align_batch(frames_f32, det["landmarks"])
        aligned = jnp.clip(jnp.round(aligned), 0.0, 255.0)
        ok, metrics = jax.vmap(self._per_frame_quality)(det, aligned)
        b, f = aligned.shape[:2]

        if self.embed_budget is None:
            # One backbone forward for every face slot of every frame.
            x = normalize_face_batch(
                aligned, dtype=self.embedder._dtype
            )  # [B, F, S, S, 3]
            feats, norms = self.embedder.model.apply(
                emb_vars, x.reshape(b * f, self.align_size, self.align_size, 3)
            )
            feats = feats.reshape(b, f, -1)
            norms = norms.reshape(b, f)
            embedded = jnp.ones((b, f), dtype=bool)
            scores, idx = self._match(
                feats, templates, templates_valid, gallery_k
            )
        else:
            # Compacted path: per frame, gather the K best eligible slots
            # (valid AND quality-ok, ranked by det score), embed/match only
            # those, scatter back. All shapes static; the gather indices of
            # a frame stay within that frame, so a 'data'-sharded batch
            # never needs cross-device collectives here.
            kb = self.embed_budget
            elig = det["valid"] & ok  # [B, F]
            det_f = det["scores"].astype(jnp.float32)
            # Per-frame det-descending rank among ELIGIBLE slots (lower-index
            # tie-break): r_i = #{eligible j ordered before i}. O(F^2) bools —
            # trivial at F<=32 and avoids argsort-of-argsort.
            ii = jnp.arange(f)
            before = (det_f[:, None, :] > det_f[:, :, None]) | (
                (det_f[:, None, :] == det_f[:, :, None])
                & (ii[None, None, :] < ii[None, :, None])
            )  # [B, i, j]: eligible j precedes i in the det ordering
            before &= elig[:, None, :]
            r = jnp.sum(before, axis=2)  # [B, F]
            n_elig = jnp.sum(elig, axis=1, keepdims=True)
            # Slide the K-wide window by `rotation` steps (mod n) so a static
            # scene cycles its faces through the budget instead of starving
            # the lower-ranked ones. rotation=0 == plain top-K-by-det.
            rot = jnp.asarray(rotation, jnp.int32)
            shift = jnp.mod(r - rot * kb, jnp.maximum(n_elig, 1))
            key = jnp.where(elig, -shift.astype(jnp.float32), -1e9)
            top_s, sel = jax.lax.top_k(key, kb)  # [B, kb]
            sel_ok = top_s > -1e8  # selected slot is genuinely eligible
            # Gather the selected crops BEFORE normalizing: normalizing all
            # F slots and then keeping kb would waste (F-kb)/F of the
            # elementwise work and a full-size [B,F,S,S,3] intermediate.
            xs = normalize_face_batch(
                jnp.take_along_axis(
                    aligned, sel[:, :, None, None, None], axis=1
                ),
                dtype=self.embedder._dtype,
            )  # [B, kb, S, S, 3]
            feats_k, norms_k = self.embedder.model.apply(
                emb_vars,
                xs.reshape(b * kb, self.align_size, self.align_size, 3),
            )
            d = feats_k.shape[-1]
            feats_k = feats_k.reshape(b, kb, d) * sel_ok[:, :, None]
            norms_k = norms_k.reshape(b, kb) * sel_ok
            sc_k, ix_k = self._match(
                feats_k, templates, templates_valid, gallery_k
            )
            sc_k = jnp.where(sel_ok[:, :, None], sc_k, -1.0)
            ix_k = jnp.where(sel_ok[:, :, None], ix_k, 0)

            # Scatter the compacted results into the [B, F] slot layout
            # (top_k indices are distinct within a frame, so .at[].set is
            # race-free; unselected slots keep the canvas fill value).
            scat = jax.vmap(lambda cv, s, u: cv.at[s].set(u))
            feats = scat(jnp.zeros((b, f, d), feats_k.dtype), sel, feats_k)
            norms = scat(jnp.zeros((b, f), norms_k.dtype), sel, norms_k)
            embedded = scat(
                jnp.zeros((b, f), dtype=bool), sel, sel_ok
            )
            scores = scat(
                jnp.full((b, f, gallery_k), -1.0, sc_k.dtype), sel, sc_k
            )
            idx = scat(
                jnp.zeros((b, f, gallery_k), ix_k.dtype), sel, ix_k
            )
        return {
            "bboxes": det["bboxes"],
            "det_scores": det["scores"],
            "landmarks": det["landmarks"],
            "face_valid": det["valid"],
            "quality_ok": ok,
            "quality_metrics": metrics,
            # uint8 ON DEVICE: values are already round+clip'd to [0,255];
            # consumers fetch crops over the host link (150 KB f32 vs
            # 37.5 KB u8 per face — the link is the serving ceiling on
            # tunneled hosts, see PERFORMANCE.md)
            "aligned": aligned.astype(jnp.uint8),
            # which slots actually got a backbone forward this step (all of
            # them on the dense path; the budget's selection otherwise)
            "embedded": embedded,
            "embeddings": feats,
            "embedding_norms": norms,
            "match_scores": scores,
            "match_idx": idx,
        }

    # ---------------------------------------------------------------- host API

    def process_frames(
        self,
        frames: np.ndarray,
        gallery_templates: jax.Array,
        gallery_valid: jax.Array,
        gallery_k: Optional[int] = None,
        rotation: int = 0,
    ) -> dict:
        """Host entry -> device result dict. Expected frame shape depends on
        the engine's input_format: [B,H,W,3] uint8 for 'rgb', [B,H*3//2,W]
        uint8 planar YUV for 'i420' (see `host_frame_shape`).

        rotation: embed-budget fairness counter (any monotonically varying
        int, e.g. the batcher's dispatch count); traced, so changing it
        never recompiles. Ignored without an embed_budget."""
        # Cold compiles through a remote tunnel can take minutes; say so
        # instead of looking like a stalled request. Keyed on every jit
        # cache axis that varies in practice (frame shape, gallery padding,
        # top-k) — serving warms its buckets up front, so this fires only
        # for genuinely new programs (instant when persistently cached).
        tpl = (
            gallery_templates[0]
            if isinstance(gallery_templates, tuple) else gallery_templates
        )
        key = (
            tuple(frames.shape),
            tuple(tpl.shape),
            str(tpl.dtype),
            int(gallery_k or self.top_k),
        )
        if key not in self._compiled_shapes:
            import sys as _sys

            print(
                f"[RecognitionEngine] compiling fused step for frames "
                f"{key[0]}, gallery {key[1]} {key[2]}, k={key[3]} (first "
                f"use of this shape in this process; may take minutes "
                f"uncached)",
                file=_sys.stderr,
            )
            self._compiled_shapes.add(key)
        return self._step(
            self.detector.variables,
            self.embedder.variables,
            gallery_templates,
            gallery_valid,
            jnp.asarray(frames),
            gallery_k=gallery_k or self.top_k,
            rotation=jnp.asarray(rotation, jnp.int32),
        )
