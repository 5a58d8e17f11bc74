"""Fixed-shape MTCNN cascade detector (P/R/O-net + masked NMS), fully jitted.

Functional replacement for the reference's insightface SCRFD delegation
(`FaceDetector`, face_recognition.py:19-48): emits {bbox, 5-point landmarks,
det_score} per face at a configurable det_size/threshold. TPU-first design:

* static image pyramid (scales fixed at trace time),
* every stage works on PADDED candidate sets with validity masks — top-k
  selection instead of boolean indexing, `nms_mask` instead of dynamic NMS,
* R/O-net crops come from one batched bilinear gather (`crop_resize`),
* the whole cascade is ONE jitted program per input shape; batching over
  frames is a vmap.

Stage budgets (static): 128 proposals/scale -> 256 after P-NMS -> 96 after
R-net -> `max_faces` out of O-net.
"""

from __future__ import annotations

import math
import os
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from facerecognitionpipeline_tpu.models.detector_nets import (
    ONet,
    PNet,
    RNet,
    init_detector_variables,
    load_mtcnn_torch_statedict,
)
from facerecognitionpipeline_tpu.ops.nms import nms_mask, topk_boxes
from facerecognitionpipeline_tpu.ops.pallas_crop import crop_resize_pallas
from facerecognitionpipeline_tpu.ops.warp import crop_resize

_NEG = -1e9

P_PER_SCALE = 128
P_KEEP = 256
R_KEEP = 96


def _resize_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] antialiased-linear resize weights (static).

    Same triangle-kernel semantics as `jax.image.resize(method='linear',
    antialias=True)`: output sample o reads source position
    (o+0.5)*src/dst - 0.5; for downscale the hat stretches by src/dst and
    rows renormalize. Baked as a compile-time constant so a whole resize is
    TWO MXU matmuls against static weights — measured (in-program,
    roundtrip-subtracted, B=8x640) the full 9-level pyramid drops 1.05 ms
    (direct `jax.image.resize` per level) -> 0.46 ms (progressive static
    matmuls in the cascade dtype)."""
    scale = dst / src
    pos = (np.arange(dst, dtype=np.float64) + 0.5) / scale - 0.5
    d = np.abs(pos[:, None] - np.arange(src, dtype=np.float64)[None, :])
    w = np.maximum(0.0, 1.0 - (d * scale if scale < 1.0 else d))
    return (w / w.sum(axis=1, keepdims=True)).astype(np.float32)


def _pnet_out_dim(s: int) -> int:
    """P-net output extent for an even input extent s (VALID 3x3 conv ->
    2x2/2 pool (exact for even s) -> two VALID 3x3 convs)."""
    assert s % 2 == 0
    return (s - 4) // 2 - 3


def _pack_pyramid(h: int, w: int, scales: list[float], gap: int = 4):
    """Static shelf-packing of the image pyramid into ONE canvas.

    Every region gets EVEN dims at an EVEN origin, so P-net over the canvas
    reproduces the per-scale P-net outputs BIT-EXACTLY inside each region's
    submap: all P-net convs are VALID (a submap cell's receptive field never
    leaves its region) and the 2x2/2 pool needs no ceil padding for even
    extents aligned to even origins. Gap pixels only feed canvas cells
    outside every submap, which are discarded.

    Returns (canvas_h, canvas_w, regions) with regions a list of
    (sh, sw, oy, ox) in scale order.
    """

    def even(x: float) -> int:
        n = int(math.ceil(x))
        return n + (n % 2)

    dims = [(even(h * s), even(w * s)) for s in scales]
    shelf_w = dims[0][1] + gap + (dims[1][1] if len(dims) > 1 else 0) + gap + (
        dims[2][1] if len(dims) > 2 else 0
    )
    regions: list[tuple[int, int, int, int]] = []
    oy = ox = shelf_h = 0
    canvas_w = 0
    for sh, sw in dims:
        if ox + sw > shelf_w and ox > 0:
            oy += shelf_h + gap
            oy += oy % 2
            ox = 0
            shelf_h = 0
        regions.append((sh, sw, oy, ox))
        canvas_w = max(canvas_w, ox + sw)
        ox += sw + gap
        ox += ox % 2
        shelf_h = max(shelf_h, sh)
    canvas_h = oy + shelf_h
    return canvas_h + canvas_h % 2, canvas_w + canvas_w % 2, regions


def _square(boxes: jax.Array) -> jax.Array:
    """Expand boxes to squares around their centers (MTCNN 'rerec')."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = jnp.maximum(w, h)
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    half = side * 0.5
    return jnp.stack([cx - half, cy - half, cx + half, cy + half], axis=1)


def _apply_reg(boxes: jax.Array, reg: jax.Array) -> jax.Array:
    """Bounding-box regression: offsets scaled by box size."""
    w = (boxes[:, 2] - boxes[:, 0])[:, None]
    h = (boxes[:, 3] - boxes[:, 1])[:, None]
    scale = jnp.concatenate([w, h, w, h], axis=1)
    return boxes + reg * scale


#: Default detector weight files, best first, searched relative to the repo
#: root's pretrained/ directory (same convention as ADAFACE_MODELS).
_PRETRAINED_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "..", "pretrained"
)
DEFAULT_DETECTOR_WEIGHTS = (
    # domain-randomized cascade (round 5): in-distribution stress AP parity
    # with mtcnn_stress (occlusion 0.917, hard-negative fp/img 0.0) PLUS
    # held-out-renderer/corruption generalization the earlier weights lack
    # (facegen OOD AP 0.20 -> 0.86-1.0; reports/detector_ood/report.json)
    os.path.join(_PRETRAINED_DIR, "mtcnn_dr.npz"),
    os.path.join(_PRETRAINED_DIR, "mtcnn_stress.npz"),
    os.path.join(_PRETRAINED_DIR, "mtcnn_synthetic.npz"),
)


def discover_default_weights() -> Optional[str]:
    """First existing default detector weights file, or None."""
    for path in DEFAULT_DETECTOR_WEIGHTS:
        if os.path.isfile(path):
            return path
    return None


class MTCNNDetector:
    """Three-stage cascaded detector with fixed shapes end-to-end."""

    def __init__(
        self,
        det_size: tuple[int, int] = (640, 640),
        det_thresh: float = 0.5,
        stage_thresholds: tuple[float, float, float] | None = None,
        min_face_size: int = 20,
        scale_factor: float = 0.709,
        max_faces: int = 32,
        variables: Optional[dict] = None,
        weights_path: Optional[str] = None,
        dtype=jnp.float32,
        rnet_crop_downscale: int = 2,
        stage1_keep: int = P_KEEP,
        stage2_keep: int = R_KEEP,
        pack_pyramid: bool = False,
        crop_impl: str = "auto",
        quantize: Optional[str] = None,
        calib_frames: Optional[np.ndarray] = None,
    ):
        """rnet_crop_downscale: R-net's 24x24 candidate crops resample from
        the frame pre-downsampled by this factor (one separable-matmul
        resize shared by all candidates) instead of the full-resolution
        frame. The stage-2 crop_resize contraction scales with the source
        width (each candidate contracts over the full frame axis); halving
        the source was measured on the fused bench step as 49.5 -> 47.2 ms
        p50; a 24px crop of a >=`2*24`px box samples at >=1 source pixel
        per output sample either way, so factor 2 changes scores only
        marginally (stress-suite guarded; sample positions stay bit-exact
        for any frame size — only the source is pre-low-passed). Set 1 to crop from full
        resolution (exact round-1 behavior). O-net's 48px crops always use
        the full-resolution frame (final localization + landmarks).

        stage1_keep / stage2_keep: padded candidate budgets surviving the
        P-net and R-net stages (fixed shapes: every budget slot pays full
        crop + conv compute in later stages whether occupied or not).
        The defaults are load-bearing: halving to 128/64 was measured to
        drop crowded-scene recall to 0.52 and tiny-face recall to 0 on the
        stress suite — shrink only for single-face/large-face workloads.

        pack_pyramid: run P-net ONCE over all pyramid scales shelf-packed
        into a single canvas (`_pack_pyramid`) instead of one conv program
        per scale. Bit-exact per region (P-net is all-VALID convs; regions
        get even dims at even origins so the 2x2/2 pool needs no ceil
        padding), but scaled sizes round up to even and boxes map back by
        the TRUE per-axis factors sh/h, sw/w — proposal coordinates can
        differ from the unpacked path at the sub-pixel level. MEASURED
        SLOWER at the bench config (stage-1 8.65 vs 8.04 ms standalone,
        B=8x640px: the canvas padding costs more than the 9 merged conv
        dispatches save), so default OFF. With roundtrip-corrected
        profiling the whole of stage 1 is only ~1.9 ms of the ~6.8 ms
        cascade (pyramid 0.46 via the static-matmul `_pyramid` below);
        stages 2-3 are where the remaining milliseconds live.

        crop_impl: how R/O-net candidate crops resample. 'pallas'
        (ops/pallas_crop.crop_resize_pallas — frame resident in VMEM, hat
        weights from iota, both separable passes fused per box; bf16
        compute): stage-2 crops 1.95 -> 0.47 ms, stage-3 1.89 -> 0.68 ms
        measured B=8x640. 'matmul' — the XLA two-contraction crop_resize
        in self.dtype. 'auto' picks 'pallas' on a TPU backend when the
        cascade dtype is bfloat16 (the serving configuration; the kernel's
        operands are bf16 by design), else 'matmul'. Under a DP mesh the
        engine wraps the whole detect in `jax.shard_map` (the SPMD
        partitioner cannot split a bare pallas_call) — see
        pipeline/engine.py."""
        self.det_size = det_size
        self.max_faces = max_faces
        self.thresholds = stage_thresholds or (0.6, 0.7, det_thresh)
        self.rnet_crop_downscale = int(rnet_crop_downscale)
        self.stage1_keep = int(stage1_keep)
        self.stage2_keep = int(stage2_keep)
        # fail at construction, not with an opaque lax.top_k trace error
        # ('k > operand size') minutes into the first jitted detect
        if not (self.max_faces <= self.stage2_keep <= self.stage1_keep):
            raise ValueError(
                f"candidate budgets must narrow through the cascade: "
                f"max_faces={self.max_faces} <= stage2_keep="
                f"{self.stage2_keep} <= stage1_keep={self.stage1_keep}"
            )
        self._crop_dtype = dtype  # cascade crops run on normalized [-1,1] data
        if crop_impl == "auto":
            crop_impl = (
                "pallas"
                if jax.default_backend() == "tpu" and dtype == jnp.bfloat16
                else "matmul"
            )
        if crop_impl not in ("pallas", "matmul"):
            raise ValueError(f"unknown crop_impl {crop_impl!r}")
        if crop_impl == "pallas":
            # fail loudly at construction, not with a Mosaic trace error /
            # silent bf16 downgrade at first detect (mirrors the engine's
            # align_impl guards, pipeline/engine.py)
            if jax.default_backend() not in ("tpu", "cpu"):
                raise ValueError(
                    f"crop_impl='pallas' needs a TPU backend (or CPU "
                    f"interpret mode); this process is on "
                    f"{jax.default_backend()!r} — use 'matmul'"
                )
            if dtype != jnp.bfloat16:
                raise ValueError(
                    "crop_impl='pallas' computes crops in bfloat16; use "
                    "dtype=jnp.bfloat16 or crop_impl='matmul'"
                )
        self.crop_impl = crop_impl
        self.pnet = PNet(dtype=dtype)
        self.rnet = RNet(dtype=dtype)
        self.onet = ONet(dtype=dtype)

        if weights_path is None and variables is None:
            # Auto-discover shipped default weights (mirrors the embedder's
            # default-path table, pipeline/embedder.py:36-43; reference SCRFD
            # works out-of-the-box, face_recognition.py:20-29). Pass
            # weights_path="random" for explicit random init (training).
            weights_path = discover_default_weights()
        if weights_path == "random":
            weights_path = None

        if variables is not None:
            # device_put: loaders return host numpy trees, and numpy args to
            # a jitted call are re-uploaded on EVERY call (the embedder's
            # 260 MB/step lesson, pipeline/embedder.py; the cascade's ~2 MB
            # costs ~60 ms/step through this image's device tunnel).
            self.variables = jax.device_put(variables)
            self.pretrained = True
        elif weights_path is not None:
            self.variables = jax.device_put(self._load_weights(weights_path))
            self.pretrained = True
        else:
            print(
                "[MTCNNDetector] No weights provided; using random init "
                "(detections will be meaningless until weights are loaded).",
                file=sys.stderr,
            )
            self.variables = init_detector_variables()
            self.pretrained = False

        # Static pyramid: scales over det_size until the smaller side < 12.
        h, w = det_size
        m = 12.0 / min_face_size
        self.scales: list[float] = []
        s = m
        while min(h, w) * s >= 12.0:
            self.scales.append(s)
            s *= scale_factor
        if not self.scales:
            # an empty pyramid would crash in jnp.concatenate([]) deep
            # inside the first jitted cascade, far from the bad argument
            raise ValueError(
                f"min_face_size={min_face_size} leaves no pyramid scale "
                f"for det_size={det_size} (need min_face_size <= "
                f"{min(h, w)}); lower min_face_size or raise det_size"
            )

        self.pack_pyramid = bool(pack_pyramid)
        if self.pack_pyramid:
            self._canvas_hw = _pack_pyramid(h, w, self.scales)

        # Post-training int8 quantization of the R/O-net stages (quantize=
        # 'int8'): per-output-channel int8 weights + static calibrated
        # activation scales on conv1..N/fc1, same scheme as the embedder's
        # models/quantize.py. P-net stays float: its 10/16/32-channel convs
        # are MXU-padding-bound (int8 can't help) and its score map ranks
        # every proposal. Calibration observes R/O-net intermediates on
        # `calib_frames` (raw RGB uint8 [N, H, W, 3] at det_size; default =
        # synthetic stress scenes — for imported real-world weights pass
        # real frames, the transfer caveat of models/quantize.py applies).
        self.quantized = False
        if quantize not in (None, "int8"):
            raise ValueError(f"Unknown quantize mode: {quantize!r} (use 'int8')")
        if quantize == "int8":
            if not self._variables_quantized():
                from facerecognitionpipeline_tpu.models.quantize import (
                    default_calibration_frames,
                    quantize_detector_variables,
                )

                if calib_frames is None:
                    calib_frames = default_calibration_frames(det_size=det_size)
                amax = self.calibrate_amax(calib_frames)
                self.variables = jax.device_put(
                    quantize_detector_variables(
                        jax.device_get(self.variables), amax
                    )
                )
            # else: loaded variables already carry int8 kernels (e.g. a
            # save_npz of a quantized detector) — no recalibration
            self.rnet = RNet(dtype=dtype, quantized=True)
            self.onet = ONet(dtype=dtype, quantized=True)
            self.quantized = True
        elif self._variables_quantized():
            raise ValueError(
                "loaded detector variables are int8-quantized; construct "
                "with quantize='int8' (the float R/O-nets cannot consume "
                "kernel_q params)"
            )

        self._detect_one = jax.jit(self._cascade)
        self._detect_batch = jax.jit(jax.vmap(self._cascade, in_axes=(None, 0)))

    def _load_weights(self, path: str) -> dict:
        if path.endswith(".npz"):
            from facerecognitionpipeline_tpu.utils.io import load_npz_variables

            return load_npz_variables(path)
        import torch

        blob = torch.load(path, map_location="cpu", weights_only=True)
        return load_mtcnn_torch_statedict(blob)

    def save_npz(self, path: str) -> None:
        from facerecognitionpipeline_tpu.utils.io import save_npz_variables

        save_npz_variables(path, self.variables)

    # ------------------------------------------------------------- cascade

    def _pyramid(self, img, dims=None):
        """Pyramid levels at the static scales, built PROGRESSIVELY in the
        cascade compute dtype with STATIC-WEIGHT matmul resizes.

        Each level is two `dot_general`s against compile-time
        `_resize_matrix` constants (same antialiased-linear semantics as
        `jax.image.resize`), sourced from the previous level so the
        contraction stays small, in bf16 on the serving path. Measured
        (examples/profile_detect.py, roundtrip-subtracted, B=8x640):
        1.05 ms for nine direct full-frame `jax.image.resize` calls ->
        0.46 ms for this path. MEASUREMENT CAUTION: an earlier chain=5
        profile without roundtrip subtraction attributed ~5.7 ms to the
        pyramid — that was the ~25 ms fetch round-trip smeared over the
        chain, not compute; always subtract the probe. The extra low-pass
        of repeated 0.709x anti-aliased resampling is the classic image-
        pyramid construction; stress-suite detection parity is pinned by
        tests/test_detector_stress.py.
        """
        h, w, _ = img.shape
        if dims is None:
            dims = [
                (int(math.ceil(h * s)), int(math.ceil(w * s)))
                for s in self.scales
            ]
        dt = self._crop_dtype
        levels = []
        src = img.astype(dt)
        ph, pw = h, w
        for sh, sw in dims:
            wy = jnp.asarray(_resize_matrix(ph, sh)).astype(dt)
            wx = jnp.asarray(_resize_matrix(pw, sw)).astype(dt)
            rows = jnp.einsum("oh,hwc->owc", wy, src,
                              preferred_element_type=dt)
            src = jnp.einsum("xw,owc->oxc", wx, rows,
                             preferred_element_type=dt)
            levels.append(src)
            ph, pw = sh, sw
        return levels

    def _pnet_proposals(self, prob, reg, sx, sy):
        """Decode one scale's P-net maps into P_PER_SCALE padded proposals.

        Shared by `_stage1` (per-scale maps, sx == sy == scale) and
        `_stage1_packed` (canvas submaps, true per-axis factors) so the
        12 px window / stride-2 decode convention and the pad fill can
        never silently diverge between the two pyramid paths."""
        fh, fw = prob.shape
        k = min(P_PER_SCALE, fh * fw)
        top_p, top_i = jax.lax.top_k(prob.reshape(-1), k)
        rows = (top_i // fw).astype(jnp.float32)
        cols = (top_i % fw).astype(jnp.float32)
        x1 = cols * 2.0 / sx
        y1 = rows * 2.0 / sy
        x2 = (cols * 2.0 + 12.0) / sx
        y2 = (rows * 2.0 + 12.0) / sy
        boxes = jnp.stack([x1, y1, x2, y2], axis=1)
        boxes = _apply_reg(boxes, reg.reshape(-1, 4)[top_i])
        pad = P_PER_SCALE - k
        if pad:
            boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
            top_p = jnp.pad(top_p, (0, pad), constant_values=_NEG)
        return boxes, top_p

    def _stage1_finish(self, all_boxes, all_scores, all_valid):
        """Concat per-scale proposals, cross-scale NMS, stage-1 top-k."""
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        valid = jnp.concatenate(all_valid)
        keep = nms_mask(boxes, scores, valid, iou_threshold=0.7)
        return topk_boxes(
            boxes, jnp.where(keep, scores, _NEG), keep, self.stage1_keep
        )

    def _stage1_packed(self, variables, img):
        """P-net ONCE over the shelf-packed pyramid canvas -> proposals.

        One conv program instead of len(scales) tiny ones: the per-scale
        resizes write into a single canvas, P-net runs on it once, and each
        scale's output submap is a STATIC slice of the canvas map (bit-exact
        vs running P-net on that scale alone — see `_pack_pyramid`)."""
        h, w, _ = img.shape
        ch, cw, regions = self._canvas_hw
        levels = self._pyramid(img, dims=[(sh, sw) for sh, sw, _, _ in regions])
        canvas = jnp.zeros((ch, cw, 3), levels[0].dtype)
        for (sh, sw, oy, ox), scaled in zip(regions, levels):
            canvas = jax.lax.dynamic_update_slice(canvas, scaled, (oy, ox, 0))
        prob, reg = self.pnet.apply(variables["pnet"], canvas[None])
        prob, reg = prob[0], reg[0]

        all_boxes, all_scores, all_valid = [], [], []
        thr1 = self.thresholds[0]
        for sh, sw, oy, ox in regions:
            fh, fw = _pnet_out_dim(sh), _pnet_out_dim(sw)
            a, b = oy // 2, ox // 2
            sub_p = jax.lax.slice(prob, (a, b), (a + fh, b + fw))
            sub_r = jax.lax.slice(reg, (a, b, 0), (a + fh, b + fw, 4))
            boxes, top_p = self._pnet_proposals(
                sub_p, sub_r, sx=sw / float(w), sy=sh / float(h)
            )
            all_boxes.append(boxes)
            all_scores.append(top_p)
            all_valid.append(top_p > thr1)

        return self._stage1_finish(all_boxes, all_scores, all_valid)

    def _stage1(self, variables, img):
        """P-net over the static pyramid -> padded proposals."""
        all_boxes, all_scores, all_valid = [], [], []
        thr1 = self.thresholds[0]
        for scale, scaled in zip(self.scales, self._pyramid(img)):
            prob, reg = self.pnet.apply(variables["pnet"], scaled[None])
            boxes, top_p = self._pnet_proposals(
                prob[0], reg[0], sx=scale, sy=scale
            )
            all_boxes.append(boxes)
            all_scores.append(top_p)
            all_valid.append(top_p > thr1)

        return self._stage1_finish(all_boxes, all_scores, all_valid)

    def _crop(self, img, boxes, out_size):
        """Candidate crop dispatch (see `crop_impl` in __init__)."""
        if self.crop_impl == "pallas":
            return crop_resize_pallas(img, boxes, out_size)
        return crop_resize(img, boxes, out_size, compute_dtype=self._crop_dtype)

    def _stage2_crops(self, img, boxes):
        """Squared candidate boxes -> (sq, 24px R-net crops)."""
        h, w, _ = img.shape
        sq = jnp.clip(_square(boxes), 0, max(h, w))
        d = self.rnet_crop_downscale
        if d > 1:
            # One shared separable-matmul downsample, then every candidate
            # crops from the small frame: the per-candidate interp
            # contraction shrinks by ~d x in the contracted dimension.
            # Boxes scale by the TRUE per-axis factors S/w and S/h (the
            # small frame is an S x S resample of the full w x h frame), so
            # the half-pixel algebra cancels exactly for ANY frame size —
            # sample positions match full-res bilinear bit-for-bit; only
            # the source is pre-low-passed.
            s = max(h, w) // d
            small = crop_resize(
                img,
                jnp.array([[0.0, 0.0, float(w), float(h)]], jnp.float32),
                s,
                compute_dtype=self._crop_dtype,
            )[0]
            sx, sy = s / float(w), s / float(h)
            small_boxes = sq * jnp.array([sx, sy, sx, sy], jnp.float32)
            crops = self._crop(small, small_boxes, 24)
        else:
            crops = self._crop(img, sq, 24)
        return sq, crops

    def _stage2_finish(self, sq, prob, reg, valid):
        valid = valid & (prob > self.thresholds[1])
        boxes = _apply_reg(sq, reg)
        keep = nms_mask(boxes, prob, valid, iou_threshold=0.7)
        return topk_boxes(
            boxes, jnp.where(keep, prob, _NEG), keep, self.stage2_keep
        )

    def _stage2(self, variables, img, boxes, scores, valid):
        sq, crops = self._stage2_crops(img, boxes)
        prob, reg = self.rnet.apply(variables["rnet"], crops)
        return self._stage2_finish(sq, prob, reg, valid)

    def _stage3_crops(self, img, boxes):
        h, w, _ = img.shape
        sq = jnp.clip(_square(boxes), 0, max(h, w))
        return sq, self._crop(img, sq, 48)

    def _stage3(self, variables, img, boxes, scores, valid):
        sq, crops = self._stage3_crops(img, boxes)
        prob, reg, lmk = self.onet.apply(variables["onet"], crops)
        valid = valid & (prob > self.thresholds[2])

        bw = (sq[:, 2] - sq[:, 0])[:, None]
        bh = (sq[:, 3] - sq[:, 1])[:, None]
        lmk_x = sq[:, 0, None] + lmk[:, :, 0] * bw
        lmk_y = sq[:, 1, None] + lmk[:, :, 1] * bh
        landmarks = jnp.stack([lmk_x, lmk_y], axis=-1)  # [N, 5, 2]

        boxes = _apply_reg(sq, reg)
        keep = nms_mask(boxes, prob, valid, iou_threshold=0.7, mode="min")
        masked = jnp.where(keep, prob, _NEG)
        top_scores, top_i = jax.lax.top_k(masked, self.max_faces)
        return (
            boxes[top_i],
            top_scores,
            landmarks[top_i],
            top_scores > _NEG / 2,
        )

    def _cascade(self, variables, frame):
        """frame [H,W,3] raw RGB float/uint8 -> padded detections."""
        img = (frame.astype(jnp.float32) - 127.5) / 128.0
        stage1 = self._stage1_packed if self.pack_pyramid else self._stage1
        boxes, scores, valid = stage1(variables, img)
        boxes, scores, valid = self._stage2(variables, img, boxes, scores, valid)
        boxes, scores, landmarks, valid = self._stage3(variables, img, boxes, scores, valid)
        h, w, _ = frame.shape
        lim = jnp.array([w - 1, h - 1, w - 1, h - 1], jnp.float32)
        boxes = jnp.clip(boxes, 0, lim)
        return {
            "bboxes": boxes,
            "scores": jnp.where(valid, scores, 0.0),
            "landmarks": landmarks,
            "valid": valid,
        }

    # --------------------------------------------------------- calibration

    def _variables_quantized(self) -> bool:
        """Whether the loaded variable tree carries int8 R-net kernels."""
        try:
            return "kernel_q" in self.variables["rnet"]["params"]["conv1"]
        except (KeyError, TypeError):
            return False

    def calibrate_amax(self, frames: np.ndarray) -> dict:
        """Observe max|input| of every R/O-net conv/fc over calibration
        frames (raw RGB uint8 [N, H, W, 3] at det_size), for int8
        activation scales (models/quantize.py scheme).

        Must run on the FLOAT cascade (before variables are quantized).
        conv1 sees the crops directly; conv2..N see the pooled PReLU
        outputs — the ceil-mode max pools here have stride <= window, so
        every element lands in some window and the captured PReLU amax
        over-estimates the pooled conv input's only through damped
        negatives (conservative: a too-large scale costs fractions of an
        LSB, a too-small one clips).
        """
        if self.quantized:
            raise RuntimeError(
                "calibrate_amax needs the float cascade; this detector is "
                "already quantized"
            )

        def one(v, frame):
            img = (frame.astype(jnp.float32) - 127.5) / 128.0
            stage1 = self._stage1_packed if self.pack_pyramid else self._stage1
            boxes, scores, valid = stage1(v, img)
            sq, crops24 = self._stage2_crops(img, boxes)
            (prob, reg), tr = self.rnet.apply(
                v["rnet"], crops24,
                capture_intermediates=True, mutable=["intermediates"],
            )
            boxes2, scores2, valid2 = self._stage2_finish(sq, prob, reg, valid)
            _, crops48 = self._stage3_crops(img, boxes2)
            _, to = self.onet.apply(
                v["onet"], crops48,
                capture_intermediates=True, mutable=["intermediates"],
            )

            def amx(x):
                return jnp.max(jnp.abs(x.astype(jnp.float32)))

            def prelu_amax(tree, name):
                return amx(tree["intermediates"][name]["__call__"][0])

            return {
                "rnet": {
                    "conv1": amx(crops24),
                    "conv2": prelu_amax(tr, "prelu1"),
                    "conv3": prelu_amax(tr, "prelu2"),
                    "fc1": prelu_amax(tr, "prelu3"),
                },
                "onet": {
                    "conv1": amx(crops48),
                    "conv2": prelu_amax(to, "prelu1"),
                    "conv3": prelu_amax(to, "prelu2"),
                    "conv4": prelu_amax(to, "prelu3"),
                    "fc1": prelu_amax(to, "prelu4"),
                },
            }

        run = jax.jit(jax.vmap(one, in_axes=(None, 0)))
        per_frame = jax.device_get(run(self.variables, jnp.asarray(frames)))
        return jax.tree_util.tree_map(
            lambda a: float(np.max(a)), per_frame
        )

    # ---------------------------------------------------------------- API

    def detect_device(self, frames: jax.Array) -> dict:
        """[B,H,W,3] (det_size) -> padded detection dict, stays on device."""
        return self._detect_batch(self.variables, frames)

    def detect(self, image: np.ndarray) -> List[dict]:
        """Single RGB image (any size) -> list of face dicts, reference
        `FaceDetector.detect` schema (face_recognition.py:31-48).

        The image is letterboxed to det_size on the host; boxes/landmarks map
        back to original coordinates.
        """
        ih, iw = image.shape[:2]
        dh, dw = self.det_size
        scale = min(dw / iw, dh / ih)
        nw, nh = int(round(iw * scale)), int(round(ih * scale))
        try:
            import cv2

            resized = cv2.resize(image.astype(np.float32), (nw, nh))
        except ImportError:  # pragma: no cover
            resized = np.asarray(
                jax.image.resize(image.astype(np.float32), (nh, nw, 3), "linear")
            )
        canvas = np.zeros((dh, dw, 3), dtype=np.float32)
        canvas[:nh, :nw] = resized

        out = jax.device_get(self._detect_one(self.variables, jnp.asarray(canvas)))
        results = []
        for i in range(self.max_faces):
            if not out["valid"][i]:
                continue
            # clip to the ORIGINAL image: the cascade clips to det_size only,
            # so a box regressed a few px into the letterbox padding would
            # map past (iw-1, ih-1) and downstream int-bbox crops would
            # slice short/empty
            bbox = np.clip(
                out["bboxes"][i] / scale,
                0,
                [iw - 1, ih - 1, iw - 1, ih - 1],
            )
            results.append(
                {
                    "bbox": bbox.astype(np.int32),
                    "landmarks": (out["landmarks"][i] / scale).astype(np.float32),
                    "det_score": float(out["scores"][i]),
                    "pose": None,
                    "age": None,
                    "gender": None,
                }
            )
        results.sort(key=lambda r: -r["det_score"])
        return results
