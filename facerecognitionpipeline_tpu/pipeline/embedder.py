"""FaceEmbedder: the embedding API surface, batched and jitted.

Drop-in equivalent of the reference `FaceEmbedder` (`face_embedder.py:26-225`)
— same methods (`extract_embedding`, `extract_embeddings_batch`,
`compute_similarity`, `compute_similarity_batch`, `aggregate_embeddings`),
same normalization semantics (L2 with eps 1e-8), same model-path table
convention — but TPU-first:

* one jitted forward over the whole padded batch (the reference loops
  python-side in chunks of 32, `face_embedder.py:146-174`; ArcFace was even
  forced to batch size 1 by callers, `embedding_generator.py:190`),
* power-of-two batch bucketing so arbitrary face counts reuse a handful of
  compiled programs,
* bfloat16 compute option for the MXU, float32 feature output,
* both model families run the same JAX IR backbone — 'adaface' loads the
  zoo's .ckpt Lightning statedicts; 'arcface' loads torch-format weights
  (ONNX parsing requires the optional `onnx` package).
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from facerecognitionpipeline_tpu.models.irse import build_backbone
from facerecognitionpipeline_tpu.ops.image import preprocess_faces

# Default pretrained-weight locations (reference face_embedder.py:16-24
# convention, relative to the repo root).
_PRETRAINED_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "..", "pretrained")
ADAFACE_MODELS = {
    "ir_50": os.path.join(_PRETRAINED_DIR, "adaface_ir50_ms1mv2.ckpt"),
    "ir_101": os.path.join(_PRETRAINED_DIR, "adaface_ir101_ms1mv3.ckpt"),
}
ARCFACE_MODELS = {
    "ir_50": os.path.join(_PRETRAINED_DIR, "arcface_ir50_ms1mv3.ckpt"),
    "ir_101": os.path.join(_PRETRAINED_DIR, "arcface_ir101_ms1mv3.ckpt"),
}

_EPS = 1e-8
_MAX_DEVICE_BATCH = 512


def _bucket(n: int) -> int:
    """Smallest power-of-two >= n (>=8) so batch shapes reuse compilations."""
    b = 8
    while b < n:
        b *= 2
    return min(b, _MAX_DEVICE_BATCH)


class FaceEmbedder:
    """Face embedding extraction with AdaFace/ArcFace IR backbones on TPU."""

    def __init__(
        self,
        architecture: str = "ir_101",
        model_path: Optional[str] = None,
        model_type: str = "adaface",
        dtype=jnp.float32,
        variables: Optional[dict] = None,
        init_seed: int = 0,
        fold_bn: bool = True,
        quantize: Optional[str] = None,
        calib_faces: Optional[np.ndarray] = None,
        random_ok: bool = False,
        int8_fused: bool = False,
    ):
        """quantize: None (default) or 'int8' — post-training quantization of
        the res convs (~99% of backbone FLOPs) onto the MXU int8 fast path
        (~2x bf16 FLOP rate on v5e; see models/quantize.py). Requires
        fold_bn=True. calib_faces optionally supplies the activation-scale
        calibration batch as raw RGB uint8 [N, 112, 112, 3] (use a sample of
        REAL aligned faces when serving imported real-world weights); by
        default a deterministic synthetic render set is used.

        int8_fused: run the quantized units as one explicitly-fused int8
        chain (irse.FusedQuantBody via quantize.fuse_quantized_params)
        instead of the op-per-op Affine/QuantConv/PReLU composition. Same
        math; measured on-chip at parity-to-slightly-slower than the
        default (ir_101 B=256 embed p50 24.96 vs 24.17 ms — XLA already
        fuses the op-per-op chain optimally; PERFORMANCE.md "int8 roofline"
        post-mortem), so the default stays False and this flag preserves
        the measured experiment.

        random_ok: declare that random initialization is acceptable when no
        weights are found (throughput benchmarks, shape/compile checks —
        timing is independent of weight values). Real weights still load
        when present; this only silences the missing-weights warning, which
        exists to catch *accidental* production use without a checkpoint."""
        if model_type not in ("adaface", "arcface"):
            raise ValueError(
                f"Unknown model_type: {model_type}. Must be 'adaface' or 'arcface'"
            )
        if quantize not in (None, "int8"):
            raise ValueError(f"Unknown quantize mode: {quantize!r} (use 'int8')")
        if quantize and not fold_bn:
            raise ValueError("quantize='int8' requires fold_bn=True")
        self.model_type = model_type
        self.architecture = architecture
        self.input_size = (112, 112)
        self._dtype = dtype

        # resolve the weights path before building: ArcFace .onnx files carry
        # the iresnet flavor of the architecture (conv shortcuts on stride).
        resolved_path = model_path
        if variables is None and resolved_path is None:
            table = ADAFACE_MODELS if model_type == "adaface" else ARCFACE_MODELS
            resolved_path = table.get(architecture)
        build_arch = architecture
        if (
            model_type == "arcface"
            and resolved_path is not None
            and resolved_path.endswith(".onnx")
        ):
            build_arch = {"ir_50": "iresnet_50", "ir_101": "iresnet_100"}.get(
                architecture, architecture
            )
        self._build_arch = build_arch
        self.model = build_backbone(build_arch, dtype=dtype)

        if variables is not None:
            self.variables = variables
            self.pretrained = True
        else:
            path = resolved_path
            if path is not None and os.path.exists(path):
                self.variables = self._load_weights(path)
                self.pretrained = True
            else:
                if model_path is not None:
                    raise FileNotFoundError(f"Model weights not found at: {model_path}")
                if not random_ok:
                    where = (
                        f"at {path}" if path is not None
                        else f"configured for architecture {architecture!r}"
                    )
                    print(
                        f"[FaceEmbedder] No pretrained weights {where}; "
                        f"using random init (embeddings will not be "
                        f"identity-discriminative).",
                        file=sys.stderr,
                    )
                self.variables = self.model.init(
                    jax.random.PRNGKey(init_seed),
                    jnp.zeros((1, 112, 112, 3), jnp.float32),
                )
                self.pretrained = False

        # Inference-mode BN folding: bake BN statistics into conv/fc weights
        # (exact — see models/fold.py) so the hot embed stage skips the BN
        # element-wise passes entirely. Variables passed in without
        # batch_stats are assumed pre-folded.
        self.folded = False
        if fold_bn:
            from facerecognitionpipeline_tpu.models.fold import (
                fold_inference_variables,
            )

            if "batch_stats" in self.variables:
                self.variables = fold_inference_variables(self.variables)
            self.model = build_backbone(build_arch, dtype=dtype, folded=True)
            self.folded = True

        self.quantized = False
        if quantize == "int8":
            from facerecognitionpipeline_tpu.models.quantize import (
                calibrate_activation_amax,
                default_calibration_faces,
                quantize_folded_variables,
            )

            if calib_faces is None:
                if self.pretrained:
                    # Scales calibrated on synthetic renders only transfer
                    # approximately to real-world weights/data; activations
                    # hotter than the calibrated amax clip at +-127.
                    print(
                        "[FaceEmbedder] quantize='int8' with pretrained "
                        "weights but no calib_faces: calibrating activation "
                        "scales on SYNTHETIC renders. Pass calib_faces (or "
                        "the server's --quantize_calib DIR) with real "
                        "aligned crops before trusting accuracy — see "
                        "docs/weights.md.",
                        file=sys.stderr,
                    )
                calib_faces = default_calibration_faces()
            calib_faces = np.asarray(calib_faces)
            if calib_faces.ndim != 4 or calib_faces.shape[0] == 0 or (
                calib_faces.shape[-1] != 3
            ):
                raise ValueError(
                    f"calib_faces must be [N>0, H, W, 3] RGB crops, got "
                    f"shape {calib_faces.shape}"
                )
            faces_pm1 = preprocess_faces(jnp.asarray(calib_faces), dtype=dtype)
            amax = calibrate_activation_amax(
                self.model, self.variables, faces_pm1
            )
            self.variables = quantize_folded_variables(self.variables, amax)
            if int8_fused:
                from facerecognitionpipeline_tpu.models.quantize import (
                    fuse_quantized_params,
                )

                self.variables = fuse_quantized_params(self.variables)
            self.model = build_backbone(
                build_arch, dtype=dtype, folded=True, quantized=True,
                fused_int8=int8_fused,
            )
            self.quantized = True

        # Pin the variables on device ONCE. Checkpoint loaders and the BN
        # fold return host numpy trees; passing those to a jitted call
        # re-uploads every parameter on EVERY call (~260 MB/step for ir_101
        # through this image's ~32 MB/s device tunnel — measured as a 100x
        # fused-step regression before this line existed).
        self.variables = jax.device_put(self.variables)

        self._forward = jax.jit(self._forward_impl)

    def _load_weights(self, path: str) -> dict:
        print(f"Loading {self.model_type} weights ({self.architecture}) from {path}...", file=sys.stderr)
        if path.endswith(".npz"):
            # framework-native format (train/checkpoint.py export_backbone)
            from facerecognitionpipeline_tpu.train.checkpoint import (
                load_npz_variables,
            )

            return load_npz_variables(path)
        if path.endswith(".onnx"):
            # built-in protobuf reader — no onnx/onnxruntime dependency
            from facerecognitionpipeline_tpu.models.onnx_import import (
                load_arcface_onnx,
            )

            return load_arcface_onnx(path, self._build_arch)
        from facerecognitionpipeline_tpu.models.torch_import import (
            load_adaface_checkpoint,
        )

        return load_adaface_checkpoint(path, self.architecture)

    def _forward_impl(self, variables, faces_rgb):
        """[B, H, W, 3] raw RGB (uint8/float) -> (feat [B,512] f32, norm [B,1])."""
        x = preprocess_faces(faces_rgb, dtype=self._dtype)
        return self.model.apply(variables, x)

    # ------------------------------------------------------------------ API

    def embed_batch_device(self, faces_rgb: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Device-to-device embed: raw RGB faces -> (features, norms), no host copies.

        For composition inside larger jitted graphs (serving engine, eval).
        """
        return self._forward_impl(self.variables, faces_rgb)

    def extract_embedding(
        self, face_image: np.ndarray, normalize: bool = True
    ) -> np.ndarray:
        """Single face [H,W,3] RGB -> [512] float32 (reference face_embedder.py:112-135)."""
        emb = self.extract_embeddings_batch([face_image], normalize=normalize)
        return emb[0]

    def extract_embeddings_batch(
        self,
        face_images: Union[Sequence[np.ndarray], np.ndarray],
        normalize: bool = True,
        batch_size: Optional[int] = None,  # kept for API compat; bucketing is automatic
    ) -> np.ndarray:
        """Batch of RGB faces -> [N, 512] float32 embeddings.

        Accepts a list of HxWx3 arrays (resized as needed) or one [N,H,W,3]
        array. Pads to the next power-of-two bucket so any N reuses a small
        set of compiled programs, then slices the padding off.
        """
        if len(face_images) == 0:
            return np.zeros((0, 512), np.float32)

        if isinstance(face_images, np.ndarray) and face_images.ndim == 4:
            arrs = face_images.astype(np.float32)
            if arrs.shape[1:3] != self.input_size:
                arrs = np.stack([self._resize_host(f) for f in arrs])
        else:
            arrs = np.stack([self._resize_host(np.asarray(f)) for f in face_images])

        n = arrs.shape[0]
        outs = []
        for start in range(0, n, _MAX_DEVICE_BATCH):
            chunk = arrs[start : start + _MAX_DEVICE_BATCH]
            b = _bucket(chunk.shape[0])
            padded = np.zeros((b, *chunk.shape[1:]), dtype=np.float32)
            padded[: chunk.shape[0]] = chunk
            feat, _ = self._forward(self.variables, jnp.asarray(padded))
            outs.append(np.asarray(feat[: chunk.shape[0]]))
        emb = np.concatenate(outs, axis=0)

        if normalize:
            # Backbone output is already unit-norm; re-apply the reference's
            # eps-normalization for bit-identical downstream math.
            emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + _EPS)
        return emb

    def _resize_host(self, face: np.ndarray) -> np.ndarray:
        face = face.astype(np.float32)
        if face.shape[:2] != self.input_size:
            try:
                import cv2

                face = cv2.resize(face, self.input_size, interpolation=cv2.INTER_LINEAR)
            except ImportError:
                face = np.asarray(
                    jax.image.resize(face, (*self.input_size, 3), method="linear")
                )
        return face

    # ----------------------------------------------------- similarity utils

    @staticmethod
    def compute_similarity(embedding1: np.ndarray, embedding2: np.ndarray) -> float:
        """Cosine similarity with the reference's eps semantics
        (face_embedder.py:184-190)."""
        e1 = embedding1 / (np.linalg.norm(embedding1) + _EPS)
        e2 = embedding2 / (np.linalg.norm(embedding2) + _EPS)
        return float(np.dot(e1, e2))

    @staticmethod
    def compute_similarity_batch(
        embedding: np.ndarray, gallery_embeddings: np.ndarray
    ) -> np.ndarray:
        """One query vs a [G,512] gallery (face_embedder.py:192-200)."""
        q = embedding / (np.linalg.norm(embedding) + _EPS)
        norms = np.linalg.norm(gallery_embeddings, axis=1, keepdims=True)
        g = gallery_embeddings / (norms + _EPS)
        return np.dot(g, q)

    @staticmethod
    def aggregate_embeddings(embeddings: np.ndarray, method: str = "mean") -> np.ndarray:
        """mean / median / weighted_mean template aggregation
        (face_embedder.py:202-225)."""
        embeddings = np.asarray(embeddings)
        if len(embeddings) == 0:
            raise ValueError("Cannot aggregate empty embeddings")
        if len(embeddings) == 1:
            return embeddings[0]
        if method == "mean":
            agg = np.mean(embeddings, axis=0)
        elif method == "median":
            agg = np.median(embeddings, axis=0)
        elif method == "weighted_mean":
            sims = np.dot(embeddings, embeddings.T)
            weights = np.mean(sims, axis=1)
            weights = weights / np.sum(weights)
            agg = np.sum(embeddings * weights[:, None], axis=0)
        else:
            raise ValueError(f"Unknown aggregation method: {method}")
        return agg / (np.linalg.norm(agg) + _EPS)
