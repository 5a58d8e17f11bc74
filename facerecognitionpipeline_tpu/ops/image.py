"""Batched image ops: color conversion, resize, model-input normalization.

Behavioral contracts mirrored from the reference pipeline
(`face_embedder.py:93-110`, `face_recognition.py:94-99` in
tuoasty/FaceRecognitionPipeline) but implemented as fixed-shape NHWC batches
so XLA can fuse them into the surrounding graph. Note the reference's two
normalizations — AdaFace `(x/255 - 0.5)/0.5` and ArcFace `(x - 127.5)/127.5`
— are the same affine map; there is one op here serving both model types.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ITU-R BT.601 luma weights — identical to cv2.COLOR_RGB2GRAY.
_GRAY_WEIGHTS = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)

MODEL_INPUT_SIZE = 112


def rgb_to_gray(images: jax.Array) -> jax.Array:
    """[..., H, W, 3] RGB (any real dtype) -> [..., H, W] float32 grayscale."""
    return jnp.tensordot(images.astype(jnp.float32), _GRAY_WEIGHTS, axes=([-1], [0]))


def rgb_to_bgr(images: jax.Array) -> jax.Array:
    """Flip the channel axis ([..., 3])."""
    return images[..., ::-1]


def resize_bilinear(images: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Batched bilinear resize with half-pixel-center sampling.

    Matches cv2.INTER_LINEAR coordinate mapping (src = (dst + 0.5)*scale - 0.5),
    which is also what `jax.image.resize(method="linear")` implements.
    Accepts [..., H, W, C]; resizes the (H, W) axes only.
    """
    *lead, h, w, c = images.shape
    if (h, w) == (out_h, out_w):
        return images.astype(jnp.float32)
    out_shape = (*lead, out_h, out_w, c)
    # antialias=False: cv2.INTER_LINEAR samples a fixed 2x2 neighborhood
    # when DOWNSCALING too — jax's default antialias=True widens the kernel
    # there, silently diverging from the reference for crops larger than
    # the model input (upsampling is unaffected either way)
    return jax.image.resize(
        images.astype(jnp.float32), out_shape, method="linear", antialias=False
    )


def normalize_face_batch(faces_rgb: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8/float RGB faces [..., H, W, 3] -> BGR, (x - 127.5) / 127.5.

    One op for both model families: AdaFace's `(x/255 - 0.5)/0.5` and
    ArcFace's `(x - 127.5)/127.5` (reference `face_embedder.py:98-110`) are
    the same transform. Output stays NHWC (TPU-native) with BGR channel order
    so imported torch/onnx weights see the channel ordering they were trained
    with.
    """
    x = rgb_to_bgr(faces_rgb).astype(jnp.float32)
    x = (x - 127.5) / 127.5
    return x.astype(dtype)


def preprocess_faces(
    faces_rgb: jax.Array,
    input_size: int = MODEL_INPUT_SIZE,
    dtype=jnp.float32,
) -> jax.Array:
    """Resize (if needed) + normalize a batch of RGB face crops for the embedder.

    [B, H, W, 3] any real dtype -> [B, input_size, input_size, 3] `dtype`,
    BGR, in [-1, 1]. Mirrors reference `face_embedder.preprocess`
    (`face_embedder.py:93-110`) as a single fused batched op.
    """
    faces_rgb = resize_bilinear(faces_rgb, input_size, input_size)
    return normalize_face_batch(faces_rgb, dtype=dtype)


def i420_to_rgb(yuv: jax.Array, height: int, width: int) -> jax.Array:
    """Planar I420 frames -> RGB float32, on device.

    yuv: [..., H*3//2, W] uint8 in the cv2 I420 layout
    (`cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)`): a full-res Y plane, then
    the quarter-res U and V planes each packed into H//4 rows of width W.
    Returns [..., H, W, 3] float32 RGB in [0, 255].

    Purpose: a 640x640 RGB frame is 1.2 MB over the host->device link; the
    same frame as I420 is 0.6 MB. Through this image's ~32 MB/s device
    tunnel (and any bandwidth-constrained PCIe/ICI link) halving H2D bytes
    raises the serving ceiling, and chroma upsample + the BT.601 matrix are
    a few fused VPU ops on device. Matches cv2.COLOR_YUV2RGB_I420 (nearest
    chroma upsample, STUDIO-SWING/video-range BT.601: Y in [16,235],
    chroma in [16,240]) within quantization error — do NOT feed full-range
    (JPEG-convention) YUV here.
    """
    h, w = height, width
    # w must be even for 4:2:0 chroma; h must be a multiple of FOUR: the
    # U/V planes are h//4 rows of width w each, which only tiles the
    # (h//2, w//2) chroma array when 4 | h (for h = 2 mod 4 cv2 packs U and
    # V into shared rows, a layout this unpacking cannot represent).
    if h % 4 or w % 2:
        raise ValueError(
            f"i420_to_rgb requires height % 4 == 0 and width % 2 == 0, "
            f"got {h}x{w}"
        )
    *lead, rows, cols = yuv.shape
    assert rows == h * 3 // 2 and cols == w, (
        f"expected [..., {h * 3 // 2}, {w}], got {yuv.shape}"
    )
    x = yuv.astype(jnp.float32)
    y = x[..., :h, :]
    u = x[..., h:h + h // 4, :].reshape(*lead, h // 2, w // 2)
    v = x[..., h + h // 4:, :].reshape(*lead, h // 2, w // 2)

    def up2(p):  # nearest-neighbor 2x chroma upsample (broadcast+reshape)
        p = jnp.repeat(p, 2, axis=-1)
        return jnp.repeat(p, 2, axis=-2)

    # Studio-swing BT.601 (what cv2's I420 conversions use): Y in [16,235],
    # chroma in [16,240]; 1.164 = 255/219 expands to full range.
    yf = 1.164 * (y - 16.0)
    u = up2(u) - 128.0
    v = up2(v) - 128.0
    r = yf + 1.596 * v
    g = yf - 0.392 * u - 0.813 * v
    b = yf + 2.017 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def rgb_to_i420_host(frame_rgb) -> "np.ndarray":
    """Host-side RGB uint8 [H,W,3] -> I420 [H*3//2, W] uint8 (cv2 native).

    Delegates to the jax-free transport module so there is exactly one
    implementation of the host conversion (serve.rawproto.rgb_to_i420 —
    the camera client must not import jax, so the canonical copy lives
    there and this device-side module re-exports it)."""
    from facerecognitionpipeline_tpu.serve.rawproto import rgb_to_i420

    return rgb_to_i420(frame_rgb)
