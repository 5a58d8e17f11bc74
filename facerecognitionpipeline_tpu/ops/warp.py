"""Batched similarity-transform face alignment.

TPU-native replacement for the reference's per-face
`cv2.estimateAffinePartial2D` + `cv2.warpAffine` (`face_recognition.py:61-75`):

* `similarity_transform` — closed-form least-squares 4-DoF (scale, rotation,
  translation, no reflection) fit of landmarks onto a template. This is the
  exact optimum that estimateAffinePartial2D converges to on clean
  correspondences, computed batched with no SVD / no host round-trip.
* `warp_affine` — batched bilinear warp with constant-zero border, built from
  gathers so XLA fuses it; one kernel for the whole face batch instead of one
  cv2 call per face.

Template matches reference `FaceAligner.template` fractions
(face_recognition.py:53-59); the canonical ArcFace 112x112 template is also
provided for insightface-style alignment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# insightface/ArcFace canonical 112x112 5-point template.
ARCFACE_TEMPLATE = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    dtype=np.float32,
)

# Reference FaceAligner fractional template (face_recognition.py:53-59).
_REFERENCE_FRACTIONS = np.array(
    [[0.34, 0.46], [0.66, 0.46], [0.50, 0.61], [0.37, 0.74], [0.63, 0.74]],
    dtype=np.float32,
)


def reference_template(output_size: int = 112) -> np.ndarray:
    """The reference pipeline's 5-point template scaled to `output_size`."""
    return _REFERENCE_FRACTIONS * float(output_size)


def similarity_transform(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Least-squares non-reflective similarity mapping src -> dst.

    src: [B, K, 2] landmark points; dst: [K, 2] or [B, K, 2] template points.
    Returns forward affine matrices [B, 2, 3] (same convention as the 2x3
    matrix cv2.estimateAffinePartial2D returns).

    Closed form: with centered coordinates x (src) and y (dst),
      a = sum(x . y) / sum(|x|^2),  b = sum(x ^ y) / sum(|x|^2)
    giving M = [[a, -b], [b, a]] and t = mean(dst) - M @ mean(src).
    """
    src = src.astype(jnp.float32)
    dst = jnp.broadcast_to(dst.astype(jnp.float32), src.shape)

    src_mean = jnp.mean(src, axis=1, keepdims=True)
    dst_mean = jnp.mean(dst, axis=1, keepdims=True)
    x = src - src_mean
    y = dst - dst_mean

    denom = jnp.sum(x * x, axis=(1, 2))
    denom = jnp.where(denom > 0, denom, 1.0)
    a = jnp.sum(x * y, axis=(1, 2)) / denom
    b = jnp.sum(x[:, :, 0] * y[:, :, 1] - x[:, :, 1] * y[:, :, 0], axis=1) / denom

    rot = jnp.stack(
        [jnp.stack([a, -b], axis=-1), jnp.stack([b, a], axis=-1)], axis=1
    )  # [B, 2, 2]
    t = dst_mean[:, 0, :] - jnp.einsum("bij,bj->bi", rot, src_mean[:, 0, :])
    return jnp.concatenate([rot, t[:, :, None]], axis=2)


def invert_affine(m: jax.Array) -> jax.Array:
    """Invert batched 2x3 affine matrices. m: [B, 2, 3] -> [B, 2, 3]."""
    a = m[:, :, :2]
    t = m[:, :, 2]
    det = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    inv = (
        jnp.stack(
            [
                jnp.stack([a[:, 1, 1], -a[:, 0, 1]], axis=-1),
                jnp.stack([-a[:, 1, 0], a[:, 0, 0]], axis=-1),
            ],
            axis=1,
        )
        / det[:, None, None]
    )
    inv_t = -jnp.einsum("bij,bj->bi", inv, t)
    return jnp.concatenate([inv, inv_t[:, :, None]], axis=2)


def warp_affine(
    images: jax.Array,
    matrices: jax.Array,
    out_h: int,
    out_w: int,
) -> jax.Array:
    """Batched bilinear affine warp with constant-zero border.

    images: [B, H, W, C]; matrices: [B, 2, 3] FORWARD maps (src -> dst pixel
    coords, cv2.warpAffine convention). Returns [B, out_h, out_w, C] float32.

    Sampling: for each output pixel p, src = M^-1 @ p, bilinear interpolation,
    zero outside the source (cv2 BORDER_CONSTANT, value 0).
    """
    b, h, w, c = images.shape
    images = images.astype(jnp.float32)
    inv = invert_affine(matrices)

    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # [out_h, out_w]

    # src coords per batch element: [B, out_h, out_w]
    sx = inv[:, 0, 0, None, None] * gx + inv[:, 0, 1, None, None] * gy + inv[:, 0, 2, None, None]
    sy = inv[:, 1, 0, None, None] * gx + inv[:, 1, 1, None, None] * gy + inv[:, 1, 2, None, None]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = images.reshape(b, h * w, c)

    def gather(yi: jax.Array, xi: jax.Array) -> jax.Array:
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take_along_axis(
            flat, idx.reshape(b, out_h * out_w, 1), axis=1
        ).reshape(b, out_h, out_w, c)
        return vals * inb[..., None].astype(jnp.float32)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def bilinear_sample(
    image: jax.Array, sx: jax.Array, sy: jax.Array, border: str = "zero"
) -> jax.Array:
    """Bilinear-sample ONE image at float coords.

    image [H,W,C]; sx/sy any shape S. Returns [*S, C] float32. Gathers from
    the flattened image (no image broadcast), so sampling many crops of one
    frame costs O(|S|) memory. border='zero' (cv2 BORDER_CONSTANT 0) or
    'replicate' (cv2 BORDER_REPLICATE: clamp to edge).
    """
    h, w, c = image.shape
    flat = image.astype(jnp.float32).reshape(h * w, c)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if border == "replicate":
        def gather(yi, xi):
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            return jnp.take(flat, idx, axis=0)

        top = gather(y0i, x0i) * (1 - wx) + gather(y0i, x0i + 1) * wx
        bot = gather(y0i + 1, x0i) * (1 - wx) + gather(y0i + 1, x0i + 1) * wx
        return top * (1 - wy) + bot * wy

    # zero border: fetch each bilinear 2x2 neighborhood as ONE gather slice
    # (4x fewer gather descriptors than per-corner takes; bit-identical).
    lead_shape = sx.shape
    start_y = jnp.clip(y0i, 0, h - 2)
    start_x = jnp.clip(x0i, 0, w - 2)
    starts = jnp.stack([start_y, start_x], axis=-1).reshape(-1, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    blocks = jax.lax.gather(
        image.astype(jnp.float32), starts, dn, slice_sizes=(2, 2, c)
    ).reshape(*lead_shape, 2, 2, c)
    b00 = blocks[..., 0, 0, :]
    b01 = blocks[..., 0, 1, :]
    b10 = blocks[..., 1, 0, :]
    b11 = blocks[..., 1, 1, :]

    def corner(dy: int, dx: int) -> jax.Array:
        # At image edges the clipped gather start shifts the neighborhood
        # inside the block: select the right in-block cell per pixel.
        # Out-of-range picks are zeroed by the border mask.
        yi, xi = y0i + dy, x0i + dx
        ri = (jnp.clip(yi - start_y, 0, 1) == 1)[..., None]
        ci = (jnp.clip(xi - start_x, 0, 1) == 1)[..., None]
        top_v = jnp.where(ci, b01, b00)
        bot_v = jnp.where(ci, b11, b10)
        v = jnp.where(ri, bot_v, top_v)
        inb = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).astype(jnp.float32)
        return v * inb[..., None]

    top = corner(0, 0) * (1 - wx) + corner(0, 1) * wx
    bot = corner(1, 0) * (1 - wx) + corner(1, 1) * wx
    return top * (1 - wy) + bot * wy


def warp_affine_single(
    image: jax.Array, matrices: jax.Array, out_h: int, out_w: int
) -> jax.Array:
    """Extract F affine-warped crops from ONE image.

    image [H,W,C]; matrices [F,2,3] FORWARD maps (src->dst). Returns
    [F,out_h,out_w,C] float32 without materializing F image copies.
    """
    inv = invert_affine(matrices)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = inv[:, 0, 0, None, None] * gx + inv[:, 0, 1, None, None] * gy + inv[:, 0, 2, None, None]
    sy = inv[:, 1, 0, None, None] * gx + inv[:, 1, 1, None, None] * gy + inv[:, 1, 2, None, None]
    return bilinear_sample(image, sx, sy)


def crop_resize_gather(image: jax.Array, boxes: jax.Array, out_size: int) -> jax.Array:
    """Gather-based crop+resize (kept as the semantic reference; see
    `crop_resize` for the MXU formulation used on the hot path)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)
    t = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    sx = x1[:, None, None] + bw[:, None, None] * t[None, None, :] - 0.5
    sy = y1[:, None, None] + bh[:, None, None] * t[None, :, None] - 0.5
    sx = jnp.broadcast_to(sx, (boxes.shape[0], out_size, out_size))
    sy = jnp.broadcast_to(sy, (boxes.shape[0], out_size, out_size))
    return bilinear_sample(image, sx, sy)


def _interp_matrix(starts: jax.Array, sizes: jax.Array, out_size: int, src_dim: int) -> jax.Array:
    """Per-box 1D bilinear interpolation matrices.

    starts/sizes [N] -> [N, out_size, src_dim] where row (b, o) holds the
    bilinear weights of output sample o over source pixels. Weight(src, p) =
    max(0, 1 - |src - p|) reproduces gather-bilinear exactly, including the
    zero border (coords outside [0, src_dim-1] get < full mass).
    """
    t = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    src = starts[:, None] + sizes[:, None] * t[None, :] - 0.5  # [N, out]
    pix = jnp.arange(src_dim, dtype=jnp.float32)  # [src_dim]
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, :, None] - pix[None, None, :]))


def crop_resize(
    image: jax.Array, boxes: jax.Array, out_size: int, compute_dtype=jnp.float32
) -> jax.Array:
    """Crop boxes [N,4] (x1,y1,x2,y2 float pixels) from one image and resize
    to [N,out_size,out_size,C] with bilinear sampling (half-pixel centers,
    zero outside the image).

    TPU formulation: axis-aligned bilinear resampling is separable, so the
    whole batch is TWO matmuls — rows: [N*out, H] @ [H, W*C], then columns
    per box — which run on the MXU instead of the (very slow) gather unit.
    Numerically identical to `crop_resize_gather` at float32; pass
    compute_dtype=bfloat16 on already-normalized inputs (detector cascade)
    to halve the intermediate's HBM traffic.
    """
    n = boxes.shape[0]
    h, w, c = image.shape
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)

    my = _interp_matrix(y1, bh, out_size, h).astype(compute_dtype)  # [N, out, H]
    mx = _interp_matrix(x1, bw, out_size, w).astype(compute_dtype)  # [N, out, W]

    img = image.astype(compute_dtype).reshape(h, w * c)
    rows = jnp.dot(
        my.reshape(n * out_size, h), img, preferred_element_type=compute_dtype
    ).reshape(n, out_size, w, c)
    # batched column contraction: out[b, y, x, c] = sum_w mx[b, x, w] rows[b, y, w, c]
    return jnp.einsum(
        "bxw,bywc->byxc", mx, rows, preferred_element_type=jnp.float32
    ).astype(jnp.float32)


def align_faces(
    image: jax.Array,
    landmarks: jax.Array,
    template: jax.Array,
    output_size: int = 112,
) -> jax.Array:
    """Align every detected face of one image to the template.

    image: [H, W, C]; landmarks: [F, 5, 2] (F = padded max faces);
    template: [5, 2]. Returns [F, output_size, output_size, C] float32.
    The vectorized equivalent of reference `FaceAligner.align`
    (face_recognition.py:61-75) over all faces of a frame at once.
    """
    mats = similarity_transform(landmarks, template)
    return warp_affine_single(image, mats, output_size, output_size)
