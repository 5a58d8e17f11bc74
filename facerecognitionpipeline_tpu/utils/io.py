"""Host-side image IO (RGB numpy in/out) with cv2 -> PIL fallback.

The device pipeline consumes RGB uint8 arrays; all disk IO stays on the host
thread, off the jitted path.
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

VALID_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp"}


def imread_rgb(path: str) -> np.ndarray | None:
    """Read an image file as RGB uint8 [H,W,3]; None when unreadable."""
    if _HAS_CV2:
        img = cv2.imread(path)
        if img is None:
            return None
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    from PIL import Image  # pragma: no cover

    try:
        return np.asarray(Image.open(path).convert("RGB"))
    except Exception:
        return None


def imwrite_rgb(path: str, image_rgb: np.ndarray) -> None:
    """Write an RGB (float or uint8) array to disk."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.clip(np.asarray(image_rgb), 0, 255).astype(np.uint8)
    if _HAS_CV2:
        cv2.imwrite(path, cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))
    else:  # pragma: no cover
        from PIL import Image

        Image.fromarray(arr).save(path)


def list_images(directory: str) -> list[str]:
    """Sorted image paths directly under `directory`."""
    if not os.path.isdir(directory):
        return []
    return [
        os.path.join(directory, f)
        for f in sorted(os.listdir(directory))
        if os.path.splitext(f)[1].lower() in VALID_EXTENSIONS
    ]


# ------------------------------------------------------------- weight npz

def save_npz_variables(path: str, variables) -> None:
    """Flax variable tree -> flattened plain-array .npz (the framework's
    native weight format: '/'-joined key paths, no pickled objects)."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    # write through a file handle: np.savez(str) silently APPENDS '.npz'
    # when the suffix is missing, so the exact path the caller prints (and
    # later loads) would not exist
    with open(path, "wb") as f:
        np.savez(f, **{"/".join(k): np.asarray(v) for k, v in flat.items()})


def load_npz_variables(path: str) -> dict:
    """Inverse of save_npz_variables. allow_pickle=False: plain-array
    archives only — never execute pickled code from a weights path."""
    import flax

    blob = np.load(path, allow_pickle=False)
    return flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): blob[k] for k in blob.files}
    )
