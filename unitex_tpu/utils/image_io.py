"""PIL <-> array helpers (renderer_utils.image_to_tensor/tensor_to_image)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_image(path: str, mode: str = "RGB") -> np.ndarray:
    """-> [H, W, C] float32 in [0, 1]."""
    img = Image.open(path).convert(mode)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def to_uint8(arr) -> np.ndarray:
    a = np.asarray(arr)
    return (np.clip(a, 0.0, 1.0) * 255.0).round().astype(np.uint8)


def from_uint8(img: np.ndarray) -> np.ndarray:
    return np.asarray(img, np.float32) / 255.0


def save_image(path: str, arr) -> None:
    """[H, W, C] float in [0,1] (C in 1/3/4) -> PNG."""
    a = to_uint8(arr)
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[..., 0]
    Image.fromarray(a).save(path)
