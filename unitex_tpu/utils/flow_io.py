"""Optical-flow file IO (basicsr/utils/flow_util.py, mmcv semantics).

Middlebury ``.flo`` read/write plus the uint8 quantized pair form used
by the REDS/Vimeo video-SR datasets.  The quantized form stores dx/dy
(optionally normalized by image width/height) on 255 levels so 0 stays
0 after a round trip; lossy image codecs are the caller's choice here —
we read/write the raw concatenated uint8 array via any PNG-capable
saver (the in-repo image IO) instead of binding cv2.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_FLO_MAGIC = b"PIEH"


def flowread(path: str) -> np.ndarray:
    """Read a ``.flo`` file -> [H, W, 2] float32 (flow_util.py:28-43)."""
    with open(path, "rb") as f:
        if f.read(4) != _FLO_MAGIC:
            raise IOError(f"Invalid flow file: {path} (bad magic)")
        w = int(np.fromfile(f, np.int32, 1)[0])
        h = int(np.fromfile(f, np.int32, 1)[0])
        return np.fromfile(f, np.float32, w * h * 2).reshape(h, w, 2)


def flowwrite(flow: np.ndarray, path: str) -> None:
    """Write [H, W, 2] flow to ``.flo`` (flow_util.py:63-68)."""
    flow = np.asarray(flow, np.float32)
    with open(path, "wb") as f:
        f.write(_FLO_MAGIC)
        np.array([flow.shape[1], flow.shape[0]], np.int32).tofile(f)
        flow.tofile(f)


def quantize(arr: np.ndarray, min_val: float, max_val: float,
             levels: int, dtype=np.int64) -> np.ndarray:
    """Clip to [min_val, max_val] and quantize to [0, levels-1]
    (flow_util.py:126-147)."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be > 1, got {levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val {min_val} !< max_val {max_val}")
    arr = np.clip(arr, min_val, max_val) - min_val
    return np.minimum(
        np.floor(levels * arr / (max_val - min_val)).astype(dtype),
        levels - 1)


def dequantize(arr: np.ndarray, min_val: float, max_val: float,
               levels: int, dtype=np.float64) -> np.ndarray:
    """Inverse of :func:`quantize` at bin centers (flow_util.py:150-170)."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be > 1, got {levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val {min_val} !< max_val {max_val}")
    return (arr + 0.5).astype(dtype) * (max_val - min_val) / levels + min_val


def quantize_flow(flow: np.ndarray, max_val: float = 0.02,
                  norm: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """[H, W, 2] flow -> uint8 (dx, dy) on 255 levels, optionally
    normalized by width/height (flow_util.py:76-100)."""
    h, w, _ = flow.shape
    dx, dy = flow[..., 0], flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    return (quantize(dx, -max_val, max_val, 255, np.uint8),
            quantize(dy, -max_val, max_val, 255, np.uint8))


def dequantize_flow(dx: np.ndarray, dy: np.ndarray, max_val: float = 0.02,
                    denorm: bool = True) -> np.ndarray:
    """Inverse of :func:`quantize_flow` (flow_util.py:102-123)."""
    assert dx.shape == dy.shape
    dx = dequantize(dx, -max_val, max_val, 255)
    dy = dequantize(dy, -max_val, max_val, 255)
    if denorm:
        dx = dx * dx.shape[1]
        dy = dy * dy.shape[0]
    return np.dstack((dx, dy)).astype(np.float32)


def flow_pair_write(flow: np.ndarray, concat_axis: int = 0,
                    max_val: float = 0.02, norm: bool = True) -> np.ndarray:
    """Quantized storage form: dx/dy concatenated into one uint8 image
    (flowwrite(quantize=True) without the codec)."""
    assert concat_axis in (0, 1)
    dx, dy = quantize_flow(flow, max_val, norm)
    return np.concatenate((dx, dy), axis=concat_axis)


def flow_pair_read(cat: np.ndarray, concat_axis: int = 0,
                   max_val: float = 0.02, denorm: bool = True) -> np.ndarray:
    """Inverse of :func:`flow_pair_write` (flowread(quantize=True))."""
    assert concat_axis in (0, 1)
    if cat.ndim != 2:
        raise IOError(f"quantized flow must be 2D, got {cat.ndim}D")
    assert cat.shape[concat_axis] % 2 == 0
    dx, dy = np.split(cat, 2, axis=concat_axis)
    return dequantize_flow(dx, dy, max_val, denorm)
