"""Result-browsing media utilities: image grids, video grids, training
progress videos, and string<->array coding.

Generic equivalents of the reference's dataset-curation one-offs (which
hard-code personal paths): utils/make_image_grid.py (reference image +
multi-view strip rows, paged stacks with a divider), utils/make_video_grid.py
(paged r x c grids of same-length videos with filename labels),
utils/make_training_video.py (step-indexed validation images -> labelled
mp4), utils/encode_str.py (fixed-width utf-8 <-> uint8 arrays for packing
asset ids into tensor records).  All host-side numpy/PIL/imageio.
"""

from __future__ import annotations

import os
import re
from glob import glob
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from .image_io import load_image, to_uint8


def _as_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = to_uint8(img)
    return img


# -------------------------------------------------------- string coding

def encode_str_to_array(text: str, width: int = 64, fillchar: str = "\x00") -> np.ndarray:
    """utf-8 bytes of ``text`` left-justified to ``width`` as uint8
    (encode_str.py:4-5)."""
    return np.frombuffer(text.ljust(width, fillchar).encode("utf-8"), dtype=np.uint8)


def decode_array_to_str(array: np.ndarray, fillchar: str = "\x00") -> str:
    return np.asarray(array, np.uint8).tobytes().decode("utf-8").rstrip(fillchar)


# -------------------------------------------------------- label drawing

def draw_label(image: np.ndarray, text: str, color=(255, 0, 255)) -> np.ndarray:
    """Stamp ``text`` into the top-left corner (cv2.putText stand-in via
    PIL's built-in bitmap font; no-op if PIL is unavailable)."""
    try:
        from PIL import Image, ImageDraw
    except ImportError:  # pragma: no cover
        return image
    im = Image.fromarray(image)
    ImageDraw.Draw(im).text((2, 2), text, fill=tuple(color))
    return np.asarray(im)


def _resize_uint8(img: np.ndarray, h: int, w: int) -> np.ndarray:
    from PIL import Image

    if img.shape[0] == h and img.shape[1] == w:
        return img
    return np.asarray(Image.fromarray(img).resize((w, h), Image.BILINEAR))


def _to_rgba(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    if img.shape[-1] == 3:
        img = np.concatenate(
            [img, np.full_like(img[..., :1], 255)], axis=-1
        )
    return img


# -------------------------------------------------------- image grids

def make_image_grid(
    rows: Sequence[Sequence[np.ndarray]],
    out_dir: str,
    rows_per_page: int = 10,
    cell_size: Tuple[int, int] = (512, 512),
    divider_after_col: Optional[int] = 1,
    prefix: str = "grid",
) -> List[str]:
    """Stack image rows into paged comparison grids (make_image_grid.py:
    29-51).  Each row is a list of images (e.g. [reference, 6-view strip]);
    every image is resized to cell height, rows are concatenated
    horizontally then stacked ``rows_per_page`` at a time, with a black
    4-px divider after column ``divider_after_col`` cells.  Returns the
    written page paths."""
    ch, _cw = cell_size
    row_images = []
    row_boundaries = []  # cumulative width of the first divider_after_col cells
    for row in rows:
        cells = []
        for img in row:
            img = _to_rgba(_as_uint8(img))
            # preserve each cell's aspect: width scales with its w/h ratio
            w = int(round(ch * img.shape[1] / max(img.shape[0], 1)))
            cells.append(_resize_uint8(img, ch, max(w, 1)))
        row_images.append(np.concatenate(cells, axis=1))
        if divider_after_col is not None:
            row_boundaries.append(
                sum(c.shape[1] for c in cells[:divider_after_col])
            )
    width = max(r.shape[1] for r in row_images)
    row_images = [
        np.pad(r, ((0, 0), (0, width - r.shape[1]), (0, 0))) for r in row_images
    ]
    os.makedirs(out_dir, exist_ok=True)
    pages = []
    for idx in range(0, len(row_images), rows_per_page):
        page = np.concatenate(row_images[idx : idx + rows_per_page], axis=0)
        if divider_after_col is not None:
            # cells are aspect-preserving, so the boundary is per row
            for r, x in enumerate(row_boundaries[idx : idx + rows_per_page]):
                if 2 <= x < page.shape[1] - 2:
                    page[r * ch : (r + 1) * ch, x - 2 : x + 2, :] = np.array(
                        [0, 0, 0, 255], np.uint8
                    )
        path = os.path.join(out_dir, f"{prefix}_{idx:04d}.png")
        from PIL import Image

        Image.fromarray(page).save(path)
        pages.append(path)
    return pages


def make_comparison_grid(
    reference_paths: Sequence[str],
    result_paths: Sequence[str],
    out_dir: str,
    **kwargs,
) -> List[str]:
    """The make_image_grid.py flow over files: pair reference images with
    result strips by shared parent-directory uid, build paged grids."""
    by_uid = lambda p: os.path.basename(os.path.dirname(p))  # noqa: E731
    refs = {by_uid(p): p for p in reference_paths}
    res = {by_uid(p): p for p in result_paths}
    rows = [
        [load_image(refs[u]), load_image(res[u])]
        for u in sorted(set(refs) & set(res))
    ]
    return make_image_grid(rows, out_dir, **kwargs)


# -------------------------------------------------------- video grids

def _read_video(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    return np.stack(imageio.mimread(path, memtest=False), axis=0)


def _write_video(path: str, frames: Sequence[np.ndarray], fps: int) -> str:
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        imageio.mimwrite(path, list(frames), fps=fps, quality=8)
    except (ValueError, ImportError):
        path = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(path, list(frames), duration=1000.0 / fps, loop=0)
    return path


def make_video_grid(
    video_paths: Sequence[str],
    out_path: str,
    n_rows: int = 3,
    n_cols: int = 3,
    fps: int = 30,
    label: bool = True,
    text_fn: Optional[Callable[[str], str]] = None,
) -> str:
    """Tile same-shape videos into an ``n_rows x n_cols`` paged grid video
    (make_video_grid.py:8-36): page i shows videos [i*r*c, (i+1)*r*c) side
    by side, pages play back to back, each cell stamped with its filename."""
    text_fn = text_fn or os.path.basename
    per_page = n_rows * n_cols
    first = _read_video(video_paths[0])
    n_frames, H, W = first.shape[:3]
    pages = []
    for start in range(0, len(video_paths), per_page):
        grid = np.zeros((n_frames, n_rows * H, n_cols * W, 3), np.uint8)
        for j, p in enumerate(video_paths[start : start + per_page]):
            # reuse the shape-probe decode for the first video
            src = first if p == video_paths[0] else _read_video(p)
            data = src[:n_frames, ..., :3]
            if label:
                data = np.stack([draw_label(fr, text_fn(p)) for fr in data])
            r, c = j // n_cols, j % n_cols
            grid[: len(data), r * H : (r + 1) * H, c * W : (c + 1) * W] = data
        pages.append(grid)
    frames = np.concatenate(pages, axis=0)
    return _write_video(out_path, list(frames), fps)


def make_side_by_side_video_grid(
    video_paths_a: Sequence[str],
    video_paths_b: Sequence[str],
    out_path: str,
    **kwargs,
) -> str:
    """make_video_grid.py:39-73: match two result dirs by basename, concat
    each pair horizontally, grid the pairs."""
    a = {os.path.basename(p): p for p in video_paths_a}
    b = {os.path.basename(p): p for p in video_paths_b}
    import tempfile

    pair_paths = []
    with tempfile.TemporaryDirectory() as tmp:
        for uid in sorted(set(a) & set(b)):
            va, vb = _read_video(a[uid]), _read_video(b[uid])
            n = min(len(va), len(vb))
            pair = np.concatenate([va[:n, ..., :3], vb[:n, ..., :3]], axis=2)
            pp = os.path.join(tmp, uid)
            pair_paths.append(_write_video(pp, list(pair), kwargs.get("fps", 30)))
        return make_video_grid(pair_paths, out_path, **kwargs)


def make_training_video(
    image_glob: str,
    out_path: str,
    step_fn: Optional[Callable[[str], int]] = None,
    size: Optional[Tuple[int, int]] = None,
    fps: int = 10,
) -> str:
    """Validation-image progress video (make_training_video.py): collect
    ``image_glob`` files, sort by training step (default: first integer in
    the basename), resize, stamp ``step: NNNN``, write a video."""
    if step_fn is None:
        def step_fn(p):
            m = re.search(r"\d+", os.path.basename(p))
            return int(m.group()) if m else 0

    paths = sorted(glob(image_glob), key=step_fn)
    if not paths:
        raise ValueError(f"no images match {image_glob!r}")
    frames = []
    for p in paths:
        img = _as_uint8(load_image(p))[..., :3]
        if size is not None:
            img = _resize_uint8(img, size[0], size[1])
        frames.append(draw_label(img, f"step: {step_fn(p):04d}"))
    return _write_video(out_path, frames, fps)
