"""Geometry conditioning renders + the pipeline's grid/strip permutations.

Equivalent of ``VideoExporter.export_condition``
(/root/reference/TextureTools/texturetools/video/export_nvdiffrast_video.py:900-999)
and the load-bearing view-order shuffles of ``infer_mv``
(/root/reference/pipeline.py:238-282).  The multi-view LoRAs were trained on
these exact layouts, so the permutations are pinned:

* box cameras come out in **frbltd** (front right back left top down);
* the 2x3 condition grid uses **frtbld** (c2ws reorder [0,1,4,2,3,5]):
  row 0 = front right top, row 1 = back left down;
* before FLUX, the grid becomes a 1x6 strip in order
  [front, left, right, back, top, down] — cell permutation [0,4,1,3,2,5]
  of the row-major frtbld grid — with the **down view rotated 180°**;
* after FLUX, the strip maps back with the inverse permutation
  [0,2,4,3,1,5] and the down view rotated back.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..camera.conversion import c2ws_to_ray_matrices
from ..camera.generator import (
    FRBLTD_TO_FRTBLD,
    generate_box_views_c2ws,
    generate_intrinsics,
)
from ..geometry.mesh import Mesh
from .renderer import RenderOutputs, render_views

# row-major frtbld grid cells -> 1x6 FLUX strip (pipeline.py:245)
GRID_TO_STRIP = (0, 4, 1, 3, 2, 5)
# 1x6 FLUX strip -> row-major frtbld grid cells (pipeline.py:285)
STRIP_TO_GRID = (0, 2, 4, 3, 1, 5)
# index of the "down" view: grid cell 5, strip cell 5
DOWN_CELL = 5


def views_to_grid(views: jnp.ndarray, rows: int = 2, cols: int = 3) -> jnp.ndarray:
    """[rows*cols, H, W, C] -> [rows*H, cols*W, C] row-major tiling."""
    n, H, W, C = views.shape
    assert n == rows * cols
    return (
        views.reshape(rows, cols, H, W, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * H, cols * W, C)
    )


def grid_to_views(grid: jnp.ndarray, rows: int = 2, cols: int = 3) -> jnp.ndarray:
    """[rows*H, cols*W, C] -> [rows*cols, H, W, C]."""
    GH, GW, C = grid.shape
    H, W = GH // rows, GW // cols
    return (
        grid.reshape(rows, H, cols, W, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * cols, H, W, C)
    )


def grid_to_strip(grid: jnp.ndarray) -> jnp.ndarray:
    """frtbld 2x3 grid image -> 1x6 FLUX strip image with the down view
    rotated 180° (pipeline.py:238-247)."""
    views = grid_to_views(grid, 2, 3)
    views = views.at[DOWN_CELL].set(views[DOWN_CELL, ::-1, ::-1])
    views = views[jnp.asarray(GRID_TO_STRIP)]
    return views_to_grid(views, 1, 6)


def strip_to_grid(strip: jnp.ndarray) -> jnp.ndarray:
    """1x6 FLUX strip image -> frtbld 2x3 grid image, down view rotated back
    (pipeline.py:283-285)."""
    views = grid_to_views(strip, 1, 6)
    views = views.at[DOWN_CELL].set(views[DOWN_CELL, ::-1, ::-1])
    views = views[jnp.asarray(STRIP_TO_GRID)]
    return views_to_grid(views, 2, 3)


def condition_cameras(
    radius: float = 2.8, ortho_scale: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The six frtbld condition cameras + normalized ortho intrinsics."""
    c2ws = generate_box_views_c2ws(radius)[jnp.asarray(FRBLTD_TO_FRTBLD)]
    intr = generate_intrinsics(ortho_scale, ortho_scale, fov=False)
    return c2ws, intr


def render_geometry_condition(
    mesh: Mesh,
    view_size: int = 512,
    radius: float = 2.8,
    ortho_scale: float = 1.0,
    background: float = 0.5,
    rows: int = 2,
    cols: int = 3,
    face_chunk: int = 512,
    row_chunk=None,
    tile_batch: int = 64,
) -> Dict[str, jnp.ndarray]:
    """Render the 6-view geometry conditioning grids.

    Returns dict with 'alpha' [GH, GW, 1], 'ccm'/'normal' [GH, GW, 3] in
    [0, 1] (background = ``background`` grey, pipeline color 'grey'),
    plus 'c2ws' [6, 4, 4] and 'intrinsics' [3, 3].  The mesh must already be
    scaled (pipeline scales to bbox 0.95, pipeline.py:176).
    """
    c2ws, intr = condition_cameras(radius, ortho_scale)
    out: RenderOutputs = render_views(
        mesh,
        c2ws,
        intr,
        (view_size, view_size),
        perspective=False,
        render_world_normal=True,
        render_world_position=True,
        face_chunk=face_chunk,
        # low-HBM serving: slab the per-pixel interpolate tail and bound
        # the binned rasterizer's transient edge-eval batch (see
        # renderer.render_views row_chunk/tile_batch) so the conditioning
        # render fits next to ~14 GB of resident int8 params
        row_chunk=row_chunk,
        tile_batch=tile_batch,
    )
    alpha = out.alpha
    ccm = out.world_position * 0.5 + 0.5
    normal = out.world_normal * 0.5 + 0.5
    ccm = ccm * alpha + background * (1.0 - alpha)
    normal = normal * alpha + background * (1.0 - alpha)
    return {
        "alpha": views_to_grid(alpha, rows, cols),
        "ccm": views_to_grid(ccm, rows, cols),
        "normal": views_to_grid(normal, rows, cols),
        "alpha_views": alpha,
        "ccm_views": ccm,
        "normal_views": normal,
        "c2ws": c2ws,
        "intrinsics": intr,
    }
