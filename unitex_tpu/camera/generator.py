"""Camera pose generation in pure jnp.

Matches the pose families of the reference
(/root/reference/TextureTools/texturetools/camera/generator.py): normalized
intrinsics, orbit rings, and the six axis-aligned "box" views used for
multi-view conditioning.  The box views come out in the fixed order
front, right, back, left, top, down ("frbltd", generator.py:153-185); the
pipeline reshuffles them into the 2x3 grid order front, right, top, back,
left, down ("frtbld") before tiling (export_nvdiffrast_video.py:926-936).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

BOX_VIEW_NAMES = ("front", "right", "back", "left", "top", "down")
# frbltd -> frtbld (export_nvdiffrast_video.py:926-936)
FRBLTD_TO_FRTBLD = (0, 1, 4, 2, 3, 5)
# frtbld -> fblrtd (per-view bake priority, renderer_inverse.py:44)
FRTBLD_TO_FBLRTD = (0, 3, 4, 1, 2, 5)
# frtbld grid -> frbltd-with-flipped-bottom used by infer_mv (pipeline.py:238-247)
FRTBLD_TO_FRBLTD = (0, 1, 3, 4, 2, 5)


def generate_intrinsics(
    f_x: float, f_y: float, fov: bool = True, degree: bool = False
) -> jnp.ndarray:
    """Normalized 3x3 intrinsics.  ``fov=True``: f is a field of view
    (radians unless ``degree``); ``fov=False``: f is focal/size for
    perspective or the scale for orthographic cameras."""
    if fov:
        if degree:
            f_x, f_y = math.radians(f_x), math.radians(f_y)
        fx = 1.0 / (2.0 * math.tan(f_x / 2.0))
        fy = 1.0 / (2.0 * math.tan(f_y / 2.0))
    else:
        fx, fy = f_x, f_y
    return jnp.asarray(
        [[fx, 0.0, 0.5], [0.0, fy, 0.5], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )


def lookat_to_matrix(lookat: jnp.ndarray) -> jnp.ndarray:
    """Camera positions [..., 3] looking at the origin -> c2w [..., 4, 4].

    World: x forward / y right / z up.  Camera: z backward / x right / y up.
    Top/down poses (position parallel to z) use the hard-coded y-axis tangent
    the reference uses, so pose grids agree exactly.
    """
    lookat = jnp.asarray(lookat, dtype=jnp.float32)
    batch = lookat.shape[:-1]
    e2 = jnp.asarray([0.0, 1.0, 0.0], dtype=lookat.dtype)
    e3 = jnp.asarray([0.0, 0.0, 1.0], dtype=lookat.dtype)
    z_axis = lookat / jnp.maximum(jnp.linalg.norm(lookat, axis=-1, keepdims=True), 1e-12)
    x_axis = jnp.cross(jnp.broadcast_to(e3, z_axis.shape), z_axis)
    degenerate = jnp.all(x_axis == 0.0, axis=-1, keepdims=True)
    x_axis = jnp.where(degenerate, e2, x_axis)
    y_axis = jnp.cross(z_axis, x_axis)
    rots = jnp.stack([x_axis, y_axis, z_axis], axis=-1)
    c2w = jnp.concatenate(
        [
            jnp.concatenate([rots, lookat[..., None]], axis=-1),
            jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=lookat.dtype), batch + (1, 4)
            ),
        ],
        axis=-2,
    )
    # world axes are (x fwd, y right, z up); camera matrix rows must be (z, x, y):
    # left-multiplying by the xyz->zxy permutation == reordering rows (1, 2, 0, 3)
    return c2w[..., (1, 2, 0, 3), :]


def generate_orbit_views_c2ws(
    num_views: int,
    radius: float = 1.0,
    height: float = 0.0,
    theta_0: float = 0.0,
    degree: bool = False,
) -> jnp.ndarray:
    """Turntable ring of cameras (endpoint included, matching linspace of the
    reference — the last frame duplicates the first)."""
    if degree:
        theta_0 = math.radians(theta_0)
    projected = math.sqrt(radius**2 - height**2)
    theta = jnp.linspace(theta_0, 2.0 * math.pi + theta_0, num_views, dtype=jnp.float32)
    xyz = jnp.stack(
        [
            projected * jnp.cos(theta),
            projected * jnp.sin(theta),
            jnp.full((num_views,), height, dtype=jnp.float32),
        ],
        axis=-1,
    )
    return lookat_to_matrix(xyz)


def generate_box_views_c2ws(radius: float = 2.8) -> jnp.ndarray:
    """The six axis-aligned ortho views in frbltd order [6, 4, 4].

    front/right/back/left equal ``lookat_to_matrix`` at ±radius along the
    horizontal axes; top and down have hard-coded in-plane orientations
    (down is rotated 180° about the view axis relative to the lookat
    construction).  These exact matrices are a behavioral constant of the
    reference pipeline (generator.py:153-185) — the multi-view LoRAs were
    trained against them, so they are pinned numerically."""
    r = float(radius)
    front = lookat_to_matrix(jnp.asarray([[r, 0, 0], [0, r, 0], [-r, 0, 0], [0, -r, 0]], dtype=jnp.float32))
    top_down = jnp.asarray(
        [
            [[1.0, 0.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, r],
             [0.0, -1.0, 0.0, 0.0],
             [0.0, 0.0, 0.0, 1.0]],
            [[-1.0, 0.0, 0.0, 0.0],
             [0.0, 0.0, -1.0, -r],
             [0.0, -1.0, 0.0, 0.0],
             [0.0, 0.0, 0.0, 1.0]],
        ],
        dtype=jnp.float32,
    )
    return jnp.concatenate([front, top_down], axis=0)
