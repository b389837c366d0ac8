"""Perspective-view -> equirectangular panorama stitching.

Capability of the reference's utils/extra_scene_utils.py (cubemap/perspective
to panorama conversion for scene data processing): every equirect pixel's
direction is rotated into each perspective camera (yaw PHI about +z, then
pitch THETA about the yawed +x, +y forward), projected onto the image plane,
and sampled — re-expressed as ONE dense jnp program (direction grid ->
grid_sample per view -> masked average/first-write blend) instead of the
reference's per-view cv2.remap loop; XLA fuses the trig + rotations into the
gather.  Angle/axis conventions and the cubemap face list match the
reference exactly (extra_scene_utils.py:30-93, 135-147).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample

# cubemap (fov, phi, theta) per face: front/right/back/left/up/down
# (extra_scene_utils.py:139-144)
CUBEMAP_FPT = (
    (90.0, 0.0, 0.0),
    (90.0, -90.0, 0.0),
    (90.0, -180.0, 0.0),
    (90.0, -270.0, 0.0),
    (90.0, 0.0, 90.0),
    (90.0, 0.0, -90.0),
)


def _equirect_dirs(height: int, width: int) -> jnp.ndarray:
    """Unit directions [H, W, 3] for each equirect pixel: lon in
    [-180, 180] across columns, lat in [90, -90] down rows, +y forward."""
    lon = jnp.radians(jnp.linspace(-180.0, 180.0, width))
    lat = jnp.radians(jnp.linspace(90.0, -90.0, height))
    lon, lat = jnp.meshgrid(lon, lat)
    return jnp.stack(
        [jnp.sin(lon) * jnp.cos(lat), jnp.cos(lon) * jnp.cos(lat), jnp.sin(lat)],
        axis=-1,
    )


def _axis_angle(axis: jnp.ndarray, rad: float | jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation matrix (the tested library conversion)."""
    from ..camera.rotation import axis_angle_to_matrix

    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    return axis_angle_to_matrix(axis * rad)


def perspective_to_panorama(
    image: jnp.ndarray,
    fov_deg: float,
    phi_deg: float,
    theta_deg: float,
    height: int = 512,
    width: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One perspective image [h, w, C] -> (panorama [H, W, C], mask
    [H, W, 1]); fov is horizontal, vertical follows the aspect
    (Perspective2Panorama.GetEquirec)."""
    h, w = image.shape[:2]
    w_len = math.tan(math.radians(fov_deg / 2.0))
    h_len = float(h) / w * w_len

    dirs = _equirect_dirs(height, width)
    # camera orientation: yaw about +z, then pitch about the yawed +x axis;
    # the reference applies the INVERSE rotations to the ray directions
    r1 = _axis_angle(jnp.array([0.0, 0.0, 1.0]), math.radians(phi_deg))
    pitch_axis = r1 @ jnp.array([1.0, 0.0, 0.0])
    r2 = _axis_angle(pitch_axis, math.radians(theta_deg))
    rot = jnp.linalg.inv(r1) @ jnp.linalg.inv(r2)
    d = dirs @ rot.T

    y = d[..., 1]
    front = y > 0
    xz = d[..., (0, 2)] / jnp.where(front, y, 1.0)[..., None]
    inside = (
        front
        & (jnp.abs(xz[..., 0]) < w_len)
        & (jnp.abs(xz[..., 1]) < h_len)
    )
    # NDC: x right, z up -> image row grows downward
    gx = xz[..., 0] / w_len
    gy = -xz[..., 1] / h_len
    sampled = grid_sample(
        image.astype(jnp.float32), jnp.stack([gx, gy], axis=-1), padding_mode="border"
    )
    mask = inside[..., None]
    return jnp.where(mask, sampled, 0.0), mask.astype(jnp.float32)


@partial(jax.jit, static_argnames=("height", "width", "average", "fpt"))
def _stitch(images, fpt, height, width, average):
    acc = jnp.zeros((height, width, images[0].shape[-1]), jnp.float32)
    msk = jnp.zeros((height, width, 1), jnp.float32)
    for img, (f, p, t) in zip(images, fpt):
        pano, m = perspective_to_panorama(img, f, p, t, height, width)
        if average:
            acc = acc + pano
            msk = msk + m
        else:
            acc = jnp.where((msk == 0) & (m > 0), pano, acc)
            msk = jnp.maximum(msk, m)
    if average:
        acc = acc / jnp.where(msk == 0, 1.0, msk)
        msk = jnp.minimum(msk, 1.0)
    return acc, msk


def multi_perspective_to_panorama(
    images: Sequence[jnp.ndarray],
    fpt: Sequence[Tuple[float, float, float]],
    height: int = 512,
    width: int = 1024,
    average: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blend N perspective views into one panorama (MultiPers2Panorama):
    ``average=True`` averages overlapping views, else first-write-wins."""
    assert len(images) == len(fpt)
    return _stitch(tuple(images), tuple(tuple(x) for x in fpt), height, width, average)


def cubemap_to_panorama(
    faces: Sequence[np.ndarray],
    height: int = 1024,
    width: int = 2048,
    average: bool = True,
) -> jnp.ndarray:
    """Six cubemap faces (front/right/back/left/up/down skybox order, with
    the reference's up/down pre-transpose applied,
    extra_scene_utils.py:145-147) -> equirect panorama [H, W, C]."""
    faces = [jnp.asarray(f, jnp.float32) for f in faces]
    faces[4] = jnp.flip(jnp.swapaxes(faces[4], 0, 1), axis=1)
    faces[5] = jnp.flip(jnp.swapaxes(faces[5], 0, 1), axis=0)
    pano, _ = multi_perspective_to_panorama(
        faces, CUBEMAP_FPT, height=height, width=width, average=average
    )
    return pano
