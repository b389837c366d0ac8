"""Rotation augmentation of 6-view CCM/albedo training sets.

Capability of the reference's utils/rotation_augment.py: given the six box
views (front/right/back/left/top/down) of an asset rendered as canonical
coordinate maps (CCM/NOCS) + albedos, apply a 90-degree-multiple euler
rotation to the OBJECT by only permuting views, rotating each image
in-plane, and re-coloring the CCM — no re-render needed.  The mapping from
euler angles to (view permutation, per-view in-plane rotation) is recovered
by chamfer-matching rotated cube-face corners against the canonical face
corners (rotation_augment.py:169-177); in-plane rotations are exact
``np.rot90`` (the reference's cv2.warpAffine at 0/90/180/270 degrees).
Host-side numpy — this is data-pipeline code.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

# storage frame of the CCM encoding: the front box camera is +z
# (rotation_augment.py:13-18; our camera/generator.py storage convention)
C2W_0 = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]], np.float32
)

_AXES_INDEX = {"X": 0, "Y": 1, "Z": 2}

# in-plane rotation choices (CCW degrees) and the canonical corner/center
# tables of the six box faces, order front,right,back,left,top,down
EULERS_2D = np.array([0.0, 90.0, 180.0, 270.0], np.float32)
XYZS = np.array(
    [
        [[1, 1, 1], [-1, 1, 1], [-1, -1, 1], [1, -1, 1]],
        [[1, 1, -1], [1, 1, 1], [1, -1, 1], [1, -1, -1]],
        [[-1, 1, -1], [1, 1, -1], [1, -1, -1], [-1, -1, -1]],
        [[-1, 1, 1], [-1, 1, -1], [-1, -1, -1], [-1, -1, 1]],
        [[1, 1, -1], [-1, 1, -1], [-1, 1, 1], [1, 1, 1]],
        [[1, -1, 1], [-1, -1, 1], [-1, -1, -1], [1, -1, -1]],
    ],
    np.float32,
)
XYZS_CENTER = np.array(
    [[0, 0, 1], [1, 0, 0], [0, 0, -1], [-1, 0, 0], [0, 1, 0], [0, -1, 0]],
    np.float32,
)


def euler_to_rotations(euler_degree: np.ndarray, axes: str = "XYZ") -> np.ndarray:
    """Euler degrees [..., len(axes)] -> rotation matrices [..., 3, 3],
    composed in the given axis order (rotation_augment.py:156-167)."""
    euler = np.radians(np.asarray(euler_degree, np.float64))
    mats = None
    for idx, axis in enumerate(axes.upper()):
        a = euler[..., idx]
        c, s = np.cos(a), np.sin(a)
        one, zero = np.ones_like(a), np.zeros_like(a)
        if axis == "X":
            rows = [one, zero, zero, zero, c, -s, zero, s, c]
        elif axis == "Y":
            rows = [c, zero, s, zero, one, zero, -s, zero, c]
        elif axis == "Z":
            rows = [c, -s, zero, s, c, zero, zero, zero, one]
        else:
            raise ValueError(f"bad axis {axis!r}")
        m = np.stack(rows, axis=-1).reshape(*a.shape, 3, 3)
        mats = m if mats is None else mats @ m
    return mats.astype(np.float32)


def apply_rotation(vertices: np.ndarray, rotations: np.ndarray) -> np.ndarray:
    """[..., 3] x [..., 3, 3] -> rotated [..., 3]."""
    return np.squeeze(vertices[..., None, :] @ np.swapaxes(rotations, -1, -2), -2)


def apply_euler_3d(vertices: np.ndarray, euler_degree, axes: str = "XYZ"):
    return apply_rotation(vertices, euler_to_rotations(euler_degree, axes))


def euler_to_index(
    euler_degree: np.ndarray, axes: str = "XYZ"
) -> Tuple[np.ndarray, np.ndarray]:
    """Which source view lands on each target view slot (index_0 [6]) and
    which in-plane rotation it needs (index_1 [6] into EULERS_2D) — the
    chamfer-matching recovery of rotation_augment.py:169-177."""
    corners = apply_euler_3d(XYZS, -np.asarray(euler_degree, np.float32), axes=axes)
    centers = corners.mean(axis=-2)  # [6, 3]
    d = np.sum(
        np.square(centers[:, None, :] - XYZS_CENTER[None, :, :]), axis=-1
    )  # [6 target, 6 canonical]
    index_0 = np.argmin(d, axis=-1)
    remapped = XYZS[index_0]  # [6, 4, 3]
    d0 = np.sum(np.square(corners - remapped[:, [0], :]), axis=-1)  # [6, 4]
    index_1 = np.argmin(d0, axis=-1)
    return index_0, index_1


def apply_euler_2d(
    images: np.ndarray, euler_degree, axes: str = "XYZ"
) -> np.ndarray:
    """Permute the 6 views and rotate each in-plane; exact rot90 in place of
    the reference's warpAffine (angles are always 90-degree multiples)."""
    index_0, index_1 = euler_to_index(euler_degree, axes=axes)
    images = images[index_0]
    return np.stack(
        [np.rot90(img, k=int(k1)) for img, k1 in zip(images, index_1)], axis=0
    )


def ccms_to_vertices(ccms: np.ndarray) -> np.ndarray:
    """Decode foreground CCM pixels to world points [N, 3]
    (rotation_augment.py:194-199)."""
    rgbs = ccms[..., :3].astype(np.float32) / 255.0 * 2.0 - 1.0
    alpha = ccms[..., 3] > 0
    pts = rgbs[alpha]
    pts_h = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=-1)
    return (pts_h @ C2W_0.T)[:, :3]


def vertices_to_ccms(ccms: np.ndarray, vertices: np.ndarray) -> np.ndarray:
    """Re-encode rotated points into the CCM color channels at the same
    foreground pixels (rotation_augment.py:201-207)."""
    out = ccms.copy()
    alpha = ccms[..., 3] > 0
    pts_h = np.concatenate([vertices, np.ones_like(vertices[:, :1])], axis=-1)
    enc = (pts_h @ np.linalg.inv(C2W_0).T)[:, :3]
    rgb = (np.clip(enc * 0.5 + 0.5, 0.0, 1.0) * 255.0).astype(np.uint8)
    chan = out[..., :3]
    chan[alpha] = rgb
    out[..., :3] = chan
    return out


def augment_view_set(
    ccms: np.ndarray,
    albedos: np.ndarray,
    euler_degree,
    axes: str = "XYZ",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rotate a rendered 6-view training sample by ``euler_degree``
    (90-degree multiples): returns (rotated ccms [6, H, W, 4], rotated
    albedos [6, H, W, 4], rotated point cloud [N, 3]) — the array-level core
    of the reference's ``augment_images`` (rotation_augment.py:209-223)."""
    vertices = ccms_to_vertices(ccms)
    vertices = apply_euler_3d(vertices, euler_degree, axes=axes)
    ccms = vertices_to_ccms(ccms, vertices)
    ccms = apply_euler_2d(ccms, euler_degree, axes=axes)
    albedos = apply_euler_2d(albedos, euler_degree, axes=axes)
    return ccms, albedos, vertices


def augment_images(
    input_path: str, output_path: str, euler_degree, axes: str = "XYZ"
) -> None:
    """File driver over the reference's artifact layout:
    ``{i:04d}_nocs.png`` / ``{i:04d}_albedo.png`` per view, writes the same
    names plus the rotated point cloud as ``pcd.ply``."""
    from PIL import Image

    from ..geometry.io.mesh_io import HostMesh, save_ply

    ccms = np.stack(
        [
            np.asarray(
                Image.open(os.path.join(input_path, f"{i:04d}_nocs.png")).convert("RGBA")
            )
            for i in range(6)
        ]
    )
    albedos = np.stack(
        [
            np.asarray(
                Image.open(
                    os.path.join(input_path, f"{i:04d}_albedo.png")
                ).convert("RGBA")
            )
            for i in range(6)
        ]
    )
    ccms, albedos, vertices = augment_view_set(ccms, albedos, euler_degree, axes)
    os.makedirs(output_path, exist_ok=True)
    save_ply(
        os.path.join(output_path, "pcd.ply"),
        HostMesh(vertices=vertices.astype(np.float32), faces=np.zeros((0, 3), np.int64)),
    )
    for idx, (ccm, albedo) in enumerate(zip(ccms, albedos)):
        Image.fromarray(ccm).save(os.path.join(output_path, f"{idx:04d}_nocs.png"))
        Image.fromarray(albedo).save(
            os.path.join(output_path, f"{idx:04d}_albedo.png")
        )
