"""Camera matrix conversions in pure jnp.

Conventions match the reference renderer's
(/root/reference/TextureTools/texturetools/camera/conversion.py):

* intrinsics are 3x3 and *normalized* (focal / image size, principal point 0.5),
* projection matrices are OpenGL-style with the y row negated so that
  rasterized images come out y-down (the "for nvdiffrast" flip,
  conversion.py:27) — our rasterizer adopts the same screen convention,
* world frame: x forward, y right, z up;
  camera frame: z backward (camera looks along -z), x right, y up.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def intr_to_proj(
    intr: jnp.ndarray, near: float = 0.01, far: float = 1000.0, perspective: bool = True
) -> jnp.ndarray:
    """Normalized intrinsics [..., 3, 3] -> clip-space projection [..., 4, 4]."""
    batch = intr.shape[:-2]
    z = jnp.zeros(batch, dtype=intr.dtype)
    o = jnp.ones(batch, dtype=intr.dtype)
    fx, fy = intr[..., 0, 0], intr[..., 1, 1]
    cx, cy = intr[..., 0, 2], intr[..., 1, 2]
    if perspective:
        rows = [
            [2 * fx, z, 2 * cx - 1, z],
            [z, 2 * fy, 2 * cy - 1, z],
            [z, z, -(far + near) / (far - near) * o, -2.0 * far * near / (far - near) * o],
            [z, z, -o, z],
        ]
    else:
        rows = [
            [fx, z, z, -(2 * cx - 1)],
            [z, fy, z, -(2 * cy - 1)],
            [z, z, -2.0 / (far - near) * o, -(far + near) / (far - near) * o],
            [z, z, z, o],
        ]
    proj = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    # flip y so image rows run top-to-bottom after the viewport transform
    return proj * jnp.asarray([1.0, -1.0, 1.0, 1.0], dtype=intr.dtype)[:, None]


def proj_to_intr(proj: jnp.ndarray, perspective: bool = True) -> jnp.ndarray:
    """Inverse of :func:`intr_to_proj` (ignoring near/far)."""
    proj = proj * jnp.asarray([1.0, -1.0, 1.0, 1.0], dtype=proj.dtype)[:, None]
    batch = proj.shape[:-2]
    z = jnp.zeros(batch, dtype=proj.dtype)
    o = jnp.ones(batch, dtype=proj.dtype)
    if perspective:
        fx = proj[..., 0, 0] / 2.0
        fy = proj[..., 1, 1] / 2.0
        cx = 0.5 * proj[..., 0, 2] + 0.5
        cy = 0.5 * proj[..., 1, 2] + 0.5
    else:
        fx = proj[..., 0, 0]
        fy = proj[..., 1, 1]
        cx = 0.5 * (-proj[..., 0, 3]) + 0.5
        cy = 0.5 * (-proj[..., 1, 3]) + 0.5
    rows = [[fx, z, cx], [z, fy, cy], [z, z, o]]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def c2w_to_w2c(c2w: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid camera-to-world transforms [..., 4, 4]."""
    rt = jnp.swapaxes(c2w[..., :3, :3], -1, -2)
    t = -jnp.matmul(rt, c2w[..., :3, 3:], precision="highest")
    top = jnp.concatenate([rt, t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def get_mvp(
    c2ws: jnp.ndarray,
    intrinsics: jnp.ndarray,
    perspective: bool = True,
    near: float = 0.01,
    far: float = 1000.0,
) -> jnp.ndarray:
    """Model-view-projection matrices [..., 4, 4]."""
    proj = intr_to_proj(intrinsics, near=near, far=far, perspective=perspective)
    return jnp.matmul(proj, c2w_to_w2c(c2ws), precision="highest")


def transform_points_homo(points_h: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 4] @ [..., 4, 4]^T."""
    return jnp.matmul(points_h, jnp.swapaxes(mat, -1, -2), precision="highest")


def transform_points_mat4(points3: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """3D points [..., 3] through a 4×4 matrix → homogeneous output
    [..., 4], WITHOUT materializing a homogeneous input.

    The obvious ``concatenate([p, ones]) @ mat.T`` MISCOMPILES on the
    current TPU toolchain when the concat is inside the jit: XLA fuses the
    concat into the dot and reads the ones column in place of z — measured
    2026-08-20 as a constant camera depth (z_cam ≡ 1 − radius) that
    silently degenerated the bake's visibility test (all-visible in the
    fused program, none-visible eagerly).  The affine split below is
    numerically identical for w=1 inputs, immune to the fusion bug, and
    one fewer HBM pass.  HIGHEST precision: these projections feed the
    5e-3-epsilon depth test — the MXU's bf16-grade default f32 matmul
    precision is ~0.01 absolute at radius-2.8 depths."""
    lin = jnp.matmul(
        points3, jnp.swapaxes(mat[..., :, :3], -1, -2), precision="highest"
    )
    return lin + mat[..., :, 3]


def project(
    points_h: jnp.ndarray, intrinsics: jnp.ndarray, perspective: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-space homogeneous points -> (ndc xy [..., 2], clip w [..., 1])."""
    clip = transform_points_homo(points_h, intr_to_proj(intrinsics, perspective=perspective))
    w = clip[..., 3:4]
    return clip[..., :2] / w, w


def unproject(
    ndc: jnp.ndarray, depth: jnp.ndarray, intrinsics: jnp.ndarray, perspective: bool = True
) -> jnp.ndarray:
    """NDC xy + depth -> camera-space homogeneous points [..., 4]."""
    proj = intr_to_proj(intrinsics, perspective=perspective)
    inv = jnp.linalg.inv(proj)
    if perspective:
        clip = jnp.concatenate([ndc * depth, jnp.zeros_like(depth), depth], axis=-1)
        pts = transform_points_homo(clip, inv)
        return pts.at[..., 3].set(1.0)
    clip = jnp.concatenate([ndc, jnp.zeros_like(depth), jnp.ones_like(depth)], axis=-1)
    pts = transform_points_homo(clip, inv)
    pts = pts.at[..., 2].set(depth[..., 0])
    return pts.at[..., 3].set(1.0)


def discretize(
    ndc: jnp.ndarray, H: int, W: int, is_ndc: bool = True, align_corner: bool = False
) -> jnp.ndarray:
    """NDC/unit xy -> continuous pixel coordinates (u right, v down)."""
    uf, vf = ndc[..., 0], ndc[..., 1]
    if is_ndc:
        uf = uf * 0.5 + 0.5
        vf = vf * 0.5 + 0.5
    if align_corner:
        ui = uf * (W - 1) + 0.5
        vi = vf * (H - 1) + 0.5
    else:
        ui = uf * W
        vi = vf * H
    return jnp.stack([ui, vi], axis=-1)


def undiscretize(
    pix: jnp.ndarray, H: int, W: int, to_ndc: bool = True, align_corner: bool = False
) -> jnp.ndarray:
    """Pixel coordinates -> NDC/unit xy."""
    ui, vi = pix[..., 0], pix[..., 1]
    if align_corner:
        uf = ui / (W - 1)
        vf = vi / (H - 1)
    else:
        uf = (ui + 0.5) / W
        vf = (vi + 0.5) / H
    if to_ndc:
        uf = uf * 2.0 - 1.0
        vf = vf * 2.0 - 1.0
    return jnp.stack([uf, vf], axis=-1)


def c2ws_to_rays(c2ws: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera centers and central view directions in the world x-fwd/y-right/z-up frame."""
    rays_o = c2ws[..., (2, 0, 1), 3]
    rays_d = -c2ws[..., (2, 0, 1), 2]
    return rays_o, rays_d


def c2ws_to_ray_matrices(
    c2ws: jnp.ndarray,
    intrinsics: jnp.ndarray,
    H: int,
    W: int,
    perspective: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel ray origins/directions [..., H, W, 3] (directions unnormalized)."""
    c2ws = c2ws[..., None, :, :]
    intrinsics = intrinsics[..., None, :, :]
    rays_o = c2ws[..., :3, 3][..., None, :]
    rays_d = -c2ws[..., :3, 2][..., None, :]
    ys = jnp.arange(H, dtype=c2ws.dtype)
    xs = jnp.arange(W, dtype=c2ws.dtype)
    gv, gu = jnp.meshgrid(ys, xs, indexing="ij")
    grid_f = undiscretize(jnp.stack([gu, gv], axis=-1), H=H, W=W)
    pts_cam = unproject(grid_f, jnp.ones_like(grid_f[..., :1]), intrinsics, perspective=perspective)
    pts_world = transform_points_homo(pts_cam, c2ws)
    if perspective:
        rays_dm = pts_world[..., :3] - rays_o
        rays_om = jnp.broadcast_to(rays_o, rays_dm.shape)
    else:
        rays_om = pts_world[..., :3]
        rays_dm = jnp.broadcast_to(rays_d, rays_om.shape)
    return rays_om, rays_dm
