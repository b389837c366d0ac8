"""Volume / neural-field sampling: 3D grids, triplanes, and coordinate
(un)discretization.

Equivalent of the reference's field-query toolkit
(/root/reference/TextureTools/texturetools/render/volume/query.py:93-233) —
the infrastructure the LTM texture-function VAE plugs into, also used by the
renderer's voxel_attr path (renderer_base.py:205-230).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_3d(
    volume: jnp.ndarray, coords: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """Trilinear sampling: volume [D, H, W, C], coords [..., 3] in [-1, 1]
    as (x, y, z) indexing (W, H, D) — torch grid_sample 3D convention."""
    D, H, W = volume.shape[:3]
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]

    def to_pix(g, S):
        if align_corners:
            return (g + 1.0) * 0.5 * (S - 1)
        return (g + 1.0) * 0.5 * S - 0.5

    fx, fy, fz = to_pix(x, W), to_pix(y, H), to_pix(z, D)
    x0, y0, z0 = jnp.floor(fx), jnp.floor(fy), jnp.floor(fz)
    wx, wy, wz = fx - x0, fy - y0, fz - z0
    x0, y0, z0 = x0.astype(jnp.int32), y0.astype(jnp.int32), z0.astype(jnp.int32)

    def fetch(xi, yi, zi):
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        zc = jnp.clip(zi, 0, D - 1)
        val = volume[zc, yc, xc]
        inb = (
            (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (zi >= 0) & (zi < D)
        )[..., None]
        return jnp.where(inb, val, 0.0)

    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (
                    (wx if dx else 1 - wx)
                    * (wy if dy else 1 - wy)
                    * (wz if dz else 1 - wz)
                )[..., None]
                out = out + w * fetch(x0 + dx, y0 + dy, z0 + dz)
    return out


def triplane_query(
    planes: jnp.ndarray, coords: jnp.ndarray, mode: str = "sum"
) -> jnp.ndarray:
    """Triplane field query: planes [3, H, W, C] (xy, xz, yz), coords
    [..., 3] in [-1, 1].  ``mode``: 'sum' or 'concat'."""
    from ..ops.grid_sample import grid_sample

    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    f_xy = grid_sample(planes[0], jnp.stack([x, y], axis=-1), padding_mode="border")
    f_xz = grid_sample(planes[1], jnp.stack([x, z], axis=-1), padding_mode="border")
    f_yz = grid_sample(planes[2], jnp.stack([y, z], axis=-1), padding_mode="border")
    if mode == "sum":
        return f_xy + f_xz + f_yz
    return jnp.concatenate([f_xy, f_xz, f_yz], axis=-1)


def discretize_3d(
    coords_ndc: jnp.ndarray, resolution: int, align_corners: bool = False
) -> jnp.ndarray:
    """NDC [-1,1]^3 -> continuous voxel coordinates."""
    u = coords_ndc * 0.5 + 0.5
    if align_corners:
        return u * (resolution - 1) + 0.5
    return u * resolution


def undiscretize_3d(
    voxels: jnp.ndarray, resolution: int, align_corners: bool = False
) -> jnp.ndarray:
    if align_corners:
        u = voxels / (resolution - 1)
    else:
        u = (voxels + 0.5) / resolution
    return u * 2.0 - 1.0


def splat_points_to_grid(
    points: jnp.ndarray,
    values: jnp.ndarray,
    resolution: int,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Average-splat point values into a [R, R, R, C] grid (the
    discretize_3d scatter path of query.py) via segment-sum — static
    shapes, TPU-friendly."""
    import jax

    R = resolution
    vox = jnp.clip(jnp.floor((points * 0.5 + 0.5) * R), 0, R - 1).astype(jnp.int32)
    idx = (vox[:, 2] * R + vox[:, 1]) * R + vox[:, 0]
    if valid is not None:
        idx = jnp.where(valid, idx, R * R * R)  # dropped bucket
    ones = jnp.ones((points.shape[0], 1), values.dtype)
    num = jax.ops.segment_sum(values, idx, num_segments=R * R * R + 1)[:-1]
    den = jax.ops.segment_sum(ones, idx, num_segments=R * R * R + 1)[:-1]
    grid = num / jnp.maximum(den, 1.0)
    return grid.reshape(R, R, R, values.shape[-1])


def box_query(faces: jnp.ndarray, coords: jnp.ndarray, mode: str = "sum") -> jnp.ndarray:
    """Six-plane "box" field query (query.py query_box semantics): faces
    [6, H, W, C] paired per axis — (xy, xy, xz, xz, yz, yz) — coords
    [..., 3] in [-1, 1].  ``mode``: 'sum' or 'concat'."""
    from ..ops.grid_sample import grid_sample

    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    planes = [
        jnp.stack([x, y], -1), jnp.stack([x, y], -1),
        jnp.stack([x, z], -1), jnp.stack([x, z], -1),
        jnp.stack([y, z], -1), jnp.stack([y, z], -1),
    ]
    feats = [grid_sample(faces[i], g, padding_mode="border") for i, g in enumerate(planes)]
    if mode == "sum":
        return sum(feats)
    return jnp.concatenate(feats, axis=-1)


def discretize_2d(
    coords_ndc: jnp.ndarray, H: int, W: int, ndc: bool = True, align_corners: bool = False
) -> jnp.ndarray:
    """[..., 2] (u, v) NDC or [0,1] -> integer pixel coords (query.py
    discretize_2d: floor(u*W) / floor(u*(W-1)+0.5))."""
    uf, vf = coords_ndc[..., 0], coords_ndc[..., 1]
    if ndc:
        uf = uf * 0.5 + 0.5
        vf = vf * 0.5 + 0.5
    if align_corners:
        ui = jnp.floor(uf * (W - 1) + 0.5)
        vi = jnp.floor(vf * (H - 1) + 0.5)
    else:
        ui = jnp.floor(uf * W)
        vi = jnp.floor(vf * H)
    return jnp.stack([ui, vi], axis=-1).astype(jnp.int32)


def undiscretize_2d(
    pix: jnp.ndarray, H: int, W: int, ndc: bool = True, align_corners: bool = False
) -> jnp.ndarray:
    """Integer pixel coords -> continuous (u, v), inverse of discretize_2d."""
    ui, vi = pix[..., 0].astype(jnp.float32), pix[..., 1].astype(jnp.float32)
    if align_corners:
        uf = ui / (W - 1)
        vf = vi / (H - 1)
    else:
        uf = (ui + 0.5) / W
        vf = (vi + 0.5) / H
    if ndc:
        uf = uf * 2.0 - 1.0
        vf = vf * 2.0 - 1.0
    return jnp.stack([uf, vf], axis=-1)


def make_grid_2d(H: int, W: int, ndc: bool = True) -> jnp.ndarray:
    """[H, W, 2] grid of pixel-center (x, y) coordinates (query.py
    make_grid_2d: row-major, last axis (x, y))."""
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    return undiscretize_2d(jnp.stack([xs, ys], axis=-1), H, W, ndc=ndc)


def make_grid_3d(D: int, H: int, W: int, ndc: bool = True) -> jnp.ndarray:
    """[D, H, W, 3] grid of voxel-center (x, y, z) coordinates."""
    zs, ys, xs = jnp.meshgrid(
        jnp.arange(D), jnp.arange(H), jnp.arange(W), indexing="ij")
    # per-axis undiscretize with its own resolution
    def un(i, S):
        u = (i.astype(jnp.float32) + 0.5) / S
        return u * 2.0 - 1.0 if ndc else u

    return jnp.stack([un(xs, W), un(ys, H), un(zs, D)], axis=-1)


def scale_tensor(dat, inp_scale, tgt_scale):
    """Affine range remap [inp_scale -> tgt_scale] (the field-query helper
    of the reference's mesh/utils.py:22-31); scales default to (0, 1)."""
    if inp_scale is None:
        inp_scale = (0.0, 1.0)
    if tgt_scale is None:
        tgt_scale = (0.0, 1.0)
    dat = (dat - inp_scale[0]) / (inp_scale[1] - inp_scale[0])
    return dat * (tgt_scale[1] - tgt_scale[0]) + tgt_scale[0]


def contract_to_unisphere(
    x: jnp.ndarray, bbox, unbounded: bool = False
) -> jnp.ndarray:
    """Map points into [0, 1]^3 for field queries (mesh/utils.py:33-43):
    bounded = plain bbox normalize; unbounded = mip-NeRF-360 contraction of
    the exterior (|x| > 1 squashed to radius < 2, result scaled to [0, 1]).
    Branch-free jnp (the reference's boolean masking becomes ``where``)."""
    x = scale_tensor(x, bbox, (0.0, 1.0))
    if not unbounded:
        return x
    x = x * 2.0 - 1.0
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    safe = jnp.maximum(mag, 1e-12)
    contracted = (2.0 - 1.0 / safe) * (x / safe)
    x = jnp.where(mag > 1.0, contracted, x)
    return x / 4.0 + 0.5


# ------------------------------------------------- Cauchy boundary queries


def create_circle(n: int, radius: float = 1.0, t_0: float = 0.0):
    """Closed unit-circle contour with ``n + 1`` parameter samples and its
    analytic derivative (query.py create_circle:46-60).  Returns
    ``(t, d_t, gamma, d_gamma)``; ``gamma``/``d_gamma`` are complex64,
    ``d_gamma`` already includes the ``d_t`` quadrature weights (torch's
    ``gradient`` on a uniform linspace: spacing ``1/n`` at every sample,
    endpoints included — so the duplicated t=0/t=1 contour point is
    double-weighted, matching the reference's quadrature exactly)."""
    t = jnp.linspace(0.0, 1.0, n + 1, dtype=jnp.float32)
    h = 1.0 / n
    d_t = jnp.full((n + 1,), h, jnp.float32)
    ang = 2.0 * jnp.pi * (t - t_0)
    gamma = radius * (jnp.cos(ang) + 1j * jnp.sin(ang)).astype(jnp.complex64)
    d_gamma = (
        radius * 2.0 * jnp.pi * (-jnp.sin(ang) + 1j * jnp.cos(ang))
    ).astype(jnp.complex64) * d_t
    return t, d_t, gamma, d_gamma


def cauchy_integrate(
    z: jnp.ndarray, gamma: jnp.ndarray, d_gamma: jnp.ndarray,
    f_gamma: jnp.ndarray,
) -> jnp.ndarray:
    """Discrete Cauchy integral ``(1 / 2πi) Σ f(γ) γ' dt / (γ - z)``
    (query.py cauchy_integrate:76-90): evaluates the holomorphic extension
    of boundary features at interior points.  z [...], gamma/d_gamma [N],
    f_gamma [..., N, C] -> [..., C] complex."""
    zc = z.astype(jnp.complex64)[..., None, None]
    c = f_gamma * (d_gamma[:, None] / (gamma[:, None] - zc))
    return c.sum(axis=-2) / (2j * jnp.pi)


def query_circle(positions: jnp.ndarray, circles: jnp.ndarray) -> jnp.ndarray:
    """Circle boundary-field query (query.py query_circle:202-214):
    features living on the unit circle's boundary are extended to interior
    2D points by the Cauchy integral.  positions [B, N, 2] in the unit
    disk, circles [B, Cc, Wc] (Wc boundary samples per channel) ->
    [B, N, Cc] real."""
    Wc = circles.shape[-1]
    circles = jnp.concatenate([circles, circles[..., :1]], axis=-1)
    _, _, gamma, d_gamma = create_circle(Wc)
    z = positions[..., 0] + 1j * positions[..., 1]  # [B, N]
    f_gamma = jnp.swapaxes(circles, -1, -2)[:, None]  # [B, 1, Wc+1, Cc]
    return cauchy_integrate(z, gamma, d_gamma, f_gamma).real


def query_cylinder(
    positions: jnp.ndarray, cylinders: jnp.ndarray
) -> jnp.ndarray:
    """Cylinder boundary-field query: features on a cylinder's lateral
    surface (Dc rings of Wc samples) extended to interior 3D points — the
    Cauchy circle query per depth ring on (x, y), linearly interpolated
    along z in [-1, 1].  positions [B, N, 3], cylinders [B, Cc, Dc, Wc] ->
    [B, N, Cc] real.  The reference's query_cylinder (query.py:217-233) is
    FIXME-incomplete (it rasterizes per-slice Cauchy fields to a 128² grid
    and ends before sampling); this is the direct evaluation of the same
    integral at the query points — exact where the reference would have
    interpolated its grid."""
    B, Cc, Dc, Wc = cylinders.shape
    rings = jnp.concatenate([cylinders, cylinders[..., :1]], axis=-1)
    _, _, gamma, d_gamma = create_circle(Wc)
    z2d = positions[..., 0] + 1j * positions[..., 1]  # [B, N]
    # [B, 1, Dc, Wc+1, Cc]: one Cauchy query per depth ring
    f_gamma = jnp.moveaxis(rings, 1, -1)[:, None]  # [B, 1, Dc, Wc+1, Cc]
    per_ring = cauchy_integrate(
        z2d[..., None], gamma, d_gamma, f_gamma
    ).real  # [B, N, Dc, Cc]
    if Dc == 1:
        return per_ring[:, :, 0]
    zf = (positions[..., 2] + 1.0) / 2.0 * (Dc - 1)  # [-1,1] -> ring index
    zf = jnp.clip(zf, 0.0, Dc - 1)
    lo = jnp.clip(jnp.floor(zf).astype(jnp.int32), 0, Dc - 2)
    w = (zf - lo)[..., None]
    a = jnp.take_along_axis(per_ring, lo[..., None, None], axis=2)[:, :, 0]
    b = jnp.take_along_axis(per_ring, (lo + 1)[..., None, None], axis=2)[:, :, 0]
    return a * (1.0 - w) + b * w
