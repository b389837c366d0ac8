"""Forward multi-view renderer (the ``simple_rendering`` capability of
/root/reference/TextureTools/texturetools/render/nvdiffrast/renderer_base.py:101-350)
as a single jit-able function over pytrees.

Everything is batched over views with vmap; the rasterizer is the XLA
tile/chunk kernel from ops/rasterize.  Output conventions match the
reference: normals/positions lerped to -1 background, alpha in [0, 1],
no antialiasing on the conditioning path (export_nvdiffrast_video.py:963).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..camera.conversion import transform_points_mat4, c2w_to_w2c, get_mvp
from ..geometry.mesh import Mesh, compute_vertex_normals
from ..ops.grid_sample import grid_sample
from ..ops.rasterize import Rast, interpolate, rasterize


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderOutputs:
    """Per-view buffers [M, H, W, C]; fields are None unless requested."""

    mask: jnp.ndarray
    alpha: jnp.ndarray
    tri: jnp.ndarray
    world_normal: Optional[jnp.ndarray] = None
    camera_normal: Optional[jnp.ndarray] = None
    world_position: Optional[jnp.ndarray] = None
    z_depth: Optional[jnp.ndarray] = None
    camera_position: Optional[jnp.ndarray] = None
    distance: Optional[jnp.ndarray] = None
    ray_direction: Optional[jnp.ndarray] = None
    cos_ray_normal: Optional[jnp.ndarray] = None
    v_attr: Optional[jnp.ndarray] = None
    uv: Optional[jnp.ndarray] = None
    map_attr: Optional[jnp.ndarray] = None
    bary: Optional[jnp.ndarray] = None


def _lerp_bg(value, alpha, bg):
    return value * alpha + bg * (1.0 - alpha)


def draw_point_cloud(
    points_ndc: jnp.ndarray,
    H: int,
    W: int,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scatter NDC points into a boolean [H, W, 1] dot mask (the
    ``draw_mask`` / render_all_point_cloud output of renderer_base.py:28-36)
    — a segment scatter instead of torch.scatter."""
    pix_x = jnp.floor((points_ndc[..., 0] * 0.5 + 0.5) * W).astype(jnp.int32)
    pix_y = jnp.floor((points_ndc[..., 1] * 0.5 + 0.5) * H).astype(jnp.int32)
    inb = (pix_x >= 0) & (pix_x < W) & (pix_y >= 0) & (pix_y < H)
    if valid is not None:
        inb = inb & valid
    flat = jnp.where(inb, pix_y * W + pix_x, H * W)
    img = jnp.zeros((H * W + 1,), bool).at[flat].set(True)[: H * W]
    return img.reshape(H, W, 1)


def render_uv_attributes(
    mesh: Mesh,
    uv_size: int,
    v_attr: Optional[jnp.ndarray] = None,
    render_world_normal: bool = False,
    render_world_position: bool = False,
    face_chunk: int = 512,
    pixel_tile: int = 512,
):
    """Inverse (UV-space) rendering: bake per-vertex attributes into the UV
    atlas (``simple_inverse_rendering``/``global_inverse_rendering``,
    renderer_base.py:352, :562).  Returns dict with 'mask' [S, S, 1] and the
    requested attribute images."""
    from ..ops.rasterize import interpolate, rasterize_uv

    rast = rasterize_uv(
        mesh.uv, mesh.faces_uv.astype(jnp.int32), uv_size,
        face_chunk=face_chunk,
        pixel_tile=pixel_tile if uv_size > pixel_tile else 0,
    )
    faces = mesh.faces.astype(jnp.int32)
    out = {"mask": rast.mask[..., None]}
    if v_attr is not None:
        out["v_attr"] = interpolate(v_attr, rast, faces)
    if render_world_position:
        out["world_position"] = interpolate(mesh.vertices, rast, faces)
    if render_world_normal:
        nrm = compute_vertex_normals(mesh.vertices, faces)
        wn = interpolate(nrm, rast, faces)
        out["world_normal"] = wn / jnp.maximum(
            jnp.linalg.norm(wn, axis=-1, keepdims=True), 1e-12
        )
    return out


def get_visible_faces(
    mesh: Mesh,
    c2ws: jnp.ndarray,
    intrinsics: jnp.ndarray,
    render_size: Tuple[int, int],
    perspective: bool = False,
) -> jnp.ndarray:
    """Per-view face visibility [M, F] bool from rasterized triangle ids
    (renderer_base.py get_visible_faces:66-87), via a scatter instead of
    masked unique."""
    out = render_views(mesh, c2ws, intrinsics, render_size, perspective=perspective)
    F = mesh.faces.shape[0]
    tri = out.tri.reshape(out.tri.shape[0], -1)

    def one(t):
        seen = jnp.zeros((F + 1,), bool)
        return seen.at[jnp.where(t >= 0, t, F)].set(True)[:F]

    return jax.vmap(one)(tri)


def get_visible_vertices(
    mesh: Mesh,
    c2ws: jnp.ndarray,
    intrinsics: jnp.ndarray,
    render_size: Tuple[int, int],
    perspective: bool = False,
) -> jnp.ndarray:
    """Per-view vertex visibility [M, V] bool (renderer_base.py:89-103):
    a vertex is visible when any face using it is."""
    fvis = get_visible_faces(mesh, c2ws, intrinsics, render_size, perspective)
    V = mesh.vertices.shape[0]
    faces = mesh.faces.astype(jnp.int32)

    def one(fv):
        idx = jnp.where(fv[:, None], faces, V)
        return jnp.zeros((V + 1,), bool).at[idx.reshape(-1)].set(True)[:V]

    return jax.vmap(one)(fvis)


@partial(
    jax.jit,
    static_argnames=(
        "render_size",
        "perspective",
        "render_world_normal",
        "render_camera_normal",
        "render_world_position",
        "render_z_depth",
        "render_camera_position",
        "render_distance",
        "render_ray_direction",
        "render_cos_ray_normal",
        "render_v_attr",
        "render_uv",
        "render_map_attr",
        "face_chunk",
        "pixel_tile",
        "supersample",
        "row_chunk",
        "tile_batch",
    ),
)
def render_views(
    mesh: Mesh,
    c2ws: jnp.ndarray,
    intrinsics: jnp.ndarray,
    render_size: Tuple[int, int],
    perspective: bool = False,
    v_attr: Optional[jnp.ndarray] = None,
    map_attr: Optional[jnp.ndarray] = None,
    render_world_normal: bool = False,
    render_camera_normal: bool = False,
    render_world_position: bool = False,
    render_z_depth: bool = False,
    render_camera_position: bool = False,
    render_distance: bool = False,
    render_ray_direction: bool = False,
    render_cos_ray_normal: bool = False,
    render_v_attr: bool = False,
    render_uv: bool = False,
    render_map_attr: bool = False,
    face_chunk: int = 512,
    pixel_tile: int = 0,
    supersample: int = 1,
    row_chunk: Optional[int] = None,
    tile_batch: int = 64,
) -> RenderOutputs:
    """Render a mesh from M cameras.

    mesh: Mesh pytree; c2ws [M, 4, 4]; intrinsics [3, 3] or [M, 3, 3]
    (normalized).  render_size (H, W).  ``supersample`` > 1 renders at NxN
    the resolution and box-filters float outputs back down — the
    anti-aliasing capability standing in for ``dr.antialias`` (which the
    reference's main conditioning path disables anyway,
    export_nvdiffrast_video.py:963); integer buffers (tri) keep the
    top-left sample.
    """
    if supersample > 1:
        H0, W0 = render_size
        hi = render_views(
            mesh, c2ws, intrinsics, (H0 * supersample, W0 * supersample),
            perspective=perspective, v_attr=v_attr, map_attr=map_attr,
            render_world_normal=render_world_normal,
            render_camera_normal=render_camera_normal,
            render_world_position=render_world_position,
            render_z_depth=render_z_depth,
            render_camera_position=render_camera_position,
            render_distance=render_distance,
            render_ray_direction=render_ray_direction,
            render_cos_ray_normal=render_cos_ray_normal,
            render_v_attr=render_v_attr,
            render_uv=render_uv,
            render_map_attr=render_map_attr,
            face_chunk=face_chunk, pixel_tile=pixel_tile, supersample=1,
            row_chunk=row_chunk, tile_batch=tile_batch,
        )
        s = supersample

        def down(x):
            if x is None:
                return None
            M_, Hs, Ws = x.shape[:3]
            if jnp.issubdtype(x.dtype, jnp.floating):
                r = x.reshape(M_, Hs // s, s, Ws // s, s, *x.shape[3:])
                return r.mean(axis=(2, 4))
            return x[:, ::s, ::s]

        return jax.tree.map(
            down, hi, is_leaf=lambda v: v is None or isinstance(v, jnp.ndarray)
        )
    H, W = render_size
    M = c2ws.shape[0]
    if intrinsics.ndim == 2:
        intrinsics = jnp.broadcast_to(intrinsics, (M, 3, 3))
    mvp = get_mvp(c2ws, intrinsics, perspective=perspective)       # [M, 4, 4]
    w2cs = c2w_to_w2c(c2ws)

    v = mesh.vertices
    faces = mesh.faces.astype(jnp.int32)
    v_nrm = None
    if render_world_normal or render_camera_normal or render_cos_ray_normal:
        v_nrm = compute_vertex_normals(v, faces)

    def one_view(mvp_i, w2c_i, c2w_i):
        # transform_points_mat4: exact f32, immune to the in-jit
        # concat->matmul fusion miscompile (camera/conversion.py) — the
        # re-bake depth test resolves these at the 5e-3 level
        clip = transform_points_mat4(v, mvp_i)
        rast = rasterize(clip, faces, (H, W), face_chunk=face_chunk, pixel_tile=pixel_tile, tile_batch=tile_batch)
        if row_chunk is None or H <= row_chunk or H % row_chunk:
            return _pixel_tail(rast, clip, mvp_i, w2c_i, c2w_i)
        # low-HBM serving: the per-pixel gather tail (interpolates) is the
        # program's temp peak under XLA's TPU gather lowering (same
        # pathology measured at 8.3 GB in the 2048² uv_render,
        # renderer_inverse.py) — slab it so the conditioning render
        # co-resides with ~14 GB of int8 FLUX+SD3 params on a 16 GB chip
        from ..ops.rasterize import Rast

        n = H // row_chunk
        out = jax.lax.map(
            lambda t: _pixel_tail(
                Rast(bary=t[0], z=t[1], tri=t[2]), clip, mvp_i, w2c_i, c2w_i
            ),
            (
                rast.bary.reshape(n, row_chunk, W, 2),
                rast.z.reshape(n, row_chunk, W),
                rast.tri.reshape(n, row_chunk, W),
            ),
        )
        return jax.tree.map(
            lambda x: x.reshape(H, W, *x.shape[3:]), out
        )

    def _pixel_tail(rast, clip, mvp_i, w2c_i, c2w_i):
        mask = rast.mask[..., None]
        alpha = mask.astype(jnp.float32)
        out = {"mask": mask, "alpha": alpha, "tri": rast.tri, "bary": rast.bary}

        def interp(attr, fill=0.0):
            return interpolate(attr, rast, faces, fill=fill)

        if render_world_normal:
            wn = interp(v_nrm)
            wn = wn / jnp.maximum(jnp.linalg.norm(wn, axis=-1, keepdims=True), 1e-12)
            out["world_normal"] = _lerp_bg(wn, alpha, -1.0)
        if render_camera_normal or render_cos_ray_normal:
            vn_cam = v_nrm @ c2w_i[:3, :3]
            vn_cam = vn_cam / jnp.maximum(
                jnp.linalg.norm(vn_cam, axis=-1, keepdims=True), 1e-12
            )
            cn = interp(vn_cam)
            cn = cn / jnp.maximum(jnp.linalg.norm(cn, axis=-1, keepdims=True), 1e-12)
            if render_camera_normal:
                out["camera_normal"] = _lerp_bg(cn, alpha, -1.0)
        if render_world_position:
            out["world_position"] = _lerp_bg(interp(v), alpha, -1.0)
        if render_z_depth:
            zd = interp(clip[:, 3:4] if perspective else clip[:, 2:3])
            out["z_depth"] = zd * alpha
        if (
            render_camera_position
            or render_distance
            or render_ray_direction
            or render_cos_ray_normal
        ):
            v_cam = transform_points_mat4(v, w2c_i)[:, :3]
            cp = interp(v_cam)
            if render_camera_position:
                out["camera_position"] = cp * alpha
            if render_distance:
                out["distance"] = jnp.linalg.norm(cp, axis=-1, keepdims=True) * alpha
            rd = cp / jnp.maximum(jnp.linalg.norm(cp, axis=-1, keepdims=True), 1e-12)
            if render_ray_direction:
                out["ray_direction"] = _lerp_bg(rd, alpha, -1.0)
            if render_cos_ray_normal:
                crn = jnp.sum(cn * rd, axis=-1, keepdims=True)
                out["cos_ray_normal"] = _lerp_bg(crn, alpha, -1.0)
        if render_v_attr and v_attr is not None:
            out["v_attr"] = interp(v_attr) * alpha
        if (render_uv or render_map_attr) and mesh.uv is not None:
            uv_ndc = mesh.uv * 2.0 - 1.0
            tri_safe = jnp.maximum(rast.tri, 0)
            corners = uv_ndc[mesh.faces_uv.astype(jnp.int32)[tri_safe]]
            gb_uv = jnp.einsum("...kc,...k->...c", corners, rast.bary3)
            gb_uv = jnp.where(mask, gb_uv, -1.0)
            if render_uv:
                out["uv"] = gb_uv
            if render_map_attr and map_attr is not None:
                # uv is v-up; image row 0 = v=1: flip y for grid_sample
                g = jnp.stack([gb_uv[..., 0], -gb_uv[..., 1]], axis=-1)
                out["map_attr"] = grid_sample(map_attr, g, padding_mode="border") * alpha
        return out

    # sequential map over views: one compiled body (batching the binned
    # rasterizer's sort/scatter through vmap inflates the HLO and compile
    # time enormously; M is only 6-10 so sequential execution is cheap)
    outs = jax.lax.map(lambda args: one_view(*args), (mvp, w2cs, c2ws))
    return RenderOutputs(
        mask=outs["mask"],
        alpha=outs["alpha"],
        tri=outs["tri"],
        bary=outs.get("bary"),
        world_normal=outs.get("world_normal"),
        camera_normal=outs.get("camera_normal"),
        world_position=outs.get("world_position"),
        z_depth=outs.get("z_depth"),
        camera_position=outs.get("camera_position"),
        distance=outs.get("distance"),
        ray_direction=outs.get("ray_direction"),
        cos_ray_normal=outs.get("cos_ray_normal"),
        v_attr=outs.get("v_attr"),
        uv=outs.get("uv"),
        map_attr=outs.get("map_attr"),
    )
