"""Stage-2 texture baking: multi-view images -> UV atlas texture.

TPU-native re-architecture of ``NVDiffRendererInverse``
(/root/reference/TextureTools/texturetools/render/nvdiffrast/renderer_inverse.py):
the reference pipes everything through ragged masked_select point clouds and
an OptiX/LBVH ray tracer; here every step is a dense masked image-space op
with static shapes:

* ``mv_render``    — rasterize the mesh per view: positions, face normals,
                     triangle ids, linear view depth, screen-gradient filter
                     (mv_to_pcd, renderer_inverse.py:159-241).
* ``uv_render``    — rasterize the UV atlas: per-texel 3D position, face
                     normal, triangle id (uv_to_pcd first half, :243-290).
* ``view_visibility`` — per-view texel visibility.  The reference compares
                     the ray-traced first-hit triangle id with the texel's
                     triangle id (:321-325); we get the same bit from the
                     z-buffer: project the texel into the view and compare
                     its linear depth with the rasterized depth map (the
                     substitution the reference itself validates with its
                     rasterization-emulated ray tracer, rt_nvdiffrast.py),
                     optionally AND/OR a sampled triangle-id equality test.
                     Ray-normal angle test and ring-kernel hole closing
                     match the reference (:326-344).
* ``bake_reproject_blur`` — per-view-priority paste -> seam boundary blur ->
                     k=1 KNN fill of invisible texels -> pull_push dilation
                     (:574-633, the shipped default).
* ``bake_kdtree``  — 'order_mean' / 'mean' / 'mvpaint' KNN baking
                     (:367-433).
* ``bake_texture`` — the ``infer`` orchestrator (:635-726).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera.conversion import c2w_to_w2c, get_mvp, transform_points_mat4
from ..geometry.mesh import Mesh, compute_face_normals
from ..ops.grid_sample import grid_sample
from ..ops.image_ops import (
    boundary_mask,
    dilate_mask,
    lens_blur,
    erode_mask,
    gaussian_blur,
    pull_push,
    ring_close_mask,
)
from ..ops.knn import knn
from ..ops.rasterize import interpolate, rasterize, rasterize_uv

# per-view paste priority: frtbld -> fblrtd (renderer_inverse.py:44)
VIEW_PRIORITY = (0, 3, 4, 1, 2, 5)


def _face_normal_image(face_normals, tri):
    """Gather per-pixel face normals by triangle id (0 where background)."""
    safe = jnp.maximum(tri, 0)
    fn = face_normals[safe]
    return jnp.where((tri >= 0)[..., None], fn, 0.0)


@partial(
    jax.jit,
    static_argnames=(
        "render_size", "perspective", "grad_norm_threshold",
        "ray_normal_angle_threshold", "filt_gradient_points", "face_chunk",
        "view_scan", "tile_batch",
    ),
)
def mv_render(
    mesh: Mesh,
    c2ws: jnp.ndarray,
    intrinsics: jnp.ndarray,
    render_size: Tuple[int, int],
    perspective: bool = False,
    grad_norm_threshold: float = 0.15,
    ray_normal_angle_threshold: float = 100.0,
    filt_gradient_points: bool = False,
    face_chunk: int = 512,
    view_scan: bool = False,
    tile_batch: int = 64,
) -> Dict[str, jnp.ndarray]:
    """Per-view geometry buffers of the processed mesh (mv_to_pcd).

    Jitted whole (the inner rasterize is itself jitted and inlines): the
    interpolate/normal/depth/gradient-filter chain otherwise runs eagerly,
    one HBM round-trip per op.  Compiles per mesh shape bucket."""
    H, W = render_size
    M = c2ws.shape[0]
    if intrinsics.ndim == 2:
        intrinsics = jnp.broadcast_to(intrinsics, (M, 3, 3))
    mvp = get_mvp(c2ws, intrinsics, perspective=perspective)
    w2cs = c2w_to_w2c(c2ws)
    v = mesh.vertices
    faces = mesh.faces.astype(jnp.int32)
    face_normals = compute_face_normals(v, faces)

    def one_view(mvp_i, w2c_i, c2w_i):
        # transform_points_mat4: exact f32 projections, immune to the
        # in-jit concat->matmul fusion miscompile — the visibility depth
        # test compares these against texel-point projections at 5e-3 eps
        clip = transform_points_mat4(v, mvp_i)
        rast = rasterize(
            clip, faces, (H, W), face_chunk=face_chunk,
            tile_batch=tile_batch,
        )
        mask = rast.mask[..., None]
        pos = interpolate(v, rast, faces)
        fn = _face_normal_image(face_normals, rast.tri)
        # linear view depth: camera-space -z (distance along the view axis)
        v_cam = transform_points_mat4(v, w2c_i)[:, :3]
        depth = interpolate(v_cam[:, 2:3], rast, faces)
        depth = jnp.where(mask, -depth, jnp.inf)
        if perspective:
            rays_d = pos - c2w_i[:3, 3]
        else:
            rays_d = jnp.broadcast_to(-c2w_i[:3, 2], pos.shape)
        rays_d = rays_d / jnp.maximum(
            jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12
        )
        cos_rn = jnp.sum(rays_d * fn, axis=-1, keepdims=True)
        return rast.tri, mask, pos, fn, depth, cos_rn

    if view_scan:
        # low-HBM serving: one view's rasterizer transients at a time
        # (the vmapped 6-view form OOMed next to 12 GB of resident int8
        # params at the larger face buckets — E2E_r03)
        tri, mask, pos, fn, depth, cos_rn = jax.lax.map(
            lambda args: one_view(*args), (mvp, w2cs, c2ws)
        )
    else:
        tri, mask, pos, fn, depth, cos_rn = jax.vmap(one_view)(mvp, w2cs, c2ws)

    cos_thresh = math.cos(math.radians(ray_normal_angle_threshold))
    mask_vis = mask & (cos_rn < cos_thresh)
    if filt_gradient_points:
        attrs = jnp.concatenate([pos, fn], axis=-1)             # [M, H, W, 6]
        dy = jnp.gradient(attrs, axis=1)
        dx = jnp.gradient(attrs, axis=2)
        grad_norm = jnp.sqrt(
            jnp.sum(dx * dx + dy * dy, axis=-1, keepdims=True)
        )
        smooth = grad_norm < grad_norm_threshold
        # erode the smooth region with a 31x31 window (reference dilates the
        # rejected region, renderer_inverse.py:210-213)
        smooth = erode_mask(smooth, 31)
        mask_vis = mask_vis & smooth
    else:
        mask_vis = mask

    return {
        "tri": tri,
        "mask": mask,
        "mask_visible": mask_vis,
        "position": pos,
        "face_normal": fn,
        "depth": depth,
        "cos_ray_normal": cos_rn,
        "mvp": mvp,
        "w2cs": w2cs,
    }


@partial(jax.jit, static_argnames=(
    "uv_size", "face_chunk", "pixel_tile", "tile_batch", "row_chunk"))
def uv_render(
    mesh: Mesh,
    uv_size: int,
    face_chunk: int = 512,
    pixel_tile: int = 512,
    tile_batch: int = 64,
    row_chunk: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """UV-space geometry buffers (uv_to_pcd first half): per-texel mask,
    3D position, face normal, triangle id.  Jitted whole (see mv_render).

    ``row_chunk``: run the per-texel tail (vertex-gather interpolate +
    face-normal gather) in row slabs via ``lax.map``.  The full-grid form
    measured 8.3 GB of XLA temps at 2048²/32k-face bucket (the chained
    ``attr[faces[tri]]`` gathers under XLA's TPU gather lowering — AOT
    memory_analysis, r04) and was the largest OOM source next to the 12 GB
    resident int8 params; the rasterizer itself needs only 0.4 GB."""
    from ..ops.rasterize import Rast

    rast = rasterize_uv(
        mesh.uv, mesh.faces_uv.astype(jnp.int32), uv_size,
        face_chunk=face_chunk, pixel_tile=pixel_tile,
        tile_batch=tile_batch,
    )
    faces = mesh.faces.astype(jnp.int32)
    face_normals = compute_face_normals(mesh.vertices, faces)

    def tail(r):
        pos_s = interpolate(mesh.vertices, r, faces)
        fn_s = _face_normal_image(face_normals, r.tri)
        return pos_s, fn_s

    if row_chunk is None or uv_size <= row_chunk or uv_size % row_chunk:
        pos, fn = tail(rast)
    else:
        n = uv_size // row_chunk
        pos, fn = jax.lax.map(
            lambda t: tail(Rast(bary=t[0], z=t[1], tri=t[2])),
            (
                rast.bary.reshape(n, row_chunk, uv_size, 2),
                rast.z.reshape(n, row_chunk, uv_size),
                rast.tri.reshape(n, row_chunk, uv_size),
            ),
        )
        pos = pos.reshape(uv_size, uv_size, 3)
        fn = fn.reshape(uv_size, uv_size, 3)
    mask = rast.mask[..., None]
    return {"tri": rast.tri, "mask": mask, "position": pos, "face_normal": fn}


def _one_view_visibility(
    pos, mask_2d, tri_2d, fn_2d,
    mvp_i, w2c_i, c2w_i, depth_i, tri_i, mask_i, img_i,
    *, perspective, ray_normal_angle_threshold, depth_eps,
    visibility_mode, ring_kernels, row_chunk=None,
):
    """One view's texel visibility + sampled color (shared by the eager
    ``view_visibility`` and the fused jitted ``_visibility_paste``).

    Projections via :func:`transform_points_mat4` — exact f32 and immune
    to the in-jit concat→matmul fusion miscompile (see that docstring):
    the depth test below resolves 5e-3 differences.

    ``row_chunk``: process the texel grid in row slabs via ``lax.map`` —
    everything but the ring closing is pointwise over texels, so slab
    temps shrink by H2/row_chunk.  Measured need: XLA gives the full-grid
    bilinear gather ~2.5 GB of temps at 2048² (AOT memory_analysis), which
    OOMed the bake next to the 12 GB resident int8 12B (E2E r04 asset 1);
    256-row slabs cut the per-view peak ~8x.  The closing runs on the
    assembled full-grid mask (box sums, lane-safe)."""

    def pointwise(pos_s, tri2d_s, fn_s):
        clip = transform_points_mat4(pos_s, mvp_i)      # [..., 4]
        w = jnp.where(jnp.abs(clip[..., 3:4]) > 1e-12, clip[..., 3:4], 1e-12)
        ndc = clip[..., :2] / w
        # linear view depth of the texel point
        cam = transform_points_mat4(pos_s, w2c_i)
        tex_depth = -cam[..., 2:3]
        # sampled view depth + view mask (+ view color) at the projected
        # location, as ONE bilinear gather: color taps share the
        # depth/alpha taps' addresses, so fusing them halves the 4M-texel
        # gather passes.  Zeros padding is sound for the color channels
        # too: visibility requires view_alpha > 0.999, so any texel whose
        # sample window leaves the image (where border vs zeros padding
        # differ) is invisible and its color is never consumed
        # (out-of-window tap weight < 1e-3).
        # color may live at a DIFFERENT resolution than the geometry
        # buffers (max-memory --sr: depth/tri/mask at the camera's 512²,
        # SR color at 2048² — NDC sampling decouples them; the 512²
        # visibility test is then bit-identical to the plain serving
        # bake).  Same-res keeps the fused single-gather form.
        fuse_color = img_i is not None and \
            img_i.shape[:2] == depth_i.shape[:2]
        planes = [jnp.where(mask_i, depth_i, 0.0), mask_i.astype(jnp.float32)]
        if fuse_color:
            planes.append(img_i)
        samp = grid_sample(
            jnp.concatenate(planes, axis=-1), ndc, padding_mode="zeros"
        )
        view_depth, view_alpha = samp[..., :1], samp[..., 1:2]
        depth_ok = (view_alpha > 0.999) & (
            jnp.abs(view_depth - tex_depth) < depth_eps
        )
        # nearest-pixel triangle-id equality (the reference's ray-trace
        # test).  Gate by an in-frame check: the pixel lookup clamps, so a
        # texel projecting outside the view image would otherwise read a
        # border pixel's tri id and could pass while its bilinear color
        # sample is zeros-diluted (the depth path is safe —
        # view_alpha > 0.999 already implies in-frame under zeros padding).
        Hv, Wv = tri_i.shape[:2]
        in_frame = (
            (jnp.abs(ndc[..., 0]) <= 1.0) & (jnp.abs(ndc[..., 1]) <= 1.0)
        )[..., None]
        px = jnp.clip(
            ((ndc[..., 0] + 1) * 0.5 * Wv).astype(jnp.int32), 0, Wv - 1)
        py = jnp.clip(
            ((ndc[..., 1] + 1) * 0.5 * Hv).astype(jnp.int32), 0, Hv - 1)
        tid_ok = (
            (tri_i[py, px] == tri2d_s)[..., None]
            & (tri2d_s >= 0)[..., None]
            & in_frame
        )
        if visibility_mode == "depth":
            vis = depth_ok
        elif visibility_mode == "tid":
            vis = tid_ok
        else:
            vis = depth_ok | tid_ok
        # ray-normal angle test on the texel's own face normal
        if perspective:
            rays_d = pos_s - c2w_i[:3, 3]
        else:
            rays_d = jnp.broadcast_to(-c2w_i[:3, 2], pos_s.shape)
        rays_d = rays_d / jnp.maximum(
            jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12
        )
        cos_rn = jnp.sum(rays_d * fn_s, axis=-1, keepdims=True)
        vis = vis & (
            cos_rn < math.cos(math.radians(ray_normal_angle_threshold)))
        if img_i is None:
            color = jnp.zeros(())
        elif fuse_color:
            color = samp[..., 2:]
        else:
            color = grid_sample(img_i, ndc, padding_mode="zeros")
        return vis, color, ndc, cos_rn

    H2, W2 = pos.shape[:2]
    if row_chunk is None or H2 <= row_chunk or H2 % row_chunk != 0:
        vis, color, ndc, cos_rn = pointwise(pos, tri_2d, fn_2d)
    else:
        n = H2 // row_chunk
        vis, color, ndc, cos_rn = jax.lax.map(
            lambda t: pointwise(*t),
            (
                pos.reshape(n, row_chunk, W2, 3),
                tri_2d.reshape(n, row_chunk, W2),
                fn_2d.reshape(n, row_chunk, W2, 3),
            ),
        )
        vis = vis.reshape(H2, W2, 1)
        ndc = ndc.reshape(H2, W2, 2)
        cos_rn = cos_rn.reshape(H2, W2, 1)
        if img_i is not None:
            color = color.reshape(H2, W2, -1)
    vis = ring_close_mask(vis, ring_kernels) if ring_kernels else vis
    vis = vis & mask_2d
    if img_i is None:
        color = None
    return vis, color, ndc, cos_rn


def view_visibility(
    uv_out: Dict[str, jnp.ndarray],
    mv_out: Dict[str, jnp.ndarray],
    c2ws: jnp.ndarray,
    view_images: Optional[jnp.ndarray],
    perspective: bool = False,
    ray_normal_angle_threshold: float = 100.0,
    depth_eps: float = 5e-3,
    visibility_mode: str = "depth",
    ring_kernels: Tuple[int, ...] = (3, 5),
) -> Dict[str, jnp.ndarray]:
    """Per-view texel visibility + sampled view colors.

    Returns 'visible' [M, H2, W2, 1] bool, 'colors' [M, H2, W2, C]
    (sampled view images, garbage where invisible), 'ndc' [M, H2, W2, 2].
    """
    assert visibility_mode in ("depth", "tid", "both")
    pos = uv_out["position"]                      # [H2, W2, 3]
    mask_2d = uv_out["mask"]
    tri_2d = uv_out["tri"]
    fn_2d = uv_out["face_normal"]
    mvp = mv_out["mvp"]
    w2cs = mv_out["w2cs"]

    def one_view(mvp_i, w2c_i, c2w_i, depth_i, tri_i, mask_i, img_i=None):
        return _one_view_visibility(
            pos, mask_2d, tri_2d, fn_2d,
            mvp_i, w2c_i, c2w_i, depth_i, tri_i, mask_i, img_i,
            perspective=perspective,
            ray_normal_angle_threshold=ray_normal_angle_threshold,
            depth_eps=depth_eps, visibility_mode=visibility_mode,
            ring_kernels=ring_kernels,
        )

    depth = mv_out["depth"]
    tri = mv_out["tri"]
    maskv = mv_out["mask"] & mv_out["mask_visible"]
    if view_images is not None:
        vis, colors, ndc, cos = jax.vmap(one_view)(
            mvp, w2cs, c2ws, depth, tri, maskv, view_images
        )
    else:
        vis, colors, ndc, cos = jax.vmap(
            lambda a, b, c, d, e, f: one_view(a, b, c, d, e, f, None)
        )(mvp, w2cs, c2ws, depth, tri, maskv)
    return {"visible": vis, "colors": colors, "ndc": ndc, "cos": cos}


def _paste_views(
    visible, colors, cos, priority, paste_mode,
    kernel_size_boundary,
):
    """Combine per-view (visible, color) maps into one texture + seam
    boundary.

    ``paste_mode='priority'`` — the reference's fixed-order
    first-visible-view paste (renderer_inverse.py:44, :574-633).
    ``paste_mode='cosine'`` — per-texel winner-take-all on the most
    head-on visible view (max |cos(ray, normal)|): still a hard selection
    (no cross-view ghosting on inconsistent diffusion outputs), but
    grazing-angle samples — whose view-pixel footprint smears a long 3D
    strip — lose to any view that sees the texel straight on.  The seam
    boundary is then where the winning view changes between neighboring
    texels (plus the visibility edge), feeding the same seam blur."""
    M = visible.shape[0]
    H2, W2 = visible.shape[1:3]
    C = colors.shape[-1]
    color_cur = jnp.zeros((H2, W2, C), colors.dtype)
    mask_cur = jnp.zeros((H2, W2, 1), bool)
    boundary = jnp.zeros((H2, W2, 1), bool)
    if paste_mode == "priority":
        for i in priority:
            extra = (~mask_cur) & visible[i]
            color_cur = jnp.where(extra, colors[i], color_cur)
            mask_cur = mask_cur | extra
            b_in, b_out = boundary_mask(extra, kernel_size_boundary)
            boundary = boundary | b_in | b_out
        return color_cur, mask_cur, boundary
    assert paste_mode == "cosine"
    score = jnp.where(visible, -cos, -jnp.inf)            # [M, H2, W2, 1]
    win = jnp.argmax(score, axis=0)                       # [H2, W2, 1]
    mask_cur = visible.any(axis=0)
    color_cur = jnp.take_along_axis(
        colors, win[None, ..., :1].repeat(C, axis=-1), axis=0
    )[0]
    color_cur = jnp.where(mask_cur, color_cur, 0.0)
    # seams: winner changes between 4-neighbors, or visibility edge
    wid = jnp.where(mask_cur, win + 1, 0)                 # 0 = no view
    change = jnp.zeros_like(mask_cur)
    for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
        change = change | (wid != jnp.roll(wid, sh, axis=ax))
    boundary = dilate_mask(
        change & mask_cur, kernel_size_boundary
    )
    return color_cur, mask_cur, boundary


@partial(
    jax.jit,
    static_argnames=(
        "perspective", "ray_normal_angle_threshold", "depth_eps",
        "visibility_mode", "ring_kernels", "priority",
        "kernel_size_boundary", "kernel_size_boundary_blur", "paste_mode",
    ),
)
def _visibility_paste(
    uv_pos, uv_mask, uv_tri, uv_fn,
    mvp, w2cs, c2ws, depth, tri, maskv, view_images,
    *, perspective, ray_normal_angle_threshold, depth_eps,
    visibility_mode, ring_kernels, priority,
    kernel_size_boundary, kernel_size_boundary_blur, paste_mode="priority",
):
    """Fused per-view visibility + priority paste, one XLA program.

    Composition-equivalent to ``view_visibility`` followed by
    ``bake_reproject_blur``'s paste loop (parity-tested).  The per-view
    visibility math stays vmapped over the view axis — the convs/gathers/
    grid_samples batch all M views into single dispatches, which measured
    ~2x faster than a lax.scan over views at production scale (the scan
    serialized conv/gather work the VPU wants batched) — and the paste is
    an unrolled masked-select chain XLA fuses into the same program, so
    the eager composition's per-op HBM round-trips between visibility and
    paste disappear.  Shapes depend only on (uv_size, view count/res),
    NOT on mesh bucket — one compile serves every asset.  Returns
    (color_cur, mask_cur, boundary, visible_any,
    visible_per_view [M,...] in view order)."""

    def one_view(mvp_i, w2c_i, c2w_i, depth_i, tri_i, maskv_i, img_i):
        vis, color, _, cos = _one_view_visibility(
            uv_pos, uv_mask, uv_tri, uv_fn,
            mvp_i, w2c_i, c2w_i, depth_i, tri_i, maskv_i, img_i,
            perspective=perspective,
            ray_normal_angle_threshold=ray_normal_angle_threshold,
            depth_eps=depth_eps, visibility_mode=visibility_mode,
            ring_kernels=ring_kernels,
        )
        return vis, color, cos

    visible, colors, cos = jax.vmap(one_view)(
        mvp, w2cs, c2ws, depth, tri, maskv, view_images
    )

    color_cur, mask_cur, boundary = _paste_views(
        visible, colors, cos, priority, paste_mode, kernel_size_boundary
    )
    boundary = dilate_mask(boundary, kernel_size_boundary_blur)
    boundary = boundary & erode_mask(
        uv_mask, 2 * (kernel_size_boundary_blur // 2) + 5
    )
    return color_cur, mask_cur, boundary, visible.any(axis=0), visible


@partial(
    jax.jit,
    static_argnames=(
        "perspective", "ray_normal_angle_threshold", "depth_eps",
        "visibility_mode", "ring_kernels", "priority",
        "kernel_size_boundary", "kernel_size_boundary_blur", "row_chunk",
    ),
)
def _visibility_paste_scan(
    uv_pos, uv_mask, uv_tri, uv_fn,
    mvp, w2cs, c2ws, depth, tri, maskv, view_images,
    *, perspective, ray_normal_angle_threshold, depth_eps,
    visibility_mode, ring_kernels, priority,
    kernel_size_boundary, kernel_size_boundary_blur, row_chunk=256,
):
    """Low-HBM variant of :func:`_visibility_paste`: one view at a time
    through a ``lax.scan`` IN PRIORITY ORDER, pasting into the carry, AND
    row-chunked pointwise texel math inside each view (``row_chunk``).
    Both levels matter: AOT memory_analysis measured the view scan alone
    at 2.99 GB of temps vs the vmapped 3.33 GB — the full-grid bilinear
    gather (~2.5 GB at 2048², XLA's TPU gather lowering) dominates either
    way, and it OOMed next to the 12 GB resident int8 12B on the r04 E2E's
    first asset.  The row slabs cut it ~H2/row_chunk x; the scan removes
    the view factor.  ~2x slower than vmapped at production scale —
    acceptable only in the co-resident max_memory serving mode.  Priority
    paste only."""
    order = jnp.asarray(priority, jnp.int32)

    def step(carry, idx):
        color_cur, mask_cur, boundary = carry
        vis, color, _, _ = _one_view_visibility(
            uv_pos, uv_mask, uv_tri, uv_fn,
            mvp[idx], w2cs[idx], c2ws[idx], depth[idx], tri[idx],
            maskv[idx], view_images[idx],
            perspective=perspective,
            ray_normal_angle_threshold=ray_normal_angle_threshold,
            depth_eps=depth_eps, visibility_mode=visibility_mode,
            ring_kernels=ring_kernels, row_chunk=row_chunk,
        )
        extra = (~mask_cur) & vis
        color_cur = jnp.where(extra, color, color_cur)
        mask_cur = mask_cur | extra
        b_in, b_out = boundary_mask(extra, kernel_size_boundary)
        boundary = boundary | b_in | b_out
        return (color_cur, mask_cur, boundary), vis

    H2, W2 = uv_mask.shape[:2]
    C = view_images.shape[-1]
    init = (
        jnp.zeros((H2, W2, C), view_images.dtype),
        jnp.zeros((H2, W2, 1), bool),
        jnp.zeros((H2, W2, 1), bool),
    )
    (color_cur, mask_cur, boundary), vis_by_prio = jax.lax.scan(
        step, init, order
    )
    # un-permute the stacked per-view masks back to view order
    visible = jnp.zeros_like(vis_by_prio).at[order].set(vis_by_prio)
    boundary = dilate_mask(boundary, kernel_size_boundary_blur)
    boundary = boundary & erode_mask(
        uv_mask, 2 * (kernel_size_boundary_blur // 2) + 5
    )
    return color_cur, mask_cur, boundary, visible.any(axis=0), visible


def _select_masked_points(
    points: jnp.ndarray, values: jnp.ndarray, mask: jnp.ndarray, max_n: int
):
    """Static-shape selection of up to ``max_n`` masked points.

    points [N, 3], values [N, C], mask [N] -> (pts [max_n, 3],
    vals [max_n, C], valid [max_n]).  A fixed pseudo-random permutation
    spreads the picks over the image so truncation is unbiased."""
    N = points.shape[0]
    # deterministic permutation priority (golden-ratio hash of the index)
    idx = jnp.arange(N, dtype=jnp.uint32)
    h = (idx * jnp.uint32(2654435761)) ^ (idx >> 16)
    # valid points sort first (by hash, an unbiased shuffle); invalid last
    key = jnp.where(mask, h >> 1, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    take = order[:max_n]
    return points[take], values[take], mask[take]


def _fill_invisible_knn(
    pos_flat: jnp.ndarray,
    color_flat: jnp.ndarray,
    visible_flat: jnp.ndarray,
    target_mask_flat: jnp.ndarray,
    k: int = 1,
    max_ref: int = 65536,
    chunk: int = 4096,
    query_field=None,
    max_fill: int = 1 << 20,
) -> jnp.ndarray:
    """Fill masked target texels with the (mean of) k nearest visible texels
    in 3D (renderer_inverse.py:611-616).  All arrays flat over texels.

    This runs at orchestration level (not under jit), so it counts the
    fill set on the host first: nothing to fill costs one scalar sync
    instead of a dense 4M-query KNN (measured 3.2 s of a 3.7 s bake at
    2048² with zero invisible texels).  Up to ``max_fill`` texels are
    query-COMPACTED (invisible-first gather, scatter-back) — 16x less KNN
    work than the dense form; only a fill set larger than the cap falls
    back to the dense all-texel query.

    ``query_field(vertices_visible, colors_visible, vertices_invisible)``
    replaces the KNN fill when registered — the LTM inpainting hook
    (register_query_field, renderer_inverse.py:93-105); it receives the
    dense arrays plus validity masks via keyword for static shapes."""
    if query_field is not None:
        field_colors = query_field(
            pos_flat, color_flat, pos_flat,
            visible_mask=visible_flat, query_mask=target_mask_flat,
        )
        return jnp.where(target_mask_flat[:, None], field_colors, color_flat)
    n_fill = int(jnp.count_nonzero(target_mask_flat))  # host sync, ~40 ms
    if n_fill == 0:
        return color_flat

    def _blend_one(d, idx):
        vals = ref_vals[idx]                           # [q, k, C]
        if k == 1:
            return vals[..., 0, :]
        # inverse-distance weighting: smooth fill instead of the nearest
        # texel's hard copy (k=1 is the reference's choice,
        # renderer_inverse.py:611; k>1 IDW measurably helps occluded
        # regions — ORACLE_r03)
        w = 1.0 / jnp.maximum(d, 1e-6)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        return jnp.einsum("qk,qkc->qc", w, vals)

    def blend(d, idx):
        """CHUNKED neighbor-color blend: one [Q, k, C] gather lane-pads
        the size-C(=3) trailing dim to the 128-lane tile — measured 16 GB
        of HLO temp (42.7x expansion) for the cup oracle's dense-fallback
        fill at 2048² (Q=4.2M, k=8), a compile-time OOM.  lax.map over
        ``chunk``-query slices bounds it to [chunk, k, C]."""
        Q = idx.shape[0]
        if Q <= chunk:
            return _blend_one(d, idx)
        pad = (-Q) % chunk
        dp = jnp.pad(d, ((0, pad), (0, 0)))
        ip = jnp.pad(idx, ((0, pad), (0, 0)))
        out = jax.lax.map(
            lambda di: _blend_one(*di),
            (dp.reshape(-1, chunk, k), ip.reshape(-1, chunk, k)),
        )
        return out.reshape(-1, out.shape[-1])[:Q]

    ref_pts, ref_vals, ref_valid = _select_masked_points(
        pos_flat, color_flat, visible_flat, max_ref
    )
    if n_fill <= max_fill:
        qidx = jnp.argsort(~target_mask_flat)[:max_fill]
        d, idx = knn(
            pos_flat[qidx], ref_pts, k=k, chunk=chunk, ref_valid=ref_valid
        )
        nn_color = blend(d, idx)
        upd = jnp.where(
            target_mask_flat[qidx][:, None], nn_color, color_flat[qidx]
        )
        return color_flat.at[qidx].set(upd)
    d, idx = knn(pos_flat, ref_pts, k=k, chunk=chunk, ref_valid=ref_valid)
    nn_color = blend(d, idx)
    return jnp.where(target_mask_flat[:, None], nn_color, color_flat)


def bake_reproject_blur(
    uv_out: Dict[str, jnp.ndarray],
    vis_out: Dict[str, jnp.ndarray],
    method: str = "lens",
    kernel_size_boundary: int = 3,
    kernel_size_boundary_blur: int = 3,
    kernel_size_blur: int = 5,
    priority: Tuple[int, ...] = VIEW_PRIORITY,
    knn_max_ref: int = 65536,
    knn_chunk: int = 4096,
    query_field=None,
    paste_mode: str = "priority",
    fill_k: int = 1,
    fill_relax_iters: int = 0,
    query_field_auto: float | None = None,
) -> Dict[str, jnp.ndarray]:
    """Paste + seam blur + KNN fill + pull_push (the shipped default bake,
    renderer_inverse.py:574-633).  ``query_field`` swaps the KNN fill for a
    learned texture-function (the LTM inpainting path,
    ``reproject_inpainting=True``).  ``paste_mode``/``fill_k``/
    ``fill_relax_iters``/``query_field_auto`` — see :func:`_paste_views` /
    :func:`_finish_reproject_blur`."""
    assert method in ("gaussian", "lens")
    mask_2d = uv_out["mask"]
    visible = vis_out["visible"]
    colors = vis_out["colors"]

    color_cur, mask_cur, boundary = _paste_views(
        visible, colors, vis_out.get("cos"), priority, paste_mode,
        kernel_size_boundary,
    )
    boundary = dilate_mask(boundary, kernel_size_boundary_blur)
    # only blur well inside the chart (reference uses kernel 2*(k//2)+5,
    # renderer_inverse.py:601)
    boundary = boundary & erode_mask(mask_2d, 2 * (kernel_size_boundary_blur // 2) + 5)

    return _finish_reproject_blur(
        uv_out, color_cur, mask_cur, boundary, visible.any(axis=0),
        method=method, kernel_size_blur=kernel_size_blur,
        knn_max_ref=knn_max_ref, knn_chunk=knn_chunk,
        query_field=query_field, fill_k=fill_k,
        fill_relax_iters=fill_relax_iters,
        query_field_auto=query_field_auto,
    )


@partial(jax.jit, static_argnames=("iters",))
def _relax_fill(color, update_mask, support_mask, iters: int):
    """Seam-aware relaxation of filled texels: Jacobi-average each
    ``update_mask`` texel over its in-chart 4-neighbors, holding visible
    texels fixed (Dirichlet boundary).  Makes the KNN fill C0-continuous
    with the visible regions at visibility boundaries instead of leaving a
    hard copied-color edge; out-of-chart texels never contribute (chart
    packing keeps disconnected surface pieces from bleeding)."""
    w = support_mask.astype(color.dtype)
    upd = update_mask & support_mask

    def body(c, _):
        cw = c * w
        nsum = wsum = 0.0
        for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
            nsum = nsum + jnp.roll(cw, sh, axis=ax)
            wsum = wsum + jnp.roll(w, sh, axis=ax)
        avg = nsum / jnp.maximum(wsum, 1e-6)
        return jnp.where(upd & (wsum > 0), avg, c), None

    color, _ = jax.lax.scan(body, color, None, length=iters)
    return color


def _finish_reproject_blur(
    uv_out, color_cur, mask_cur, boundary, visible_any,
    *, method, kernel_size_blur, knn_max_ref, knn_chunk, query_field,
    fill_k=1, fill_relax_iters=0, query_field_auto=None,
):
    """KNN fill + seam blur + pull_push — the bake tail after the paste.

    ``query_field_auto``: per-asset fill-policy threshold (visible-texel
    fraction over the chart).  The ORACLE_r05 split: the trained LTM
    query_field beats k=8 IDW + relaxation on every case under ~90%
    visible (trefoil/compound/cup, by 2.8-4.5 dB all-texel) but LOSES on
    the near-fully-visible torus (96.6% visible, 55.2 vs 57.7 dB — its
    occlusions are thin bands where local interpolation is the right
    model, while the field regression smooths across them).  With a
    threshold (default 0.93 from the pipeline, the midpoint of the
    measured split), assets at or above it take the IDW+relax fill and
    the field serves only genuinely occluded meshes; relaxation is also
    suppressed after a field fill (composing them is a measured negative,
    ORACLE_r05_ltm_relax.json).  Costs one host scalar sync (~40 ms)
    on the LTM path only."""
    mask_2d = uv_out["mask"]
    H2, W2, C = color_cur.shape
    # fill texels never seen by any view with nearest visible color in 3D
    pos_flat = uv_out["position"].reshape(-1, 3)
    color_flat = color_cur.reshape(-1, C)
    vis_flat = mask_cur.reshape(-1)
    invis_flat = (mask_2d & ~mask_cur).reshape(-1)
    if query_field is not None and query_field_auto is not None:
        n_valid = int(jnp.count_nonzero(mask_2d))       # host sync
        n_fill = int(jnp.count_nonzero(invis_flat))
        vis_frac = 1.0 - n_fill / max(1, n_valid)
        if vis_frac >= query_field_auto:
            query_field = None                          # IDW+relax branch
        else:
            fill_relax_iters = 0                        # field fill: no relax
    color_flat = _fill_invisible_knn(
        pos_flat, color_flat, vis_flat, invis_flat,
        k=fill_k, max_ref=knn_max_ref, chunk=knn_chunk,
        query_field=query_field,
    )
    color_cur = color_flat.reshape(H2, W2, C)
    if fill_relax_iters > 0:
        color_cur = _relax_fill(
            color_cur, mask_2d & ~mask_cur, mask_2d, fill_relax_iters
        )

    if method == "gaussian":
        blurred = gaussian_blur(color_cur, kernel_size_blur)
    else:
        # the reference's default seam softener: complex-kernel bokeh with
        # its stock radius/components (renderer_inverse.py:620-621 calls
        # lens_blur_torch with defaults, ignoring kernel_size_blur)
        blurred = lens_blur(color_cur)
    color_cur = jnp.where(boundary, blurred, color_cur)

    texture = pull_push(color_cur, mask_2d)
    return {
        "texture": texture,
        "color_before_fill": color_cur,
        "mask_2d": mask_2d,
        "mask_visible_any": visible_any,
        "boundary": boundary,
    }


def bake_reproject_blending(
    uv_out: Dict[str, jnp.ndarray],
    vis_out: Dict[str, jnp.ndarray],
    priority: Tuple[int, ...] = VIEW_PRIORITY,
    n_blend_iters: int = 100,
    n_outpaint_iters: int = 50,
    knn_max_ref: int = 65536,
    knn_chunk: int = 4096,
) -> Dict[str, jnp.ndarray]:
    """Priority paste + per-view Poisson blending + KNN fill
    (renderer_inverse.py:480-572, bake_mv_to_uv_reproject_blending): after
    the base paste, each view's visible colors are seamlessly cloned over
    the accumulated texture (the reference round-trips through
    cv2.seamlessClone per view; here it's an on-device Jacobi solve), with
    the chart exterior diffusion-outpainted so blend boundaries see valid
    colors."""
    from ..ops.poisson import diffusion_inpaint, poisson_blend

    mask_2d = uv_out["mask"]
    visible = vis_out["visible"]
    colors = vis_out["colors"]
    H2, W2 = mask_2d.shape[:2]
    C = colors.shape[-1]

    color_cur = jnp.zeros((H2, W2, C), colors.dtype)
    mask_cur = jnp.zeros((H2, W2, 1), bool)
    for i in priority:
        extra = (~mask_cur) & visible[i]
        color_cur = jnp.where(extra, colors[i], color_cur)
        mask_cur = mask_cur | extra

    pos_flat = uv_out["position"].reshape(-1, 3)
    vis_flat = mask_cur.reshape(-1)
    invis_flat = (mask_2d & ~mask_cur).reshape(-1)
    color_flat = _fill_invisible_knn(
        pos_flat, color_cur.reshape(-1, C), vis_flat, invis_flat,
        k=1, max_ref=knn_max_ref, chunk=knn_chunk,
    )
    color_cur = color_flat.reshape(H2, W2, C)

    # per-view seamless cloning, lowest priority first so the highest
    # priority views dominate the final gradients (reference iterates
    # self.index reversed, renderer_inverse.py:533)
    for i in reversed(priority):
        color_cur = diffusion_inpaint(color_cur, ~mask_2d, n_outpaint_iters)
        color_cur = poisson_blend(colors[i], color_cur, visible[i], n_blend_iters)

    color_cur = jnp.where(mask_2d, color_cur, 0.0)
    texture = pull_push(color_cur, mask_2d)
    return {
        "texture": texture,
        "mask_2d": mask_2d,
        "mask_visible_any": visible.any(axis=0),
    }


def bake_kdtree(
    uv_out: Dict[str, jnp.ndarray],
    vis_out: Dict[str, jnp.ndarray],
    mv_out: Dict[str, jnp.ndarray],
    view_images: jnp.ndarray,
    method: str = "order_mean",
    n_neighbors: int = 8,
    n_neighbors_visible: int = 4,
    n_neighbors_invisible: int = 8,
    priority: Tuple[int, ...] = VIEW_PRIORITY,
    knn_max_ref: int = 65536,
    knn_chunk: int = 4096,
    query_field=None,
) -> Dict[str, jnp.ndarray]:
    """KNN baking from the per-view *pixel* clouds (renderer_inverse.py
    :367-433): 'order_mean' takes, for each texel, the mean of the
    k-nearest visible pixels of the highest-priority view that sees it;
    'mean'/'mvpaint' blend all views at once.  ``query_field`` replaces the
    KNN fill of never-visible texels (kdtree_inpainting=True)."""
    assert method in ("mean", "mvpaint", "order_mean")
    mask_2d = uv_out["mask"]
    pos2 = uv_out["position"]
    H2, W2 = mask_2d.shape[:2]
    C = view_images.shape[-1]
    q = pos2.reshape(-1, 3)

    mv_pos = mv_out["position"]                  # [M, H, W, 3]
    mv_vis = (mv_out["mask"] & mv_out["mask_visible"])[..., 0]

    if method in ("mean", "mvpaint"):
        pts = mv_pos.reshape(-1, 3)
        vals = view_images.reshape(-1, C)
        msk = mv_vis.reshape(-1)
        nrm = mv_out["face_normal"].reshape(-1, 3)
        ref_pts, ref_vals, ref_valid = _select_masked_points(
            pts, jnp.concatenate([vals, nrm], -1), msk, knn_max_ref
        )
        d, idx = knn(q, ref_pts, k=n_neighbors, chunk=knn_chunk, ref_valid=ref_valid)
        gathered = ref_vals[idx]
        colors_k = gathered[..., :C]
        if method == "mean":
            out = colors_k.mean(axis=-2)
        else:
            normals_k = gathered[..., C:]
            w = 1.0 / jnp.maximum(d, 1e-8)
            w = w / jnp.sum(w, axis=-1, keepdims=True)
            cos = jnp.einsum(
                "qkc,qc->qk", normals_k, uv_out["face_normal"].reshape(-1, 3)
            )
            w = w * cos
            out = jnp.einsum("qk,qkc->qc", w, colors_k) / jnp.maximum(
                jnp.sum(w, axis=-1, keepdims=True), 1e-8
            )
            out = jnp.nan_to_num(out)
        color_flat = out
        covered = jnp.ones((H2 * W2,), bool)
    else:
        visible = vis_out["visible"]
        color_flat = jnp.zeros((H2 * W2, C))
        mask_cur = jnp.zeros((H2 * W2,), bool)
        for i in priority:
            extra = (~mask_cur) & visible[i].reshape(-1)
            pts = mv_pos[i].reshape(-1, 3)
            vals = view_images[i].reshape(-1, C)
            msk = mv_vis[i].reshape(-1)
            ref_pts, ref_vals, ref_valid = _select_masked_points(
                pts, vals, msk, knn_max_ref
            )
            d, idx = knn(
                q, ref_pts, k=n_neighbors_visible, chunk=knn_chunk, ref_valid=ref_valid
            )
            nn_color = ref_vals[idx].mean(axis=-2)
            color_flat = jnp.where(extra[:, None], nn_color, color_flat)
            mask_cur = mask_cur | extra
        covered = mask_cur

    invis = mask_2d.reshape(-1) & ~covered
    color_flat = _fill_invisible_knn(
        q, color_flat, covered, invis,
        k=n_neighbors_invisible, max_ref=knn_max_ref, chunk=knn_chunk,
        query_field=query_field,
    )
    color_2d = color_flat.reshape(H2, W2, C)
    color_2d = jnp.where(mask_2d, color_2d, 0.0)
    texture = pull_push(color_2d, mask_2d)
    return {"texture": texture, "mask_2d": mask_2d}


def bake_texture(
    mesh: Mesh,
    view_images: jnp.ndarray,
    c2ws: jnp.ndarray,
    intrinsics: jnp.ndarray,
    uv_size: int = 2048,
    perspective: bool = False,
    method: str = "reproject",
    grad_norm_threshold: float = 0.15,
    ray_normal_angle_threshold: float = 100.0,
    filt_gradient_points: bool = False,
    depth_eps: float = 5e-3,
    visibility_mode: str = "depth",
    knn_max_ref: int = 65536,
    knn_chunk: int = 4096,
    face_chunk: int = 512,
    uv_pixel_tile: int = 512,
    low_hbm: bool = False,
    **bake_kwargs,
) -> Dict[str, jnp.ndarray]:
    """Full stage-2 bake (``NVDiffRendererInverse.infer``,
    renderer_inverse.py:635-726): view_images [M, H, W, C] (C = 3 RGB or 9
    PBR albedo/MR/bump), returns the baked texture [uv_size, uv_size, C] and
    diagnostic masks.  ``low_hbm`` scans views through the visibility+paste
    instead of vmapping them — ~2x slower but one view's peak footprint,
    for serving with the 12 GB int8 12B resident (see
    :func:`_visibility_paste_scan`)."""
    assert method in ("reproject", "kdtree", "reproject_blending")
    M, H, W, C = view_images.shape
    assert C in (3, 9)
    # uv_render BEFORE mv_render: no data dependency between them, and
    # mv_render's per-view geometry buffers ([M, H, W, ~8ch] f32 — 1.3 GB
    # at SR-scaled 2048² views) would otherwise sit resident through
    # uv_render's rasterize+tail peak (the r04 --sr uv_render OOM next to
    # the 11.2 GB int8 FLUX)
    uv_out = uv_render(
        mesh, uv_size, face_chunk=face_chunk, pixel_tile=uv_pixel_tile,
        tile_batch=8 if low_hbm else 64,
        # low_hbm: slab the per-texel gather tail (8.3 GB full-grid temps
        # at 2048² — see uv_render docstring)
        row_chunk=bake_kwargs.get("low_hbm_row_chunk", 256)
        if low_hbm else None,
    )
    if low_hbm:
        # drain the uv programs before mv_render's dispatch-time output
        # allocations land (dispatch races execution through the tunnel)
        np.asarray(jax.tree.leaves(uv_out)[0].ravel()[0])
    # geometry_size: render the per-view GEOMETRY buffers at this size
    # instead of the view-image size — max-memory --sr serving keeps the
    # visibility test at the camera's proven 512² regime while the paste
    # samples SR color at 2048² (NDC sampling decouples the resolutions;
    # reproject method only)
    geom_hw = bake_kwargs.get("geometry_size") or (H, W)
    assert geom_hw == (H, W) or method == "reproject", \
        "geometry_size != view size is supported for method='reproject'"
    mv_out = mv_render(
        mesh, c2ws, intrinsics, geom_hw,
        perspective=perspective,
        grad_norm_threshold=grad_norm_threshold,
        ray_normal_angle_threshold=ray_normal_angle_threshold,
        filt_gradient_points=filt_gradient_points,
        face_chunk=face_chunk,
        # low_hbm: one view's rasterizer transients at a time + a small
        # binned-tile batch — the 65k-face bucket's vmapped transients
        # OOMed next to 12 GB of resident int8 params (E2E_r03)
        view_scan=low_hbm,
        tile_batch=8 if low_hbm else 64,
    )
    if method == "reproject":
        # fused visibility + paste: one jitted program instead of the eager
        # view_visibility -> paste composition (parity-tested equal); its
        # shapes depend only on (uv_size, view grid), so one compile serves
        # every mesh bucket
        vp_kwargs = dict(
            perspective=perspective,
            ray_normal_angle_threshold=ray_normal_angle_threshold,
            depth_eps=depth_eps, visibility_mode=visibility_mode,
            ring_kernels=(3, 5),
            priority=bake_kwargs.get("priority", VIEW_PRIORITY),
            kernel_size_boundary=bake_kwargs.get("kernel_size_boundary", 3),
            kernel_size_boundary_blur=bake_kwargs.get(
                "kernel_size_boundary_blur", 3),
        )
        maskv = mv_out["mask"] & mv_out["mask_visible"]
        if low_hbm:
            assert bake_kwargs.get("paste_mode", "priority") == "priority", \
                "low_hbm bake supports priority paste only"
            paste_fn = partial(
                _visibility_paste_scan,
                row_chunk=bake_kwargs.get("low_hbm_row_chunk", 256),
            )
            # the scanned priority paste consumes only mvp/w2cs/depth/tri
            # + maskv: drop position/face_normal/cos_ray_normal (~0.9 GB
            # of [M, H, W, 3] f32 at SR-scaled 2048² views) and drain the
            # queue so the frees land before the paste's dispatch-time
            # allocations (r04 --sr paste OOM)
            mv_out = {k: mv_out[k] for k in ("mvp", "w2cs", "depth", "tri")}
            np.asarray(maskv.ravel()[0])
        else:
            paste_fn = partial(
                _visibility_paste,
                paste_mode=bake_kwargs.get("paste_mode", "priority"),
            )
        color_cur, mask_cur, boundary, visible_any, vis_pv = paste_fn(
            uv_out["position"], uv_out["mask"], uv_out["tri"],
            uv_out["face_normal"],
            mv_out["mvp"], mv_out["w2cs"], c2ws, mv_out["depth"],
            mv_out["tri"], maskv,
            view_images,
            **vp_kwargs,
        )
        out = _finish_reproject_blur(
            uv_out, color_cur, mask_cur, boundary, visible_any,
            method=bake_kwargs.get("method", "lens"),
            kernel_size_blur=bake_kwargs.get("kernel_size_blur", 5),
            knn_max_ref=knn_max_ref, knn_chunk=knn_chunk,
            query_field=bake_kwargs.get("query_field"),
            fill_k=bake_kwargs.get("fill_k", 1),
            fill_relax_iters=bake_kwargs.get("fill_relax_iters", 0),
            query_field_auto=bake_kwargs.get("query_field_auto"),
        )
        out["visible_per_view"] = vis_pv
        out["mask_visible_any"] = visible_any
        return out
    # reproject-only knobs that may legally ride in bake_kwargs (the assert
    # above admits geometry_size == (H, W)) but that bake_kdtree /
    # bake_reproject_blending do not accept — drop before forwarding
    for consumed in ("geometry_size", "low_hbm_row_chunk", "query_field_auto"):
        bake_kwargs.pop(consumed, None)
    vis_out = view_visibility(
        uv_out, mv_out, c2ws, view_images,
        perspective=perspective,
        ray_normal_angle_threshold=ray_normal_angle_threshold,
        depth_eps=depth_eps,
        visibility_mode=visibility_mode,
    )
    if method == "reproject_blending":
        out = bake_reproject_blending(
            uv_out, vis_out,
            knn_max_ref=knn_max_ref, knn_chunk=knn_chunk, **bake_kwargs,
        )
    else:
        out = bake_kdtree(
            uv_out, vis_out, mv_out, view_images,
            knn_max_ref=knn_max_ref, knn_chunk=knn_chunk, **bake_kwargs,
        )
    out["visible_per_view"] = vis_out["visible"]
    out["mask_visible_any"] = vis_out["visible"].any(axis=0)
    return out
