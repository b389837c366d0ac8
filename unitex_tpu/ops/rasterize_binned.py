"""Tile-binned rasterization — the production path for large meshes.

The brute-force kernel in ops/rasterize.py evaluates every (pixel, face)
pair: O(H·W·F) is fine for the 6x512² conditioning renders of small meshes
but hits seconds per view at the 200k-face budget.  This module adds
device-side binning, entirely in XLA (sort + segment compaction — no
dynamic shapes):

1.  per-triangle screen bbox -> the set of screen tiles it may cover;
    each triangle emits up to ``max_tiles_per_tri`` (tile, tri) entries
    (normalized meshes have tiny triangles; the few large ones fall into a
    separate "big" list tested against every tile);
2.  entries are sorted by tile id; ``searchsorted`` segment offsets turn
    the sorted list into a dense [n_tiles, bin_capacity] triangle table
    (overflow simply drops lowest-priority entries — capacity is sized for
    the face budget);
3.  a vmapped per-tile kernel z-buffers only its own candidates:
    O(tile_px · (bin + n_big)) — a ~50x work reduction at 512²/200k.

Same Rast output contract as ops/rasterize.rasterize, which dispatches here
above a face-count threshold.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .rasterize import Rast, _triangle_setup


def _edge_rast_subset(
    pix_g, z_g, w_g, valid_g, tri_ids, x0, y0, th, tw
):
    """Rasterize the triangle subset ``tri_ids`` (with -1 padding) into a
    [th, tw] tile at origin (x0, y0).  All gathers are data-parallel."""
    safe = jnp.maximum(tri_ids, 0)
    pix = pix_g[safe]            # [K, 3, 2]
    z = z_g[safe]
    w = w_g[safe]
    valid = valid_g[safe] & (tri_ids >= 0)

    ys = y0 + jnp.arange(th, dtype=jnp.float32) + 0.5
    xs = x0 + jnp.arange(tw, dtype=jnp.float32) + 0.5
    px = jnp.broadcast_to(xs[None, :], (th, tw)).reshape(-1)
    py = jnp.broadcast_to(ys[:, None], (th, tw)).reshape(-1)
    P = th * tw

    ax, ay = pix[:, 0, 0], pix[:, 0, 1]
    bx, by = pix[:, 1, 0], pix[:, 1, 1]
    cx, cy = pix[:, 2, 0], pix[:, 2, 1]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)

    def edge(x1, y1, x2, y2):
        return (x2 - x1)[None, :] * (py[:, None] - y1[None, :]) - (
            (y2 - y1)[None, :] * (px[:, None] - x1[None, :])
        )

    e0 = edge(bx, by, cx, cy)
    e1 = edge(cx, cy, ax, ay)
    e2 = edge(ax, ay, bx, by)
    s = jnp.sign(area)[None, :]
    inside = (e0 * s >= 0) & (e1 * s >= 0) & (e2 * s >= 0)
    inside &= (jnp.abs(area) > 1e-12)[None, :] & valid[None, :]
    b0 = e0 * inv_area[None, :]
    b1 = e1 * inv_area[None, :]
    b2 = e2 * inv_area[None, :]
    zs = b0 * z[None, :, 0] + b1 * z[None, :, 1] + b2 * z[None, :, 2]
    inside &= (zs >= -1.0) & (zs <= 1.0)
    z_masked = jnp.where(inside, zs, jnp.inf)
    best = jnp.argmin(z_masked, axis=1)
    pidx = jnp.arange(P)
    zb = z_masked[pidx, best]
    hit = jnp.isfinite(zb)
    tri = jnp.where(hit, tri_ids[best], -1)
    wb = w[best]
    bb = jnp.stack([b0[pidx, best], b1[pidx, best], b2[pidx, best]], axis=-1)
    pc = bb / wb
    pc = pc / jnp.sum(pc, axis=-1, keepdims=True)
    bary = jnp.where(hit[:, None], pc[:, 1:], 0.0)
    return (
        bary.reshape(th, tw, 2).astype(jnp.float32),
        jnp.where(hit, zb, 1.0).reshape(th, tw).astype(jnp.float32),
        tri.reshape(th, tw).astype(jnp.int32),
        zb.reshape(th, tw),  # raw (inf when miss) for cross-pass merging
    )


@partial(
    jax.jit,
    static_argnames=(
        "resolution", "tile", "max_tiles_per_tri", "bin_capacity",
        "n_big", "tile_batch",
    ),
)
def rasterize_binned(
    verts_clip: jnp.ndarray,
    faces: jnp.ndarray,
    resolution: Tuple[int, int],
    tile: int = 32,
    max_tiles_per_tri: int = 8,
    bin_capacity: int = 1024,
    n_big: int = 256,
    tile_batch: int = 64,
) -> Rast:
    """Tile-binned z-buffer rasterization; same contract as ``rasterize``."""
    H, W = resolution
    assert H % tile == 0 and W % tile == 0
    TX, TY = W // tile, H // tile
    T = TX * TY
    # small images have fewer tiles than the default map batch; the batch
    # must divide T (tids.reshape(-1, tile_batch) below)
    tile_batch = math.gcd(tile_batch, T)
    F = faces.shape[0]

    pix, z_ndc, w_clip, valid = _triangle_setup(verts_clip, faces, H, W)

    # ---- tile bboxes per triangle
    xmin = jnp.clip(jnp.floor(pix[..., 0].min(axis=1) / tile), 0, TX - 1)
    xmax = jnp.clip(jnp.floor(pix[..., 0].max(axis=1) / tile), 0, TX - 1)
    ymin = jnp.clip(jnp.floor(pix[..., 1].min(axis=1) / tile), 0, TY - 1)
    ymax = jnp.clip(jnp.floor(pix[..., 1].max(axis=1) / tile), 0, TY - 1)
    # cull triangles entirely off screen
    on_screen = (
        (pix[..., 0].max(axis=1) >= 0)
        & (pix[..., 0].min(axis=1) < W)
        & (pix[..., 1].max(axis=1) >= 0)
        & (pix[..., 1].min(axis=1) < H)
        & valid
    )
    bw = (xmax - xmin + 1).astype(jnp.int32)
    bh = (ymax - ymin + 1).astype(jnp.int32)
    n_tiles_tri = bw * bh
    small = on_screen & (n_tiles_tri <= max_tiles_per_tri)

    # ---- big triangles: top-n_big by covered tile count, tested everywhere
    big_score = jnp.where(on_screen & ~small, n_tiles_tri, 0)
    _, big_ids = jax.lax.top_k(big_score, min(n_big, F))
    big_ids = jnp.where(
        jnp.take(big_score, big_ids) > 0, big_ids, -1
    ).astype(jnp.int32)

    # ---- emit (tile, tri) entries for small triangles
    r = jnp.arange(max_tiles_per_tri, dtype=jnp.int32)
    dy = r[None, :] // jnp.maximum(bw[:, None], 1)
    dx = r[None, :] % jnp.maximum(bw[:, None], 1)
    entry_valid = small[:, None] & (dy < bh[:, None])
    tx = xmin.astype(jnp.int32)[:, None] + dx
    ty = ymin.astype(jnp.int32)[:, None] + dy
    tile_id = jnp.where(entry_valid, ty * TX + tx, T)  # T = drop sentinel
    tri_id = jnp.broadcast_to(
        jnp.arange(F, dtype=jnp.int32)[:, None], tile_id.shape
    )
    tile_flat = tile_id.reshape(-1)
    tri_flat = tri_id.reshape(-1)

    # sort candidates by (tile, nearest-z): when a bin overflows its static
    # capacity, the dropped entries are the FARTHEST triangles in the tile —
    # the ones most likely occluded anyway — instead of whichever happened
    # to carry the highest face index (z-aware graceful degradation; it is
    # what lets the capacity heuristic in ops/rasterize.py run without the
    # old 8x headroom).  Composite int32 key: tile * 2^16 + z16, exact for
    # tile counts up to 16384 (a 4096^2 image at tile 32).
    z_near = jnp.clip(z_ndc.min(axis=1), -1.0, 1.0)          # [F]
    z16 = ((z_near + 1.0) * 0.5 * 65535.0).astype(jnp.int32)
    key = tile_flat * 65536 + jnp.take(z16, tri_flat)
    order = jnp.argsort(key)
    tile_sorted = tile_flat[order]
    tri_sorted = tri_flat[order]

    # ---- dense [T, bin_capacity] table via segment positions
    seg_start = jnp.searchsorted(tile_sorted, jnp.arange(T, dtype=tile_sorted.dtype))
    pos = jnp.arange(tile_sorted.shape[0]) - seg_start[jnp.minimum(tile_sorted, T - 1)]
    keep = (tile_sorted < T) & (pos < bin_capacity)
    table = jnp.full((T, bin_capacity), -1, jnp.int32)
    # rejected entries are routed to row T (out of bounds) so mode="drop"
    # discards them instead of clobbering table[0, 0]
    table = table.at[
        jnp.where(keep, tile_sorted, T),
        jnp.where(keep, pos, 0),
    ].set(tri_sorted, mode="drop")

    # ---- per-tile rasterization (batched to bound gather memory)
    def do_tile(tidx):
        iy = tidx // TX
        ix = tidx % TX
        ids = jnp.concatenate([table[tidx], big_ids])
        bary, z, tri, zraw = _edge_rast_subset(
            pix, z_ndc, w_clip, valid,
            ids,
            (ix * tile).astype(jnp.float32),
            (iy * tile).astype(jnp.float32),
            tile, tile,
        )
        return bary, z, tri

    tids = jnp.arange(T, dtype=jnp.int32)
    barys, zs, tris = jax.lax.map(
        jax.vmap(do_tile), tids.reshape(-1, tile_batch)
    )
    barys = barys.reshape(T, tile, tile, 2)
    zs = zs.reshape(T, tile, tile)
    tris = tris.reshape(T, tile, tile)

    def untile(a):
        a = a.reshape(TY, TX, tile, tile, *a.shape[3:])
        a = jnp.moveaxis(a, 2, 1)
        return a.reshape(H, W, *a.shape[4:])

    return Rast(untile(barys), untile(zs), untile(tris))
