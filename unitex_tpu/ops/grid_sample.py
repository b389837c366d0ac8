"""Bilinear grid sampling (torch ``F.grid_sample`` semantics) in jnp.

The reference samples view images at projected NDC coordinates
(renderer_inverse.py uv_to_pcd, grid_sample with align_corners=False) and
textures at UVs (renderer_base map_attr).  This implements the same
conventions: input grid in [-1, 1] NDC, align_corners=False pixel mapping
``pix = (g + 1) / 2 * S - 0.5``, zeros or border padding.
"""

from __future__ import annotations

from typing import Literal

import jax.numpy as jnp


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: Literal["zeros", "border"] = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """image [H, W, C], grid [..., 2] with (x, y) in [-1, 1] -> [..., C].

    x indexes W (columns), y indexes H (rows) — same as torch grid_sample on
    an NCHW image with an (x, y) grid.
    """
    H, W = image.shape[:2]
    x, y = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (W - 1)
        fy = (y + 1.0) * 0.5 * (H - 1)
    else:
        fx = (x + 1.0) * 0.5 * W - 0.5
        fy = (y + 1.0) * 0.5 * H - 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def fetch(xi, yi):
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        val = image[yc, xc]
        if padding_mode == "zeros":
            inb = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))[..., None]
            val = jnp.where(inb, val, 0.0)
        return val

    v00 = fetch(x0, y0)
    v01 = fetch(x0 + 1, y0)
    v10 = fetch(x0, y0 + 1)
    v11 = fetch(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def sample_texture(texture: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample a texture stored image-style (row 0 = top = v=1) at v-up UVs in
    [0, 1]: texture [H, W, C], uv [..., 2] -> [..., C]."""
    grid = jnp.stack([uv[..., 0] * 2.0 - 1.0, 1.0 - uv[..., 1] * 2.0], axis=-1)
    return grid_sample(texture, grid, padding_mode="border")
