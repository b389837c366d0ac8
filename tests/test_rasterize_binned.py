"""Binned rasterizer parity vs the brute-force reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.camera import generate_box_views_c2ws, generate_intrinsics, get_mvp
from unitex_tpu.geometry.primitives import make_icosphere, make_torus
from unitex_tpu.geometry.uv_atlas import unwrap_atlas
from unitex_tpu.ops.rasterize import rasterize
from unitex_tpu.ops.rasterize_binned import rasterize_binned


def _clip(mesh, view=0, scale=0.9):
    c2ws = generate_box_views_c2ws(2.8)
    intr = generate_intrinsics(1.0, 1.0, fov=False)
    mvp = get_mvp(c2ws[view][None], intr[None], perspective=False)[0]
    v = jnp.asarray(mesh.vertices * scale)
    vh = jnp.concatenate([v, jnp.ones_like(v[:, :1])], axis=-1)
    return vh @ mvp.T


@pytest.mark.parametrize("maker,view", [(make_icosphere, 0), (make_torus, 1), (make_icosphere, 4)])
def test_binned_matches_brute(maker, view):
    mesh = maker() if maker is make_torus else maker(3)
    clip = _clip(mesh, view)
    faces = jnp.asarray(mesh.faces)
    brute = rasterize(clip, faces, (64, 64), binned_threshold=0)
    binned = rasterize_binned(clip, faces, (64, 64), tile=32, bin_capacity=2048, tile_batch=2)
    tb = np.asarray(brute.tri)
    tn = np.asarray(binned.tri)
    # identical visibility and triangle ids
    same = (tb == tn).mean()
    assert same > 0.999, f"tri mismatch {1-same:.4f}"
    m = tb == tn
    np.testing.assert_allclose(
        np.asarray(brute.bary)[m], np.asarray(binned.bary)[m], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(brute.z)[m], np.asarray(binned.z)[m], atol=1e-5
    )


def test_binned_uv_rasterization():
    mesh = unwrap_atlas(make_icosphere(3), size=128, gutter=2)
    uv = jnp.asarray(mesh.uv)
    ndc = jnp.stack([uv[:, 0] * 2 - 1, 1 - uv[:, 1] * 2], axis=-1)
    clip = jnp.concatenate(
        [ndc, jnp.zeros_like(ndc[:, :1]), jnp.ones_like(ndc[:, :1])], axis=-1
    )
    faces_uv = jnp.asarray(mesh.faces_uv)
    brute = rasterize(clip, faces_uv, (128, 128), binned_threshold=0)
    binned = rasterize_binned(clip, faces_uv, (128, 128), tile=32, tile_batch=4)
    same = (np.asarray(brute.tri) == np.asarray(binned.tri)).mean()
    assert same > 0.999


def test_big_triangle_fallback():
    """A full-screen triangle (bbox >> max_tiles_per_tri) must still render
    through the big-triangle path."""
    verts = jnp.asarray(
        [[-3.0, -3.0, 0.0, 1.0], [3.0, -3.0, 0.0, 1.0], [0.0, 3.0, 0.0, 1.0]]
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    out = rasterize_binned(verts, faces, (64, 64), tile=32, tile_batch=2)
    mask = np.asarray(out.tri >= 0)
    assert mask[32, 32]
    assert mask.mean() > 0.4


def test_tile_batch_static_through_outer_jit():
    """Regression: tile_batch is consumed by Python-level math (gcd) in the
    binned kernel, so `rasterize` must mark it static — left dynamic, the
    concrete int became a tracer when rasterize was called from INSIDE an
    outer jit above the binned face threshold (mv_render with the low-HBM
    tile_batch=8 crashed the full-12B E2E run with
    TracerIntegerConversionError).  Trace-only (eval_shape): no compile."""
    import jax

    F = 8200  # > binned_threshold -> takes the rasterize_binned path
    verts = jax.ShapeDtypeStruct((3 * F, 4), jnp.float32)
    faces = jax.ShapeDtypeStruct((F, 3), jnp.int32)

    def outer(v, f):
        return rasterize(v, f, (64, 64), tile_batch=8).tri

    jax.eval_shape(jax.jit(outer), verts, faces)  # must not raise
