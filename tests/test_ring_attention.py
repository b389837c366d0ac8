import jax
import jax.numpy as jnp
import numpy as np

from unitex_tpu.ops.attention import attention_reference
from unitex_tpu.ops.ring_attention import ring_attention
from unitex_tpu.parallel.mesh import make_mesh


def test_ring_matches_reference_8dev():
    mesh = make_mesh(data=1, model=8, axis_names=("data", "model"))
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 64, 2, 32
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
        for _ in range(3)
    )
    ref = attention_reference(q, k, v)
    with jax.set_mesh(mesh):
        out = ring_attention(q, k, v, mesh, "model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_matches_reference_2dev():
    mesh = make_mesh(data=4, model=2, axis_names=("data", "model"))
    rng = np.random.default_rng(1)
    B, S, H, D = 1, 32, 4, 16
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
        for _ in range(3)
    )
    ref = attention_reference(q, k, v)
    with jax.set_mesh(mesh):
        out = ring_attention(q, k, v, mesh, "model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
