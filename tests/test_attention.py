"""Pallas flash-attention parity vs the jnp reference (interpret mode on
CPU — the dual-implementation test pattern of SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from unitex_tpu.ops.attention import attention_reference, flash_attention


@pytest.mark.parametrize("shape", [(1, 512, 2, 128), (2, 1024, 3, 128)])
def test_flash_matches_reference(shape):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3)
    )
    ref = attention_reference(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, block_q=256, block_k=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_awkward_length_falls_back():
    rng = np.random.default_rng(1)
    shape = (1, 100, 2, 64)  # not blockable -> reference fallback
    q, k, v = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3)
    )
    out = flash_attention(q, k, v)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_softmax_scale_invariance():
    """Adding a constant to all logits (q shifted along a constant k
    direction) must not change attention output."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 256, 1, 128)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 256, 1, 128)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 256, 1, 128)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        a = flash_attention(q, k, v, block_q=128, block_k=128)
        b = flash_attention(q * 1.0, k, v, block_q=256, block_k=256)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_flash_gradients_match_reference():
    """custom_vjp backward parity vs autodiff through the jnp reference."""
    rng = np.random.default_rng(5)
    shape = (1, 256, 2, 128)
    q, k, v = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3)
    )
    g_out = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) * g_out)

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128) * g_out)

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    flash_grads = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(flash_grads, ref_grads, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4,
            err_msg=f"d{name} mismatch",
        )


def test_qk8_serving_kernel_close_to_reference():
    """int8-QK serving kernel: per-row symmetric quantization of q/k gives
    ~1% logit noise that the softmax mostly renormalizes away."""
    from unitex_tpu.ops.attention import flash_attention_qk8

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(1, 512, 4, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 512, 4, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 512, 4, 64)).astype(np.float32))
    ref = attention_reference(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_qk8(q, k, v, block_q=256, block_k=256)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_qk8_awkward_length_falls_back():
    from unitex_tpu.ops.attention import flash_attention_qk8

    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.normal(size=(1, 100, 2, 32)).astype(np.float32))
    out = flash_attention_qk8(q, q, q)
    ref = attention_reference(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pick_blocks_largest_divisor():
    """Non-dividing requests take the largest divisor of S, not the gcd:
    at S=14336 (an off-design conditioning mix; the pipeline's own joint
    sequence is 13824, which divides 1536) the 1536 default must map to
    1024/1024 (142-156 TF/s on v5e) rather than gcd 512/512 (79 TF/s)."""
    from unitex_tpu.ops.attention import _pick_blocks

    assert _pick_blocks(14336, 1536, 1536) == (1024, 1024, True)
    # dividing requests pass through untouched
    assert _pick_blocks(13824, 1536, 1536) == (1536, 1536, True)
    # tiny/prime sequences report not-ok (dispatcher falls back to jnp)
    _, _, ok = _pick_blocks(101, 1536, 1536)
    assert not ok


def test_pallas_backward_matches_xla_backward():
    """The Pallas dq/dk/dv kernels against the XLA chunked-recompute
    backward on identical residuals."""
    from unitex_tpu.ops import attention as at

    rng = np.random.default_rng(11)
    BH, S, D = 3, 512, 64
    qr = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    kr = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32))
    scale = 1.0 / np.sqrt(D)
    with pltpu.force_tpu_interpret_mode():
        out, lse = at._flash_forward(qr, kr, vr, scale, 128, 128)
        dq_p, dk_p, dv_p = at._flash_backward_pallas(
            qr, kr, vr, out, lse, g, scale, 128, 256)
    dq_x, dk_x, dv_x = at._flash_core_bwd_xla(
        scale, 128, 128, (qr, kr, vr, out, lse), g)
    np.testing.assert_allclose(np.asarray(dq_p), np.asarray(dq_x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk_p), np.asarray(dk_x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_x), atol=2e-4)


def test_bwd_fallback_on_awkward_lengths():
    """S that doesn't tile into 128-multiples must still differentiate
    (the XLA fallback path)."""
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.normal(size=(1, 96, 2, 32)).astype(np.float32))

    def loss(q):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(flash_attention(q, q, q) ** 2)

    gq = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(gq)).all()
