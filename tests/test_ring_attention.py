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


class TestFluxSP:
    """VERDICT #5: ring attention as a MODEL capability — the sequence-
    sharded FLUX forward (models/flux/sp.py) matches the replicated
    forward."""

    def _setup(self, S_img=32, S_txt=8):
        from unitex_tpu.models.flux import FluxConfig, init_flux_params
        import numpy as np

        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), cfg)
        rng = np.random.default_rng(2)
        B = 2
        batch = dict(
            hidden_states=jnp.asarray(
                rng.normal(size=(B, S_img, cfg.in_channels)), jnp.float32),
            encoder_hidden_states=jnp.asarray(
                rng.normal(size=(B, S_txt, cfg.joint_attention_dim)),
                jnp.float32),
            timestep=jnp.asarray([0.5, 0.9], jnp.float32),
            pooled_projections=jnp.asarray(
                rng.normal(size=(B, cfg.pooled_projection_dim)), jnp.float32),
            img_ids=jnp.asarray(
                rng.integers(0, 16, size=(S_img, 3)), jnp.float32),
            txt_ids=jnp.zeros((S_txt, 3), jnp.float32),
            guidance=jnp.asarray([3.5, 3.5], jnp.float32),
        )
        return cfg, params, batch

    def test_forward_sp_matches_replicated_8dev(self):
        from unitex_tpu.models.flux.model import flux_forward
        from unitex_tpu.models.flux.sp import flux_forward_sp

        cfg, params, batch = self._setup()
        ref = flux_forward(params, cfg, **batch)
        mesh = make_mesh(data=1, model=8, axis_names=("data", "model"))
        with jax.set_mesh(mesh):
            out = flux_forward_sp(params, cfg, **batch, seq_axis="model")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_forward_sp_jit_explicit_mesh(self):
        from unitex_tpu.models.flux.model import flux_forward
        from unitex_tpu.models.flux.sp import flux_forward_sp
        from functools import partial

        cfg, params, batch = self._setup(S_img=16, S_txt=4)
        ref = flux_forward(params, cfg, **batch)
        mesh = make_mesh(data=2, model=4, axis_names=("data", "seq"))
        fn = jax.jit(partial(flux_forward_sp, cfg=cfg, mesh=mesh,
                             seq_axis="seq"))
        out = fn(params, **batch)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_sp_divisibility_assert(self):
        import pytest
        from unitex_tpu.models.flux.sp import flux_forward_sp

        cfg, params, batch = self._setup(S_img=12, S_txt=8)
        mesh = make_mesh(data=1, model=8, axis_names=("data", "model"))
        with pytest.raises(AssertionError):
            with jax.set_mesh(mesh):
                flux_forward_sp(params, cfg, **batch, seq_axis="model")

    def test_sp_composes_with_tp(self):
        """VERDICT r03 #4: SP x TP on a (seq x model) mesh — the shard_map
        goes manual over 'seq' only (axis_names), params keep their
        Megatron flux_param_shardings over 'model', and the XLA SPMD
        partitioner inserts the TP collectives inside each sequence shard.
        Must match the replicated forward exactly (the >100k-token layout
        where neither the sequence nor the 12B weights fit one chip)."""
        from jax.sharding import Mesh
        from unitex_tpu.models.flux.model import flux_forward
        from unitex_tpu.models.flux.sp import flux_forward_sp
        from unitex_tpu.parallel.sharding import (
            flux_param_shardings, shard_params,
        )

        cfg, params, batch = self._setup(S_img=16, S_txt=4)
        ref = flux_forward(params, cfg, **batch)
        mesh = Mesh(
            np.asarray(jax.devices()).reshape(2, 4), ("seq", "model"))
        tp_params = shard_params(params, flux_param_shardings(params, mesh))
        out = flux_forward_sp(tp_params, cfg, **batch, mesh=mesh,
                              seq_axis="seq", tp_axis="model")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_sp_tp_gradients_match_replicated(self):
        """SP x TP composed TRAINING: grads w.r.t. the TP-sharded params
        through the manual-seq shard_map match the replicated grads."""
        from jax.sharding import Mesh
        from unitex_tpu.models.flux.model import flux_forward
        from unitex_tpu.models.flux.sp import flux_forward_sp
        from unitex_tpu.parallel.sharding import (
            flux_param_shardings, shard_params,
        )

        cfg, params, batch = self._setup(S_img=16, S_txt=4)
        mesh = Mesh(
            np.asarray(jax.devices()).reshape(2, 4), ("seq", "model"))
        tp_params = shard_params(params, flux_param_shardings(params, mesh))

        def loss_ref(p):
            return jnp.mean(flux_forward(p, cfg, **batch) ** 2)

        def loss_sp_tp(p):
            return jnp.mean(
                flux_forward_sp(p, cfg, **batch, mesh=mesh,
                                seq_axis="seq", tp_axis="model") ** 2)

        g_ref = jax.grad(loss_ref)(params)
        g = jax.grad(loss_sp_tp)(tp_params)
        errs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), g_ref, g)
        assert max(jax.tree.leaves(errs)) < 5e-5

    def test_sp_gradients_match_replicated(self):
        """SP is a TRAINING capability too: the ring schedule's fori_loop
        has a static trip count, so reverse-mode differentiates through
        the ppermutes — parameter gradients of the sequence-sharded
        forward match the replicated forward's."""
        from unitex_tpu.models.flux.model import flux_forward
        from unitex_tpu.models.flux.sp import flux_forward_sp

        cfg, params, batch = self._setup()
        mesh = make_mesh(data=1, model=8, axis_names=("data", "model"))

        def loss_ref(p):
            return jnp.mean(flux_forward(p, cfg, **batch) ** 2)

        def loss_sp(p):
            return jnp.mean(
                flux_forward_sp(p, cfg, **batch, mesh=mesh,
                                seq_axis="model") ** 2)

        g_ref = jax.grad(loss_ref)(params)
        g_sp = jax.grad(loss_sp)(params)
        errs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), g_ref, g_sp)
        assert max(jax.tree.leaves(errs)) < 5e-5


class TestUlysses:
    """Ulysses SP (two all_to_all reshards, head-sharded full-seq
    attention) — the default sp_mode when heads divide the axis."""

    def test_op_matches_reference_8dev(self):
        from unitex_tpu.ops.ring_attention import ulysses_attention

        mesh = make_mesh(data=1, model=8, axis_names=("data", "model"))
        rng = np.random.default_rng(3)
        B, S, H, D = 2, 64, 8, 32
        q, k, v = (
            jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
            for _ in range(3)
        )
        ref = attention_reference(q, k, v)
        with jax.set_mesh(mesh):
            out = ulysses_attention(q, k, v, mesh, "model")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def _setup8(self):
        """FluxConfig.tiny with 8 heads so ulysses divides an 8-axis."""
        import dataclasses
        from unitex_tpu.models.flux import FluxConfig, init_flux_params

        cfg = dataclasses.replace(FluxConfig.tiny(), num_attention_heads=8)
        params = init_flux_params(jax.random.key(0), cfg)
        rng = np.random.default_rng(4)
        B, S_img, S_txt = 2, 32, 8
        batch = dict(
            hidden_states=jnp.asarray(
                rng.normal(size=(B, S_img, cfg.in_channels)), jnp.float32),
            encoder_hidden_states=jnp.asarray(
                rng.normal(size=(B, S_txt, cfg.joint_attention_dim)),
                jnp.float32),
            timestep=jnp.asarray([0.5, 0.9], jnp.float32),
            pooled_projections=jnp.asarray(
                rng.normal(size=(B, cfg.pooled_projection_dim)), jnp.float32),
            img_ids=jnp.asarray(
                rng.integers(0, 16, size=(S_img, 3)), jnp.float32),
            txt_ids=jnp.zeros((S_txt, 3), jnp.float32),
            guidance=jnp.asarray([3.5, 3.5], jnp.float32),
        )
        return cfg, params, batch

    def test_flux_sp_ulysses_matches_replicated(self):
        from unitex_tpu.models.flux.model import flux_forward
        from unitex_tpu.models.flux.sp import flux_forward_sp

        cfg, params, batch = self._setup8()
        ref = flux_forward(params, cfg, **batch)
        mesh = make_mesh(data=1, model=8, axis_names=("data", "model"))
        with jax.set_mesh(mesh):
            out = flux_forward_sp(params, cfg, **batch, seq_axis="model",
                                  sp_mode="ulysses")
            # auto picks ulysses here (8 heads % 8 devices == 0) — same path
            out_auto = flux_forward_sp(params, cfg, **batch,
                                       seq_axis="model", sp_mode="auto")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(out_auto), np.asarray(ref), atol=3e-5)

    def test_flux_sp_ulysses_gradients(self):
        """all_to_all is linear, so reverse-mode differentiates through
        both reshards — ulysses SP trains."""
        from unitex_tpu.models.flux.model import flux_forward
        from unitex_tpu.models.flux.sp import flux_forward_sp

        cfg, params, batch = self._setup8()
        mesh = make_mesh(data=1, model=8, axis_names=("data", "model"))

        def loss_ref(p):
            return jnp.mean(flux_forward(p, cfg, **batch) ** 2)

        def loss_sp(p):
            return jnp.mean(
                flux_forward_sp(p, cfg, **batch, mesh=mesh,
                                seq_axis="model", sp_mode="ulysses") ** 2)

        g_ref = jax.grad(loss_ref)(params)
        g_sp = jax.grad(loss_sp)(params)
        errs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), g_ref, g_sp)
        assert max(jax.tree.leaves(errs)) < 5e-5
