"""Pipeline parallelism (parallel/pipeline.py, models/flux/pp.py).

GPipe schedule parity vs the sequential scan, identity zero-block padding,
DPxPP composition, and gradients through the pipeline — all on the 8-device
CPU mesh (SURVEY.md §4 multi-device test pattern)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from unitex_tpu.models.flux.config import FluxConfig
from unitex_tpu.models.flux.model import flux_forward, init_flux_params
from unitex_tpu.models.flux.pipeline import latent_image_ids
from unitex_tpu.models.flux.pp import flux_forward_pp
from unitex_tpu.parallel.pipeline import (
    pad_stacked_blocks,
    pipeline_apply,
)


def _pipe_mesh(pipe, data=None):
    devs = np.asarray(jax.devices()[: pipe * (data or 1)])
    if data is None:
        return Mesh(devs.reshape(pipe), ("pipe",))
    return Mesh(devs.reshape(data, pipe), ("data", "pipe"))


class TestGPipe:
    def _toy(self, L=8, M=4, B=2, D=8, seed=0):
        rng = np.random.default_rng(seed)
        w = jnp.asarray(rng.normal(size=(L, D, D)) / np.sqrt(D), jnp.float32)
        b = jnp.asarray(rng.normal(size=(L, D)) * 0.1, jnp.float32)
        x = jnp.asarray(rng.normal(size=(M, B, D)), jnp.float32)
        aux = jnp.asarray(rng.normal(size=(M, B, D)) * 0.1, jnp.float32)
        shared = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
        stacked = {"w": w, "b": b}

        def stage(params, xx, aa, sh):
            def body(carry, blk):
                y = jnp.tanh(carry @ blk["w"] + blk["b"] + aa + sh)
                return y, None

            y, _ = jax.lax.scan(body, xx, params)
            return y

        def sequential(params, xs, auxs, sh):
            return jnp.stack(
                [stage(params, xs[m], auxs[m], sh) for m in range(M)]
            )

        return stacked, x, aux, shared, stage, sequential

    @pytest.mark.parametrize("pipe", [2, 4, 8])
    def test_parity(self, pipe):
        stacked, x, aux, shared, stage, sequential = self._toy()
        mesh = _pipe_mesh(pipe)
        got = pipeline_apply(stage, stacked, x, aux, shared, mesh)
        want = sequential(stacked, x, aux, shared)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_data_axis(self):
        stacked, x, aux, shared, stage, sequential = self._toy(B=4)
        mesh = _pipe_mesh(4, data=2)
        got = pipeline_apply(
            stage, stacked, x, aux, shared, mesh, data_axis="data"
        )
        want = sequential(stacked, x, aux, shared)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_grad_parity(self):
        stacked, x, aux, shared, stage, sequential = self._toy(L=4, M=2)
        mesh = _pipe_mesh(2)

        def loss_pp(p):
            return jnp.sum(pipeline_apply(stage, p, x, aux, shared, mesh) ** 2)

        def loss_seq(p):
            return jnp.sum(sequential(p, x, aux, shared) ** 2)

        g_pp = jax.grad(loss_pp)(stacked)
        g_seq = jax.grad(loss_seq)(stacked)
        for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_pad_identity(self):
        stacked, x, aux, shared, stage, sequential = self._toy()
        # zero toy blocks are NOT identities for this tanh stage, so pad a
        # real flux stack instead — covered in TestFluxPP; here just check
        # shapes/order of the padding helper
        padded = pad_stacked_blocks(stacked, 3)
        assert jax.tree.leaves(padded)[0].shape[0] == 9
        np.testing.assert_array_equal(
            np.asarray(padded["w"][:8]), np.asarray(stacked["w"])
        )
        assert float(jnp.abs(padded["w"][8:]).max()) == 0.0


class TestFluxPP:
    def _inputs(self, cfg, B=4, seed=0):
        rng = np.random.default_rng(seed)
        img_ids = latent_image_ids(2, 4)
        S_img, S_txt = img_ids.shape[0], 6
        hidden = jnp.asarray(
            rng.normal(size=(B, S_img, cfg.in_channels)), jnp.float32
        )
        ctx = jnp.asarray(
            rng.normal(size=(B, S_txt, cfg.joint_attention_dim)), jnp.float32
        )
        txt_ids = jnp.zeros((S_txt, 3), jnp.float32)
        t = jnp.linspace(0.2, 0.8, B)
        pooled = jnp.asarray(
            rng.normal(size=(B, cfg.pooled_projection_dim)), jnp.float32
        )
        guidance = jnp.full((B,), 3.5, jnp.float32)
        return hidden, ctx, t, pooled, img_ids, txt_ids, guidance

    def test_forward_parity_with_identity_padding(self):
        # 2 dual + 2 single blocks over pipe=4: both stacks pad 2 -> 4 with
        # zero blocks, which must be EXACT identities (AdaLN-Zero gates)
        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), cfg)
        args = self._inputs(cfg)
        want = flux_forward(params, cfg, *args)
        mesh = _pipe_mesh(4)
        got = flux_forward_pp(params, cfg, *args, mesh=mesh, n_micro=2)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )

    def test_forward_parity_dp_pp(self):
        cfg = dataclasses.replace(
            FluxConfig.tiny(), num_layers=4, num_single_layers=4
        )
        params = init_flux_params(jax.random.key(1), cfg)
        args = self._inputs(cfg, B=4, seed=1)
        want = flux_forward(params, cfg, *args)
        mesh = _pipe_mesh(4, data=2)
        got = flux_forward_pp(
            params, cfg, *args, mesh=mesh, n_micro=2, data_axis="data"
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )

    def test_kv_keep_idx(self):
        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(2), cfg)
        args = self._inputs(cfg, B=2, seed=2)
        keep = jnp.asarray([0, 1, 2, 3, 5, 7, 9, 11], jnp.int32)
        want = flux_forward(params, cfg, *args, kv_keep_idx=keep)
        mesh = _pipe_mesh(2)
        got = flux_forward_pp(
            params, cfg, *args, kv_keep_idx=keep, mesh=mesh, n_micro=2
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )

    def test_grad_through_pipeline(self):
        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(3), cfg)
        args = self._inputs(cfg, B=2, seed=3)
        mesh = _pipe_mesh(2)

        def loss_pp(p):
            return jnp.mean(
                flux_forward_pp(p, cfg, *args, mesh=mesh, n_micro=2) ** 2
            )

        def loss_seq(p):
            return jnp.mean(flux_forward(p, cfg, *args) ** 2)

        g_pp = jax.grad(loss_pp)(params)
        g_seq = jax.grad(loss_seq)(params)
        # the padded identity blocks get zero grads appended; compare the
        # real slice of the dual/single stacks and the unstacked leaves
        for key in ("x_embedder", "proj_out", "norm_out"):
            for a, b in zip(
                jax.tree.leaves(g_pp[key]), jax.tree.leaves(g_seq[key])
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=3e-5
                )
        for key in ("dual_blocks", "single_blocks"):
            for a, b in zip(
                jax.tree.leaves(g_pp[key]), jax.tree.leaves(g_seq[key])
            ):
                a = np.asarray(a)[: np.asarray(b).shape[0]]
                np.testing.assert_allclose(a, np.asarray(b), atol=3e-5)


class TestPPTraining:
    @pytest.mark.parametrize(
        "pipe,data", [(2, None), (4, None), (2, 2)],
        ids=["pipe2", "pipe4", "dp2xpp2"],
    )
    def test_train_step_parity(self, pipe, data):
        """The LoRA train step under pipe_axis (ambient mesh) matches the
        sequential step: same loss, same updated adapter.  The chained
        one-shard_map schedule (pipeline_apply_chain) runs >2-stage and
        DPxPP training on the in-process CPU collective runtime — the old
        two-pipeline form SIGABRT'd there."""
        from unitex_tpu.training.flux_lora import (
            FluxLoraTrainConfig,
            create_train_state,
            train_step,
        )

        cfg = FluxConfig.tiny()
        base = init_flux_params(jax.random.key(0), cfg)
        tcfg = FluxLoraTrainConfig(rank=2)
        tcfg_pp = dataclasses.replace(
            tcfg, pipe_axis="pipe", pipe_n_micro=2,
            pipe_data_axis="data" if data else None,
        )
        rng = np.random.default_rng(0)
        B = 2 * (data or 1)
        batch = {
            "latents": jnp.asarray(
                rng.normal(size=(B, 4, 4, cfg.in_channels // 4)), jnp.float32
            ),
            "prompt_embeds": jnp.asarray(
                rng.normal(size=(B, 6, cfg.joint_attention_dim)), jnp.float32
            ),
            "pooled_embeds": jnp.asarray(
                rng.normal(size=(B, cfg.pooled_projection_dim)), jnp.float32
            ),
        }
        state, tx = create_train_state(jax.random.key(1), base, tcfg)
        state_pp, tx_pp = create_train_state(jax.random.key(1), base, tcfg_pp)

        _, loss = train_step(
            state, base, batch, jax.random.key(2), cfg, tcfg, tx
        )
        mesh = _pipe_mesh(pipe, data=data)
        with jax.set_mesh(mesh):
            state2_pp, loss_pp = train_step(
                state_pp, base, batch, jax.random.key(2), cfg, tcfg_pp, tx_pp
            )
        np.testing.assert_allclose(
            float(loss_pp), float(loss), rtol=1e-5
        )
        state2, _ = train_step(
            state, base, batch, jax.random.key(2), cfg, tcfg, tx
        )
        for a, b in zip(
            jax.tree.leaves(state2_pp.lora), jax.tree.leaves(state2.lora)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )

    def test_train_step_prepared_parity(self):
        """The pre-prepared layout (prepare_flux_params_pp +
        prepare_lora_pp: pad/tag/storage-shard ONCE, outside the trace)
        matches the sequential step — loss and the updated adapter on the
        real layers — and strip_lora_padding leaves padded layers exactly
        zero-effect."""
        from unitex_tpu.models.flux.pp import (
            prepare_flux_params_pp,
            prepare_lora_pp,
            strip_lora_padding,
        )
        from unitex_tpu.training.flux_lora import (
            FluxLoraTrainConfig,
            create_train_state,
            train_step,
        )

        cfg = FluxConfig.tiny()
        base = init_flux_params(jax.random.key(0), cfg)
        tcfg = FluxLoraTrainConfig(rank=2)
        tcfg_pp = dataclasses.replace(tcfg, pipe_axis="pipe", pipe_n_micro=2)
        rng = np.random.default_rng(0)
        batch = {
            "latents": jnp.asarray(
                rng.normal(size=(2, 4, 4, cfg.in_channels // 4)), jnp.float32
            ),
            "prompt_embeds": jnp.asarray(
                rng.normal(size=(2, 6, cfg.joint_attention_dim)), jnp.float32
            ),
            "pooled_embeds": jnp.asarray(
                rng.normal(size=(2, cfg.pooled_projection_dim)), jnp.float32
            ),
        }
        state, tx = create_train_state(jax.random.key(1), base, tcfg)
        mesh = _pipe_mesh(4)
        base_prep = prepare_flux_params_pp(base, mesh)
        lora_prep = prepare_lora_pp(state.lora, mesh)
        with jax.set_mesh(mesh):
            opt_prep = jax.jit(tx.init)(lora_prep)
        state_pp = dataclasses.replace(
            state, lora=lora_prep, opt_state=opt_prep
        )

        state2, loss = train_step(
            state, base, batch, jax.random.key(2), cfg, tcfg, tx
        )
        with jax.set_mesh(mesh):
            state2_pp, loss_pp = train_step(
                state_pp, base_prep, batch, jax.random.key(2), cfg,
                tcfg_pp, tx
            )
        np.testing.assert_allclose(float(loss_pp), float(loss), rtol=1e-5)
        stripped = strip_lora_padding(state2_pp.lora, cfg)
        for a, b in zip(
            jax.tree.leaves(stripped), jax.tree.leaves(state2.lora)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )
        # padded adapter layers stay exactly zero-effect: b leaves are 0
        for grp, L in (
            ("dual_blocks", cfg.num_layers),
            ("single_blocks", cfg.num_single_layers),
        ):
            for leaf in jax.tree.leaves(
                jax.tree.map(lambda x: x[L:], state2_pp.lora[grp])
            ):
                pad_b = np.asarray(leaf)
                assert pad_b.shape[0] == (-L) % 4

    def test_train_step_accum_parity(self):
        """--pipe composed with --grad-accum: the shard_map ppermute
        schedule inside train_step_accum's lax.scan (pipe=2, the config the
        CPU collective runtime tolerates) matches the sequential
        accumulated step."""
        from unitex_tpu.training.flux_lora import (
            FluxLoraTrainConfig,
            create_train_state,
            train_step_accum,
        )

        cfg = FluxConfig.tiny()
        base = init_flux_params(jax.random.key(0), cfg)
        tcfg = FluxLoraTrainConfig(rank=2)
        tcfg_pp = dataclasses.replace(tcfg, pipe_axis="pipe", pipe_n_micro=2)
        rng = np.random.default_rng(1)
        A, B = 2, 2
        batches = {
            "latents": jnp.asarray(
                rng.normal(size=(A, B, 4, 4, cfg.in_channels // 4)),
                jnp.float32,
            ),
            "prompt_embeds": jnp.asarray(
                rng.normal(size=(A, B, 6, cfg.joint_attention_dim)),
                jnp.float32,
            ),
            "pooled_embeds": jnp.asarray(
                rng.normal(size=(A, B, cfg.pooled_projection_dim)),
                jnp.float32,
            ),
        }
        state, tx = create_train_state(jax.random.key(1), base, tcfg)
        state_pp, tx_pp = create_train_state(jax.random.key(1), base, tcfg_pp)
        state2, loss = train_step_accum(
            state, base, batches, jax.random.key(2), cfg, tcfg, tx
        )
        with jax.set_mesh(_pipe_mesh(2)):
            state2_pp, loss_pp = train_step_accum(
                state_pp, base, batches, jax.random.key(2), cfg, tcfg_pp,
                tx_pp,
            )
        np.testing.assert_allclose(float(loss_pp), float(loss), rtol=1e-5)
        for a, b in zip(
            jax.tree.leaves(state2_pp.lora), jax.tree.leaves(state2.lora)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )


class TestPPServing:
    """PP as a SERVING capability: the denoise loop's pluggable forward_fn
    runs flux_forward_pp over storage-sharded weights (each device stores
    L/P blocks at rest — the bf16 >16 GB path, prepare_flux_params_pp)."""

    def test_denoise_pp_matches_sequential(self):
        from functools import partial

        from unitex_tpu.models.flux.pipeline import denoise
        from unitex_tpu.models.flux.pp import prepare_flux_params_pp
        from unitex_tpu.models.flux.scheduler import FlowMatchEulerScheduler

        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), cfg)
        rng = np.random.default_rng(0)
        img_ids = latent_image_ids(2, 4)
        S = img_ids.shape[0]
        noise = jnp.asarray(
            rng.normal(size=(1, S, cfg.in_channels)).astype(np.float32)
        )
        prompt = jnp.zeros((1, 6, cfg.joint_attention_dim), jnp.float32)
        pooled = jnp.zeros((1, cfg.pooled_projection_dim), jnp.float32)
        txt_ids = jnp.zeros((6, 3), jnp.float32)
        sched = FlowMatchEulerScheduler.create(3, S)

        ref = denoise(
            params, cfg, noise, img_ids, txt_ids, prompt, pooled, sched, 3.5
        )

        mesh = _pipe_mesh(4)
        prepared = prepare_flux_params_pp(params, mesh, pipe_axis="pipe")
        # prepared stacks are padded to the pipe size and sharded layer-wise
        lv = prepared["dual_blocks"]["_valid"]
        assert lv.shape[0] % 4 == 0
        assert "pipe" in str(jax.tree.leaves(prepared["dual_blocks"])[0].sharding)
        out = denoise(
            prepared, cfg, noise, img_ids, txt_ids, prompt, pooled, sched,
            3.5,
            forward_fn=partial(flux_forward_pp, mesh=mesh, n_micro=1),
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5
        )


class TestTPxPP:
    """3-axis data x tp x pipe composition (VERDICT r02 #6): Megatron TP
    on kernel shards INSIDE the one-shard_map GPipe schedule
    (prepare_flux_params_tp_pp + flux_forward_pp(tp_axis=...))."""

    def _mesh3(self, data=2, tp=2, pipe=2):
        devs = np.asarray(jax.devices()[: data * tp * pipe])
        return Mesh(devs.reshape(data, tp, pipe), ("data", "model", "pipe"))

    @pytest.mark.parametrize(
        "data,tp,pipe", [(2, 2, 2), (1, 4, 2), (1, 2, 4)],
        ids=["d2t2p2", "t4p2", "t2p4"],
    )
    def test_forward_parity(self, data, tp, pipe):
        from unitex_tpu.models.flux.pp import prepare_flux_params_tp_pp

        cfg = FluxConfig.tiny()
        base = init_flux_params(jax.random.key(0), cfg)
        mesh = self._mesh3(data, tp, pipe)
        prep = prepare_flux_params_tp_pp(base, cfg, mesh, tp_axis="model")
        rng = np.random.default_rng(0)
        B = 2 * data
        img_ids = latent_image_ids(2, 4)
        hidden = jnp.asarray(
            rng.normal(size=(B, img_ids.shape[0], cfg.in_channels)),
            jnp.float32,
        )
        ctx = jnp.asarray(
            rng.normal(size=(B, 6, cfg.joint_attention_dim)), jnp.float32
        )
        args = (
            hidden, ctx, jnp.full((B,), 0.5),
            jnp.zeros((B, cfg.pooled_projection_dim), jnp.float32),
            img_ids, jnp.zeros((6, 3), jnp.float32), jnp.full((B,), 3.5),
        )
        ref = flux_forward(base, cfg, *args)
        got = flux_forward_pp(
            prep, cfg, *args, mesh=mesh, n_micro=2,
            data_axis="data" if data > 1 else None, tp_axis="model",
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-5
        )
