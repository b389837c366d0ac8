import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.models.flux.config import FluxConfig
from unitex_tpu.models.flux.layers import apply_rope, rope_freqs, sinusoidal_embedding
from unitex_tpu.models.flux.model import flux_forward, init_flux_params
from unitex_tpu.models.flux.pipeline import (
    FluxPipelineConfig,
    denoise,
    latent_image_ids,
    pack_latents,
    run_flux_pipeline,
    unpack_latents,
)
from unitex_tpu.models.flux.scheduler import FlowMatchEulerScheduler, calculate_shift
from unitex_tpu.models.flux.vae import VAEConfig, init_vae_params, vae_decode, vae_encode


class TestPacking:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(0)
        lat = jnp.asarray(rng.normal(size=(2, 8, 12, 4)).astype(np.float32))
        packed = pack_latents(lat)
        assert packed.shape == (2, 4 * 6, 16)
        back = unpack_latents(packed, 8, 12)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(lat))

    def test_pack_matches_torch_reference(self):
        """Spec check against the reference's packing
        (texturing/pipeline.py:240-249, NCHW view/permute)."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        lat_nchw = rng.normal(size=(1, 4, 8, 12)).astype(np.float32)
        t = torch.from_numpy(lat_nchw)
        B, C, H, W = t.shape
        ref = t.view(B, C, H // 2, 2, W // 2, 2)
        ref = ref.permute(0, 2, 4, 1, 3, 5)
        ref = ref.reshape(B, (H // 2) * (W // 2), C * 4).numpy()
        ours = pack_latents(jnp.asarray(lat_nchw.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=0)

    def test_image_ids_offsets(self):
        ids = latent_image_ids(3, 4)
        assert ids.shape == (12, 3)
        np.testing.assert_array_equal(np.asarray(ids[0]), [0, 0, 0])
        np.testing.assert_array_equal(np.asarray(ids[-1]), [0, 2, 3])
        ids_off = latent_image_ids(2, 2, offset_x=5, offset_y=7)
        np.testing.assert_array_equal(np.asarray(ids_off[0]), [0, 7, 5])


class TestScheduler:
    def test_shift_formula(self):
        # 6144-token noise sequence of the texture pass
        mu = calculate_shift(6144, 256, 4096, 0.5, 1.15)
        expect = 6144 * (1.15 - 0.5) / (4096 - 256) + (0.5 - 256 * (1.15 - 0.5) / (4096 - 256))
        assert abs(mu - expect) < 1e-9

    def test_sigmas_monotone_terminal_zero(self):
        s = FlowMatchEulerScheduler.create(28, 6144)
        sig = np.asarray(s.sigmas)
        assert sig.shape == (29,)
        assert sig[-1] == 0.0
        assert (np.diff(sig) < 0).all()
        assert abs(float(s.timesteps[0]) - sig[0] * 1000) < 1e-4

    # Golden sigma table for the production texture-pass config (28 steps,
    # 6144-token noise sequence, µ = 1.4966666666666666): the diffusers
    # FlowMatchEulerDiscreteScheduler algorithm hand-traced at float64 —
    # σ' = e^µ / (e^µ + (1/σ − 1)) over σ = linspace(1, 1/28, 28), terminal
    # 0 appended, timesteps = σ'·1000 (reference texturing/pipeline.py:59-69,
    # 594-610).  Checked in so the parity assertion runs without diffusers.
    GOLDEN_MU_6144 = 1.4966666666666666
    GOLDEN_SIGMAS_28_6144 = [
        1.0000000000, 0.9917765136, 0.9830703810, 0.9738378271,
        0.9640296178, 0.9535901821, 0.9424565580, 0.9305571225,
        0.9178100484, 0.9041214202, 0.8893829166, 0.8734689376,
        0.8562330169, 0.8375033000, 0.8170767950, 0.7947119852,
        0.7701192354, 0.7429481793, 0.7127709218, 0.6790593387,
        0.6411539043, 0.5982201139, 0.5491863313, 0.4926531196,
        0.4267575244, 0.3489638423, 0.2557298061, 0.1419521060,
        0.0000000000,
    ]

    def test_matches_diffusers_golden(self):
        assert abs(calculate_shift(6144) - self.GOLDEN_MU_6144) < 1e-12
        ours = FlowMatchEulerScheduler.create(28, 6144)
        np.testing.assert_allclose(
            np.asarray(ours.sigmas), self.GOLDEN_SIGMAS_28_6144, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(ours.timesteps),
            np.asarray(self.GOLDEN_SIGMAS_28_6144[:-1]) * 1000.0, atol=1e-2
        )

    def test_euler_step_linear_model(self):
        """With v = eps - x0 constant, integrating from sigma=1 to 0 must
        land exactly on x0."""
        s = FlowMatchEulerScheduler.create(8, 1024)
        x0 = jnp.asarray([3.0])
        eps = jnp.asarray([-1.0])
        x = 1.0 * eps + 0.0 * x0  # at sigma=1, z = eps
        v = eps - x0
        for i in range(8):
            x = s.step(v, i, x)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-5)


class TestRoPE:
    def test_rope_rotation_preserves_norm(self):
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (10, 3)), jnp.float32)
        cos, sin = rope_freqs(ids, (8, 12, 12))
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 10, 4, 32)).astype(np.float32))
        y = apply_rope(x, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-5,
        )

    def test_rope_zero_ids_identity(self):
        ids = jnp.zeros((5, 3))
        cos, sin = rope_freqs(ids, (8, 12, 12))
        x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 5, 2, 32)).astype(np.float32))
        y = apply_rope(x, cos, sin)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_rope_relative_shift_invariance(self):
        """Attention logits depend only on relative positions."""
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(1, 6, 1, 32)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 6, 1, 32)).astype(np.float32))

        def logits(offset):
            ids = jnp.stack(
                [jnp.zeros(6), jnp.arange(6) + offset, jnp.zeros(6)], axis=-1
            )
            cos, sin = rope_freqs(ids, (8, 12, 12))
            qr = apply_rope(q, cos, sin)[0, :, 0]
            kr = apply_rope(k, cos, sin)[0, :, 0]
            return np.asarray(qr @ kr.T)

        np.testing.assert_allclose(logits(0.0), logits(17.0), atol=1e-3)

    def test_sinusoidal_matches_diffusers_spec(self):
        """Numpy re-derivation of diffusers ``get_timestep_embedding``
        (flip_sin_to_cos=True, downscale_freq_shift=0): freqs =
        exp(-ln(10000)·arange(half)/half), emb = [cos(t·f) ‖ sin(t·f)] —
        executes without diffusers (golden-spec oracle)."""
        t = np.asarray([0.5, 0.9], dtype=np.float64) * 1000.0
        half = 128
        freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
        arg = t[:, None] * freqs[None, :]
        ref = np.concatenate([np.cos(arg), np.sin(arg)], axis=-1)
        ours = np.asarray(
            sinusoidal_embedding(jnp.asarray([0.5, 0.9], jnp.float32), 256)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestModel:
    def test_forward_shapes_and_finite(self):
        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), cfg)
        B, S_img, S_txt = 2, 24, 8
        hidden = jnp.asarray(
            np.random.default_rng(0).normal(size=(B, S_img, cfg.in_channels)),
            jnp.float32,
        )
        ctx = jnp.zeros((B, S_txt, cfg.joint_attention_dim))
        img_ids = latent_image_ids(4, 6)
        txt_ids = jnp.zeros((S_txt, 3))
        out = flux_forward(
            params, cfg, hidden, ctx,
            jnp.full((B,), 0.5), jnp.zeros((B, cfg.pooled_projection_dim)),
            img_ids, txt_ids, guidance=jnp.full((B,), 3.5),
        )
        assert out.shape == (B, S_img, cfg.in_channels)
        assert np.isfinite(np.asarray(out)).all()

    def test_timestep_changes_output(self):
        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), cfg)
        hidden = jnp.ones((1, 8, cfg.in_channels))
        ctx = jnp.zeros((1, 4, cfg.joint_attention_dim))
        ids = latent_image_ids(2, 4)
        tids = jnp.zeros((4, 3))
        pooled = jnp.zeros((1, cfg.pooled_projection_dim))
        o1 = flux_forward(params, cfg, hidden, ctx, jnp.asarray([0.1]), pooled, ids, tids, jnp.asarray([3.5]))
        o2 = flux_forward(params, cfg, hidden, ctx, jnp.asarray([0.9]), pooled, ids, tids, jnp.asarray([3.5]))
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-4


class TestVAE:
    def test_encode_decode_shapes(self):
        cfg = VAEConfig.tiny()
        params = init_vae_params(jax.random.key(0), cfg)
        img = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
        )
        lat = vae_encode(params, cfg, img)
        assert lat.shape == (1, 8, 8, cfg.latent_channels)
        out = vae_decode(params, cfg, lat)
        assert out.shape == (1, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_group_norm_matches_reference_formula(self):
        """group_norm applies stats in the INPUT dtype (the bf16 decode's
        HBM ceiling depends on it) — f32 path must match the direct
        normalize-then-affine formula, bf16 within its mantissa."""
        from unitex_tpu.models.flux.vae import gn_init, group_norm

        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32) * 3 + 1
        p = gn_init(16)
        p = {"scale": p["scale"] * 1.7 + 0.1, "bias": p["bias"] + 0.3}
        g = 4
        xg = x.reshape(2, 8, 8, g, 4)
        mean = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = xg.var(axis=(1, 2, 4), keepdims=True)
        want = ((xg - mean) / np.sqrt(var + 1e-6)).reshape(2, 8, 8, 16)
        want = want * np.asarray(p["scale"]) + np.asarray(p["bias"])
        got32 = group_norm(jnp.asarray(x), p, g)
        np.testing.assert_allclose(np.asarray(got32), want, atol=2e-4)
        got16 = group_norm(jnp.asarray(x, jnp.bfloat16), p, g)
        assert got16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got16, np.float32), want, atol=0.1)


class TestPipeline:
    def test_end_to_end_tiny(self):
        """Smoke the whole conditioned pipeline at toy scale: control +
        dual images, 4 steps, check output range/shape and determinism."""
        flux_cfg = FluxConfig.tiny()
        vae_cfg = VAEConfig.tiny()
        tparams = init_flux_params(jax.random.key(0), flux_cfg)
        vparams = init_vae_params(jax.random.key(1), vae_cfg)
        pipe_cfg = FluxPipelineConfig(
            height=16, width=32, num_inference_steps=3, max_sequence_length=8
        )
        rng = np.random.default_rng(0)
        control = jnp.asarray(rng.uniform(0, 1, (16, 32, 3)).astype(np.float32))
        dual = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
        img = run_flux_pipeline(
            tparams, flux_cfg, vparams, vae_cfg,
            jax.random.key(63), pipe_cfg,
            control_image=control, dual_image=dual,
        )
        assert img.shape == (16, 32, 3)
        assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
        img2 = run_flux_pipeline(
            tparams, flux_cfg, vparams, vae_cfg,
            jax.random.key(63), pipe_cfg,
            control_image=control, dual_image=dual,
        )
        np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))

    def test_condition_tokens_pinned(self):
        """The returned sequence must only contain the denoised noise slice:
        with a model that returns zeros, output == input noise tokens."""
        flux_cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), flux_cfg)

        zero_params = jax.tree.map(jnp.zeros_like, params)
        noise = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 8, flux_cfg.in_channels)),
            jnp.float32,
        )
        cond = jnp.ones((1, 4, flux_cfg.in_channels))
        ids = jnp.concatenate([latent_image_ids(2, 4), latent_image_ids(1, 4, offset_y=2)])
        sched = FlowMatchEulerScheduler.create(4, 8)
        out = denoise(
            zero_params, flux_cfg, noise, ids, jnp.zeros((4, 3)),
            jnp.zeros((1, 4, flux_cfg.joint_attention_dim)),
            jnp.zeros((1, flux_cfg.pooled_projection_dim)),
            sched, 3.5, cond,
        )
        assert out.shape == noise.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(noise), atol=1e-6)


class TestRedux:
    def test_projection_shapes(self):
        from unitex_tpu.models.flux.redux import (
            init_redux_params,
            redux_image_ids,
            redux_project,
        )

        params = init_redux_params(jax.random.key(0), siglip_dim=32, t5_dim=64)
        feats = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 9, 32)).astype(np.float32)
        )
        out = redux_project(params, feats)
        assert out.shape == (2, 9, 64)
        assert np.isfinite(np.asarray(out)).all()
        ids = redux_image_ids(9)
        assert ids.shape == (9, 3)
        np.testing.assert_array_equal(np.asarray(ids), 0)

    def test_redux_feeds_pipeline(self):
        """Redux embeds slot into the denoise loop as the prompt stream."""
        from unitex_tpu.models.flux.redux import init_redux_params, redux_project

        flux_cfg = FluxConfig.tiny()
        tparams = init_flux_params(jax.random.key(0), flux_cfg)
        rparams = init_redux_params(
            jax.random.key(1), siglip_dim=16, t5_dim=flux_cfg.joint_attention_dim
        )
        feats = jnp.asarray(
            np.random.default_rng(2).normal(size=(1, 6, 16)).astype(np.float32)
        )
        embeds = redux_project(rparams, feats)
        out = flux_forward(
            tparams, flux_cfg,
            jnp.ones((1, 8, flux_cfg.in_channels)),
            embeds,
            jnp.asarray([0.5]),
            jnp.zeros((1, flux_cfg.pooled_projection_dim)),
            latent_image_ids(2, 4), jnp.zeros((6, 3)),
            jnp.asarray([3.5]),
        )
        assert out.shape == (1, 8, flux_cfg.in_channels)


class TestVelocityReuse:
    def test_mask_properties(self):
        from unitex_tpu.models.flux.pipeline import make_reuse_mask

        assert make_reuse_mask(28, 0) is None
        for n, k in ((28, 7), (28, 12), (8, 3), (50, 20)):
            m = np.asarray(make_reuse_mask(n, k))
            assert m.shape == (n,)
            assert not m[0] and not m[1] and not m[-1]
            assert not (m[:-1] & m[1:]).any()      # never two in a row
            assert 0 < m.sum() <= k

    def test_reuse_matches_manual_extrapolation(self):
        """A reused step must apply v1 + r(v1 - v2) with r the sigma-gap
        ratio — checked against a hand-rolled Python loop."""
        from unitex_tpu.models.flux.model import flux_forward
        from unitex_tpu.models.flux.pipeline import make_reuse_mask

        flux_cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), flux_cfg)
        noise = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 8, flux_cfg.in_channels)),
            jnp.float32,
        )
        ids = latent_image_ids(2, 4)
        tids = jnp.zeros((4, 3))
        prompt = jnp.zeros((1, 4, flux_cfg.joint_attention_dim))
        pooled = jnp.zeros((1, flux_cfg.pooled_projection_dim))
        sched = FlowMatchEulerScheduler.create(6, 8)
        mask = np.zeros(6, bool)
        mask[3] = True
        out = denoise(
            params, flux_cfg, noise, ids, tids, prompt, pooled, sched, 3.5,
            reuse_mask=jnp.asarray(mask),
        )

        # manual loop
        lat = noise
        vs = []
        sig = np.asarray(sched.sigmas)
        for i in range(6):
            if mask[i]:
                r = (sig[i] - sig[i - 1]) / (sig[i - 1] - sig[i - 2])
                v = vs[-1] + r * (vs[-1] - vs[-2])
            else:
                t = jnp.full((1,), float(sched.timesteps[i]) / 1000.0)
                v = flux_forward(
                    params, flux_cfg, lat, prompt, t, pooled, ids, tids,
                    guidance=jnp.full((1,), 3.5),
                )
            vs.append(v)
            lat = lat + (sig[i + 1] - sig[i]) * v
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(lat), atol=1e-5)

    def test_zero_reuse_identical(self):
        """An all-False mask must match the maskless loop (up to XLA's
        fusion reordering inside lax.cond — observed ~6e-7)."""
        flux_cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.key(0), flux_cfg)
        noise = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 8, flux_cfg.in_channels)),
            jnp.float32,
        )
        ids = latent_image_ids(2, 4)
        tids = jnp.zeros((4, 3))
        prompt = jnp.zeros((1, 4, flux_cfg.joint_attention_dim))
        pooled = jnp.zeros((1, flux_cfg.pooled_projection_dim))
        sched = FlowMatchEulerScheduler.create(4, 8)
        a = denoise(params, flux_cfg, noise, ids, tids, prompt, pooled, sched, 3.5)
        b = denoise(
            params, flux_cfg, noise, ids, tids, prompt, pooled, sched, 3.5,
            reuse_mask=jnp.asarray(np.zeros(4, bool)),
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestTorchRNGParity:
    """Seed-parity replay of the reference's torch.Generator stream
    (pipeline.py:152; draw order texturing/pipeline.py:294,318,367)."""

    def test_stream_order_and_values(self):
        torch = pytest.importorskip("torch")
        from unitex_tpu.models.flux.pipeline import torch_reference_rng

        plan = torch_reference_rng(
            63, (4, 8), dual_hw=(4, 4), control_hw=(4, 8), latent_channels=16
        )
        g = torch.Generator().manual_seed(63)
        for key, hw in (("noise", (4, 8)), ("dual_eps", (4, 4)), ("control_eps", (4, 8))):
            want = torch.randn((1, 16, *hw), generator=g, dtype=torch.bfloat16)
            np.testing.assert_array_equal(
                plan[key], want.float().numpy().transpose(0, 2, 3, 1)
            )
        # omitted conditioning images draw nothing
        plan2 = torch_reference_rng(63, (4, 8), latent_channels=16)
        np.testing.assert_array_equal(plan2["noise"], plan["noise"])
        assert plan2["dual_eps"] is None and plan2["control_eps"] is None

    def test_eps_injection_semantics(self):
        """vae_encode(sample_eps=e): posterior mean + std*e — symmetric
        around the deterministic mode, strictly above it for e=+1."""
        from unitex_tpu.models.flux.vae import vae_encode

        cfg = VAEConfig.tiny()
        params = init_vae_params(jax.random.key(1), cfg)
        img = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
        )
        z0 = vae_encode(params, cfg, img)
        e = jnp.ones((1, 8, 8, cfg.latent_channels), jnp.float32)
        zp = vae_encode(params, cfg, img, sample_eps=e)
        zm = vae_encode(params, cfg, img, sample_eps=-e)
        np.testing.assert_allclose(
            np.asarray(zp + zm), np.asarray(2 * z0), atol=1e-5
        )
        assert float((zp - z0).min()) > 0.0  # std > 0 everywhere

    def test_pipeline_accepts_plan(self):
        pytest.importorskip("torch")
        from unitex_tpu.models.flux.pipeline import torch_reference_rng

        flux_cfg = FluxConfig.tiny()
        vae_cfg = VAEConfig.tiny()
        tparams = init_flux_params(jax.random.key(0), flux_cfg)
        vparams = init_vae_params(jax.random.key(1), vae_cfg)
        pipe_cfg = FluxPipelineConfig(
            height=16, width=32, num_inference_steps=2, max_sequence_length=8
        )
        rng = np.random.default_rng(0)
        control = jnp.asarray(rng.uniform(0, 1, (16, 32, 3)).astype(np.float32))
        dual = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
        plan = torch_reference_rng(
            63, (8, 16), dual_hw=(8, 8), control_hw=(8, 16),
            latent_channels=vae_cfg.latent_channels,
        )
        img = run_flux_pipeline(
            tparams, flux_cfg, vparams, vae_cfg,
            jax.random.key(63), pipe_cfg,
            control_image=control, dual_image=dual,
            noise=plan["noise"], control_eps=plan["control_eps"],
            dual_eps=plan["dual_eps"],
        )
        img2 = run_flux_pipeline(
            tparams, flux_cfg, vparams, vae_cfg,
            jax.random.key(0), pipe_cfg,  # different jax key: must not matter
            control_image=control, dual_image=dual,
            noise=plan["noise"], control_eps=plan["control_eps"],
            dual_eps=plan["dual_eps"],
        )
        assert img.shape == (16, 32, 3)
        np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))
        # eps changes the conditioning tokens, so the output must move
        img3 = run_flux_pipeline(
            tparams, flux_cfg, vparams, vae_cfg,
            jax.random.key(63), pipe_cfg,
            control_image=control, dual_image=dual,
            noise=plan["noise"],
        )
        assert float(jnp.abs(img - img3).max()) > 0.0
