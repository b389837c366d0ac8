import jax
import jax.numpy as jnp
import numpy as np
import optax

from unitex_tpu.models.ltm import (
    LTMConfig,
    decode_field,
    encode_geometry,
    fourier_features,
    init_ltm_params,
    ltm_vae_loss,
    make_query_field,
)


def test_fourier_shapes():
    x = jnp.zeros((5, 3))
    f = fourier_features(x, 4)
    assert f.shape == (5, 3 + 6 * 4)


def test_encode_decode_shapes():
    cfg = LTMConfig.tiny()
    params = init_ltm_params(jax.random.key(0), cfg)
    pts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (100, 3)), jnp.float32)
    cols = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (100, 3)), jnp.float32)
    valid = jnp.ones((100,), bool)
    z, mean, logvar = encode_geometry(params, cfg, pts, cols, valid)
    assert z.shape == (cfg.n_latents, cfg.kl_latent_dim)
    out = decode_field(params, cfg, z, pts[:17])
    assert out.shape == (17, 3)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_masked_points_ignored():
    cfg = LTMConfig.tiny()
    params = init_ltm_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-1, 1, (50, 3)), jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (50, 3)), jnp.float32)
    valid = jnp.asarray([True] * 25 + [False] * 25)
    z1, _, _ = encode_geometry(params, cfg, pts, cols, valid)
    # mutate only the masked points: encoding must not change
    pts2 = pts.at[25:].add(10.0)
    cols2 = cols.at[25:].set(0.0)
    z2, _, _ = encode_geometry(params, cfg, pts2, cols2, valid)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)


def test_query_field_contract():
    cfg = LTMConfig.tiny()
    params = init_ltm_params(jax.random.key(0), cfg)
    qf = make_query_field(params, cfg)
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)
    out = qf(pts, cols, pts[:10], visible_mask=jnp.ones((64,), bool))
    assert out.shape == (10, 3)


def test_query_field_chunked_matches_direct():
    """Chunked lax.map decode + pad must equal the one-shot decode, and
    context subsampling must keep only valid points (the dense-bake path:
    ~4.2M texels would OOM the cross-attention without these)."""
    cfg = LTMConfig.tiny()
    params = init_ltm_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.uniform(-1, 1, (200, 3)), jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (200, 3)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=200) < 0.7)
    queries = jnp.asarray(rng.uniform(-1, 1, (57, 3)), jnp.float32)

    big = make_query_field(params, cfg, chunk=1 << 16, max_ref=1 << 20)
    small = make_query_field(params, cfg, chunk=16, max_ref=1 << 20)
    a = big(pts, cols, queries, visible_mask=mask)
    b = small(pts, cols, queries, visible_mask=mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # subsampled context (max_ref < n valid) still spans the cloud: the
    # prediction stays within the tiny-model tolerance of the full-context
    # answer on a smooth field
    sub = make_query_field(params, cfg, chunk=1 << 16, max_ref=120)
    c = sub(pts, cols, queries, visible_mask=mask)
    assert c.shape == a.shape and bool(jnp.isfinite(c).all())


def test_subsample_context_only_valid():
    from unitex_tpu.models.ltm import _subsample_context

    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.uniform(-1, 1, (100, 3)), jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (100, 3)), jnp.float32)
    mask = jnp.asarray([True] * 40 + [False] * 60)
    p, c, v = _subsample_context(pts, cols, mask, 32)
    assert p.shape == (32, 3) and bool(v.all())  # only valid points kept


class TestLTMData:
    def test_random_field_range_and_smoothness(self):
        from unitex_tpu.training.ltm import random_field_colors

        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(-0.85, 0.85, (512, 3)), jnp.float32)
        cols = random_field_colors(jax.random.key(3), pts)
        assert cols.shape == (512, 3)
        assert float(cols.min()) >= 0.05 - 1e-5
        assert float(cols.max()) <= 0.95 + 1e-5
        # different keys -> different fields
        cols2 = random_field_colors(jax.random.key(4), pts)
        assert float(jnp.abs(cols - cols2).max()) > 0.1
        # smooth: nearby points have nearby colors
        d = jnp.linalg.norm(pts[1:] - pts[:-1], axis=-1)
        dc = jnp.linalg.norm(cols[1:] - cols[:-1], axis=-1)
        near = d < 0.05
        if bool(near.any()):
            assert float(dc[near].max()) < 0.5

    def test_occlusion_split_static_shapes_and_holes(self):
        from unitex_tpu.training.ltm import occlusion_split

        rng = np.random.default_rng(1)
        pts = jnp.asarray(rng.uniform(-0.85, 0.85, (1024, 3)), jnp.float32)
        cols = jnp.asarray(rng.uniform(0, 1, (1024, 3)), jnp.float32)
        b = occlusion_split(jax.random.key(0), pts, cols, n_query=256)
        assert b["points"].shape == (1024, 3)
        assert b["query_points"].shape == (256, 3)
        assert b["valid"].dtype == jnp.bool_
        n_holes = int((~b["valid"]).sum())
        assert n_holes > 0  # holes exist
        # queries are hole-first: if there are >= n_query hole points,
        # every query is a hole point; otherwise all holes are queried
        qset = {tuple(np.asarray(p)) for p in b["query_points"]}
        hole_pts = np.asarray(pts)[~np.asarray(b["valid"])]
        n_hole_queries = sum(tuple(p) in qset for p in hole_pts)
        assert n_hole_queries == min(n_holes, 256)

    def test_sample_device_batch_jits(self):
        from unitex_tpu.training.ltm import sample_device_batch

        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.uniform(-0.85, 0.85, (512, 3)), jnp.float32)
        b = sample_device_batch(jax.random.key(1), pts, 128)
        assert b["query_colors"].shape == (128, 3)
        assert bool(jnp.isfinite(b["query_colors"]).all())

    def test_build_point_bank(self):
        from unitex_tpu.training.ltm import build_point_bank

        bank = build_point_bank(5, 256, seed=0)
        assert bank.shape == (5, 256, 3)
        assert np.abs(bank).max() <= 0.85 + 1e-5
        assert np.isfinite(bank).all()


def test_vae_overfits_one_field():
    """Train on a single smooth color field: reconstruction must improve."""
    cfg = LTMConfig.tiny()
    params = init_ltm_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.uniform(-1, 1, (128, 3)), jnp.float32)
    cols = jnp.clip(0.5 + 0.5 * pts, 0, 1)
    valid = jnp.ones((128,), bool)
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    loss_fn = lambda p, k: ltm_vae_loss(p, cfg, pts, cols, valid, pts, cols, k)
    l0 = float(loss_fn(params, jax.random.key(1)))
    step = jax.jit(
        lambda p, o, k: (lambda g: (optax.apply_updates(p, tx.update(g, o, p)[0]),
                                    tx.update(g, o, p)[1]))(jax.grad(loss_fn)(p, k))
    )
    for i in range(60):
        params, opt = step(params, opt, jax.random.key(i))
    l1 = float(loss_fn(params, jax.random.key(999)))
    assert l1 < l0 * 0.5, (l0, l1)


class TestLTMTraining:
    def test_training_learns_positional_field(self):
        """Train the tiny texture-function VAE on a sphere painted with a
        position-based color field: loss must fall and the trained decoder
        must beat the untrained one on held-out queries."""
        from unitex_tpu.geometry.primitives import make_icosphere
        from unitex_tpu.models.ltm import LTMConfig, decode_field, encode_geometry
        from unitex_tpu.training.ltm import (
            LTMTrainConfig,
            create_ltm_state,
            ltm_train_step,
            sample_ltm_batch,
        )

        sphere = make_icosphere(2)
        sphere.vertex_colors = np.clip(
            0.5 + 0.5 * sphere.vertices, 0, 1
        ).astype(np.float32)
        cfg = LTMConfig.tiny()
        tcfg = LTMTrainConfig(learning_rate=3e-3, n_visible=512, n_query=256)
        state0, tx = create_ltm_state(jax.random.key(0), cfg, tcfg)

        def holdout_err(params):
            batch = sample_ltm_batch(sphere, tcfg, seed=999)
            z, _, _ = encode_geometry(
                params, cfg, batch["points"], batch["colors"], batch["valid"]
            )
            pred = decode_field(params, cfg, z, batch["query_points"])
            return float(jnp.abs(pred - batch["query_colors"]).mean())

        err0 = holdout_err(state0.params)
        state = state0
        losses = []
        for i in range(40):
            batch = sample_ltm_batch(sphere, tcfg, seed=i)
            state, loss = ltm_train_step(
                state, batch, jax.random.key(i), cfg, tcfg, tx
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        err1 = holdout_err(state.params)
        assert err1 < 0.8 * err0, (err0, err1)
