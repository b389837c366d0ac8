import jax
import jax.numpy as jnp
import numpy as np

from unitex_tpu.models.flux.lora import merge_lora
from unitex_tpu.models.flux.vae import VAEConfig, init_vae_params
from unitex_tpu.models.sd3.config import SD3Config
from unitex_tpu.models.sd3.lora import init_sd3_lora, init_vae_encoder_lora
from unitex_tpu.models.sd3.model import init_sd3_params, sd3_forward
from unitex_tpu.training.tsdsr import (
    TSDTrainConfig,
    create_tsd_state,
    tsd_student_loss,
    tsd_train_step,
)


def _batch(cfg, B=1, h=8, w=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "latent_lr": jnp.asarray(rng.normal(size=(B, h, w, cfg.in_channels)).astype(np.float32)),
        "latent_hr": jnp.asarray(rng.normal(size=(B, h, w, cfg.in_channels)).astype(np.float32)),
        "prompt_embeds": jnp.zeros((B, 6, cfg.joint_attention_dim)),
        "pooled_embeds": jnp.zeros((B, cfg.pooled_projection_dim)),
        "prompt_embeds_null": jnp.zeros((B, 6, cfg.joint_attention_dim)),
        "pooled_embeds_null": jnp.zeros((B, cfg.pooled_projection_dim)),
    }


def test_sd3_lora_zero_identity():
    cfg = SD3Config.tiny()
    params = init_sd3_params(jax.random.key(0), cfg)
    lora = init_sd3_lora(jax.random.key(1), params, rank=4)
    merged = merge_lora(params, [(lora, 1.0)])
    lat = jnp.ones((1, 8, 8, cfg.in_channels))
    ctx = jnp.zeros((1, 4, cfg.joint_attention_dim))
    pooled = jnp.zeros((1, cfg.pooled_projection_dim))
    t = jnp.asarray([500.0])
    a = sd3_forward(params, cfg, lat, ctx, t, pooled)
    b = sd3_forward(merged, cfg, lat, ctx, t, pooled)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_vae_encoder_lora_structure():
    vcfg = VAEConfig.tiny()
    vparams = init_vae_params(jax.random.key(0), vcfg)
    lora = init_vae_encoder_lora(jax.random.key(1), vparams, rank=4)
    merged = merge_lora(vparams, [(lora, 1.0)])
    # zero-b merge is identity
    q0 = vparams["encoder"]["mid"]["attn"]["q"]["kernel"]
    q1 = merged["encoder"]["mid"]["attn"]["q"]["kernel"]
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))


def test_student_loss_finite_and_grads():
    cfg = SD3Config.tiny()
    tcfg = TSDTrainConfig(rank=4)
    base = init_sd3_params(jax.random.key(0), cfg)
    s_lora = init_sd3_lora(jax.random.key(1), base, rank=4)
    r_lora = init_sd3_lora(jax.random.key(2), base, rank=4)
    batch = _batch(cfg)
    (loss, aux), grads = jax.value_and_grad(tsd_student_loss, has_aux=True)(
        s_lora, r_lora, base, cfg, tcfg, batch, jax.random.key(3)
    )
    assert np.isfinite(float(loss))
    assert float(aux["tsd_loss"]) >= 0
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert max(float(jnp.abs(g).max()) for g in leaves) > 0


def test_full_train_step_updates_both():
    cfg = SD3Config.tiny()
    tcfg = TSDTrainConfig(rank=4, learning_rate=1e-3, reg_learning_rate=1e-3)
    base = init_sd3_params(jax.random.key(0), cfg)
    state, tx_s, tx_r = create_tsd_state(jax.random.key(1), base, tcfg)
    batch = _batch(cfg)
    state2, logs = tsd_train_step(
        state, base, cfg, tcfg, batch, jax.random.key(2), tx_s, tx_r
    )
    assert state2.step == 1
    for k in ("loss", "tsd_loss", "data_loss", "reg_loss"):
        assert np.isfinite(float(logs[k])), k
    moved_s = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(state.student_lora), jax.tree.leaves(state2.student_lora))
    )
    moved_r = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(state.reg_lora), jax.tree.leaves(state2.reg_lora))
    )
    assert moved_s > 0 and moved_r > 0


def test_lpips_perceptual_hook():
    """Real LPIPS (utils/lpips.py) through the decoded-image perceptual hook
    (train.py:900-904 computes pyiqa LPIPS on decoded images)."""
    from unitex_tpu.training.tsdsr import make_lpips_perceptual_fn, tsd_student_loss
    from unitex_tpu.utils.lpips import init_lpips_params

    cfg = SD3Config.tiny()
    tcfg = TSDTrainConfig(rank=4)
    base = init_sd3_params(jax.random.key(0), cfg)
    s_lora = init_sd3_lora(jax.random.key(1), base, rank=4)
    r_lora = init_sd3_lora(jax.random.key(2), base, rank=4)
    batch = _batch(cfg)

    lp = init_lpips_params(jax.random.key(3), "alex")
    # stand-in decoder: 3-channel projection of the latent, sigmoid to [0,1]
    C = cfg.in_channels
    proj = jax.random.normal(jax.random.key(4), (C, 3)) / np.sqrt(C)
    up = lambda z: jax.image.resize(z, (z.shape[0], 32, 32, z.shape[-1]), "linear")
    decode = lambda z: jax.nn.sigmoid(up(z) @ proj)

    perc = make_lpips_perceptual_fn(lp, decode)
    (loss, aux), grads = jax.value_and_grad(tsd_student_loss, has_aux=True)(
        s_lora, r_lora, base, cfg, tcfg, batch, jax.random.key(5),
        perceptual_fn=perc,
    )
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert max(float(jnp.abs(g).max()) for g in leaves) > 0
