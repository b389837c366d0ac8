"""Benchmark: FLUX denoise-step throughput per chip at the pipeline's real
operating point.

The pipeline's hot loop is 56 MMDiT forward passes over a 13,824-token
joint sequence (6144 noise + 6144 control + 1024 dual + 512 text,
SURVEY.md §3.2).  The full 12B model is tensor-parallel over 8 chips in
production; on the single bench chip we run a depth-reduced model with the
REAL sequence length and hidden size — identical per-layer kernels — and
scale by the parameter ratio to report 12B-equivalent steps/sec/chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

vs_baseline is measured against 0.41 steps/s/GPU — the estimated CUDA
reference operating point for the same 12B model at 13,824 tokens on an
A100 at ~45% MFU: 344 TFLOP/step / (312 TF/s * 0.45) ~= 2.45 s/step.
(The reference publishes no numbers — BASELINE.md; this derivation is
the single comparator used everywhere in this repo.)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from unitex_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from unitex_tpu.models.flux.config import FluxConfig
    from unitex_tpu.models.flux.model import flux_forward, init_flux_params_numpy
    from unitex_tpu.models.flux.pipeline import latent_image_ids

    full = FluxConfig.flux1_dev()
    # depth-reduced: same width/heads/seq -> identical per-layer kernels
    # (blocks are scanned, so per-layer cost is depth-independent); the full
    # 12B bf16 = 24 GB exceeds the single bench chip's HBM — production runs
    # TP over 8 chips.  Small depth keeps init/transfer/compile short for
    # the driver.
    cfg = FluxConfig(
        num_layers=1,
        num_single_layers=2,
        dtype="bfloat16",
    )

    def n_params(c: FluxConfig) -> float:
        d, m = c.hidden_size, c.mlp_dim
        dual = 2 * (d * 6 * d) + 8 * d * d + 2 * 2 * d * m
        single = d * 3 * d + 3 * d * d + d * m + (d + m) * d
        head = d * (c.in_channels + c.joint_attention_dim + 2 * d + 256 * 0)
        return c.num_layers * dual + c.num_single_layers * single + head

    scale = n_params(cfg) / n_params(full)

    # init on host CPU with numpy (f32 12B-scale temporaries would blow the
    # 16 GB HBM and jax.random is minutes-slow on CPU), cast bf16, transfer
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_flux_params_numpy(cfg, seed=0)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        # int8 serving mode (models/flux/quantize.py): W8A8 on the MXU's
        # 2x int8 path for the v/out/mlp projections — measured 121.3 ->
        # 109.5 ms/step on this chip at <0.4% output deviation (below
        # bf16's own deviation from f32); the reference's quantized
        # serving analogue is NF4 (pipeline.py:87-95), which is lossier
        from unitex_tpu.models.flux.quantize import quantize_flux_params

        params = quantize_flux_params(params)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)

    B = 1
    noise_ids = latent_image_ids(32, 192)                       # 6144
    ctrl_ids = latent_image_ids(32, 192, offset_y=32)           # 6144
    dual_ids = latent_image_ids(32, 32, offset_x=192, offset_y=32)  # 1024
    img_ids = jnp.concatenate([noise_ids, ctrl_ids, dual_ids], axis=0)
    S_img = img_ids.shape[0]
    S_txt = 512
    hidden = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, S_img, cfg.in_channels)),
        jnp.bfloat16,
    )
    ctx = jnp.zeros((B, S_txt, cfg.joint_attention_dim), jnp.bfloat16)
    txt_ids = jnp.zeros((S_txt, 3), jnp.float32)
    t = jnp.full((B,), 0.5, jnp.float32)
    pooled = jnp.zeros((B, cfg.pooled_projection_dim), jnp.bfloat16)
    guidance = jnp.full((B,), 3.5, jnp.float32)

    # N steps chained inside ONE jit (a lax.scan like the real denoise
    # loop), result fetched to host: on this platform only a host transfer
    # reliably fences device work (block_until_ready returns early through
    # the remote-execution tunnel), and chaining amortizes the ~30 ms
    # round-trip latency
    n_iter = 8

    def run_n(p, h):
        def body(carry, _):
            out = flux_forward(
                p, cfg, carry, ctx, t, pooled, img_ids, txt_ids, guidance
            )
            return carry + 0.001 * out.astype(carry.dtype), None

        h, _ = jax.lax.scan(body, h, None, length=n_iter)
        return jnp.sum(h.astype(jnp.float32))

    step = jax.jit(run_n)
    float(step(params, hidden))  # compile + warm

    # measured timing noise on this platform is a few percent between
    # repeats (CLAUDE.md measured facts) — take the median of 3
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(step(params, hidden))
        totals.append(time.perf_counter() - t0)
    total = sorted(totals)[1]
    # subtract the fixed dispatch+transfer overhead measured with a no-op
    noop = jax.jit(lambda h: jnp.sum(h.astype(jnp.float32)))
    float(noop(hidden))
    overheads = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(noop(hidden))
        overheads.append(time.perf_counter() - t0)
    overhead = sorted(overheads)[1]
    dt = max(total - overhead, 1e-6) / n_iter

    # 12B-equivalent step time on this chip
    full_step_s = dt / scale
    steps_per_sec = 1.0 / full_step_s
    # baseline: the CUDA reference's implied speed for the same 12B model at
    # 13824 tokens on an A100 at ~45% MFU: 344 TFLOP / (312 TF/s * 0.45)
    # ~= 2.45 s/step -> 0.41 steps/s (no published numbers exist; BASELINE.md)
    baseline_steps_per_sec = 0.41
    print(
        json.dumps(
            {
                "metric": "flux_denoise_steps_per_sec_per_chip_12B_equiv_seq13824",
                "value": round(steps_per_sec, 4),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / baseline_steps_per_sec, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
