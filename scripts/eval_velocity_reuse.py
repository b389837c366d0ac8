"""Quality-vs-steps evaluation of velocity_reuse (--fast-steps).

VERDICT r02 #7: the mechanism shipped with only a masking-math parity
test — no artifact recorded output PSNR vs the exact 28-step schedule at
any reuse level.  This driver runs the production texture-pass operating
point (512x3072 strip + 512² dual conditioning, 28 steps, guidance 3.5)
with a random-init production-scale transformer (no checkpoints exist in
this environment — WEIGHTS.md; the velocity field of a random MMDiT is a
harsher smoothness test than a trained one's, so these PSNRs are
conservative) at reuse levels {0, 4, 8, 12} and scores each output
against reuse=0.

  python scripts/eval_velocity_reuse.py --out VELOCITY_REUSE_r03.json
      [--levels 4 8 12] [--tiny]   # --tiny = CPU smoke shapes

TODO(weights): when real FLUX checkpoints exist (WEIGHTS.md), re-run with
``--pretrain-models <root>`` added to the pipeline build below and publish
the trained-weights table — the random-init numbers are directionally
conservative but NOT a substitute (VERDICT r03 weak #6).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# honor an explicit platform request (cpu smoke runs) — but do NOT lock
# the platform list to the sitecustomize's "axon" value: that would hide
# the host cpu backend these drivers stage GB-scale inits on
if os.environ.get("JAX_PLATFORMS") and os.environ["JAX_PLATFORMS"] != "axon":
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="VELOCITY_REUSE_r03.json")
    ap.add_argument("--levels", type=int, nargs="+", default=[4, 8, 12])
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_default_prng_impl", "rbg")

    from unitex_tpu.models.flux.config import FluxConfig
    from unitex_tpu.models.flux.model import (
        init_flux_params,
        init_flux_params_numpy,
    )
    from unitex_tpu.models.flux.pipeline import (
        FluxPipelineConfig,
        run_flux_pipeline,
    )
    from unitex_tpu.models.flux.vae import VAEConfig, init_vae_params
    from unitex_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if args.tiny:
        cfg = FluxConfig.tiny()
        vae_cfg = VAEConfig.tiny()
        params = init_flux_params(jax.random.key(0), cfg)
        H, W, D = 32, 192, 32
    else:
        cfg = FluxConfig.flux1_dev()
        vae_cfg = VAEConfig.flux()
        host = jax.devices("cpu")[0]
        with jax.default_device(host):
            params = init_flux_params_numpy(cfg, seed=0)
            params = jax.tree.map(
                lambda x: jnp.asarray(x, jnp.bfloat16), params
            )
            from unitex_tpu.models.flux.quantize import quantize_flux_params

            params = quantize_flux_params(params, weight_only_rest=True)
        params = jax.device_put(params, jax.devices()[0])
        H, W, D = 512, 3072, 512
    with jax.default_device(jax.devices("cpu")[0]):
        vae_params = init_vae_params(jax.random.key(1), vae_cfg)
    vae_params = jax.device_put(vae_params, jax.devices()[0])

    rng = np.random.default_rng(0)
    control = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    dual = jnp.asarray(rng.random((D, D, 3)), jnp.float32)

    def run(reuse):
        pipe_cfg = FluxPipelineConfig(
            height=H, width=W, num_inference_steps=args.steps,
            max_sequence_length=8 if args.tiny else 512,
            velocity_reuse=reuse,
        )
        t0 = time.perf_counter()
        img = run_flux_pipeline(
            params, cfg, vae_params, vae_cfg, jax.random.key(63), pipe_cfg,
            control_image=control, dual_image=dual,
        )
        img = np.asarray(img)  # host fence
        return img, time.perf_counter() - t0

    ref, t_ref = run(0)
    # warm second pass for a fair exact-schedule time
    ref, t_ref = run(0)
    rows = []
    for lv in args.levels:
        img, t = run(lv)
        mse = float(np.mean((img - ref) ** 2))
        psnr = round(-10 * np.log10(max(mse, 1e-10)), 2)
        rows.append({
            "velocity_reuse": lv,
            "transformer_evals": args.steps - lv,
            "psnr_vs_exact_db": psnr,
            "pass_time_s": round(t, 2),
            "speedup_vs_exact": round(t_ref / max(t, 1e-9), 3),
        })
        print(json.dumps(rows[-1]))
    report = {
        "metric": "velocity_reuse_quality",
        "protocol": (
            f"single texture pass {H}x{W} + {D}^2 dual, {args.steps} steps, "
            "random-init production transformer (int8 weight_only_rest), "
            "PSNR vs the exact schedule's output, same seed"
        ),
        "exact_pass_time_s": round(t_ref, 2),
        "levels": rows,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "levels"}))


if __name__ == "__main__":
    main()
