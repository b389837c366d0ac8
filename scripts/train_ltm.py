"""Train the LTM texture-function VAE (models/ltm.py) on procedural data.

VERDICT r03 #3: the LTM shipped with a trainer and an overfit test but was
never exercised TRAINED — its purpose (occlusion inpainting for the
stage-2.2 ``query_field`` hook, reference pipeline.py:410-564) was never
demonstrated.  This driver trains it on the procedural family the oracle
measures: randomized primitives (sphere/torus/trefoil/compound/cup point
banks, built once on the host) x random smooth RGB fields x contiguous
OCCLUSION HOLES (training/ltm.py occlusion_split — the inference regime,
not a fine random scatter), then reports held-out hole-PSNR and writes the
trained params as a fingerprinted npz (utils/param_cache.py).

  python scripts/train_ltm.py --out ltm_params.npz [--steps 20000]
      [--tiny]   # CPU smoke

The checkpoint feeds scripts/oracle_campaign.py --ltm <npz> (fill=ltm
column) and pipeline.reproject_with_field.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# honor an explicit platform request (cpu smoke runs) — but do NOT lock
# the platform list to the sitecustomize's "axon" value
if os.environ.get("JAX_PLATFORMS") and os.environ["JAX_PLATFORMS"] != "axon":
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ltm_params.npz")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--bank-meshes", type=int, default=40)
    ap.add_argument("--bank-points", type=int, default=16384)
    ap.add_argument("--n-query", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--kl-weight", type=float, default=1e-6)
    ap.add_argument("--log-every", type=int, default=500)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config + few steps (CPU smoke)")
    ap.add_argument("--config", default="large",
                    choices=["default", "large"],
                    help="model capacity (large = 4x, VERDICT r04 #2b)")
    ap.add_argument("--curriculum", default="default",
                    choices=["default", "r04", "affine"],
                    help="field family: default (context-inferable scales),"
                         " r04 (the flat-curve settings, for A/B), affine "
                         "(pure affine fields — learning diagnostic)")
    ap.add_argument("--report", default=None,
                    help="write a JSON training report here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from unitex_tpu.models.ltm import LTMConfig, init_ltm_params, ltm_vae_loss
    from unitex_tpu.training.ltm import (
        LTMCurriculum, LTMTrainConfig, LTMTrainState, build_point_bank,
        idw_fill_baseline, sample_device_batch,
    )
    from unitex_tpu.utils.param_cache import save_params

    cur = {
        "default": LTMCurriculum(),
        "r04": LTMCurriculum.r04(),
        "affine": LTMCurriculum.affine_only(),
    }[args.curriculum]
    if args.tiny:
        cfg = LTMConfig.tiny()
        args.steps = min(args.steps, 200)
        args.bank_meshes = 4
        args.bank_points = 1024
        args.n_query = 256
        args.log_every = 50
    else:
        cfg = LTMConfig.large() if args.config == "large" else LTMConfig()
    tcfg = LTMTrainConfig(
        learning_rate=args.lr, kl_weight=args.kl_weight,
        n_visible=args.bank_points, n_query=args.n_query,
    )

    t0 = time.perf_counter()
    bank = build_point_bank(args.bank_meshes, args.bank_points, seed=0)
    print(f"point bank {bank.shape} built in {time.perf_counter() - t0:.1f}s",
          flush=True)
    bank_dev = jnp.asarray(bank)
    # one mesh held out entirely for evaluation
    n_train = bank.shape[0] - 1

    params = init_ltm_params(jax.random.key(0), cfg)
    # cosine decay with warmup: the cross-attention latents collapse at
    # full LR from step 0
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(500, args.steps // 10),
        decay_steps=args.steps, end_value=args.lr * 0.05,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.adamw(sched),
    )
    state = LTMTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
    )

    from functools import partial

    def _one_step(state, key, points, n_query):
        kb, kl = jax.random.split(key)
        batch = sample_device_batch(kb, points, n_query, cur)

        def loss_fn(p):
            return ltm_vae_loss(
                p, cfg, batch["points"], batch["colors"], batch["valid"],
                batch["query_points"], batch["query_colors"], kl,
                kl_weight=tcfg.kl_weight,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return LTMTrainState(
            step=state.step + 1, params=new_params, opt_state=opt_state
        ), loss

    @partial(jax.jit, static_argnames=("n_query",), donate_argnums=(0,))
    def step_fn(state, key, points, n_query):
        return _one_step(state, key, points, n_query)

    @partial(jax.jit, static_argnames=("n_query", "n_steps"),
             donate_argnums=(0,))
    def multi_step_fn(state, key, bank, n_query, n_steps):
        """``n_steps`` train steps in ONE device program (lax.scan): data
        sampling is already device-side, so chaining amortizes the ~38 ms
        remote-exec round-trip per dispatch (CLAUDE.md measured facts) —
        the whole 20k-step run becomes a few hundred dispatches."""

        def body(carry, _):
            state, key = carry
            key, ks, km = jax.random.split(key, 3)
            mi = jax.random.randint(km, (), 0, bank.shape[0])
            state, loss = _one_step(state, ks, bank[mi], n_query)
            return (state, key), loss

        (state, key), losses = jax.lax.scan(
            body, (state, key), None, length=n_steps)
        return state, losses[-1]

    @partial(jax.jit, static_argnames=("n_query",))
    def eval_psnr(params, key, points, n_query):
        """Held-out: fresh field + holes on the held-out mesh; PSNR over
        the HOLE queries ONLY (query_in_hole — the r04 eval diluted the
        metric with the visible top-up queries), plus the k=8 IDW fill
        baseline on the SAME batch (the bar the LTM must beat,
        renderer_inverse._fill_invisible_knn semantics)."""
        from unitex_tpu.models.ltm import decode_field, encode_geometry

        kb, _ = jax.random.split(key)
        batch = sample_device_batch(kb, points, n_query, cur)
        z, _, _ = encode_geometry(
            params, cfg, batch["points"], batch["colors"], batch["valid"]
        )
        pred = decode_field(
            params, cfg, z, batch["query_points"],
            ctx=(batch["points"], batch["colors"], batch["valid"]),
        )
        idw = idw_fill_baseline(
            batch["points"], batch["colors"], batch["valid"],
            batch["query_points"], k=8,
        )
        hole = batch["query_in_hole"]
        n = jnp.maximum(jnp.sum(hole), 1)

        def psnr(p):
            err2 = jnp.mean((p - batch["query_colors"]) ** 2, axis=-1)
            mse = jnp.sum(jnp.where(hole, err2, 0.0)) / n
            return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))

        return psnr(pred), psnr(idw)

    key = jax.random.key(1)
    mesh_rng = np.random.default_rng(2)  # host pick: no device round-trip
    train_bank = bank_dev[:n_train]
    losses = []
    best = {"psnr": -1.0, "params": None, "step": 0}
    t0 = time.perf_counter()
    it = 0
    chunk = 1 if args.tiny else min(args.log_every, 250)
    while it < args.steps:
        key, ks = jax.random.split(key)
        if chunk > 1:
            n = min(chunk, args.steps - it)
            state, loss = multi_step_fn(state, ks, train_bank,
                                        args.n_query, n)
            it += n
        else:
            mesh_i = int(mesh_rng.integers(n_train))
            state, loss = step_fn(state, ks, bank_dev[mesh_i], args.n_query)
            it += 1
        if it % args.log_every == 0 or it >= args.steps or it <= chunk:
            l = float(loss)
            p, p_idw = eval_psnr(
                state.params, jax.random.key(10_000 + it), bank_dev[-1],
                args.n_query,
            )
            dt = time.perf_counter() - t0
            losses.append({"step": it, "loss": round(l, 6),
                           "holdout_hole_psnr_db": round(float(p), 2),
                           "idw_k8_hole_psnr_db": round(float(p_idw), 2),
                           "elapsed_s": round(dt, 1)})
            print(json.dumps(losses[-1]), flush=True)
            # keep the BEST holdout state: long runs must not ship a
            # checkpoint that drifted below an earlier eval point
            if float(p) > best["psnr"]:
                best = {"psnr": float(p),
                        "params": jax.tree.map(np.asarray, state.params),
                        "step": it}

    host_params = (best["params"] if best["params"] is not None
                   else jax.tree.map(np.asarray, state.params))
    print(f"saving best-holdout params (step {best['step']}, "
          f"{best['psnr']:.2f} dB)", flush=True)
    save_params(args.out, host_params, meta={
        "model": "ltm_texture_vae",
        "config": {k: getattr(cfg, k) for k in (
            "n_latents", "latent_dim", "n_heads", "n_self_layers",
            "n_fourier", "color_dim", "kl_latent_dim", "n_cross_layers",
            "kernel_decode", "kernel_tau")},
        "steps": args.steps,
        "best_step": best["step"],
        "curriculum": args.curriculum,
        "data": "procedural primitives x random smooth fields x "
                "occlusion holes (training/ltm.py)",
    })
    print(f"wrote {args.out}", flush=True)
    if args.report:
        with open(args.report, "w") as f:
            json.dump({
                "metric": "ltm_training",
                "steps": args.steps,
                "config": "tiny" if args.tiny else args.config,
                "curriculum": args.curriculum,
                "bank": [args.bank_meshes, args.bank_points],
                "best_step": best["step"],
                "best_holdout_hole_psnr_db": round(best["psnr"], 2),
                "log": losses,
            }, f, indent=2)


if __name__ == "__main__":
    main()
