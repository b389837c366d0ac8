"""Measured end-to-end pipeline run at PRODUCTION scale on the real chip.

VERDICT r02 #1: the flagship s/asset number must be a measurement, not a
projection stitched from per-stage timings.  This driver runs
``CustomRGBTextureFullPipeline`` in ONE process with the real-size 12B
transformer (random-init — no checkpoints exist in this environment,
WEIGHTS.md — int8 ``weight_only_rest`` so the full model fits the single
16 GB v5e chip, with both LoRA adapters runtime-attached), the full 2×28
denoise steps at the 13,824-token joint sequence, 6×512² views, and the
2048² bake, over N procedural assets; optionally the TSD-SR stage with a
random-init SD3 at production scale.

Per-asset wall clock is host-fenced (flush_io + final artifact stat); the
per-stage breakdown is fenced too (``CPUTimer.fence``): every stage
boundary drains the async device queue with a host round-trip, so the
56-step denoise lands in ``infer_mv``, not in whichever later stage first
touches the host (E2E_r04 misattributed ~112 s of denoise to the bake —
VERDICT r04 weak #5).  Costs ~38 ms per boundary, noise against a 126 s
asset.  Writes the report JSON (default E2E_r05.json).

With ``--sr``, SD3 weight staging is amortized over ``--sr-window`` assets
(default 4): the denoise runs for the whole window first, then ONE
``staged()`` window serves every grid's per-view SR, then all bakes run
(VERDICT r04 weak #1: per-asset staging was ~70 s/asset unamortized).

  python scripts/e2e_production.py --out E2E_r05.json [--assets 3] [--sr]
      [--small]   # --small = tiny shapes for a CPU smoke run
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


def make_assets(job_dir, names):
    """Procedural meshes (OBJ) + synthetic reference images (PNG)."""
    import numpy as np
    from PIL import Image

    from unitex_tpu.geometry.io.mesh_io import save_mesh
    from unitex_tpu.geometry.primitives import (
        make_compound,
        make_icosphere,
        make_torus,
        make_trefoil,
    )

    makers = {
        "trefoil": lambda: make_trefoil(n_major=384, n_minor=40),
        "torus": lambda: make_torus(n_major=192, n_minor=128),
        "compound": lambda: make_compound(subdivisions=5),
        "sphere": lambda: make_icosphere(5),
    }
    jobs = []
    rng = np.random.default_rng(0)
    for name in names:
        mesh_path = os.path.join(job_dir, f"{name}.obj")
        save_mesh(mesh_path, makers[name]())
        # studio-style reference image: colored blob on white
        img = np.full((512, 512, 3), 255, np.uint8)
        yy, xx = np.mgrid[:512, :512]
        c = rng.uniform(140, 360, 2)
        r2 = (yy - c[0]) ** 2 + (xx - c[1]) ** 2
        blob = r2 < rng.uniform(90, 150) ** 2
        img[blob] = (rng.uniform(40, 220, 3)).astype(np.uint8)
        img_path = os.path.join(job_dir, f"{name}.png")
        Image.fromarray(img).save(img_path)
        jobs.append({"name": name, "image": img_path, "mesh": mesh_path})
    return jobs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="E2E_r03.json")
    ap.add_argument("--assets", type=int, default=3)
    ap.add_argument("--repeat", type=int, default=1,
                    help="extra warm repeats of the asset list")
    ap.add_argument("--sr", action="store_true",
                    help="include the TSD-SR stage (random-init SD3)")
    ap.add_argument("--sr-window", type=int, default=4,
                    help="assets per SD3 staging window (host_params SR): "
                         "denoise the whole window, stage SD3 once, SR "
                         "every grid, then bake all.  1 = per-asset "
                         "staging (the r04 regime)")
    ap.add_argument("--no-fence", action="store_true",
                    help="skip the per-stage host fences (r04-style "
                         "approximate stage attribution)")
    ap.add_argument("--sr-batches", type=int, default=1,
                    help="VAE encode/decode tile batch in the SR stage "
                         "(windowed staging drains the denoise queue "
                         "first, so batch 2 has headroom the r04 "
                         "per-asset staged mode lacked)")
    ap.add_argument("--sr-int4", action="store_true",
                    help="nibble-pack the SD3 W8A8 kernels for the staging "
                         "transfer (ops/quant.pack_int4_tree): ~1.1 GB "
                         "crosses the ~40 MB/s tunnel instead of ~2.1, "
                         "unpacked device-side; lossy 4-bit weight grid — "
                         "quality delta in INT4_STAGING_r05.json")
    ap.add_argument("--sr-resident", action="store_true",
                    help="keep the int8 SD3 + bf16 VAE RESIDENT next to "
                         "the 12 GB FLUX instead of host-staging per "
                         "window (~14.4 GB params total; the r04 attempt "
                         "OOMed at <1.5 GB headroom, but the r05 bake "
                         "renders geometry at 512^2 and row-chunks its "
                         "tails — this flag re-tests co-residency)")
    ap.add_argument("--small", action="store_true",
                    help="tiny config for a CPU smoke run")
    ap.add_argument("--weightless", action="store_true",
                    help="skip the transformer (geometry+bake serving path "
                         "only, production scale — isolates the non-FLUX "
                         "stages)")
    ap.add_argument("--work", default=None, help="work dir (default: temp)")
    ap.add_argument("--params-cache", default="/root/e2e_params_cache",
                    help="quantized-serving-tree disk cache dir "
                         "(utils/param_cache.py) — skips the ~45 min "
                         "host init/quantize on later runs")
    args = ap.parse_args()

    import tempfile

    import jax
    import numpy as np

    # rbg PRNG: threefry random-init of GB-scale trees is minutes-slow on
    # the host CPU backend (CLAUDE.md measured facts / bench.py)
    jax.config.update("jax_default_prng_impl", "rbg")

    from unitex_tpu.pipeline import CustomRGBTextureFullPipeline
    from unitex_tpu.utils.timer import CPUTimer

    work = args.work or tempfile.mkdtemp(prefix="e2e_")
    job_dir = os.path.join(work, "jobs")
    os.makedirs(job_dir, exist_ok=True)
    names = ["trefoil", "torus", "compound", "sphere"][: args.assets]
    jobs = make_assets(job_dir, names)

    config = None
    pipe_kwargs = dict(
        random_weights=not args.small and not args.weightless,
        int8_serving="max_memory" if not (args.small or args.weightless)
        else False,
        save_artifacts=False,
        async_io=True,
        params_cache=(args.params_cache
                      if not (args.small or args.weightless) else None),
    )
    if args.small:
        import dataclasses

        from unitex_tpu.config import (
            BakeConfig, CameraConfig, DiffusionConfig, MeshConfig,
            PipelineConfig,
        )

        config = PipelineConfig(
            camera=CameraConfig(view_size=64),
            bake=BakeConfig(uv_size=128),
            mesh=MeshConfig(min_faces=0, max_faces=4000, shape_bucket=1024),
            diffusion=DiffusionConfig(
                height=64, width=384, dual_size=64, num_inference_steps=2,
            ),
        )
        pipe_kwargs["config"] = config

    t_build0 = time.perf_counter()
    pipe = CustomRGBTextureFullPipeline(**pipe_kwargs)
    if args.sr:
        from unitex_tpu.models.sd3.config import SD3Config
        from unitex_tpu.models.sd3.model import init_sd3_params
        from unitex_tpu.models.sd3.sr_pipeline import TSDSRConfig, TSDSRPipeline
        from unitex_tpu.models.flux.vae import VAEConfig, init_vae_params

        s_cfg = SD3Config.tiny() if args.small else SD3Config.sd3_medium()
        v_cfg = VAEConfig.tiny() if args.small else VAEConfig.sd3()
        import jax.numpy as jnp

        sd3_cache = (os.path.join(args.params_cache, "sd3_random_s10_int8.npz")
                     if args.params_cache and not args.small else None)
        # fingerprint the things leaf-shape validation can't catch: config
        # identity, init seeds, quantizer version (ADVICE r04: a stale
        # cached tree was otherwise served silently after a config/seed/
        # quantizer change)
        sd3_meta_expect = {
            "model": "sd3_sr_serving",
            "seeds": [10, 11],
            "config": "sd3_medium+vae_sd3",
            "quantizer": "quantize_linears_v1_bf16",
        }
        cached = None
        if sd3_cache and os.path.exists(sd3_cache):
            from unitex_tpu.utils.param_cache import load_meta, load_params

            meta = load_meta(sd3_cache) or {}
            if meta == sd3_meta_expect:
                cached = load_params(sd3_cache)
            else:
                print(f"[e2e] stale SD3 cache meta {meta!r} != expected; "
                      "rebuilding", flush=True)
        if cached is not None:
            sp, vp = cached["sd3"], cached["vae"]
        else:
            host = jax.devices("cpu")[0]
            with jax.default_device(host):
                sp = init_sd3_params(jax.random.key(10), s_cfg)
                # the SD3 must co-reside with the 12 GB int8 FLUX on the
                # 16 GB chip: bf16 first (f32 2B = 8 GB OOMs at build),
                # then the int8 serving quantization (~2 GB resident; the
                # stage is VAE-dominated so int8 is time-neutral)
                sp = jax.tree.map(lambda x: x.astype(jnp.bfloat16), sp)
                if not args.small:
                    # quantize ON THE HOST: letting TSDSRPipeline quantize
                    # after device_put would transiently hold bf16 (4 GB)
                    # + int8 next to the 12 GB FLUX
                    from unitex_tpu.ops.quant import quantize_linears

                    sp = quantize_linears(sp)
                vp = init_vae_params(jax.random.key(11), v_cfg)
                vp = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vp)
            if sd3_cache:
                import numpy as _np

                from unitex_tpu.utils.param_cache import save_params

                save_params(sd3_cache, {
                    "sd3": jax.tree.map(_np.asarray, sp),
                    "vae": jax.tree.map(_np.asarray, vp),
                }, meta=sd3_meta_expect)
        # co-residency: permanent SD3 residency next to the 12 GB int8
        # FLUX left <1.5 GB of HBM — less than the denoise/bake temps
        # (r04 --sr OOM) — so the SR stage STAGES its weights per call
        # (host_params=True, ~2.3 GB per asset over the transfer tunnel)
        # and decodes at the measured-safe small batch (vae_decode_batch=0
        # auto falls back to 2 where memory stats are unavailable)
        # batch 1 encode/decode: co-residency leaves ~1.5 GB after the
        # staged SD3 lands next to the 12 GB FLUX — decode batch 2
        # (2x0.8 GB bf16 tile peaks) and encode batch 2 both graze it
        # decoder tile 64 latent (512^2 pixel): the 128-tile decode's
        # ~0.8 GB scratch programs overlap in the queue and graze the
        # co-residency headroom once the LoRAs/conditioning buffers are
        # also resident (measured: probe passes at 128, the E2E OOMs)
        # --small: the tiny VAE's downscale is 2, so production tile sizes
        # are pathological on it — a 512² encoder tile reaches the VAE
        # mid-block attention with 256²=65k tokens (a 17 GB logit matrix,
        # measured as a ~60 GB host RSS blowup), and a 64² latent tile
        # exceeds tiny SD3's pos_embed_max_size=16 (patch 2).  Smoke tiles
        # keep every attention span tiny.
        sr_cfg = TSDSRConfig(
            vae_encoder_tile=128, latent_tile=32, latent_overlap=4,
            vae_decoder_tile=32, host_params=args.sr_int4,
            stage_pack_int4=args.sr_int4,
        ) if args.small else TSDSRConfig(
            vae_decode_batch=args.sr_batches,
            vae_encode_batch=args.sr_batches, tile_batch=2,
            vae_decoder_tile=64, host_params=not args.sr_resident,
            stage_pack_int4=args.sr_int4)
        # resident mode puts the trees on device ONCE at build (chunked:
        # one batched 2.2 GB put OOMs nondeterministically, r04)
        if args.sr_resident and not args.small:
            from unitex_tpu.models.sd3.sr_pipeline import _chunked_put

            stage = (lambda t: _chunked_put(t, jax.devices()[0]))
        else:
            stage = ((lambda t: t) if not args.small
                     else (lambda t: jax.device_put(t, jax.devices()[0])))
        pipe.sr_pipeline = TSDSRPipeline(
            cfg=sr_cfg,
            sd3_cfg=s_cfg,
            transformer_params=stage(sp),
            vae_params=stage(vp),
        )
        pipe.sr_pipeline.vae_cfg = v_cfg
    t_build = time.perf_counter() - t_build0

    # fence at every timed stage boundary so the async device queue drains
    # where the work was dispatched (VERDICT r04 weak #5)
    CPUTimer.fence = not args.no_fence

    stage_keys = [
        "preprocess_blank_mesh", "preprocess_reference_image",
        "render_geometry_images", "infer_mv", "apply_sr",
        "reproject_and_query_field",
    ]
    results = []
    order = jobs * (1 + args.repeat)

    def snapshot(before):
        """Stage values CHANGED since ``before`` — call right after the
        phase that produced them (CPUTimer.records only keeps the last
        value per name, so a deferred read reports another asset's)."""
        return {
            k: round(CPUTimer.records[k], 3)
            for k in stage_keys
            if k in CPUTimer.records and CPUTimer.records.get(k) != before.get(k)
        }

    def record(i, job, total, before, extra=None, stages=None):
        stages = dict(stages) if stages is not None else snapshot(before)
        out_dir = os.path.join(work, "out", f"{i:02d}_{job['name']}")
        glb = os.path.join(out_dir, "textured_mesh.glb")
        ok = os.path.exists(glb) and os.path.getsize(glb) > 0
        results.append({
            "asset": job["name"], "pass": "warm" if i >= len(jobs) else "first",
            "total_s": round(total, 3), "stages_s": stages, "glb_ok": ok,
            **(extra or {}),
        })
        print(json.dumps(results[-1]))
        _write_report(args, t_build, results)  # incremental: survive kills

    window = args.sr_window if args.sr else 1
    if window <= 1:
        for i, job in enumerate(order):
            out_dir = os.path.join(work, "out", f"{i:02d}_{job['name']}")
            os.makedirs(out_dir, exist_ok=True)
            before = dict(CPUTimer.records)
            t0 = time.perf_counter()
            pipe(out_dir, job["image"], job["mesh"])
            pipe.flush_io()
            record(i, job, time.perf_counter() - t0, before)
    else:
        # windowed --sr: per-asset totals are each asset's own fenced
        # stage walls plus its 1/k share of the window's SD3 staging
        import contextlib

        import jax.numpy as jnp

        for w0 in range(0, len(order), window):
            wjobs = list(enumerate(order))[w0 : w0 + window]
            held = []
            for i, job in wjobs:
                out_dir = os.path.join(work, "out", f"{i:02d}_{job['name']}")
                cache_dir = os.path.join(out_dir, "cache")
                os.makedirs(cache_dir, exist_ok=True)
                before = dict(CPUTimer.records)
                t0 = time.perf_counter()
                pre = pipe.preprocess_job(out_dir, job["image"], job["mesh"])
                condition = pipe.render_geometry_images_stage(
                    cache_dir, pre[0])
                mv = pipe.infer_mv_stage(
                    cache_dir, pre[1], condition, apply_sr=False)
                # pull the low-res grid to the host: frees the denoise
                # buffers before the next asset and fences the queue
                mv = np.asarray(mv)
                # hold only what the bake reads: the per-view conditioning
                # images (~56 MB/asset) otherwise accumulate on device
                # across the window and shaved the denoise headroom (the
                # window-8 OOM at asset 8's LoRA attach)
                condition = {k: condition[k]
                             for k in ("mesh", "c2ws", "intrinsics")}
                held.append([i, job, pre, condition, mv,
                             time.perf_counter() - t0, before,
                             snapshot(before)])
            # ONE staging window for every grid in this batch: the
            # staged() entry pays the SD3 host->device transfer once
            t0 = time.perf_counter()
            staged_ctx = getattr(pipe.sr_pipeline, "staged",
                                 contextlib.nullcontext)
            with staged_ctx():
                t_staged_in = time.perf_counter() - t0  # the weight puts
                for rec in held:
                    t0 = time.perf_counter()
                    with CPUTimer("apply_sr"):
                        rec[4] = pipe._apply_sr(rec[4])
                    rec[5] += time.perf_counter() - t0
                    rec[7]["apply_sr"] = round(
                        CPUTimer.records["apply_sr"], 3)
            stage_share = t_staged_in / len(held)
            import shutil

            for rec in held:
                i, job, pre, condition, mv, total, before, stages = rec
                out_dir = os.path.join(work, "out", f"{i:02d}_{job['name']}")
                cache_dir = os.path.join(out_dir, "cache")
                t0 = time.perf_counter()
                pipe.reproject_stage(
                    cache_dir, condition["mesh"], jnp.asarray(mv),
                    condition, pre[0])
                pipe.flush_io()
                glb = os.path.join(cache_dir, "textured_mesh.glb")
                if os.path.exists(glb):
                    shutil.copy(glb, os.path.join(out_dir,
                                                  "textured_mesh.glb"))
                stages["reproject_and_query_field"] = round(
                    CPUTimer.records.get("reproject_and_query_field", 0.0), 3)
                total += time.perf_counter() - t0 + stage_share
                record(i, job, total, before,
                       extra={"sr_staging_share_s": round(stage_share, 3)},
                       stages=stages)
            del held

    _write_report(args, t_build, results, final=True)


def _write_report(args, t_build, results, final=False):
    import jax
    import numpy as np

    warm = [r["total_s"] for r in results if r["pass"] == "warm"]
    report = {
        "metric": "e2e_production_pipeline",
        "protocol": (
            "small-mode smoke (weightless, tiny shapes)" if args.small else
            "weightless serving path (geometry+bake, production scale)"
            if args.weightless else
            "one process, CustomRGBTextureFullPipeline, 12B random-init "
            "transformer int8 weight_only_rest + 2 runtime-attached LoRAs, "
            "2x28 denoise @ seq 13824, 6x512^2 views, 2048^2 bake"
            + (", TSD-SR 512^2->2048^2 grid" if args.sr else "")
        ),
        "device": jax.devices()[0].platform,
        "n_devices": jax.device_count(),
        "sr": args.sr,
        "build_s": round(t_build, 1),
        "assets": results,
        "warm_median_s": round(float(np.median(warm)), 3) if warm else None,
        "complete": final,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    if final:
        print(json.dumps({k: v for k, v in report.items() if k != "assets"}))


if __name__ == "__main__":
    main()
