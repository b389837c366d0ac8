"""Batch texture-generation driver for production serving.

Loads models once and processes a queue of (image, mesh) jobs, amortizing
weight loading and compilation across the batch (the reference re-runs its
single-shot run.py per asset).  Jobs: a directory with ``<name>.png`` +
``<name>.{glb,obj,ply}`` pairs, or a JSONL manifest with
``{"name":..., "image":..., "mesh":...}`` lines.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

MESH_EXTS = (".glb", ".obj", ".ply")


def discover_jobs(path):
    if path.endswith(".jsonl"):
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
    jobs = []
    for img in sorted(glob.glob(os.path.join(path, "*.png"))):
        name = os.path.splitext(os.path.basename(img))[0]
        for ext in MESH_EXTS:
            mesh = os.path.join(path, name + ext)
            if os.path.exists(mesh):
                jobs.append({"name": name, "image": img, "mesh": mesh})
                break
    return jobs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jobs", help="job directory or JSONL manifest")
    ap.add_argument("--out", default="batch_out")
    ap.add_argument("--pretrain-models", default=None)
    ap.add_argument("--seed", type=int, default=63)
    ap.add_argument("--super-resolution", action="store_true")
    ap.add_argument("--sr-window", type=int, default=1,
                    help="assets per SD3 weight-staging window when the SR "
                         "stage runs host_params (max-memory co-residency):"
                         " denoise the window first, stage SD3 ONCE, SR "
                         "every grid, then bake all — amortizes the "
                         "~2.3 GB / ~60 s per-staging transfer (the tunnel "
                         "moves ~40 MB/s) over the window")
    ap.add_argument("--keep-going", action="store_true",
                    help="continue past per-job failures")
    ap.add_argument("--no-artifacts", action="store_true",
                    help="skip intermediate PNG dumps (fastest serving)")
    ap.add_argument("--no-prefetch", action="store_true",
                    help="disable the host-preprocess worker thread that "
                         "overlaps job N+1's CPU mesh/image work with job "
                         "N's device work")
    ap.add_argument("--sync-io", action="store_true",
                    help="write each job's GLB before starting the next "
                         "(default: a writer thread overlaps the 1-3 s "
                         "GLB/PNG encode with the next job's device work)")
    ap.add_argument("--int8", dest="int8", action="store_const", const=True,
                    default=False, help="W8A8 int8 serving (fastest)")
    ap.add_argument("--int8-max-memory", dest="int8",
                    action="store_const", const="max_memory",
                    help="int8 + weight-only storage (12B on one 16 GB chip)")
    ap.add_argument("--small", action="store_true",
                    help="reduced resolutions (smoke tests / CPU)")
    ap.add_argument("--fast-steps", type=int, default=0,
                    help="denoise steps served by velocity extrapolation "
                         "instead of a transformer evaluation (training-"
                         "free speedup; 0 = the exact 28-step schedule). "
                         "CAVEAT: quality measured on a RANDOM-INIT "
                         "transformer only (VELOCITY_REUSE_r03.json) — "
                         "re-run scripts/eval_velocity_reuse.py on real "
                         "weights before relying on it")
    args = ap.parse_args()

    from unitex_tpu.pipeline import CustomRGBTextureFullPipeline

    config = None
    if args.small:
        from unitex_tpu.config import (
            BakeConfig, CameraConfig, MeshConfig, PipelineConfig,
        )

        config = PipelineConfig(
            camera=CameraConfig(view_size=64),
            mesh=MeshConfig(min_faces=500, max_faces=4000, uv_size=256),
            bake=BakeConfig(uv_size=256),
        )

    if args.fast_steps:
        import dataclasses

        from unitex_tpu.config import DEFAULT_CONFIG

        base = config if config is not None else DEFAULT_CONFIG
        config = dataclasses.replace(
            base,
            diffusion=dataclasses.replace(
                base.diffusion, velocity_reuse=args.fast_steps
            ),
        )

    jobs = discover_jobs(args.jobs)
    if not jobs:
        print("no jobs found"); return
    print(f"{len(jobs)} jobs")

    kwargs = {"config": config} if config is not None else {}
    pipe = CustomRGBTextureFullPipeline(
        pretrain_models=args.pretrain_models,
        super_resolutions=args.super_resolution,
        seed=args.seed,
        save_artifacts=not args.no_artifacts,
        int8_serving=args.int8,
        async_io=not args.sync_io,
        **kwargs,
    )
    # host/device pipelining: a single worker thread runs job N+1's CPU
    # preprocessing (mesh decimate/unwrap + matting) while the main thread
    # drives the device through job N (diffusion + bake) — the CPU half
    # disappears from steady-state batch latency
    from concurrent.futures import ThreadPoolExecutor

    executor = None if args.no_prefetch else ThreadPoolExecutor(max_workers=1)

    def submit(job):
        out_dir = os.path.join(args.out, job["name"])
        return executor.submit(
            pipe.preprocess_job, out_dir, job["image"], job["mesh"]
        )

    pending = submit(jobs[0]) if executor else None
    results = []
    if args.sr_window > 1 and pipe.sr_pipeline is not None:
        _run_windowed(args, pipe, jobs, executor, submit, pending, results)
        _finish(args, pipe, results)
        return
    for i, job in enumerate(jobs):
        out_dir = os.path.join(args.out, job["name"])
        t0 = time.perf_counter()
        try:
            pre = pending.result() if pending is not None else None
        except Exception as e:
            pre, job_error = None, e
        else:
            job_error = None
        if executor and i + 1 < len(jobs):
            pending = submit(jobs[i + 1])
        try:
            if job_error is not None:
                raise job_error
            rembg, glb = pipe(
                out_dir, job["image"], job["mesh"], preprocessed=pre
            )
            dt = time.perf_counter() - t0
            results.append({"name": job["name"], "glb": glb, "seconds": round(dt, 2)})
            print(f"[{i+1}/{len(jobs)}] {job['name']}: {dt:.1f}s")
        except Exception as e:
            if not args.keep_going:
                raise
            results.append({"name": job["name"], "error": str(e)})
            print(f"[{i+1}/{len(jobs)}] {job['name']}: FAILED {e}")
    if executor:
        executor.shutdown(wait=False)
    _finish(args, pipe, results)


def _finish(args, pipe, results):
    try:
        pipe.flush_io()
    except Exception as e:
        results.append({"name": "__flush_io__", "error": str(e)})
        if not args.keep_going:
            raise
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(results, f, indent=2)


def _run_windowed(args, pipe, jobs, executor, submit, pending, results):
    """SR-window serving loop: denoise ``--sr-window`` assets with SR
    deferred, run every grid's SR inside ONE sr_pipeline.staged() weight
    window, then bake all (scripts/e2e_production.py measures this mode;
    reference analogue: the per-asset single-shot loop at
    /root/reference/pipeline.py:284-289 re-pays SD3 residency per asset)."""
    import contextlib
    import shutil

    import numpy as np

    window = args.sr_window
    n = len(jobs)
    i = 0
    while i < n:
        wjobs = jobs[i : i + window]
        held = []
        for k, job in enumerate(wjobs):
            out_dir = os.path.join(args.out, job["name"])
            cache = os.path.join(out_dir, "cache")
            os.makedirs(cache, exist_ok=True)
            t0 = time.perf_counter()
            try:
                if pending is not None:
                    pre = pending.result()
                else:
                    pre = pipe.preprocess_job(out_dir, job["image"],
                                              job["mesh"])
                if executor and i + k + 1 < n:
                    pending = submit(jobs[i + k + 1])
                else:
                    pending = None
                condition = pipe.render_geometry_images_stage(cache, pre[0])
                mv = np.asarray(pipe.infer_mv_stage(
                    cache, pre[1], condition, apply_sr=False))
                # hold only what the bake reads — the conditioning images
                # (~56 MB/asset) otherwise stay resident across the window
                condition = {k: condition[k]
                             for k in ("mesh", "c2ws", "intrinsics")}
                held.append([job, out_dir, cache, pre, condition, mv, t0])
            except Exception as e:
                if not args.keep_going:
                    raise
                results.append({"name": job["name"], "error": str(e)})
                print(f"{job['name']}: FAILED {e}")
        staged_ctx = getattr(pipe.sr_pipeline, "staged",
                             contextlib.nullcontext)
        with staged_ctx():
            for rec in held:
                rec[5] = pipe._apply_sr(
                    rec[5], rec[2] if not args.no_artifacts else None)
        if not args.no_artifacts:
            from unitex_tpu.utils.image_io import save_image

            for rec in held:
                save_image(os.path.join(rec[2], "mv_rgb.png"), rec[5])
        for job, out_dir, cache, pre, condition, mv, t0 in held:
            try:
                import jax.numpy as jnp

                glb = pipe.reproject_stage(
                    cache, condition["mesh"], jnp.asarray(mv), condition,
                    pre[0])
                shutil.copy(os.path.join(cache, "rembg_image.png"),
                            os.path.join(out_dir, "rembg_image.png"))
                pipe._submit_io(shutil.copy, glb,
                                os.path.join(out_dir, "textured_mesh.glb"))
                dt = time.perf_counter() - t0
                results.append({"name": job["name"],
                                "glb": os.path.join(out_dir,
                                                    "textured_mesh.glb"),
                                "seconds": round(dt, 2)})
                print(f"{job['name']}: {dt:.1f}s (window {window})")
            except Exception as e:
                if not args.keep_going:
                    raise
                results.append({"name": job["name"], "error": str(e)})
                print(f"{job['name']}: FAILED {e}")
        i += window
    if executor:
        executor.shutdown(wait=False)


if __name__ == "__main__":
    main()
