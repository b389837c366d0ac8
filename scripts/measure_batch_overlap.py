"""Measure the prefetch-OVERLAPPED batch steady state (VERDICT r03 weak #2).

README claims "overlapped steady state ≈ max(host, device)" from the batch
driver's prefetch thread (scripts/batch_pipeline.py), but the only
recorded number was the SEQUENTIAL per-asset wall.  This harness runs ONE
warm process (weightless, production scale — the same protocol as
E2E_r03_weightless.json) over a repeated asset list three ways:

  1. warm-up pass (compilation/executable loads, not scored)
  2. sequential: preprocess_job inline, synchronous GLB writes
  3. overlapped: job N+1's host preprocess on a worker thread while job
     N's device work runs, GLB encode on the async writer

and reports per-pass per-asset walls + medians, so the overlap win is a
measurement.  Writes BATCH_OVERLAP_r04.json.

  python scripts/measure_batch_overlap.py --out BATCH_OVERLAP_r04.json
      [--assets 4] [--reps 2] [--small]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") and os.environ["JAX_PLATFORMS"] != "axon":
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BATCH_OVERLAP_r04.json")
    ap.add_argument("--assets", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2,
                    help="repeats of the asset list per scored pass")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--work", default=None)
    args = ap.parse_args()

    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from e2e_production import make_assets
    from unitex_tpu.pipeline import CustomRGBTextureFullPipeline

    work = args.work or tempfile.mkdtemp(prefix="overlap_")
    job_dir = os.path.join(work, "jobs")
    os.makedirs(job_dir, exist_ok=True)
    names = ["trefoil", "torus", "compound", "sphere"][: args.assets]
    jobs = make_assets(job_dir, names)

    pipe_kwargs = dict(save_artifacts=False, async_io=True)
    if args.small:
        from unitex_tpu.config import (
            BakeConfig, CameraConfig, MeshConfig, PipelineConfig,
        )

        pipe_kwargs["config"] = PipelineConfig(
            camera=CameraConfig(view_size=64),
            mesh=MeshConfig(min_faces=500, max_faces=4000, uv_size=256),
            bake=BakeConfig(uv_size=256),
        )
    pipe = CustomRGBTextureFullPipeline(**pipe_kwargs)

    def run_pass(tag, order, overlapped):
        executor = ThreadPoolExecutor(max_workers=1) if overlapped else None
        times = []

        def submit(i):
            job = order[i]
            out_dir = os.path.join(work, tag, f"{i:02d}_{job['name']}")
            os.makedirs(out_dir, exist_ok=True)
            return executor.submit(
                pipe.preprocess_job, out_dir, job["image"], job["mesh"]
            )

        pending = submit(0) if overlapped else None
        for i, job in enumerate(order):
            out_dir = os.path.join(work, tag, f"{i:02d}_{job['name']}")
            os.makedirs(out_dir, exist_ok=True)
            t0 = time.perf_counter()
            pre = pending.result() if pending is not None else None
            if overlapped and i + 1 < len(order):
                pending = submit(i + 1)
            pipe(out_dir, job["image"], job["mesh"], preprocessed=pre)
            if not overlapped:
                pipe.flush_io()  # synchronous writes in the sequential pass
            times.append(round(time.perf_counter() - t0, 3))
        pipe.flush_io()
        if executor:
            executor.shutdown(wait=False)
        return times

    t0 = time.perf_counter()
    run_pass("warmup", jobs, overlapped=False)
    warmup_s = round(time.perf_counter() - t0, 1)
    order = jobs * args.reps
    seq = run_pass("seq", order, overlapped=False)
    ovl = run_pass("ovl", order, overlapped=True)

    report = {
        "metric": "batch_overlap_steady_state",
        "protocol": (
            "one warm process, weightless serving path at "
            + ("small smoke scale" if args.small else "production scale "
               "(6x512^2 views, 2048^2 bake)")
            + f"; {len(order)}-job scored passes (assets x{args.reps}): "
            "sequential (inline preprocess, sync IO) vs overlapped "
            "(prefetch thread + async GLB writer) — scripts/"
            "batch_pipeline.py's serving composition"
        ),
        "warmup_pass_s": warmup_s,
        "sequential_s": seq,
        "overlapped_s": ovl,
        "sequential_median_s": round(float(np.median(seq)), 3),
        "overlapped_median_s": round(float(np.median(ovl)), 3),
        "overlap_win": round(
            float(np.median(seq)) / max(float(np.median(ovl)), 1e-9), 3),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.endswith("_s") or "median" in k}))


if __name__ == "__main__":
    main()
