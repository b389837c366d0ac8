"""Time-to-first-asset for a FRESH process, with and without prewarm.

VERDICT r02 #9: serving cold-start (~3.5-5 min of cached-executable loads)
was unexamined.  This driver measures, in one fresh process:

  --mode plain    submit a job immediately; report submit->done latency.
  --mode prewarm  run pipeline.prewarm() first (recording the per-stage
                  executable-load breakdown), THEN submit; report both the
                  prewarm wall and the submit->done latency.

The serving win is the prewarm overlap: a server process prewarms while
idle (before any request arrives), so the first request sees the
post-prewarm latency instead of eating the executable loads.  Run each
mode in a separate fresh process; write/merge COLDSTART_r03.json.

  python scripts/measure_coldstart.py --mode plain  --out COLDSTART_r03.json
  python scripts/measure_coldstart.py --mode prewarm --out COLDSTART_r03.json
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
    ap.add_argument("--mode", choices=["plain", "prewarm"], required=True)
    ap.add_argument("--out", default="COLDSTART_r03.json")
    args = ap.parse_args()

    import tempfile

    import numpy as np
    from PIL import Image

    from unitex_tpu.geometry.io.mesh_io import save_mesh
    from unitex_tpu.geometry.primitives import make_trefoil
    from unitex_tpu.pipeline import CustomRGBTextureFullPipeline

    work = tempfile.mkdtemp(prefix="coldstart_")
    mesh_path = os.path.join(work, "m.obj")
    save_mesh(mesh_path, make_trefoil(n_major=384, n_minor=40))
    img = np.full((512, 512, 3), 255, np.uint8)
    img[128:384, 128:384] = [180, 80, 40]
    img_path = os.path.join(work, "i.png")
    Image.fromarray(img).save(img_path)

    t0 = time.perf_counter()
    pipe = CustomRGBTextureFullPipeline(
        save_artifacts=False, async_io=True
    )
    t_build = time.perf_counter() - t0

    entry = {"mode": args.mode, "build_s": round(t_build, 2)}
    if args.mode == "prewarm":
        t0 = time.perf_counter()
        entry["prewarm_stages_s"] = pipe.prewarm()
        entry["prewarm_total_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    pipe(os.path.join(work, "out"), img_path, mesh_path)
    pipe.flush_io()
    entry["first_job_s"] = round(time.perf_counter() - t0, 2)

    report = {"metric": "serving_cold_start", "runs": []}
    if os.path.exists(args.out):
        with open(args.out) as f:
            report = json.load(f)
    report["runs"] = [r for r in report["runs"] if r["mode"] != args.mode]
    report["runs"].append(entry)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
