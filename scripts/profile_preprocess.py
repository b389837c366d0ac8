"""Per-stage host-preprocess profile: where do the 1.3-5 s/asset go?

The round-3 weightless E2E (E2E_r03_weightless.json) showed the serving
device path at ~3.2 s/asset while the HOST preprocess (normalize/clean/
decimate-or-subdivide/weld + UV unwrap, reference pipeline.py
preprocess_blank_mesh) costs 1.3-5 s — the new critical path for big
meshes.  This driver times each stage separately (and cProfile's top
functions for the slowest stage) over the oracle primitives so the
optimization targets are measured, not guessed.

  python scripts/profile_preprocess.py [--out PROFILE_preprocess_r03.json]

Pure host (numpy/scipy + native meshproc) — safe to run without the TPU.
"""

import argparse
import cProfile
import io
import json
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PROFILE_preprocess_r03.json")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import numpy as np

    from unitex_tpu.geometry import process as gp
    from unitex_tpu.geometry import uv_atlas
    from unitex_tpu.geometry.primitives import (
        make_compound, make_icosphere, make_torus, make_trefoil,
    )

    cases = {
        "trefoil": lambda: make_trefoil(n_major=384, n_minor=40),
        "torus": lambda: make_torus(n_major=192, n_minor=128),
        "compound": lambda: make_compound(subdivisions=5),
        "sphere": lambda: make_icosphere(5),
    }

    report = {"metric": "host_preprocess_profile", "cases": []}
    for name, maker in cases.items():
        mesh0 = maker()
        best = None
        best_faces_out = None
        for _ in range(args.reps):
            mesh = mesh0
            stages = {}
            t0 = time.perf_counter()
            # mirror preprocess_blank_mesh_geometry stage by stage
            t = time.perf_counter()
            mesh = gp.normalize_to_unit_cube(mesh, scale=1.0)
            mesh = gp.remove_degenerate_faces(mesh)
            mesh = gp.remove_unreferenced_vertices(mesh)
            stages["normalize_clean"] = time.perf_counter() - t

            t = time.perf_counter()
            if mesh.n_faces > 200_000:
                mesh = gp.qem_decimate(mesh, 200_000)
                stages["decimate"] = time.perf_counter() - t
            else:
                while mesh.n_faces < 20_000:
                    mesh = gp.loop_subdivide(mesh, 1)
                stages["subdivide"] = time.perf_counter() - t

            t = time.perf_counter()
            mesh = gp.merge_close_vertices(mesh, 1e-8)
            mesh = gp.remove_degenerate_faces(mesh)
            mesh = gp.remove_unreferenced_vertices(mesh)
            stages["weld_clean"] = time.perf_counter() - t

            t = time.perf_counter()
            unwrapped = uv_atlas.unwrap_atlas(mesh)
            stages["unwrap"] = time.perf_counter() - t
            stages["total"] = time.perf_counter() - t0
            if best is None or stages["total"] < best["total"]:
                best = stages
                best_faces_out = int(
                    unwrapped.n_faces
                    if hasattr(unwrapped, "n_faces") else mesh.n_faces
                )
        report["cases"].append({
            "case": name,
            "faces_in": int(mesh0.n_faces),
            "faces_out": best_faces_out,
            "stages_s": {k: round(v, 3) for k, v in best.items()},
        })
        print(json.dumps(report["cases"][-1]))

    # cProfile the single slowest stage of the slowest case
    worst = max(report["cases"], key=lambda c: c["stages_s"]["total"])
    name = worst["case"]
    mesh0 = cases[name]()
    mesh = gp.preprocess_blank_mesh_geometry(mesh0)
    slow_stage = max(
        (k for k in worst["stages_s"] if k != "total"),
        key=lambda k: worst["stages_s"][k],
    )
    pr = cProfile.Profile()
    pr.enable()
    if slow_stage == "unwrap":
        uv_atlas.unwrap_atlas(mesh)
    elif slow_stage == "subdivide":
        m = cases[name]()
        m = gp.normalize_to_unit_cube(m)
        while m.n_faces < 20_000:
            m = gp.loop_subdivide(m, 1)
    elif slow_stage == "decimate":
        m = gp.normalize_to_unit_cube(cases[name](), scale=1.0)
        m = gp.remove_unreferenced_vertices(gp.remove_degenerate_faces(m))
        gp.qem_decimate(m, 200_000)
    elif slow_stage == "weld_clean":
        m = gp.merge_close_vertices(mesh, 1e-8)
        m = gp.remove_degenerate_faces(m)
        gp.remove_unreferenced_vertices(m)
    elif slow_stage == "normalize_clean":
        m = gp.normalize_to_unit_cube(cases[name](), scale=1.0)
        m = gp.remove_degenerate_faces(m)
        gp.remove_unreferenced_vertices(m)
    else:  # unknown stage label: whole-pipeline fallback (noted in report)
        gp.preprocess_blank_mesh_geometry(mesh0)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(15)
    top = [ln for ln in s.getvalue().splitlines() if ln.strip()][4:19]
    report["slowest"] = {"case": name, "stage": slow_stage, "top": top,
                         "isolated": slow_stage in (
                             "unwrap", "subdivide", "decimate",
                             "weld_clean", "normalize_clean")}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"slowest": name, "stage": slow_stage}))


if __name__ == "__main__":
    main()
