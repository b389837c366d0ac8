"""Golden-output comparison harness.

Scores this framework's pipeline artifacts against reference (CUDA) outputs
produced with the same seed/config — the BASELINE.md protocol ("measured,
not copied": run the reference for goldens, score the TPU rebuild against
them).  Compares every common image artifact by PSNR/SSIM and prints a
JSON report.

Usage:  python scripts/compare_golden.py ours/cache golden/cache
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

COMPARED = (
    "rembg_image.png",
    "processed_image.png",
    "mv_alpha.png",
    "mv_ccm.png",
    "mv_normal.png",
    "mv_rgb_w_light.png",
    "mv_rgb.png",
    # --sr artifact set: with super_resolutions on, mv_rgb.png is the
    # TSD-SR 2048^2 output and mv_rgb_lr.png keeps the pre-SR 512^2 grid
    # (pipeline.py infer_mv_stage) — both are scored so SR parity and
    # diffusion parity are separable; absent files report null
    "mv_rgb_lr.png",
    "visable_uv_mask.png",
    "valid_uv_mask.png",
    "completed_uv.png",
)


def compare_caches(ours: str, golden: str) -> dict:
    """Score every common image artifact in two pipeline cache dirs by
    PSNR/SSIM.  Returns ``{"artifacts": {...}, "worst_psnr": float}`` —
    the same report the CLI prints.  Also the self-parity harness used by
    tests/test_golden_parity.py: the production config's numeric drift
    across (shape bucketing, int8 serving, device count) is bounded by
    running the weightless pipeline under each and scoring here."""
    import jax.numpy as jnp

    from unitex_tpu.utils.image_io import load_image
    from unitex_tpu.utils.metrics import psnr, ssim

    report = {}
    worst = float("inf")
    for name in COMPARED:
        a_path = os.path.join(ours, name)
        b_path = os.path.join(golden, name)
        if not (os.path.exists(a_path) and os.path.exists(b_path)):
            report[name] = None
            continue
        a = load_image(a_path)
        b = load_image(b_path)
        if a.shape != b.shape:
            report[name] = {"error": f"shape {a.shape} vs {b.shape}"}
            worst = min(worst, 0.0)
            continue
        p = float(psnr(jnp.asarray(a), jnp.asarray(b)))
        s = float(ssim(jnp.asarray(a), jnp.asarray(b))) if min(a.shape[:2]) >= 11 else None
        report[name] = {"psnr": round(p, 2), "ssim": round(s, 4) if s else None}
        worst = min(worst, p)
    return {"artifacts": report, "worst_psnr": round(worst, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("golden")
    ap.add_argument("--min-psnr", type=float, default=None,
                    help="exit nonzero if any artifact scores below this")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    report = compare_caches(args.ours, args.golden)
    print(json.dumps(report, indent=2))
    if args.min_psnr is not None and report["worst_psnr"] < args.min_psnr:
        sys.exit(1)


if __name__ == "__main__":
    main()
