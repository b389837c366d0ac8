"""Adjudicate per-VIEW vs per-GRID color-fix statistics with a number
(VERDICT r04 missing #2 / next #6).

The reference computes the TSD-SR wavelet/adain color transfer on the
whole 2x3 multi-view grid (/root/reference/TSD_SR/sr_pipeline.py:273-274);
the max-memory serving path runs SR per VIEW (pipeline._apply_sr), so the
transfer statistics become per-view.  The builder's claim: the deviation
sits under the uint8 quantization floor (1/255) the texture is subject to
downstream.  This script measures it at production scale (6 views, each
512^2 -> 2048^2) on a worst-case-leaning synthetic scene — per-view
lighting/color variation (the thing per-view statistics actually change)
plus high-frequency SR detail — and writes the deltas.

  JAX_PLATFORMS=cpu python scripts/measure_colorfix_delta.py \
      [--out COLORFIX_DELTA_r05.json] [--size 2048]
"""

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") and os.environ["JAX_PLATFORMS"] != "axon":
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def make_views(size: int, rng):
    """6 views: shaded blob on white, per-view hue/illumination shifts
    (the cross-view statistic variation per-view color-fix is blind to),
    plus high-frequency detail standing in for the SR output."""
    import numpy as np

    views_hi, views_lo = [], []
    yy, xx = np.mgrid[:size, :size].astype(np.float32) / size
    for v in range(6):
        cx, cy = rng.uniform(0.35, 0.65, 2)
        r2 = (yy - cy) ** 2 + (xx - cx) ** 2
        blob = np.exp(-r2 / 0.08)
        base = np.ones((size, size, 3), np.float32)
        tint = 0.4 + 0.6 * rng.random(3).astype(np.float32)
        # per-view illumination scale: +-15% — larger than any real
        # delight-pass residual
        illum = 0.85 + 0.3 * rng.random()
        img = base * (1 - blob[..., None]) + (tint * illum) * blob[..., None]
        img = np.clip(img, 0.0, 1.0)
        detail = 0.05 * rng.standard_normal((size, size, 3)).astype(np.float32)
        views_hi.append(np.clip(img + detail, 0.0, 1.0))   # "SR output"
        # "bicubic up" source: blurred + slight cast (what color-fix
        # transplants the low frequencies from)
        cast = 1.0 + 0.02 * rng.standard_normal(3).astype(np.float32)
        views_lo.append(np.clip(img * cast, 0.0, 1.0))
    return views_hi, views_lo


def assemble(views, rows=2, cols=3):
    import numpy as np

    return np.concatenate(
        [np.concatenate(views[r * cols:(r + 1) * cols], axis=1)
         for r in range(rows)], axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="COLORFIX_DELTA_r05.json")
    ap.add_argument("--size", type=int, default=2048)
    args = ap.parse_args()

    import numpy as np

    from unitex_tpu.models.sd3.color_fix import (
        adain_color_fix, wavelet_color_fix,
    )

    rng = np.random.default_rng(0)
    views_hi, views_lo = make_views(args.size, rng)
    grid_hi, grid_lo = assemble(views_hi), assemble(views_lo)

    floor = 1.0 / 255.0
    report = {
        "metric": "colorfix_per_view_vs_per_grid",
        "protocol": (
            "6 synthetic 2048^2 views (per-view +-15% illumination + hue "
            "tints + SR-detail noise, worst-case-leaning for cross-view "
            "statistics); color fix applied per-grid (reference "
            "TSD_SR/sr_pipeline.py:273-274 semantics) vs per-view "
            "(pipeline._apply_sr max-memory branch); deltas over the "
            "assembled grid, vs the downstream uint8 floor 1/255"
        ),
        "view_size": args.size,
        "uint8_floor": round(floor, 6),
        "date": str(datetime.date.today()),
        "methods": {},
    }
    import jax

    for name, fix in (("wavelet", jax.jit(wavelet_color_fix)),
                      ("adain", jax.jit(adain_color_fix))):
        per_grid = np.asarray(fix(grid_hi, grid_lo))
        per_view = assemble(
            [np.asarray(fix(h, l)) for h, l in zip(views_hi, views_lo)]
        )
        d = np.abs(per_grid - per_view)
        report["methods"][name] = {
            "max_abs_delta": round(float(d.max()), 6),
            "mean_abs_delta": round(float(d.mean()), 8),
            "p99_abs_delta": round(float(np.percentile(d, 99)), 6),
            "frac_pixels_over_uint8_floor": round(
                float((d > floor).mean()), 6),
            "under_floor_after_quantization": bool(
                np.array_equal(
                    np.clip(per_grid * 255, 0, 255).round(),
                    np.clip(per_view * 255, 0, 255).round(),
                )
            ),
        }
        print(name, json.dumps(report["methods"][name]), flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
