"""Batch super-resolution CLI + quality-metric scoring.

The executable capability of the reference's TSD-SR test harness:
``test/test_tsdsr.py`` (batch SR over an image directory) and
``test/test_metrics.py`` (pyiqa PSNR/SSIM/LPIPS/NIQE scoring of output
dirs) — one tool here:

  python scripts/sr_batch.py --input lr_dir --output out_dir \\
      [--pretrain /path/to/checkpoints] [--gt hr_dir] [--metrics-only]
      [--lpips-backbone vgg16.pth --lpips-lins lpips_vgg.pth]

Without SD3 weights the pipeline degrades to bicubic (documented fallback),
so the harness runs end-to-end in CI.  Metrics: PSNR/SSIM always; NIQE with
--niqe-params (pristine-model npz); LPIPS when torch checkpoints are given.
Results: per-image JSONL + mean summary JSON line on stdout.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def list_images(d):
    out = []
    for ext in IMG_EXTS:
        out += glob.glob(os.path.join(d, f"*{ext}"))
    return sorted(out)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="LR image dir")
    ap.add_argument("--output", required=True, help="SR output dir")
    ap.add_argument("--pretrain", default=None, help="checkpoint root (sd3/, tsdsr/)")
    ap.add_argument("--gt", default=None, help="HR ground-truth dir (for metrics)")
    ap.add_argument("--metrics-only", action="store_true",
                    help="skip SR; score existing --output against --gt")
    ap.add_argument("--upscale", type=int, default=4)
    ap.add_argument("--align", default="wavelet", choices=["wavelet", "adain", "nofix"])
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 int8 serving for the SD3 transformer")
    ap.add_argument("--niqe-params", default=None, help="pristine-model .npz")
    ap.add_argument("--lpips-backbone", default=None, help="torchvision vgg16/alexnet .pth")
    ap.add_argument("--lpips-lins", default=None, help="LPIPS lin-head .pth")
    ap.add_argument("--lpips-net", default="vgg", choices=["vgg", "alex"])
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from unitex_tpu.utils.image_io import load_image, save_image
    from unitex_tpu.utils.metrics import psnr, ssim

    os.makedirs(args.output, exist_ok=True)

    if not args.metrics_only:
        from unitex_tpu.models.sd3.sr_pipeline import TSDSRConfig, TSDSRPipeline

        pipe = TSDSRPipeline(
            pretrain_root=args.pretrain,
            cfg=TSDSRConfig(
                upscale=args.upscale, align_method=args.align,
                int8_serving=args.int8,
            ),
        )
        for path in list_images(args.input):
            name = os.path.basename(path)
            lr = load_image(path)
            sr = np.asarray(pipe(jnp.asarray(lr)))
            save_image(os.path.join(args.output, name), sr)
            print(json.dumps({"image": name, "out_shape": list(sr.shape)}))

    if args.gt is None:
        return

    lpips_params = None
    if args.lpips_backbone and args.lpips_lins:
        from unitex_tpu.utils.lpips import load_torch_lpips

        lpips_params = load_torch_lpips(
            args.lpips_backbone, args.lpips_lins, args.lpips_net
        )
    niqe_model = None
    if args.niqe_params:
        # fit_pristine_params output saved as npz, or BasicSR's
        # niqe_pris_params.npz — same keys (mu_pris_param/cov_pris_param)
        z = np.load(args.niqe_params)
        niqe_model = {k: z[k] for k in ("mu_pris_param", "cov_pris_param")}

    rows = []
    for path in list_images(args.output):
        name = os.path.basename(path)
        gt_path = os.path.join(args.gt, name)
        if not os.path.exists(gt_path):
            continue
        a = load_image(path)
        b = load_image(gt_path)
        if a.shape != b.shape:
            import jax

            a = np.asarray(jax.image.resize(jnp.asarray(a), b.shape, "bicubic"))
        row = {
            "image": name,
            "psnr": float(psnr(jnp.asarray(a), jnp.asarray(b))),
            "ssim": float(ssim(jnp.asarray(a), jnp.asarray(b))),
        }
        if lpips_params is not None:
            from unitex_tpu.utils.lpips import lpips_image01

            row["lpips"] = float(
                lpips_image01(lpips_params, jnp.asarray(a[None]), jnp.asarray(b[None]))[0]
            )
        if niqe_model is not None:
            from unitex_tpu.utils.niqe import niqe

            row["niqe"] = float(niqe(a * 255.0, niqe_model))
        rows.append(row)
        print(json.dumps(row))

    if rows:
        keys = [k for k in rows[0] if k != "image"]
        summary = {"n": len(rows)}
        summary.update(
            {f"mean_{k}": sum(r[k] for r in rows) / len(rows) for k in keys}
        )
        print(json.dumps(summary))
        with open(os.path.join(args.output, "metrics.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
