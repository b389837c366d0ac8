#!/usr/bin/env python
"""BasicSR-style yml-driven SR evaluation (basicsr/test.py pipeline:
parse -opt yml with is_train=False -> run every test dataset through
network_g -> per-image + mean PSNR/SSIM, optional SR image dumps under
results/<name>/visualization).

Checkpoints: either a converted-params checkpoint directory saved by
scripts/train_sr.py (``path: checkpoint_g``) or a torch .pth via the
sr_convert key maps (``path: pretrain_network_g`` + the arch type).

Usage:
  python scripts/test_sr.py -opt options/test_msrresnet_x4.yml
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_params(opt, bundle, key):
    """Resolve network_g params: torch checkpoint, our checkpoint dir,
    or fresh init (smoke runs)."""
    path = opt["path"].get("pretrain_network_g")
    if path:
        from unitex_tpu.models import sr_convert as sc
        return sc.convert_for_arch(opt["network_g"]["type"], path)
    ckpt_dir = opt["path"].get("checkpoint_g")
    if ckpt_dir:
        import orbax.checkpoint as ocp
        template = bundle.init(key)
        return ocp.StandardCheckpointer().restore(
            os.path.abspath(ckpt_dir), template)
    return bundle.init(key)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True)
    ap.add_argument("--force-yml", nargs="+", default=None)
    ap.add_argument("--root", default=".")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from train_sr import build_dataset, forward_padded, score_pair
    from unitex_tpu.models.zoo import build_arch
    from unitex_tpu.utils.image_io import save_image
    from unitex_tpu.utils.options import dict2str, parse_options

    opt = parse_options(args.opt, args.root, is_train=False,
                        force_yml=args.force_yml)
    print(dict2str(opt))
    bundle = build_arch(opt["network_g"])
    params = load_params(opt, bundle, jax.random.PRNGKey(
        int(opt.get("manual_seed") or 0)))
    # pad to a shape bucket: window-multiple for SwinIR (its window
    # partition requires it, swinir_model.py:11-33), and a coarse
    # multiple otherwise so jit compiles once per bucket, not per image
    # size (minutes each through the TPU remote-compile tunnel)
    multiple = (int(opt["network_g"].get("window_size", 8))
                if opt["network_g"]["type"] == "SwinIR" else 16)
    scale = int(opt.get("scale", 1))
    jit_forward = jax.jit(bundle.forward)

    def forward(p, lq):
        return forward_padded(jit_forward, p, lq, multiple, scale)

    val_opt = opt.get("val") or {}
    save_img = bool(val_opt.get("save_img", False))
    metric_opts = val_opt.get("metrics") or {"psnr": {}, "ssim": {}}
    vis_root = opt["path"]["visualization"]
    results = {}
    for ds_key, dopt in sorted((opt.get("datasets") or {}).items()):
        dopt.setdefault("phase", "val")
        dopt["phase"] = "val"
        ds = build_dataset(dopt)
        name = dopt.get("name", ds_key)
        per_image = []
        for i in range(len(ds)):
            s = ds[i]
            sr = np.asarray(forward(params, s["lq"][None])[0])
            rec = {"index": i}
            stem = os.path.splitext(os.path.basename(
                s.get("gt_path", f"{i:06d}")))[0]
            rec["name"] = stem
            p, ss = score_pair(sr, s["gt"], metric_opts)
            if "psnr" in metric_opts:
                rec["psnr"] = p
            if "ssim" in metric_opts:
                rec["ssim"] = ss
            per_image.append(rec)
            if save_img:
                out_dir = os.path.join(vis_root, name)
                os.makedirs(out_dir, exist_ok=True)
                frame = sr[sr.shape[0] // 2] if sr.ndim == 4 else sr
                save_image(os.path.join(out_dir, f"{stem}_{opt['name']}.png"),
                           np.clip(frame, 0.0, 1.0))
        means = {m: float(np.mean([r[m] for r in per_image
                                   if np.isfinite(r[m])]))
                 for m in ("psnr", "ssim") if per_image and m in per_image[0]}
        results[name] = {"mean": means, "per_image": per_image}
        msg = "  ".join(f"{k}: {v:.4f}" for k, v in means.items())
        print(f"[{name}] {len(per_image)} images  {msg}", flush=True)

    os.makedirs(opt["path"]["log"], exist_ok=True)
    out_json = os.path.join(opt["path"]["log"], f"test_{opt['name']}.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_json}", flush=True)
    return results


if __name__ == "__main__":
    main()
