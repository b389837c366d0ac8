"""Batch super-resolution CLI + quality-metric scoring.

The executable capability of the reference's TSD-SR test harness:
``test/test_tsdsr.py`` (batch SR over an image directory) and
``test/test_metrics.py`` (pyiqa PSNR/SSIM/LPIPS/NIQE scoring of output
dirs) — one tool here:

  python scripts/sr_batch.py --input lr_dir --output out_dir \\
      [--pretrain /path/to/checkpoints] [--gt hr_dir] [--metrics-only]
      [--lpips-backbone vgg16.pth --lpips-lins lpips_vgg.pth]

Without SD3 weights the pipeline degrades to bicubic (documented fallback),
so the harness runs end-to-end in CI.  Full-reference metrics (need --gt):
PSNR/SSIM always; LPIPS when torch checkpoints are given.  No-reference
metrics (score --output alone): NIQE with --niqe-params (pristine-model
npz); MUSIQ / MANIQA / CLIP-IQA with their converted checkpoints.
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


def build_zoo_pipe(arch: str, ckpt: str, upscale: int):
    """SR-zoo serving: convert a BasicSR checkpoint and return an
    ``image [H,W,3] in [0,1] -> image`` callable.  Architecture hyper-
    parameters are inferred from the checkpoint shapes where they matter."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from unitex_tpu.models import sr_archs as sa
    from unitex_tpu.models import sr_convert as sc
    from unitex_tpu.models import swinir as sw

    if ckpt is None:
        raise SystemExit(f"--arch {arch} needs --ckpt")
    sd = sc.load_state_dict(ckpt)

    if arch == "swinir":
        probe = next(k for k in sd if k.endswith("relative_position_bias_table"))
        nw, heads = sd[probe].shape
        window = (int(np.sqrt(nw)) + 1) // 2
        n_groups = 0
        depths = []
        while f"layers.{n_groups}.residual_group.blocks.0.norm1.weight" in sd:
            d = 0
            while f"layers.{n_groups}.residual_group.blocks.{d}.norm1.weight" in sd:
                d += 1
            depths.append(d)
            n_groups += 1
        embed = sd["conv_first.weight"].shape[0]
        mlp_ratio = (
            sd["layers.0.residual_group.blocks.0.mlp.fc1.weight"].shape[0] / embed
        )
        cfg = sw.SwinIRConfig(
            embed_dim=embed, depths=tuple(depths), num_heads=heads,
            window_size=window, mlp_ratio=mlp_ratio, scale=upscale,
            num_feat=sd["conv_last.weight"].shape[1],
        )
        params = sc.convert_swinir(sd)

        def fwd(img):
            H, W = img.shape[:2]
            wsz = cfg.window_size
            ph, pw = (-H) % wsz, (-W) % wsz
            x = jnp.pad(img[None], ((0, 0), (0, ph), (0, pw), (0, 0)), "reflect")
            out = sw.swinir_forward(params, cfg, x)
            return out[0, : H * cfg.scale, : W * cfg.scale]

        return fwd

    convert, config, forward = {
        "rrdbnet": (sc.convert_rrdbnet, sa.RRDBConfig, sa.rrdbnet_forward),
        "msrresnet": (sc.convert_msrresnet, sa.MSRResNetConfig, sa.msrresnet_forward),
        "edsr": (sc.convert_edsr, sa.EDSRConfig, sa.edsr_forward),
        "rcan": (sc.convert_rcan, sa.RCANConfig, sa.rcan_forward),
        "srvgg": (sc.convert_srvgg, sa.SRVGGConfig, sa.srvgg_forward),
    }[arch]
    params = convert(sd)
    fields = {"scale": upscale}
    if arch in ("rrdbnet", "msrresnet", "edsr", "rcan"):
        fields["num_feat"] = sd["conv_first.weight"].shape[0]
    if arch == "srvgg":
        # feat width = first body conv's output channels
        first = min(int(k.split(".")[1]) for k in sd
                    if k.startswith("body.") and sd[k].ndim == 4)
        fields["num_feat"] = sd[f"body.{first}.weight"].shape[0]
    cfg = dataclasses.replace(config(), **fields)
    return lambda img: forward(params, cfg, img[None])[0]


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
    ap.add_argument("--arch", default="tsdsr",
                    choices=["tsdsr", "rrdbnet", "msrresnet", "edsr", "rcan",
                             "srvgg", "swinir"],
                    help="SR model: TSD-SR (default) or a zoo arch served "
                         "from a BasicSR checkpoint (--ckpt)")
    ap.add_argument("--ckpt", default=None,
                    help="BasicSR .pth/.safetensors for the chosen --arch")
    ap.add_argument("--niqe-params", default=None, help="pristine-model .npz")
    ap.add_argument("--lpips-backbone", default=None, help="torchvision vgg16/alexnet .pth")
    ap.add_argument("--lpips-lins", default=None, help="LPIPS lin-head .pth")
    ap.add_argument("--lpips-net", default="vgg", choices=["vgg", "alex"])
    ap.add_argument("--musiq-ckpt", default=None, help="torch MUSIQ .pth")
    ap.add_argument("--maniqa-ckpt", default=None, help="official MANIQA .pth")
    ap.add_argument("--maniqa-vit", default=None,
                    help="timm vit_base_patch8_224 .pth (if not in the ckpt)")
    ap.add_argument("--clipiqa-ckpt", default=None, help="OpenAI CLIP RN50 .pt")
    ap.add_argument("--clipiqa-text", default=None,
                    help="precomputed prompt-feature .npz (text_features [2,1024]) "
                         "or an HF CLIP model dir to encode the prompts with")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from unitex_tpu.utils.image_io import load_image, save_image
    from unitex_tpu.utils.metrics import psnr, ssim

    os.makedirs(args.output, exist_ok=True)

    if not args.metrics_only:
        if args.arch == "tsdsr":
            from unitex_tpu.models.sd3.sr_pipeline import TSDSRConfig, TSDSRPipeline

            import jax

            mesh = None
            if jax.device_count() > 1:
                from unitex_tpu.parallel.mesh import make_mesh

                # tiles are independent: favor data parallelism over the
                # tile batch, TP only if SD3 must shard (it fits per-chip
                # at ~4.3 GB bf16, so pure DP is the throughput layout)
                mesh = make_mesh(data=jax.device_count(), model=1)
            pipe = TSDSRPipeline(
                pretrain_root=args.pretrain,
                cfg=TSDSRConfig(
                    upscale=args.upscale, align_method=args.align,
                    int8_serving=args.int8,
                ),
                mesh=mesh,
            )
        else:
            pipe = build_zoo_pipe(args.arch, args.ckpt, args.upscale)
        # host/device pipelining: image N+1 decodes on a worker thread and
        # image N-1 encodes on another while image N runs on the device
        # (the batch_pipeline.py pattern; PNG codec time is host-only)
        import concurrent.futures as cf

        paths = list_images(args.input)
        with cf.ThreadPoolExecutor(max_workers=2) as pool:
            nxt = pool.submit(load_image, paths[0]) if paths else None
            saves = []
            for i, path in enumerate(paths):
                name = os.path.basename(path)
                lr = nxt.result()
                nxt = (pool.submit(load_image, paths[i + 1])
                       if i + 1 < len(paths) else None)
                sr = np.asarray(pipe(jnp.asarray(lr)))
                saves.append(pool.submit(
                    save_image, os.path.join(args.output, name), sr))
                print(json.dumps({"image": name, "out_shape": list(sr.shape)}))
            for s in saves:
                s.result()

    nr_metrics = {}
    if args.musiq_ckpt:
        from unitex_tpu.utils.iqa_musiq import load_torch_musiq, musiq

        mp = load_torch_musiq(args.musiq_ckpt)
        nr_metrics["musiq"] = lambda img: musiq(mp, img)
    if args.maniqa_ckpt:
        from unitex_tpu.utils.iqa_maniqa import load_torch_maniqa, maniqa

        qp = load_torch_maniqa(args.maniqa_ckpt, args.maniqa_vit)
        nr_metrics["maniqa"] = lambda img: maniqa(qp, img)
    if args.clipiqa_ckpt:
        from unitex_tpu.utils.iqa_clipiqa import (
            clip_text_features, clipiqa, load_torch_clip_rn50)

        if not args.clipiqa_text:
            # without real prompt features the score is softmax noise
            # against the random-init placeholders — refuse loudly
            ap.error("--clipiqa-ckpt requires --clipiqa-text "
                     "(prompt-feature .npz or an HF CLIP model dir)")
        cp = load_torch_clip_rn50(args.clipiqa_ckpt)
        if args.clipiqa_text.endswith(".npz"):
            cp["text_features"] = jnp.asarray(
                np.load(args.clipiqa_text)["text_features"])
        else:
            cp["text_features"] = jnp.asarray(clip_text_features(args.clipiqa_text))
        nr_metrics["clipiqa"] = lambda img: clipiqa(cp, img)

    if args.gt is None and not nr_metrics:
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
        a = load_image(path)
        row = {"image": name}
        gt_path = os.path.join(args.gt, name) if args.gt else None
        if gt_path and os.path.exists(gt_path):
            b = load_image(gt_path)
            if a.shape != b.shape:
                import jax

                a = np.asarray(jax.image.resize(jnp.asarray(a), b.shape, "bicubic"))
            row["psnr"] = float(psnr(jnp.asarray(a), jnp.asarray(b)))
            row["ssim"] = float(ssim(jnp.asarray(a), jnp.asarray(b)))
            if lpips_params is not None:
                from unitex_tpu.utils.lpips import lpips_image01

                row["lpips"] = float(
                    lpips_image01(
                        lpips_params, jnp.asarray(a[None]), jnp.asarray(b[None])
                    )[0]
                )
        if niqe_model is not None:
            from unitex_tpu.utils.niqe import niqe

            row["niqe"] = float(niqe(a * 255.0, niqe_model))
        for mname, fn in nr_metrics.items():
            row[mname] = float(fn(a))
        if len(row) == 1:
            continue
        rows.append(row)
        print(json.dumps(row))

    if rows:
        keys = sorted({k for r in rows for k in r} - {"image"})
        summary = {"n": len(rows)}
        for k in keys:
            vals = [r[k] for r in rows if k in r]
            summary[f"mean_{k}"] = sum(vals) / len(vals)
        print(json.dumps(summary))
        with open(os.path.join(args.output, "metrics.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
