#!/usr/bin/env python
"""BasicSR-style yml-driven SR training (basicsr/train.py pipeline:
parse -opt yml -> build datasets/networks/model by registry type ->
iterate with scheduler, logging, checkpoints, validation).

Usage:
  python scripts/train_sr.py -opt options/train_msrresnet_x4.yml
  python scripts/train_sr.py -opt cfg.yml --force-yml train:total_iter=100

Model types supported: SRModel / SwinIRModel (pixel loss + EMA),
SRGANModel / ESRGANModel (GAN, EMA, G-gating; relativistic for ESRGAN),
RealESRNetModel / RealESRGANModel (on-the-fly second-order degradation
synthesis, pair pool, USM-GT routing, LDL), VideoRecurrentModel /
EDVRModel (flow/TSA warmups, group learning rates), VideoGANModel /
VideoRecurrentGANModel, HiFaceGANModel, StyleGAN2Model.
Datasets: PairedImageDataset, RealESRGANDataset / FFHQDataset /
GTImageDataset, REDSDataset (center-GT window), REDSRecurrentDataset.
Checkpoints: pretrain_network_g/_d load torch .pth via the converter
registry; --auto-resume restores the full training state.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_dataset(dopt):
    from unitex_tpu.training import sr_data as sd
    dtype = dopt["type"]
    phase = dopt.get("phase", "train")
    if dtype == "PairedImageDataset":
        return sd.PairedImageDataset(sd.PairedImageConfig(
            lq_folder=dopt["dataroot_lq"], gt_folder=dopt["dataroot_gt"],
            scale=dopt.get("scale", 4), phase=phase,
            gt_size=dopt.get("gt_size", 128),
            use_hflip=dopt.get("use_hflip", True),
            use_rot=dopt.get("use_rot", True),
            filename_tmpl=dopt.get("filename_tmpl", "{}"),
            backend=("packed" if dopt.get("io_backend", {}).get("type")
                     in ("lmdb", "packed") else "disk"),
            meta_info_file=dopt.get("meta_info_file")))
    if dtype in ("RealESRGANDataset", "FFHQDataset", "GTImageDataset"):
        # RealESRGANDataset crops to a fixed pre-synthesis size (400 in
        # the reference); the model paired-crops to gt_size afterwards
        size = (dopt.get("crop_pad_size", 400)
                if dtype == "RealESRGANDataset"
                else dopt.get("gt_size", 256))
        return sd.GTImageDataset(sd.GTImageConfig(
            gt_folder=dopt["dataroot_gt"],
            gt_size=size, phase=phase,
            use_hflip=dopt.get("use_hflip", True),
            use_rot=dopt.get("use_rot", True)))
    if dtype in ("REDSDataset", "REDSRecurrentDataset"):
        return sd.VideoFrameDataset(sd.VideoFrameConfig(
            lq_root=dopt["dataroot_lq"], gt_root=dopt["dataroot_gt"],
            num_frame=dopt.get("num_frame", 5),
            scale=dopt.get("scale", 4), phase=phase,
            gt_size=dopt.get("gt_size", 256),
            interval_list=tuple(dopt.get("interval_list", [1])),
            random_reverse=dopt.get("random_reverse", False),
            use_hflip=dopt.get("use_hflip", True),
            use_rot=dopt.get("use_rot", True),
            center_gt=(dtype == "REDSDataset")))
    raise KeyError(f"dataset type {dtype!r} not supported")


def score_pair(sr, gt, metric_opts):
    """(psnr, ssim) honoring crop_border/test_y_channel from the yml
    metric options; video [T,H,W,C] outputs are frame-averaged (the
    reference's per-frame video evaluation)."""
    from unitex_tpu.utils.metrics import calculate_psnr, calculate_ssim
    import numpy as np

    def one(m, fn):
        mo = metric_opts.get(m) or {}
        cb = int(mo.get("crop_border", 0))
        y = bool(mo.get("test_y_channel", False))
        frames = sr if sr.ndim == 4 else sr[None]
        gts = gt if gt.ndim == 4 else gt[None]
        vals = [fn(np.clip(f, 0, 1) * 255, g * 255, crop_border=cb,
                   test_y_channel=y, bgr=False)
                for f, g in zip(frames, gts)]
        finite = [v for v in vals if np.isfinite(v)]
        return float(np.mean(finite)) if finite else float("inf")

    return one("psnr", calculate_psnr), one("ssim", calculate_ssim)


def forward_padded(forward, params, lq, multiple: int, scale: int):
    """Reflect-pad H/W to a multiple (SwinIRModel.test semantics,
    swinir_model.py:11-33) and crop the output back; also buckets
    shapes so jitted evaluation compiles once per bucket instead of
    once per image size."""
    import numpy as np

    h, w = lq.shape[-3:-1]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph or pw:
        pad = [(0, 0)] * (lq.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        lq = np.pad(lq, pad, mode="reflect")
    out = forward(params, lq)
    return out[..., :h * scale, :w * scale, :]


def build_schedule(train_opt):
    from unitex_tpu.training import schedules
    lr = float(train_opt["optim_g"]["lr"])
    sopt = dict(train_opt.get("scheduler") or {})
    stype = sopt.pop("type", None)
    if stype is None:
        return lr
    if stype == "MultiStepLR":
        return schedules.multistep_restart_lr(
            lr, sopt.get("milestones", []), sopt.get("gamma", 0.1))
    if stype == "MultiStepRestartLR":
        return schedules.multistep_restart_lr(
            lr, sopt.get("milestones", []), sopt.get("gamma", 0.1),
            sopt.get("restarts", (0,)), sopt.get("restart_weights", (1.0,)))
    if stype == "CosineAnnealingRestartLR":
        return schedules.cosine_annealing_restart_lr(
            lr, sopt["periods"], sopt.get("restart_weights", (1.0,)),
            sopt.get("eta_min", 0.0))
    raise KeyError(f"scheduler {stype!r} not supported")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True)
    ap.add_argument("--force-yml", nargs="+", default=None)
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--root", default=".")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tests/CI)")
    ap.add_argument("--auto-resume", action="store_true",
                    help="resume from the latest training state "
                         "(basicsr --auto_resume / check_resume)")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from unitex_tpu.models.zoo import build_arch
    from unitex_tpu.training import sr_data as sd
    from unitex_tpu.training.checkpoint import CheckpointManager
    from unitex_tpu.utils.logging import MetricLogger
    from unitex_tpu.utils.metrics import calculate_psnr, calculate_ssim
    from unitex_tpu.utils.options import dict2str, parse_options

    opt = parse_options(args.opt, args.root, is_train=True,
                        force_yml=args.force_yml, debug=args.debug)
    print(dict2str(opt))
    exp_root = opt["path"]["experiments_root"]
    if os.path.exists(exp_root) and not args.auto_resume:
        # basicsr misc.mkdir_and_rename: archive a stale experiment dir
        # instead of mixing logs/checkpoints into it
        import time as _time
        new_name = exp_root + "_archived_" + _time.strftime("%Y%m%d_%H%M%S")
        print(f"Path already exists. Rename it to {new_name}", flush=True)
        os.rename(exp_root, new_name)
    os.makedirs(exp_root, exist_ok=True)
    seed = int(opt.get("manual_seed") or 0)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    train_opt = opt["train"]
    model_type = opt["model_type"]
    total_iter = int(train_opt["total_iter"])
    dopt = opt["datasets"]["train"]
    dataset = build_dataset(dopt)
    batch = int(dopt.get("batch_size_per_gpu", 4))
    val_set = None
    if "val" in opt.get("datasets", {}):
        val_set = build_dataset(opt["datasets"]["val"])

    g = build_arch(opt["network_g"])
    key, gk = jax.random.split(key)
    if opt["path"].get("pretrain_network_g"):
        from unitex_tpu.models.sr_convert import convert_for_arch
        g_params = convert_for_arch(opt["network_g"]["type"],
                                    opt["path"]["pretrain_network_g"])
        print("loaded pretrain_network_g", flush=True)
    else:
        g_params = g.init(gk)

    lr_sched = build_schedule(train_opt)
    betas = train_opt["optim_g"].get("betas", (0.9, 0.99))
    opt_g = optax.adam(lr_sched, b1=float(betas[0]), b2=float(betas[1]))

    logger = MetricLogger(opt["path"]["log"])
    ckpt = CheckpointManager(
        opt["path"]["models"],
        save_every=int(opt.get("logger", {}).get(
            "save_checkpoint_freq", 5000)),
        total_limit=opt.get("logger", {}).get("checkpoints_total_limit"))
    print_freq = int(opt.get("logger", {}).get("print_freq", 100))
    state_ckpt = CheckpointManager(
        opt["path"]["training_states"],
        save_every=int(opt.get("logger", {}).get(
            "save_checkpoint_freq", 5000)),
        total_limit=opt.get("logger", {}).get("checkpoints_total_limit", 2))

    # ---- assemble the train step by model type
    ema_decay = float(train_opt.get("ema_decay", 0.0) or 0.0)
    if model_type in ("SRModel", "SwinIRModel"):
        pix_type = (train_opt.get("pixel_opt") or {}).get("type", "L1Loss")

        def loss_fn(params, lq, gt):
            sr = g.forward(params, lq)
            if pix_type == "MSELoss":
                return jnp.mean((sr - gt) ** 2)
            if pix_type == "CharbonnierLoss":
                eps = float(train_opt["pixel_opt"].get("eps", 1e-12))
                return jnp.mean(jnp.sqrt((sr - gt) ** 2 + eps))
            return jnp.mean(jnp.abs(sr - gt))

        @jax.jit
        def step(state, lq, gt):
            params, ema, opt_state = state
            loss, grads = jax.value_and_grad(loss_fn)(params, lq, gt)
            updates, opt_state = opt_g.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_decay > 0.0:
                ema = jax.tree_util.tree_map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    ema, params)
            return (params, ema, opt_state), {"l_pix": loss}

        state = (g_params, g_params, opt_g.init(g_params))

        def run_step(state, batch_d):
            return step(state, jnp.asarray(batch_d["lq"]),
                        jnp.asarray(batch_d["gt"]))

        def current_g(state):
            # validate/serve with the EMA weights when tracked (sr_model.py)
            return state[1] if ema_decay > 0.0 else state[0]

    elif model_type in ("RealESRNetModel", "RealESRGANModel"):
        from unitex_tpu.training import degradations as dg
        from unitex_tpu.training import realesrgan as re_t
        dconf_fields = {f.name for f in
                        __import__("dataclasses").fields(dg.DegradationConfig)}
        deg_kwargs = {k: (tuple(v) if isinstance(v, list) else v)
                      for src in (dopt, train_opt) for k, v in src.items()
                      if k in dconf_fields and k not in ("scale", "gt_size")}
        deg_cfg = dg.DegradationConfig(
            scale=int(opt.get("scale", 4)),
            gt_size=int(dopt.get("gt_size", 256)), **deg_kwargs)
        pool = dg.PairPool(int(train_opt.get("queue_size", 180)))
        deg_key = jax.random.PRNGKey(seed + 1)
        usm = jax.jit(dg.usm_sharp)

        def synth(batch_d):
            nonlocal deg_key
            gt = jnp.asarray(batch_d["gt"])
            deg_key, sub = jax.random.split(deg_key)
            lq = dg.synthesize_lq(rng, sub, gt, deg_cfg)
            gt_c, lq_c = dg.paired_random_crop(rng, gt, lq, deg_cfg.gt_size,
                                               deg_cfg.scale)
            lq_np, gt_np = pool.exchange(rng, np.asarray(lq_c),
                                         np.asarray(gt_c))
            gt_j = jnp.asarray(gt_np)
            return jnp.asarray(lq_np), gt_j, usm(gt_j)

        if model_type == "RealESRNetModel":
            nstep = re_t.make_realesrnet_train_step(
                g.forward, opt_g,
                ema_decay=ema_decay or 0.999,
                gt_usm=bool(train_opt.get("gt_usm", True)))
            state = (g_params, g_params, opt_g.init(g_params))

            def run_step(state, batch_d):
                return nstep(state, *synth(batch_d))

            def current_g(state):
                return state[1]
        else:
            d = build_arch(opt["network_d"])
            key, dk = jax.random.split(key)
            if opt["path"].get("pretrain_network_d"):
                from unitex_tpu.models.sr_convert import convert_for_arch
                d_params = convert_for_arch(
                    opt["network_d"]["type"],
                    opt["path"]["pretrain_network_d"])
            else:
                d_params = d.init(dk)
            betas_d = train_opt["optim_d"].get("betas", (0.9, 0.99))
            opt_d = optax.adam(float(train_opt["optim_d"]["lr"]),
                               b1=float(betas_d[0]), b2=float(betas_d[1]))
            gan_opt = train_opt.get("gan_opt") or {}
            cfg = re_t.RealESRGANConfig(
                gan_type=gan_opt.get("gan_type", "vanilla"),
                pixel_weight=float((train_opt.get("pixel_opt") or {})
                                   .get("loss_weight", 1.0)),
                gan_weight=float(gan_opt.get("loss_weight", 0.1)),
                percep_weight=0.0,   # VGG feature net not bundled
                ldl_weight=float(train_opt.get("ldl_weight", 0.0)),
                ema_decay=ema_decay or 0.999,
                l1_gt_usm=bool(train_opt.get("l1_gt_usm", True)),
                percep_gt_usm=bool(train_opt.get("percep_gt_usm", True)),
                gan_gt_usm=bool(train_opt.get("gan_gt_usm", False)))
            gstep = re_t.make_realesrgan_train_step(
                g.forward, d.forward, opt_g, opt_d, cfg)
            state = re_t.RealESRGANState(
                g_params, d_params, g_params, opt_g.init(g_params),
                opt_d.init(d_params))

            def run_step(state, batch_d):
                return gstep(state, *synth(batch_d))

            def current_g(state):
                return state.g_ema

    elif model_type in ("SRGANModel", "ESRGANModel"):
        from unitex_tpu.training.sr_gan import SRGANConfig, \
            make_srgan_train_step
        d = build_arch(opt["network_d"])
        key, dk = jax.random.split(key)
        if opt["path"].get("pretrain_network_d"):
            from unitex_tpu.models.sr_convert import convert_for_arch
            d_params = convert_for_arch(opt["network_d"]["type"],
                                        opt["path"]["pretrain_network_d"])
        else:
            d_params = d.init(dk)
        betas_d = train_opt["optim_d"].get("betas", (0.9, 0.99))
        opt_d = optax.adam(float(train_opt["optim_d"]["lr"]),
                           b1=float(betas_d[0]), b2=float(betas_d[1]))
        gan_opt = train_opt.get("gan_opt") or {}
        cfg = SRGANConfig(
            gan_type=gan_opt.get("gan_type", "vanilla"),
            pixel_weight=float((train_opt.get("pixel_opt") or {})
                               .get("loss_weight", 1.0)),
            gan_weight=float(gan_opt.get("loss_weight", 5e-3)),
            relativistic=(model_type == "ESRGANModel"),
            ema_decay=ema_decay,
            net_d_iters=int(train_opt.get("net_d_iters", 1)),
            net_d_init_iters=int(train_opt.get("net_d_init_iters", 0)))
        sstep = make_srgan_train_step(g.forward, d.forward, opt_g, opt_d, cfg)
        state = (g_params, d_params, g_params, opt_g.init(g_params),
                 opt_d.init(d_params), jnp.int32(0))

        def run_step(state, batch_d):
            return sstep(state, jnp.asarray(batch_d["lq"]),
                         jnp.asarray(batch_d["gt"]))

        def current_g(state):
            return state[2] if ema_decay > 0.0 else state[0]

    elif model_type == "VideoRecurrentModel":
        from unitex_tpu.training import video_sr as vt
        opt_gv = vt.make_video_optimizer(
            lr_sched, float(train_opt.get("flow_lr_mul", 1.0)), g_params)
        vstep = vt.make_video_recurrent_train_step(
            g.forward, opt_gv, vt.VideoRecurrentConfig(
                fix_flow_iter=int(train_opt.get("fix_flow_iter", 0))))
        state = vt.VideoTrainState(g_params, opt_gv.init(g_params),
                                   jnp.int32(0))

        def run_step(state, batch_d):
            return vstep(state, jnp.asarray(batch_d["lq"]),
                         jnp.asarray(batch_d["gt"]))

        def current_g(state):
            return state.params

    elif model_type in ("VideoGANModel", "VideoRecurrentGANModel"):
        from unitex_tpu.training import video_sr as vt
        d = build_arch(opt["network_d"])
        key, dk = jax.random.split(key)
        d_params = d.init(dk)
        betas_d = train_opt["optim_d"].get("betas", (0.9, 0.99))
        opt_d = optax.adam(float(train_opt["optim_d"]["lr"]),
                           b1=float(betas_d[0]), b2=float(betas_d[1]))
        opt_gv = vt.make_video_optimizer(
            lr_sched, float(train_opt.get("flow_lr_mul", 1.0)), g_params)
        gan_opt = train_opt.get("gan_opt") or {}
        cfg = vt.VideoGANConfig(
            gan_type=gan_opt.get("gan_type", "vanilla"),
            pixel_weight=float((train_opt.get("pixel_opt") or {})
                               .get("loss_weight", 1.0)),
            percep_weight=0.0,
            gan_weight=float(gan_opt.get("loss_weight", 5e-2)),
            fix_flow_iter=int(train_opt.get("fix_flow_iter", 0)),
            net_d_iters=int(train_opt.get("net_d_iters", 1)),
            net_d_init_iters=int(train_opt.get("net_d_init_iters", 0)),
            ema_decay=ema_decay)
        vstep = vt.make_video_gan_train_step(g.forward, d.forward, opt_gv,
                                             opt_d, cfg)
        state = vt.VideoGANState(g_params, d_params, g_params,
                                 opt_gv.init(g_params),
                                 opt_d.init(d_params), jnp.int32(0))

        def run_step(state, batch_d):
            return vstep(state, jnp.asarray(batch_d["lq"]),
                         jnp.asarray(batch_d["gt"]))

        def current_g(state):
            return state.g_ema if ema_decay > 0.0 else state.g_params

    elif model_type == "HiFaceGANModel":
        from unitex_tpu.training import hifacegan as ht
        d = build_arch(opt["network_d"])
        key, dk = jax.random.split(key)
        d_params = d.init(dk)
        betas_d = train_opt["optim_d"].get("betas", (0.9, 0.99))
        opt_d = optax.adam(float(train_opt["optim_d"]["lr"]),
                           b1=float(betas_d[0]), b2=float(betas_d[1]))
        gan_opt = train_opt.get("gan_opt") or {}
        feat_opt = train_opt.get("feature_matching_opt") or {}
        cfg = ht.HiFaceGANTrainConfig(
            gan_type=gan_opt.get("gan_type", "hinge"),
            pixel_weight=float((train_opt.get("pixel_opt") or {})
                               .get("loss_weight", 0.0)),
            feat_weight=float(feat_opt.get("loss_weight", 10.0)),
            gan_weight=float(gan_opt.get("loss_weight", 1.0)),
            net_d_iters=int(train_opt.get("net_d_iters", 1)),
            net_d_init_iters=int(train_opt.get("net_d_init_iters", 0)))
        hstep = ht.make_hifacegan_train_step(g.forward, d.forward, opt_g,
                                             opt_d, cfg)
        state = ht.init_hifacegan_state(g_params, d_params, opt_g, opt_d)

        def run_step(state, batch_d):
            return hstep(state, jnp.asarray(batch_d["lq"]),
                         jnp.asarray(batch_d["gt"]))

        def current_g(state):
            return state.g_params

    elif model_type == "StyleGAN2Model":
        from unitex_tpu.training.stylegan2 import (StyleGAN2TrainConfig,
                                                   make_stylegan2_train_step)
        d = build_arch(opt["network_d"])
        key, dk = jax.random.split(key)
        d_params = d.init(dk)
        betas_d = train_opt["optim_d"].get("betas", (0.0, 0.99))
        opt_d = optax.adam(float(train_opt["optim_d"]["lr"]),
                           b1=float(betas_d[0]), b2=float(betas_d[1]))
        tcfg = StyleGAN2TrainConfig(
            r1_reg_weight=float(train_opt.get("r1_reg_weight", 10.0)),
            path_reg_weight=float(train_opt.get("path_reg_weight", 2.0)),
            net_g_reg_every=int(train_opt.get("net_g_reg_every", 4)),
            net_d_reg_every=int(train_opt.get("net_d_reg_every", 16)),
            mixing_prob=float(train_opt.get("mixing_prob", 0.9)))
        init_state, sstep = make_stylegan2_train_step(g.cfg, opt_g, opt_d,
                                                      tcfg)
        state = init_state(g_params, d_params)
        sg_key = jax.random.PRNGKey(seed + 7)

        def run_step(state, batch_d):
            nonlocal sg_key
            sg_key, sub = jax.random.split(sg_key)
            real = jnp.asarray(batch_d["gt"]) * 2.0 - 1.0  # [-1, 1]
            return sstep(state, real, sub)

        def current_g(state):
            return state[4]  # EMA generator

    elif model_type == "EDVRModel":
        from unitex_tpu.training import video_sr as vt
        opt_gv = vt.make_edvr_optimizer(
            lr_sched, float(train_opt.get("dcn_lr_mul", 1.0)), g_params)
        vstep = vt.make_edvr_train_step(
            g.forward, opt_gv, vt.EDVRTrainConfig(
                tsa_iter=int(train_opt.get("tsa_iter") or 0)))
        state = vt.VideoTrainState(g_params, opt_gv.init(g_params),
                                   jnp.int32(0))

        def run_step(state, batch_d):
            return vstep(state, jnp.asarray(batch_d["lq"]),
                         jnp.asarray(batch_d["gt"]))

        def current_g(state):
            return state.params

    else:
        raise KeyError(f"model_type {model_type!r} not supported")

    # ---- the loop
    it = 0
    if args.auto_resume:
        restored = state_ckpt.restore_latest(
            {"it": np.asarray(0), "state": state})
        if restored is not None:
            state = restored["state"]
            it = int(restored["it"])
            print(f"resumed training state at iter {it}", flush=True)
    while it < total_iter:
        batch_keys = (("gt",) if model_type in ("RealESRNetModel",
                                                "RealESRGANModel",
                                                "StyleGAN2Model")
                      else ("lq", "gt"))
        epoch_start = it
        for batch_d in sd.batch_iterator(dataset, batch, rng,
                                         keys=batch_keys):
            state, metrics = run_step(state, batch_d)
            it += 1
            if it % print_freq == 0 or it == total_iter:
                logger.log(it, metrics)
                msg = ", ".join(f"{k}={float(v):.4g}"
                                for k, v in metrics.items())
                print(f"iter {it}/{total_iter}  {msg}", flush=True)
            if ckpt.should_save(it):
                ckpt.save(it, current_g(state))
                state_ckpt.save(it, {"it": np.asarray(it), "state": state})
            if val_set is not None and "val" in opt and \
                    it % int(opt["val"].get("val_freq", 5000)) == 0:
                psnrs, ssims = [], []
                params = current_g(state)
                mopts = opt["val"].get("metrics", {})
                for i in range(len(val_set)):
                    s = val_set[i]
                    vm = (int(opt["network_g"].get("window_size", 8))
                          if opt["network_g"]["type"] == "SwinIR" else 16)
                    sr = np.asarray(forward_padded(
                        g.forward, params, s["lq"][None], vm,
                        int(opt.get("scale", 1)))[0])
                    p, ss = score_pair(sr, s["gt"], mopts)
                    psnrs.append(p)
                    ssims.append(ss)
                logger.log(it, {"val/psnr": float(np.mean(psnrs)),
                                "val/ssim": float(np.mean(ssims))})
                print(f"iter {it}  val psnr={np.mean(psnrs):.3f} "
                      f"ssim={np.mean(ssims):.4f}", flush=True)
            if it >= total_iter:
                break
        if it == epoch_start:
            raise SystemExit(
                f"dataset yields no batches: {len(dataset)} samples < "
                f"batch size {batch} (drop_last) — fix dataroot or "
                "batch_size_per_gpu")
    ckpt.save(total_iter, current_g(state))
    logger.close()
    print("training done", flush=True)


if __name__ == "__main__":
    main()
