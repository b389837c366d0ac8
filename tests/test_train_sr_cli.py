"""YAML options + arch registry + yml-driven train runner
(utils/options.py, models/zoo.py, scripts/train_sr.py)."""

import os
import sys

import jax
import numpy as np
import pytest

from unitex_tpu.models.zoo import ARCH_REGISTRY, build_arch
from unitex_tpu.utils import options as uo

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


class TestOptions:
    def test_postprocess_values(self):
        f = uo.postprocess_yml_value
        assert f("~") is None and f("None") is None
        assert f("true") is True and f("False") is False
        assert f("!!float 1e-4") == pytest.approx(1e-4)
        assert f("42") == 42
        assert f("2.5") == 2.5
        assert f("[1, 2, 3]") == [1, 2, 3]
        assert f("hello") == "hello"

    def test_parse_options_layout(self, tmp_path):
        yml = tmp_path / "opt.yml"
        yml.write_text(
            "name: exp1\nmodel_type: SRModel\nscale: 2\n"
            "datasets:\n  train:\n    type: PairedImageDataset\n"
            "    dataroot_gt: ~/gt\n    dataroot_lq: ~/lq\n"
            "  val_1:\n    type: PairedImageDataset\n"
            "    dataroot_gt: ~/vgt\n    dataroot_lq: ~/vlq\n"
            "path:\n  pretrain_network_g: ~\n"
            "train:\n  total_iter: 10\n")
        opt = uo.parse_options(str(yml), str(tmp_path), is_train=True)
        assert opt["datasets"]["train"]["phase"] == "train"
        assert opt["datasets"]["val_1"]["phase"] == "val"
        assert opt["datasets"]["train"]["scale"] == 2
        assert opt["datasets"]["train"]["dataroot_gt"].startswith(
            os.path.expanduser("~"))
        assert opt["path"]["models"].endswith(
            os.path.join("experiments", "exp1", "models"))
        assert opt["is_train"] is True

    def test_force_yml(self, tmp_path):
        yml = tmp_path / "o.yml"
        yml.write_text("name: x\ntrain:\n  total_iter: 100\n  ema: 0.9\n")
        opt = uo.parse_options(str(yml), is_train=False,
                               force_yml=["train:total_iter=5",
                                          "train:ema=!!float 0.5"])
        assert opt["train"]["total_iter"] == 5
        assert opt["train"]["ema"] == 0.5
        with pytest.raises(KeyError):
            uo.parse_options(str(yml), force_yml=["train:nope=1"])

    def test_dict2str(self):
        s = uo.dict2str({"a": 1, "b": {"c": "x"}})
        assert "a: 1" in s and "b:[" in s and "c: x" in s


class TestArchRegistry:
    @pytest.mark.parametrize("opt,in_shape,out_shape", [
        ({"type": "MSRResNet", "num_in_ch": 3, "num_out_ch": 3,
          "num_feat": 8, "num_block": 1, "upscale": 2},
         (1, 8, 8, 3), (1, 16, 16, 3)),
        ({"type": "RRDBNet", "num_feat": 8, "num_block": 1,
          "num_grow_ch": 8, "scale": 2}, (1, 8, 8, 3), (1, 16, 16, 3)),
        ({"type": "SRVGGNetCompact", "num_feat": 8, "num_conv": 2,
          "upscale": 2, "act_type": "prelu"},
         (1, 8, 8, 3), (1, 16, 16, 3)),
        ({"type": "UNetDiscriminatorSN", "num_in_ch": 3, "num_feat": 8},
         (1, 16, 16, 3), (1, 16, 16, 1)),
    ])
    def test_build_and_forward(self, opt, in_shape, out_shape):
        b = build_arch(opt)
        p = b.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), in_shape)
        assert b.forward(p, x).shape == out_shape

    def test_swinir_mapping(self):
        b = build_arch({"type": "SwinIR", "upscale": 2, "in_chans": 3,
                        "img_size": 48, "window_size": 4,
                        "depths": [2, 2], "embed_dim": 16,
                        "num_heads": [2, 2], "mlp_ratio": 2,
                        "upsampler": "pixelshuffle"})
        assert b.cfg.scale == 2 and b.cfg.num_heads == 2
        with pytest.raises(ValueError, match="uniform"):
            build_arch({"type": "SwinIR", "num_heads": [2, 4]})

    def test_video_arch_batched(self):
        b = build_arch({"type": "EDVR", "num_feat": 8, "num_frame": 3,
                        "deformable_groups": 2, "num_extract_block": 1,
                        "num_reconstruct_block": 1})
        p = b.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8, 3))
        assert b.forward(p, x).shape == (2, 32, 32, 3)

    def test_unknown_raises(self):
        with pytest.raises(KeyError, match="registry"):
            build_arch({"type": "NoSuchNet"})
        with pytest.raises(ValueError, match="unsupported"):
            build_arch({"type": "RRDBNet", "frobnicate": 1})

    def test_registry_covers_the_zoo(self):
        for name in ("RRDBNet", "MSRResNet", "EDSR", "RCAN",
                     "SRVGGNetCompact", "ECBSR", "RIDNet", "SwinIR",
                     "VGGStyleDiscriminator", "UNetDiscriminatorSN",
                     "EDVR", "BasicVSR", "BasicVSRPlusPlus", "DUF",
                     "SPyNet"):
            assert name in ARCH_REGISTRY


class TestTrainSRRunner:
    def _write_data(self, tmp_path, n=4, scale=2, lq=8):
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(0)
        for sub, side in (("gt", lq * scale), ("lq", lq)):
            d = tmp_path / "data" / sub
            os.makedirs(str(d))
            for i in range(n):
                save_image(str(d / f"{i:03d}.png"),
                           rng.uniform(0, 1, (side, side, 3)))
        return str(tmp_path / "data")

    def test_srmodel_end_to_end(self, tmp_path):
        import train_sr
        data = self._write_data(tmp_path)
        yml = tmp_path / "opt.yml"
        yml.write_text(f"""
name: smoke
model_type: SRModel
scale: 2
manual_seed: 0
datasets:
  train:
    type: PairedImageDataset
    dataroot_gt: {data}/gt
    dataroot_lq: {data}/lq
    gt_size: 8
    batch_size_per_gpu: 2
  val:
    type: PairedImageDataset
    dataroot_gt: {data}/gt
    dataroot_lq: {data}/lq
network_g:
  type: MSRResNet
  num_in_ch: 3
  num_out_ch: 3
  num_feat: 8
  num_block: 1
  upscale: 2
path:
  pretrain_network_g: ~
train:
  total_iter: 4
  optim_g:
    lr: !!float 1e-3
  scheduler:
    type: MultiStepLR
    milestones: [2]
    gamma: 0.5
  pixel_opt:
    type: L1Loss
val:
  val_freq: 4
  metrics:
    psnr:
      crop_border: 2
logger:
  print_freq: 2
  save_checkpoint_freq: 4
""")
        train_sr.main(["-opt", str(yml), "--root", str(tmp_path), "--cpu"])
        exp = tmp_path / "experiments" / "smoke"
        assert (exp / "models" / "checkpoint-4").exists()
        assert (exp / "train.jsonl").exists()
        log = (exp / "train.jsonl").read_text()
        assert "l_pix" in log and "val/psnr" in log

    def test_esrgan_model_end_to_end(self, tmp_path):
        import train_sr
        data = self._write_data(tmp_path)
        yml = tmp_path / "opt.yml"
        yml.write_text(f"""
name: gan_smoke
model_type: ESRGANModel
scale: 2
datasets:
  train:
    type: PairedImageDataset
    dataroot_gt: {data}/gt
    dataroot_lq: {data}/lq
    gt_size: 8
    batch_size_per_gpu: 2
network_g:
  type: MSRResNet
  num_feat: 8
  num_block: 1
  upscale: 2
network_d:
  type: UNetDiscriminatorSN
  num_in_ch: 3
  num_feat: 8
path: {{}}
train:
  total_iter: 2
  optim_g:
    lr: !!float 1e-4
  optim_d:
    lr: !!float 1e-4
  gan_opt:
    gan_type: vanilla
    loss_weight: !!float 5e-3
logger:
  print_freq: 1
""")
        train_sr.main(["-opt", str(yml), "--root", str(tmp_path), "--cpu"])
        log = (tmp_path / "experiments" / "gan_smoke"
               / "train.jsonl").read_text()
        assert "l_g_gan" in log and "l_d" in log


class TestTestSRRunner:
    def test_eval_end_to_end(self, tmp_path):
        import test_sr
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(1)
        for sub, side in (("gt", 16), ("lq", 8)):
            d = tmp_path / "data" / sub
            os.makedirs(str(d))
            for i in range(2):
                save_image(str(d / f"{i:03d}.png"),
                           rng.uniform(0, 1, (side, side, 3)))
        yml = tmp_path / "test.yml"
        yml.write_text(f"""
name: eval_smoke
model_type: SRModel
scale: 2
datasets:
  test_1:
    name: setA
    type: PairedImageDataset
    dataroot_gt: {tmp_path}/data/gt
    dataroot_lq: {tmp_path}/data/lq
network_g:
  type: MSRResNet
  num_feat: 8
  num_block: 1
  upscale: 2
path: {{}}
val:
  save_img: true
  metrics:
    psnr:
      crop_border: 2
    ssim:
      crop_border: 2
""")
        res = test_sr.main(["-opt", str(yml), "--root", str(tmp_path),
                            "--cpu"])
        assert "setA" in res and len(res["setA"]["per_image"]) == 2
        assert np.isfinite(res["setA"]["mean"]["psnr"])
        out = (tmp_path / "results" / "eval_smoke")
        assert (out / "test_eval_smoke.json").exists()
        assert any((out / "visualization" / "setA").iterdir())


class TestRealESRGANRunner:
    def _write_gt(self, tmp_path, n=3, side=64):
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(5)
        d = tmp_path / "data" / "gt"
        os.makedirs(str(d))
        for i in range(n):
            save_image(str(d / f"{i:03d}.png"),
                       rng.uniform(0, 1, (side, side, 3)))
        return str(d)

    def test_realesrnet_end_to_end(self, tmp_path):
        import train_sr
        gt = self._write_gt(tmp_path)
        yml = tmp_path / "opt.yml"
        yml.write_text(f"""
name: ren_smoke
model_type: RealESRNetModel
scale: 2
datasets:
  train:
    type: RealESRGANDataset
    dataroot_gt: {gt}
    crop_pad_size: 48
    gt_size: 32
    batch_size_per_gpu: 2
network_g:
  type: MSRResNet
  num_feat: 8
  num_block: 1
  upscale: 2
path: {{}}
train:
  total_iter: 2
  queue_size: 2
  ema_decay: 0.999
  optim_g:
    lr: !!float 1e-4
logger:
  print_freq: 1
""")
        train_sr.main(["-opt", str(yml), "--root", str(tmp_path), "--cpu"])
        log = (tmp_path / "experiments" / "ren_smoke"
               / "train.jsonl").read_text()
        assert "l_pix" in log

    def test_realesrgan_end_to_end(self, tmp_path):
        import train_sr
        gt = self._write_gt(tmp_path)
        yml = tmp_path / "opt.yml"
        yml.write_text(f"""
name: reg_smoke
model_type: RealESRGANModel
scale: 2
datasets:
  train:
    type: RealESRGANDataset
    dataroot_gt: {gt}
    crop_pad_size: 48
    gt_size: 32
    batch_size_per_gpu: 2
network_g:
  type: MSRResNet
  num_feat: 8
  num_block: 1
  upscale: 2
network_d:
  type: UNetDiscriminatorSN
  num_in_ch: 3
  num_feat: 8
path: {{}}
train:
  total_iter: 2
  queue_size: 2
  optim_g:
    lr: !!float 1e-4
  optim_d:
    lr: !!float 1e-4
  gan_opt:
    gan_type: vanilla
    loss_weight: !!float 0.1
  ldl_weight: !!float 0.5
logger:
  print_freq: 1
""")
        train_sr.main(["-opt", str(yml), "--root", str(tmp_path), "--cpu"])
        log = (tmp_path / "experiments" / "reg_smoke"
               / "train.jsonl").read_text()
        assert "l_g_gan" in log and "l_g_ldl" in log

    def test_sr_model_ema(self, tmp_path):
        import train_sr
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(6)
        for sub, side in (("gt", 16), ("lq", 8)):
            d = tmp_path / "data" / sub
            os.makedirs(str(d))
            for i in range(2):
                save_image(str(d / f"{i:03d}.png"),
                           rng.uniform(0, 1, (side, side, 3)))
        yml = tmp_path / "opt.yml"
        yml.write_text(f"""
name: ema_smoke
model_type: SRModel
scale: 2
datasets:
  train:
    type: PairedImageDataset
    dataroot_gt: {tmp_path}/data/gt
    dataroot_lq: {tmp_path}/data/lq
    gt_size: 8
    batch_size_per_gpu: 2
network_g:
  type: MSRResNet
  num_feat: 8
  num_block: 1
  upscale: 2
path: {{}}
train:
  total_iter: 2
  ema_decay: 0.999
  optim_g:
    lr: !!float 1e-2
logger:
  print_freq: 1
  save_checkpoint_freq: 2
""")
        train_sr.main(["-opt", str(yml), "--root", str(tmp_path), "--cpu"])
        assert (tmp_path / "experiments" / "ema_smoke" / "models"
                / "checkpoint-2").exists()


class TestGTImageDataset:
    def test_crop_pad_and_augment(self, tmp_path):
        from unitex_tpu.training import sr_data as sdm
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(7)
        d = tmp_path / "gt"
        os.makedirs(str(d))
        save_image(str(d / "small.png"), rng.uniform(0, 1, (10, 12, 3)))
        ds = sdm.GTImageDataset(sdm.GTImageConfig(gt_folder=str(d),
                                                  gt_size=16))
        s = ds[0]
        assert s["gt"].shape == (16, 16, 3)  # reflect-padded up

    def test_empty_raises(self, tmp_path):
        from unitex_tpu.training import sr_data as sdm
        d = tmp_path / "empty"
        os.makedirs(str(d))
        with pytest.raises(FileNotFoundError):
            sdm.GTImageDataset(sdm.GTImageConfig(gt_folder=str(d)))


class TestMoreModelTypes:
    def _gt_dir(self, tmp_path, side, n=2):
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(8)
        d = tmp_path / "data" / "gt"
        os.makedirs(str(d))
        for i in range(n):
            save_image(str(d / f"{i}.png"), rng.uniform(0, 1, (side, side, 3)))
        return str(d)

    def test_hifacegan_model(self, tmp_path):
        import train_sr
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(9)
        for sub in ("gt", "lq"):
            d = tmp_path / "data" / sub
            os.makedirs(str(d))
            for i in range(2):
                save_image(str(d / f"{i}.png"),
                           rng.uniform(0, 1, (32, 32, 3)))
        yml = tmp_path / "opt.yml"
        yml.write_text(f"""
name: hfg_smoke
model_type: HiFaceGANModel
scale: 1
datasets:
  train:
    type: PairedImageDataset
    dataroot_gt: {tmp_path}/data/gt
    dataroot_lq: {tmp_path}/data/lq
    gt_size: 32
    batch_size_per_gpu: 1
network_g:
  type: HiFaceGAN
  num_in_ch: 3
  num_feat: 4
network_d:
  type: HiFaceGANDiscriminator
  num_in_ch: 3
  num_feat: 4
  num_d: 2
  n_layers_d: 2
path: {{}}
train:
  total_iter: 1
  optim_g:
    lr: !!float 1e-4
  optim_d:
    lr: !!float 1e-4
  gan_opt:
    gan_type: hinge
logger:
  print_freq: 1
""")
        train_sr.main(["-opt", str(yml), "--root", str(tmp_path), "--cpu"])
        log = (tmp_path / "experiments" / "hfg_smoke"
               / "train.jsonl").read_text()
        assert "l_g_feat" in log

    def test_stylegan2_model(self, tmp_path):
        import train_sr
        gt = self._gt_dir(tmp_path, side=16)
        yml = tmp_path / "opt.yml"
        yml.write_text(f"""
name: sg2_smoke
model_type: StyleGAN2Model
datasets:
  train:
    type: FFHQDataset
    dataroot_gt: {gt}
    gt_size: 16
    batch_size_per_gpu: 2
network_g:
  type: StyleGAN2GeneratorC
  out_size: 16
  num_style_feat: 8
  num_mlp: 2
  channel_multiplier: 1
network_d:
  type: StyleGAN2DiscriminatorC
  out_size: 16
  num_style_feat: 8
  channel_multiplier: 1
path: {{}}
train:
  total_iter: 1
  net_d_reg_every: 1
  net_g_reg_every: 1
  optim_g:
    lr: !!float 1e-4
  optim_d:
    lr: !!float 1e-4
logger:
  print_freq: 1
""")
        train_sr.main(["-opt", str(yml), "--root", str(tmp_path), "--cpu"])
        log = (tmp_path / "experiments" / "sg2_smoke"
               / "train.jsonl").read_text()
        assert "l_d" in log or "l_g" in log

    def test_video_gan_model(self, tmp_path):
        import train_sr
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(10)
        for root, side in (("gt", 128), ("lq", 32)):
            d = tmp_path / "data" / root / "000"
            os.makedirs(str(d))
            for f in range(4):
                save_image(str(d / f"{f:08d}.png"),
                           rng.uniform(0, 1, (side, side, 3)))
        yml = tmp_path / "opt.yml"
        yml.write_text(f"""
name: vgan_smoke
model_type: VideoRecurrentGANModel
scale: 4
datasets:
  train:
    type: REDSRecurrentDataset
    dataroot_gt: {tmp_path}/data/gt
    dataroot_lq: {tmp_path}/data/lq
    num_frame: 2
    gt_size: 128
    batch_size_per_gpu: 1
network_g:
  type: BasicVSR
  num_feat: 8
  num_block: 1
network_d:
  type: UNetDiscriminatorSN
  num_in_ch: 3
  num_feat: 8
path: {{}}
train:
  total_iter: 1
  fix_flow_iter: 0
  optim_g:
    lr: !!float 1e-4
  optim_d:
    lr: !!float 1e-4
  gan_opt:
    gan_type: vanilla
    loss_weight: !!float 5e-2
logger:
  print_freq: 1
""")
        train_sr.main(["-opt", str(yml), "--root", str(tmp_path), "--cpu"])
        log = (tmp_path / "experiments" / "vgan_smoke"
               / "train.jsonl").read_text()
        assert "l_g_gan" in log


class TestAuxCLIs:
    def test_make_packed_cli(self, tmp_path):
        import make_packed
        from unitex_tpu.utils.file_client import FileClient, paths_from_meta_info
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(12)
        src = tmp_path / "imgs"
        os.makedirs(str(src / "sub"))
        save_image(str(src / "a.png"), rng.uniform(0, 1, (6, 6, 3)))
        save_image(str(src / "sub" / "b.png"), rng.uniform(0, 1, (7, 5, 3)))
        out = str(tmp_path / "store.pkdb")
        make_packed.main([str(src), out])
        keys = paths_from_meta_info(out)
        assert len(keys) == 2
        client = FileClient("packed", db_paths=[out])
        assert len(client.get(keys[0])) > 0

    def test_train_tsdsr_tiny(self, tmp_path):
        import train_tsdsr
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(13)
        for sub, side in (("hr", 16), ("lr", 4)):
            d = tmp_path / sub
            os.makedirs(str(d))
            for i in range(2):
                save_image(str(d / f"{i}.png"),
                           rng.uniform(0, 1, (side, side, 3)))
        out = str(tmp_path / "run")
        train_tsdsr.main(["--lr-dir", str(tmp_path / "lr"),
                          "--hr-dir", str(tmp_path / "hr"),
                          "--tiny", "--cpu", "--steps", "1",
                          "--log-every", "1", "--save-every", "1",
                          "--output-dir", out])
        assert os.path.exists(os.path.join(out, "checkpoints",
                                           "checkpoint-1"))
        assert "loss" in open(os.path.join(out, "train.jsonl")).read()


class TestReviewFixes:
    def test_empty_dataset_raises_not_spins(self, tmp_path):
        import train_sr
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(20)
        for sub, side in (("gt", 16), ("lq", 8)):
            d = tmp_path / "data" / sub
            os.makedirs(str(d))
            save_image(str(d / "0.png"), rng.uniform(0, 1, (side, side, 3)))
        yml = tmp_path / "opt.yml"
        yml.write_text(f"""
name: empty_smoke
model_type: SRModel
scale: 2
datasets:
  train:
    type: PairedImageDataset
    dataroot_gt: {tmp_path}/data/gt
    dataroot_lq: {tmp_path}/data/lq
    gt_size: 8
    batch_size_per_gpu: 8
network_g:
  type: MSRResNet
  num_feat: 8
  num_block: 1
  upscale: 2
path: {{}}
train:
  total_iter: 5
  optim_g:
    lr: !!float 1e-3
""")
        with pytest.raises(SystemExit, match="no batches"):
            train_sr.main(["-opt", str(yml), "--root", str(tmp_path),
                           "--cpu"])

    def test_score_pair_video_and_y_channel(self):
        import train_sr
        rng = np.random.default_rng(21)
        gt = rng.uniform(0, 1, (3, 16, 16, 3)).astype(np.float32)
        sr = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1).astype(np.float32)
        p, s = train_sr.score_pair(sr, gt, {"psnr": {}, "ssim": {}})
        assert np.isfinite(p) and 0 < s <= 1
        p_y, _ = train_sr.score_pair(
            sr, gt, {"psnr": {"test_y_channel": True}, "ssim": {}})
        assert abs(p_y - p) > 1e-6  # Y scoring differs from RGB

    def test_forward_padded_crops_back(self):
        import train_sr
        calls = []

        def fwd(params, lq):
            calls.append(lq.shape)
            return np.repeat(np.repeat(lq, 2, axis=-3), 2, axis=-2)

        lq = np.ones((1, 9, 13, 3), np.float32)
        out = train_sr.forward_padded(fwd, None, lq, multiple=8, scale=2)
        assert calls[0][1] % 8 == 0 and calls[0][2] % 8 == 0
        assert out.shape == (1, 18, 26, 3)

    def test_gt_dataset_pads_tiny_images(self, tmp_path):
        from unitex_tpu.training import sr_data as sdm
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(22)
        d = tmp_path / "gt"
        os.makedirs(str(d))
        save_image(str(d / "tiny.png"), rng.uniform(0, 1, (6, 6, 3)))
        ds = sdm.GTImageDataset(sdm.GTImageConfig(gt_folder=str(d),
                                                  gt_size=32))
        assert ds[0]["gt"].shape == (32, 32, 3)


class TestAutoResume:
    def test_resume_continues_from_saved_state(self, tmp_path):
        import train_sr
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(30)
        for sub, side in (("gt", 16), ("lq", 8)):
            d = tmp_path / "data" / sub
            os.makedirs(str(d))
            for i in range(2):
                save_image(str(d / f"{i}.png"),
                           rng.uniform(0, 1, (side, side, 3)))
        yml = tmp_path / "opt.yml"
        yml.write_text(f"""
name: resume_smoke
model_type: SRModel
scale: 2
datasets:
  train:
    type: PairedImageDataset
    dataroot_gt: {tmp_path}/data/gt
    dataroot_lq: {tmp_path}/data/lq
    gt_size: 8
    batch_size_per_gpu: 2
network_g:
  type: MSRResNet
  num_feat: 8
  num_block: 1
  upscale: 2
path: {{}}
train:
  total_iter: 2
  optim_g:
    lr: !!float 1e-3
logger:
  print_freq: 1
  save_checkpoint_freq: 2
""")
        train_sr.main(["-opt", str(yml), "--root", str(tmp_path), "--cpu"])
        states = tmp_path / "experiments" / "resume_smoke" / "training_states"
        assert (states / "checkpoint-2").exists()
        # raise the iteration budget and resume
        import io
        from contextlib import redirect_stdout
        buf = io.StringIO()
        with redirect_stdout(buf):
            train_sr.main(["-opt", str(yml), "--root", str(tmp_path),
                           "--cpu", "--auto-resume",
                           "--force-yml", "train:total_iter=4"])
        out = buf.getvalue()
        assert "resumed training state at iter 2" in out
        assert "iter 3/4" in out and "iter 4/4" in out
        assert "iter 1/4" not in out


class TestExperimentArchiving:
    def test_existing_dir_archived_unless_resuming(self, tmp_path):
        import train_sr
        from unitex_tpu.utils.image_io import save_image
        rng = np.random.default_rng(31)
        for sub, side in (("gt", 16), ("lq", 8)):
            d = tmp_path / "data" / sub
            os.makedirs(str(d))
            for i in range(2):
                save_image(str(d / f"{i}.png"),
                           rng.uniform(0, 1, (side, side, 3)))
        yml = tmp_path / "opt.yml"
        yml.write_text(f"""
name: arch_smoke
model_type: SRModel
scale: 2
datasets:
  train:
    type: PairedImageDataset
    dataroot_gt: {tmp_path}/data/gt
    dataroot_lq: {tmp_path}/data/lq
    gt_size: 8
    batch_size_per_gpu: 2
network_g:
  type: MSRResNet
  num_feat: 8
  num_block: 1
  upscale: 2
path: {{}}
train:
  total_iter: 1
  optim_g:
    lr: !!float 1e-3
""")
        argv = ["-opt", str(yml), "--root", str(tmp_path), "--cpu"]
        train_sr.main(argv)
        train_sr.main(argv)  # second fresh run archives the first
        exps = sorted(os.listdir(tmp_path / "experiments"))
        assert "arch_smoke" in exps
        assert any(e.startswith("arch_smoke_archived_") for e in exps)


class TestShippedOptionFiles:
    def test_all_option_files_parse_and_resolve(self, tmp_path):
        """Every yml under options/ must parse and resolve its network
        types + kwargs against the arch registry (guard against the
        bit-rot the reference's unmaintained configs suffered)."""
        import glob as _glob

        from unitex_tpu.models.zoo import build_arch
        from unitex_tpu.utils import options as uo

        files = sorted(
            _glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                    "options", "*.yml"))
        )
        assert files, "no shipped option files found"
        for f in files:
            is_train = os.path.basename(f).startswith("train")
            opt = uo.parse_options(f, str(tmp_path), is_train=is_train)
            assert "model_type" in opt, f
            for key in ("network_g", "network_d"):
                if key in opt and opt[key]:
                    build_arch(opt[key])
