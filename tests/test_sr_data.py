"""Dataset/file-IO layer (training/sr_data.py, utils/file_client.py)."""

import os

import numpy as np
import pytest

from unitex_tpu.training import sr_data as sd
from unitex_tpu.utils import file_client as fc
from unitex_tpu.utils.image_io import imfrombytes, imtobytes, save_image


def _write_pairs(tmp_path, n=4, scale=2, lq=8, name="{:03d}.png"):
    rng = np.random.default_rng(0)
    gt_dir, lq_dir = str(tmp_path / "gt"), str(tmp_path / "lq")
    os.makedirs(gt_dir), os.makedirs(lq_dir)
    for i in range(n):
        save_image(os.path.join(gt_dir, name.format(i)),
                   rng.uniform(0, 1, (lq * scale, lq * scale, 3)))
        save_image(os.path.join(lq_dir, name.format(i)),
                   rng.uniform(0, 1, (lq, lq, 3)))
    return gt_dir, lq_dir


class TestFileClient:
    def test_disk_get(self, tmp_path):
        p = tmp_path / "x.bin"
        p.write_bytes(b"abc")
        client = fc.FileClient("disk")
        assert client.get(str(p)) == b"abc"
        (tmp_path / "t.txt").write_text("hello")
        assert client.get_text(str(tmp_path / "t.txt")) == "hello"

    def test_packed_round_trip(self, tmp_path):
        rng = np.random.default_rng(1)
        src = str(tmp_path / "imgs")
        os.makedirs(src)
        imgs = {}
        for i in range(3):
            img = rng.uniform(0, 1, (6 + i, 5, 3))
            save_image(os.path.join(src, f"im{i}.png"), img)
            imgs[f"im{i}"] = img
        pack = fc.make_packed_from_imgs(
            src, str(tmp_path / "store.pkdb"),
            [f"im{i}.png" for i in range(3)])
        client = fc.FileClient("packed", db_paths=[pack], client_keys=["gt"])
        for key, img in imgs.items():
            back = imfrombytes(client.get(key, "gt"))
            assert back.shape == img.shape
            assert np.abs(back - np.clip(img, 0, 1)).max() < 2 / 255
        # meta file lists all keys with shapes
        keys = fc.paths_from_meta_info(pack)
        assert sorted(keys) == ["im0", "im1", "im2"]
        assert client.client.shape("im2", "gt") == (8, 5, 3)

    def test_lmdb_name_raises_with_guidance(self):
        with pytest.raises(ValueError, match="packed"):
            fc.FileClient("lmdb")

    def test_scandir(self, tmp_path):
        (tmp_path / "a.png").write_bytes(b"")
        (tmp_path / "b.txt").write_bytes(b"")
        sub = tmp_path / "sub"
        sub.mkdir()
        (sub / "c.png").write_bytes(b"")
        assert list(fc.scandir(str(tmp_path), suffix=".png")) == ["a.png"]
        got = sorted(fc.scandir(str(tmp_path), suffix=".png", recursive=True))
        assert got == ["a.png", os.path.join("sub", "c.png")]


class TestAugment:
    def test_status_and_flow_consistency(self):
        rng = np.random.default_rng(2)
        img = rng.uniform(0, 1, (4, 6, 3))
        flow = rng.normal(size=(4, 6, 2))
        for _ in range(20):
            out, fout, status = sd.augment(img.copy(), rng, flows=flow.copy(),
                                           return_status=True)
            hf, vf, rot = status
            ref = img
            rf = flow
            if hf:
                ref = ref[:, ::-1]
                rf = rf[:, ::-1] * [-1, 1]
            if vf:
                ref = ref[::-1]
                rf = rf[::-1] * [1, -1]
            if rot:
                ref = ref.transpose(1, 0, 2)
                rf = rf.transpose(1, 0, 2)[:, :, [1, 0]]
            np.testing.assert_allclose(out, ref)
            np.testing.assert_allclose(fout, rf)

    def test_list_in_list_out(self):
        rng = np.random.default_rng(3)
        imgs = [np.zeros((2, 2, 3)), np.ones((2, 2, 3))]
        out = sd.augment(imgs, rng)
        assert isinstance(out, list) and len(out) == 2


class TestPairedImageDataset:
    def test_train_crop_and_shapes(self, tmp_path):
        gt_dir, lq_dir = _write_pairs(tmp_path, scale=2, lq=8)
        ds = sd.PairedImageDataset(sd.PairedImageConfig(
            lq_folder=lq_dir, gt_folder=gt_dir, scale=2, gt_size=8,
            phase="train"))
        assert len(ds) == 4
        s = ds[0]
        assert s["lq"].shape == (4, 4, 3)
        assert s["gt"].shape == (8, 8, 3)

    def test_val_passthrough(self, tmp_path):
        gt_dir, lq_dir = _write_pairs(tmp_path, scale=2, lq=8)
        ds = sd.PairedImageDataset(sd.PairedImageConfig(
            lq_folder=lq_dir, gt_folder=gt_dir, scale=2, phase="val"))
        s = ds[1]
        assert s["lq"].shape == (8, 8, 3) and s["gt"].shape == (16, 16, 3)

    def test_packed_backend(self, tmp_path):
        gt_dir, lq_dir = _write_pairs(tmp_path, scale=2, lq=8)
        gt_pack = fc.make_packed_from_imgs(
            gt_dir, str(tmp_path / "gt.pkdb"), sorted(os.listdir(gt_dir)))
        lq_pack = fc.make_packed_from_imgs(
            lq_dir, str(tmp_path / "lq.pkdb"), sorted(os.listdir(lq_dir)))
        ds = sd.PairedImageDataset(sd.PairedImageConfig(
            lq_folder=lq_pack, gt_folder=gt_pack, scale=2, gt_size=8,
            backend="packed"))
        s = ds[2]
        assert s["lq"].shape == (4, 4, 3) and s["gt"].shape == (8, 8, 3)

    def test_missing_lq_raises(self, tmp_path):
        gt_dir, lq_dir = _write_pairs(tmp_path)
        os.remove(os.path.join(lq_dir, "001.png"))
        with pytest.raises(FileNotFoundError):
            sd.PairedImageDataset(sd.PairedImageConfig(
                lq_folder=lq_dir, gt_folder=gt_dir))

    def test_batch_iterator(self, tmp_path):
        gt_dir, lq_dir = _write_pairs(tmp_path, n=5)
        ds = sd.PairedImageDataset(sd.PairedImageConfig(
            lq_folder=lq_dir, gt_folder=gt_dir, scale=2, gt_size=8))
        batches = list(sd.batch_iterator(ds, 2, np.random.default_rng(0)))
        assert len(batches) == 2  # drop_last
        assert batches[0]["lq"].shape == (2, 4, 4, 3)
        assert batches[0]["gt"].shape == (2, 8, 8, 3)


class TestVideoFrameDataset:
    def _write_clips(self, tmp_path, clips=2, frames=6, scale=2, lq=6):
        rng = np.random.default_rng(4)
        for root, side in (("gt", lq * scale), ("lq", lq)):
            for c in range(clips):
                d = tmp_path / root / f"{c:03d}"
                os.makedirs(str(d))
                for f in range(frames):
                    save_image(str(d / f"{f:08d}.png"),
                               rng.uniform(0, 1, (side, side, 3)))
        return str(tmp_path / "lq"), str(tmp_path / "gt")

    def test_center_gt_window(self, tmp_path):
        lq_root, gt_root = self._write_clips(tmp_path)
        ds = sd.VideoFrameDataset(sd.VideoFrameConfig(
            lq_root=lq_root, gt_root=gt_root, num_frame=5, scale=2,
            gt_size=8))
        assert len(ds) == 12
        s = ds[0]
        assert s["lq"].shape == (5, 4, 4, 3)
        assert s["gt"].shape == (8, 8, 3)

    def test_recurrent_all_frames(self, tmp_path):
        lq_root, gt_root = self._write_clips(tmp_path)
        ds = sd.VideoFrameDataset(sd.VideoFrameConfig(
            lq_root=lq_root, gt_root=gt_root, num_frame=3, scale=2,
            gt_size=8, center_gt=False))
        s = ds[5]
        assert s["lq"].shape == (3, 4, 4, 3)
        assert s["gt"].shape == (3, 8, 8, 3)

    def test_border_clamping(self, tmp_path):
        lq_root, gt_root = self._write_clips(tmp_path, frames=3)
        ds = sd.VideoFrameDataset(sd.VideoFrameConfig(
            lq_root=lq_root, gt_root=gt_root, num_frame=5, scale=2,
            phase="val"))
        s = ds[0]  # center frame 0: window clamps to frame 0
        assert s["lq"].shape == (5, 6, 6, 3)
        np.testing.assert_allclose(s["lq"][0], s["lq"][1])
