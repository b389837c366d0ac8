"""Batch-SR CLI (the reference's test_tsdsr.py + test_metrics.py executable
capability) — bicubic-fallback end-to-end with metric scoring."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest


def _load_script():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "sr_batch.py")
    spec = importlib.util.spec_from_file_location("sr_batch", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sr_batch_end_to_end(tmp_path, monkeypatch, capsys):
    from unitex_tpu.utils.image_io import save_image

    lr_dir, out_dir, gt_dir = tmp_path / "lr", tmp_path / "out", tmp_path / "gt"
    lr_dir.mkdir(), gt_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        hr = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        # LR = 4x box downsample of HR
        lr = hr.reshape(16, 4, 16, 4, 3).mean(axis=(1, 3))
        save_image(str(gt_dir / f"im{i}.png"), hr)
        save_image(str(lr_dir / f"im{i}.png"), lr)

    mod = _load_script()
    monkeypatch.setattr(
        sys, "argv",
        ["sr_batch.py", "--input", str(lr_dir), "--output", str(out_dir),
         "--gt", str(gt_dir)],
    )
    mod.main()

    outs = sorted(os.listdir(out_dir))
    assert "im0.png" in outs and "im1.png" in outs and "metrics.jsonl" in outs
    lines = [json.loads(l) for l in (out_dir / "metrics.jsonl").read_text().splitlines()]
    per_image, summary = lines[:-1], lines[-1]
    assert summary["n"] == 2
    # bicubic x4 of a box-downsampled random image: weak but positive fidelity
    assert 5.0 < summary["mean_psnr"] < 40.0
    assert all(0.0 <= r["ssim"] <= 1.0 for r in per_image)
