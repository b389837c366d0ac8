"""Background removal (the RMBG-2.0 / rembg capability,
/root/reference/pipeline.py:34-78).

Backends behind one callable protocol (image -> L-mode alpha), preferred
in this order by :func:`build_background_remover`:

* ``IsnetRemover``     — JAX-native ISNet (image/isnet.py) for RMBG-1.4
                         weights; on-device.
* ``BirefnetRemover``  — JAX-native BiRefNet (models/birefnet.py) for
                         RMBG-2.0 weights; on-device.
* ``OnnxRemover``      — an RMBG/BiRefNet-style ONNX segmentation model via
                         onnxruntime, when a model file is provided (the
                         reference's ``build_rembg`` path).
* ``TorchRemover``     — transformers AutoModelForImageSegmentation on CPU
                         (the reference's RMBG2 path); fallback-only.
* ``SaliencyRemover``  — dependency-free fallback: border-statistics
                         chroma keying + largest connected component.
                         Adequate for studio-style inputs (uniform
                         background), used when no weights are available.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
from PIL import Image


class BackgroundRemover:
    """Callable: PIL RGB image -> PIL 'L' alpha matte."""

    def __call__(self, image: Image.Image) -> Image.Image:  # pragma: no cover
        raise NotImplementedError


class SaliencyRemover(BackgroundRemover):
    """Heuristic matting: model the background color from the image border,
    classify pixels by color distance, keep the dominant foreground blob,
    and feather the edge."""

    def __init__(self, border: int = 8, k_sigma: float = 3.0):
        self.border = border
        self.k_sigma = k_sigma

    def __call__(self, image: Image.Image) -> Image.Image:
        rgb = np.asarray(image.convert("RGB"), np.float32)
        b = self.border
        edge = np.concatenate(
            [
                rgb[:b].reshape(-1, 3),
                rgb[-b:].reshape(-1, 3),
                rgb[:, :b].reshape(-1, 3),
                rgb[:, -b:].reshape(-1, 3),
            ]
        )
        mean = edge.mean(axis=0)
        std = edge.std(axis=0) + 4.0
        dist = np.sqrt((((rgb - mean) / std) ** 2).sum(axis=-1))
        fg = dist > self.k_sigma
        fg = self._largest_component(fg)
        # feather: soft alpha from distance
        alpha = np.clip((dist - self.k_sigma * 0.7) / (self.k_sigma * 0.6), 0, 1)
        alpha = np.where(fg, np.maximum(alpha, 0.9), np.minimum(alpha, 0.1))
        return Image.fromarray((alpha * 255).astype(np.uint8), mode="L")

    @staticmethod
    def _largest_component(mask: np.ndarray) -> np.ndarray:
        from scipy import ndimage

        labels, n = ndimage.label(mask)
        if n == 0:
            return mask
        sizes = ndimage.sum(mask, labels, range(1, n + 1))
        keep = int(np.argmax(sizes)) + 1
        return labels == keep


class OnnxRemover(BackgroundRemover):
    """ONNX segmentation model (e.g. BriaAI RMBG) with ImageNet-normalized
    1024² input — the preprocessing of the reference RMBG2 (pipeline.py:45-49)."""

    def __init__(self, model_path: str, size: int = 1024):
        import onnxruntime as ort

        self.session = ort.InferenceSession(
            model_path, providers=["CPUExecutionProvider"]
        )
        self.size = size
        self.input_name = self.session.get_inputs()[0].name

    def __call__(self, image: Image.Image) -> Image.Image:
        rgb = image.convert("RGB")
        x = np.asarray(rgb.resize((self.size, self.size)), np.float32) / 255.0
        x = (x - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
        x = x.transpose(2, 0, 1)[None].astype(np.float32)
        out = self.session.run(None, {self.input_name: x})[-1]
        pred = 1.0 / (1.0 + np.exp(-out[0].squeeze()))
        mask = Image.fromarray((pred * 255).astype(np.uint8), mode="L")
        return mask.resize(rgb.size)


class TorchRemover(BackgroundRemover):
    """transformers AutoModelForImageSegmentation (RMBG-2.0) on CPU."""

    def __init__(self, ckpt: str, size: int = 1024):
        import torch
        from transformers import AutoModelForImageSegmentation

        self.torch = torch
        self.model = AutoModelForImageSegmentation.from_pretrained(
            ckpt, trust_remote_code=True
        ).eval()
        self.size = size

    def __call__(self, image: Image.Image) -> Image.Image:
        torch = self.torch
        rgb = image.convert("RGB")
        x = np.asarray(rgb.resize((self.size, self.size)), np.float32) / 255.0
        x = (x - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
        t = torch.from_numpy(x.transpose(2, 0, 1)[None].astype(np.float32))
        with torch.no_grad():
            pred = self.model(t)[-1].sigmoid()[0, 0].numpy()
        mask = Image.fromarray((pred * 255).astype(np.uint8), mode="L")
        return mask.resize(rgb.size)


def build_background_remover(
    pretrain_root: Optional[str] = None,
) -> BackgroundRemover:
    """Pick the best available backend: the JAX-native ISNet when RMBG-1.4
    weights exist under ``pretrain_root`` (on-device, preferred), else
    RMBG-2.0 weights (torch or onnx), else the heuristic fallback."""
    if pretrain_root:
        isnet_dir = os.path.join(pretrain_root, "briaai", "RMBG-1.4")
        for fname in ("model.safetensors", "model.pth", "isnet.pth"):
            path = os.path.join(isnet_dir, fname)
            if os.path.exists(path):
                try:
                    from .isnet import IsnetRemover, load_isnet

                    return IsnetRemover(*load_isnet(path))
                except Exception:
                    break
        rmbg_dir = os.path.join(pretrain_root, "briaai", "RMBG-2.0")
        # JAX-native BiRefNet tower (models/birefnet.py): preferred for
        # RMBG-2.0 checkpoints — on-device, no host torch/onnx round-trip
        for fname in ("model.safetensors", "pytorch_model.bin", "model.pth"):
            path = os.path.join(rmbg_dir, fname)
            if os.path.exists(path):
                try:
                    from ..models.birefnet import BirefnetRemover, load_birefnet

                    return BirefnetRemover(*load_birefnet(path))
                except Exception:
                    break
        onnx_path = os.path.join(rmbg_dir, "onnx", "model.onnx")
        if os.path.exists(onnx_path):
            try:
                return OnnxRemover(onnx_path)
            except ImportError:
                pass
        if os.path.isdir(rmbg_dir):
            try:
                return TorchRemover(rmbg_dir)
            except Exception:
                pass
    return SaliencyRemover()
