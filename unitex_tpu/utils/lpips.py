"""Learned perceptual metrics from scratch: LPIPS and DISTS in jnp.

The reference scores SR output with a pyiqa battery including LPIPS and
DISTS (/root/reference/TSD_SR/test/test_metrics.py:24-34) and uses LPIPS as
the perceptual half of TSD-SR's data loss
(/root/reference/TSD_SR/train/train.py:900-904).  pyiqa wraps pretrained
torch nets; here the backbones (VGG16 / AlexNet feature stacks) and the
metric heads are implemented directly in jnp:

* ``lpips``  — unit-normalize each stage's channels, squared difference,
  learned non-negative per-channel 1x1 weights, spatial mean, sum over
  stages (Zhang et al. 2018).
* ``dists``  — VGG16 with L2-pooling instead of max-pool; per-channel
  global texture (mean) and structure (covariance) similarities combined
  with learned alpha/beta weights (Ding et al. 2020).

Weights: pretrained torchvision/LPIPS/DISTS checkpoints are not bundled in
this image — ``load_torch_lpips`` / ``load_torch_dists`` convert the
standard torch state-dict files when the user supplies them (torch-cpu is
available for deserialization only).  Random-init params exercise the full
code path for tests; the math is weight-agnostic.

Functional params: nested dicts of arrays, conv kernels HWIO (the repo
convention), NHWC activations.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# stage channel widths (features tapped after each listed ReLU)
VGG16_STAGES: Tuple[int, ...] = (64, 128, 256, 512, 512)
ALEX_STAGES: Tuple[int, ...] = (64, 192, 384, 256, 256)

# per-stage conv layer shapes: (in_ch, out_ch, ksize, stride, pad) lists.
_VGG16_CFG: Tuple[Tuple[Tuple[int, int, int, int, int], ...], ...] = (
    ((3, 64, 3, 1, 1), (64, 64, 3, 1, 1)),
    ((64, 128, 3, 1, 1), (128, 128, 3, 1, 1)),
    ((128, 256, 3, 1, 1), (256, 256, 3, 1, 1), (256, 256, 3, 1, 1)),
    ((256, 512, 3, 1, 1), (512, 512, 3, 1, 1), (512, 512, 3, 1, 1)),
    ((512, 512, 3, 1, 1), (512, 512, 3, 1, 1), (512, 512, 3, 1, 1)),
)
_ALEX_CFG: Tuple[Tuple[Tuple[int, int, int, int, int], ...], ...] = (
    ((3, 64, 11, 4, 2),),
    ((64, 192, 5, 1, 2),),
    ((192, 384, 3, 1, 1),),
    ((384, 256, 3, 1, 1),),
    ((256, 256, 3, 1, 1),),
)
# pooling applied BEFORE each stage (none before stage 0)
_VGG16_POOL = (False, True, True, True, True)
_ALEX_POOL = (False, True, True, False, False)

# LPIPS ScalingLayer constants (shift/scale applied to [-1, 1] input)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)
# DISTS normalizes with the ImageNet mean/std on [0, 1] input
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _cfg(net: str):
    if net == "vgg":
        return _VGG16_CFG, _VGG16_POOL, VGG16_STAGES
    if net == "alex":
        return _ALEX_CFG, _ALEX_POOL, ALEX_STAGES
    raise ValueError(f"unknown backbone {net!r} (vgg | alex)")


# ------------------------------------------------------------------ backbone


def init_backbone_params(key: jax.Array, net: str = "vgg") -> Dict[str, Any]:
    """He-normal random conv stack (for tests / fine-tuning from scratch)."""
    cfg, _, _ = _cfg(net)
    params: Dict[str, Any] = {"net": []}
    for stage in cfg:
        layers = []
        for cin, cout, k, _, _ in stage:
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (k, k, cin, cout), jnp.float32)
            w = w * np.sqrt(2.0 / (k * k * cin))
            layers.append({"kernel": w, "bias": jnp.zeros((cout,), jnp.float32)})
        params["net"].append(layers)
    return params


def _conv(x: jnp.ndarray, p: Dict[str, jnp.ndarray], stride: int, pad: int):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"]


def _max_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _l2_pool(x: jnp.ndarray) -> jnp.ndarray:
    """DISTS L2-pooling: sqrt of a hann^2-windowed average of x^2,
    3x3 window, stride 2 (Ding et al.; anti-aliased downsampling)."""
    w1 = np.hanning(5)[1:-1]  # [.5, 1, .5]
    w2 = np.outer(w1, w1)
    w2 = (w2 / w2.sum()).astype(np.float32)
    C = x.shape[-1]
    k = jnp.asarray(w2)[:, :, None, None] * jnp.ones((1, 1, 1, C), jnp.float32)
    y = jax.lax.conv_general_dilated(
        x * x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return jnp.sqrt(jnp.maximum(y, 1e-12))


def backbone_features(
    params: Dict[str, Any], x: jnp.ndarray, net: str = "vgg",
    pool: str = "max",
) -> List[jnp.ndarray]:
    """Per-stage ReLU feature maps of a normalized NHWC batch."""
    cfg, pools, _ = _cfg(net)
    feats = []
    for si, stage in enumerate(cfg):
        if pools[si]:
            x = _l2_pool(x) if pool == "l2" else _max_pool(x)
        for li, (_, _, k, stride, padd) in enumerate(stage):
            x = jax.nn.relu(_conv(x, params["net"][si][li], stride, padd))
        feats.append(x)
    return feats


# -------------------------------------------------------------------- LPIPS


def init_lpips_params(key: jax.Array, net: str = "vgg") -> Dict[str, Any]:
    _, _, widths = _cfg(net)
    k_bb, k_lin = jax.random.split(key)
    params = init_backbone_params(k_bb, net)
    lins = []
    for c in widths:
        k_lin, sub = jax.random.split(k_lin)
        lins.append(jnp.abs(jax.random.normal(sub, (c,), jnp.float32)) / c)
    params["lins"] = lins
    params["pnet"] = net
    return params


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (n + eps)


def lpips(
    params: Dict[str, Any], a: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """LPIPS distance per batch element.  a, b: [N, H, W, 3] in [-1, 1]."""
    net = params.get("pnet", "vgg")
    shift = jnp.asarray(_LPIPS_SHIFT)
    scale = jnp.asarray(_LPIPS_SCALE)
    fa = backbone_features(params, (a - shift) / scale, net)
    fb = backbone_features(params, (b - shift) / scale, net)
    total = jnp.zeros((a.shape[0],), jnp.float32)
    for f1, f2, w in zip(fa, fb, params["lins"]):
        d = (_unit_normalize(f1) - _unit_normalize(f2)) ** 2
        # learned non-negative per-channel weight (a 1x1 conv to 1 channel)
        total = total + jnp.mean(jnp.sum(d * jnp.abs(w), axis=-1), axis=(1, 2))
    return total


def lpips_image01(params: Dict[str, Any], a: jnp.ndarray, b: jnp.ndarray):
    """Convenience for [0,1]-range images (the trainer's perceptual hook)."""
    return lpips(params, a * 2.0 - 1.0, b * 2.0 - 1.0)


# -------------------------------------------------------------------- DISTS


def init_dists_params(key: jax.Array) -> Dict[str, Any]:
    k_bb, k_ab = jax.random.split(key)
    params = init_backbone_params(k_bb, "vgg")
    widths = (3,) + VGG16_STAGES  # stage 0 = the input image itself
    total = sum(widths)
    k_a, k_b = jax.random.split(k_ab)
    params["alpha"] = jnp.abs(jax.random.normal(k_a, (total,))) / total
    params["beta"] = jnp.abs(jax.random.normal(k_b, (total,))) / total
    return params


def dists(
    params: Dict[str, Any], a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """DISTS distance per batch element.  a, b: [N, H, W, 3] in [0, 1]."""
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)
    na, nb = (a - mean) / std, (b - mean) / std
    fa = [na] + backbone_features(params, na, "vgg", pool="l2")
    fb = [nb] + backbone_features(params, nb, "vgg", pool="l2")

    alpha = jnp.abs(params["alpha"])
    beta = jnp.abs(params["beta"])
    norm = jnp.sum(alpha) + jnp.sum(beta)
    alpha, beta = alpha / norm, beta / norm

    c1, c2 = 1e-6, 1e-6
    score = jnp.zeros((a.shape[0],), jnp.float32)
    off = 0
    for f1, f2 in zip(fa, fb):
        C = f1.shape[-1]
        mu1 = jnp.mean(f1, axis=(1, 2))
        mu2 = jnp.mean(f2, axis=(1, 2))
        var1 = jnp.mean(f1 * f1, axis=(1, 2)) - mu1 * mu1
        var2 = jnp.mean(f2 * f2, axis=(1, 2)) - mu2 * mu2
        cov = jnp.mean(f1 * f2, axis=(1, 2)) - mu1 * mu2
        texture = (2 * mu1 * mu2 + c1) / (mu1 * mu1 + mu2 * mu2 + c1)
        structure = (2 * cov + c2) / (var1 + var2 + c2)
        w_a = alpha[off : off + C]
        w_b = beta[off : off + C]
        score = score + jnp.sum(w_a * texture + w_b * structure, axis=-1)
        off += C
    return 1.0 - score


# ------------------------------------------------------------ torch loaders


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_torchvision_backbone(
    state_dict: Dict[str, np.ndarray], net: str = "vgg",
    prefix: str = "features.",
) -> List[List[Dict[str, jnp.ndarray]]]:
    """torchvision vgg16/alexnet ``features.N.{weight,bias}`` (OIHW) →
    this module's staged HWIO layout."""
    cfg, pools, _ = _cfg(net)
    # torchvision indexes: conv, relu per layer; maxpool between stages
    idx = 0
    stages = []
    for si, stage in enumerate(cfg):
        if pools[si]:
            idx += 1  # the MaxPool2d module
        layers = []
        for _ in stage:
            w = np.asarray(state_dict[f"{prefix}{idx}.weight"], np.float32)
            bkey = f"{prefix}{idx}.bias"
            b = np.asarray(state_dict[bkey], np.float32)
            layers.append(
                {"kernel": jnp.asarray(_oihw_to_hwio(w)), "bias": jnp.asarray(b)}
            )
            idx += 2  # conv + relu
        stages.append(layers)
    return stages


def load_torch_lpips(
    backbone_path: str, lins_path: str, net: str = "vgg"
) -> Dict[str, Any]:
    """Build LPIPS params from (a) a torchvision vgg16/alexnet state dict and
    (b) the LPIPS package's linear-head checkpoint
    (``lin{i}.model.1.weight`` [1, C, 1, 1])."""
    import torch  # deserialization only

    bb = torch.load(backbone_path, map_location="cpu", weights_only=True)
    lin = torch.load(lins_path, map_location="cpu", weights_only=True)
    bb = {k: v.numpy() for k, v in bb.items()}
    params: Dict[str, Any] = {
        "net": convert_torchvision_backbone(bb, net),
        "pnet": net,
    }
    lins = []
    for i in range(len(_cfg(net)[2])):
        w = lin[f"lin{i}.model.1.weight"].numpy().astype(np.float32)
        lins.append(jnp.asarray(w.reshape(-1)))
    params["lins"] = lins
    return params


def load_torch_dists(weights_path: str) -> Dict[str, Any]:
    """Build DISTS params from the official DISTS checkpoint, which bundles
    the (slightly retrained) VGG stages and alpha/beta."""
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    # official layout: stage{i}.{j}.weight / alpha / beta
    stages: List[List[Dict[str, jnp.ndarray]]] = []
    cfg = _VGG16_CFG
    for si, stage in enumerate(cfg):
        # stage modules are Sequential slices whose conv indices vary; accept
        # either 'stageN.M' or torchvision-style flat features
        keys = sorted(
            (k for k in sd if k.startswith(f"stage{si + 1}.") and k.endswith(".weight")),
            key=lambda k: int(k.split(".")[1]),
        )
        if len(keys) < len(stage):
            raise KeyError(f"stage{si + 1}: need {len(stage)} convs, found {keys}")
        layers = []
        for k in keys[-len(stage):]:
            w = _oihw_to_hwio(np.asarray(sd[k], np.float32))
            b = np.asarray(sd[k.replace(".weight", ".bias")], np.float32)
            layers.append({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)})
        stages.append(layers)
    return {
        "net": stages,
        "alpha": jnp.asarray(np.asarray(sd["alpha"], np.float32).reshape(-1)),
        "beta": jnp.asarray(np.asarray(sd["beta"], np.float32).reshape(-1)),
    }


# ------------------------------------------------------- numpy reference


def lpips_reference(params: Dict[str, Any], a: np.ndarray, b: np.ndarray):
    """Plain-numpy LPIPS for kernel-parity tests (dual-implementation
    pattern, SURVEY.md §4)."""
    net = params.get("pnet", "vgg")
    cfg, pools, _ = _cfg(net)

    def conv(x, w, bias, stride, pad):
        N, H, W, _ = x.shape
        k = w.shape[0]
        xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        Ho = (H + 2 * pad - k) // stride + 1
        Wo = (W + 2 * pad - k) // stride + 1
        cols = np.empty((N, Ho, Wo, k * k * x.shape[-1]), np.float32)
        for i in range(Ho):
            for j in range(Wo):
                patch = xp[:, i * stride : i * stride + k, j * stride : j * stride + k]
                cols[:, i, j] = patch.reshape(N, -1)
        return cols @ w.reshape(-1, w.shape[-1]) + bias

    def feats(x):
        out = []
        for si, stage in enumerate(cfg):
            if pools[si]:
                N, H, W, C = x.shape
                x = x[:, : H // 2 * 2, : W // 2 * 2]
                x = x.reshape(N, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))
            for li, (_, _, k, stride, pad) in enumerate(stage):
                p = params["net"][si][li]
                x = conv(x, np.asarray(p["kernel"]), np.asarray(p["bias"]), stride, pad)
                x = np.maximum(x, 0.0)
            out.append(x)
        return out

    na = ((a - _LPIPS_SHIFT) / _LPIPS_SCALE).astype(np.float32)
    nb = ((b - _LPIPS_SHIFT) / _LPIPS_SCALE).astype(np.float32)
    fa, fb = feats(na), feats(nb)
    total = np.zeros((a.shape[0],), np.float32)
    for f1, f2, w in zip(fa, fb, params["lins"]):
        n1 = f1 / (np.sqrt((f1**2).sum(-1, keepdims=True)) + 1e-10)
        n2 = f2 / (np.sqrt((f2**2).sum(-1, keepdims=True)) + 1e-10)
        d = (n1 - n2) ** 2
        total += (d * np.abs(np.asarray(w))).sum(-1).mean(axis=(1, 2))
    return total
