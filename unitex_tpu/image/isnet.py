"""JAX-native learned background matting: the ISNet / U²-Net family.

The reference's main pipeline runs learned matting (RMBG-2.0,
/root/reference/pipeline.py:34-63) before conditioning; matting quality
directly gates stage-1 conditioning on natural-background inputs.  This
module provides the learned capability on-device: a from-scratch JAX
implementation of the ISNet-DIS architecture (RSU residual-U blocks — the
U²-Net building block — with dilated RSU4F bottlenecks and six side
outputs), plus a torch-checkpoint converter for the publicly distributed
BriaAI RMBG-1.4 weights (``model.pth`` / ``model.safetensors``), following
the same convert-and-parity-test pattern as :mod:`unitex_tpu.models.text_jax`.

Inference-only: BatchNorm is folded into per-channel scale/shift at
conversion time, convs run as one NHWC ``lax.conv_general_dilated`` each,
and the whole forward jits into a single TPU dispatch at a fixed 1024²
input — a conv-heavy workload that maps straight onto the MXU.

The heuristic :class:`~unitex_tpu.image.rembg.SaliencyRemover` stays the
dependency-free fallback; :func:`unitex_tpu.image.rembg.build_background_remover`
returns :class:`IsnetRemover` when RMBG-1.4 weights are present.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ------------------------------------------------------------------ config


@dataclasses.dataclass(frozen=True)
class RSUSpec:
    """One RSU block: ``height`` pooling levels (7/6/5/4), or a fully
    dilated bottleneck (``dilated=True``, the RSU4F form: no pooling,
    dilation 1/2/4/8)."""

    height: int
    in_ch: int
    mid_ch: int
    out_ch: int
    dilated: bool = False


@dataclasses.dataclass(frozen=True)
class IsnetConfig:
    """ISNet-DIS topology: stride-2 stem conv, 6 encoder RSUs with 2×2
    max-pools between them, 5 decoder RSUs over skip concatenations, and a
    1-channel 3×3 side head per resolution (side1 = the output matte)."""

    in_channels: int = 3
    stem_out: int = 64
    encoder: Tuple[RSUSpec, ...] = (
        RSUSpec(7, 64, 32, 64),
        RSUSpec(6, 64, 32, 128),
        RSUSpec(5, 128, 64, 256),
        RSUSpec(4, 256, 128, 512),
        RSUSpec(4, 512, 256, 512, dilated=True),
        RSUSpec(4, 512, 256, 512, dilated=True),
    )
    decoder: Tuple[RSUSpec, ...] = (  # stage5d .. stage1d
        RSUSpec(4, 1024, 256, 512, dilated=True),
        RSUSpec(4, 1024, 128, 256),
        RSUSpec(5, 512, 64, 128),
        RSUSpec(6, 256, 32, 64),
        RSUSpec(7, 128, 16, 64),
    )
    # normalization applied by the remover (RMBG-1.4: mean .5, unit std;
    # BiRefNet-style checkpoints use ImageNet stats)
    mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    std: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    size: int = 1024

    @staticmethod
    def rmbg14() -> "IsnetConfig":
        return IsnetConfig()

    @staticmethod
    def tiny() -> "IsnetConfig":
        """Small-channel topology for parity tests."""
        return IsnetConfig(
            stem_out=8,
            encoder=(
                RSUSpec(7, 8, 4, 8),
                RSUSpec(6, 8, 4, 12),
                RSUSpec(5, 12, 4, 16),
                RSUSpec(4, 16, 4, 24),
                RSUSpec(4, 24, 8, 24, dilated=True),
                RSUSpec(4, 24, 8, 24, dilated=True),
            ),
            decoder=(
                RSUSpec(4, 48, 8, 24, dilated=True),
                RSUSpec(4, 48, 4, 16),
                RSUSpec(5, 32, 4, 12),
                RSUSpec(6, 24, 4, 8),
                RSUSpec(7, 16, 4, 8),
            ),
            size=64,
        )


# -------------------------------------------------------------- primitives


def _conv(p: Params, x: jnp.ndarray, stride: int = 1, dilation: int = 1,
          padding: int | None = None) -> jnp.ndarray:
    if padding is None:
        padding = dilation  # 3x3 'same' at this dilation
    return jax.lax.conv_general_dilated(
        x, p["w"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]


def _rebnconv(p: Params, x: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """conv3x3(dilation) + folded BatchNorm + ReLU (the REBNCONV unit)."""
    y = _conv(p["conv"], x, dilation=dilation)
    return jax.nn.relu(y * p["bn"]["scale"] + p["bn"]["shift"])


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    """2×2/2 max-pool with ceil_mode=True semantics (odd edges padded)."""
    _, H, W, _ = x.shape
    pads = ((0, 0), (0, H % 2), (0, W % 2), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), pads)


def _upsample_to(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Bilinear (half-pixel, i.e. torch align_corners=False) resize of x to
    ref's spatial size."""
    B, _, _, C = x.shape
    return jax.image.resize(
        x, (B, ref.shape[1], ref.shape[2], C), method="bilinear")


# -------------------------------------------------------------------- RSU


def _rsu(p: Params, spec: RSUSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Residual U-block.  Dilated form (RSU4F): a straight dilation ladder
    1→2→4→8 and back, no resampling.  Pooled form (RSU-L): L-1 encoder
    convs with pools between, a dilation-2 apex, and a decoder over skip
    concatenations, ending ``hx1d + hxin``."""
    hxin = _rebnconv(p["rebnconvin"], x)
    L = spec.height
    if spec.dilated:
        feats = [hxin]
        for i in range(L):
            feats.append(_rebnconv(p[f"rebnconv{i + 1}"], feats[-1],
                                   dilation=2 ** i))
        h = feats[-1]
        for i in range(L - 1, 0, -1):
            h = _rebnconv(p[f"rebnconv{i}d"], jnp.concatenate(
                [h, feats[i]], axis=-1), dilation=2 ** (i - 1))
        return h + hxin

    enc = [_rebnconv(p["rebnconv1"], hxin)]
    h = enc[0]
    for i in range(2, L):
        h = _maxpool2(h)
        h = _rebnconv(p[f"rebnconv{i}"], h)
        enc.append(h)
    apex = _rebnconv(p[f"rebnconv{L}"], enc[-1], dilation=2)
    h = apex
    for i in range(L - 1, 0, -1):
        h = _rebnconv(p[f"rebnconv{i}d"],
                      jnp.concatenate([h, enc[i - 1]], axis=-1))
        if i > 1:
            h = _upsample_to(h, enc[i - 2])
    return h + hxin


# ---------------------------------------------------------------- forward


def isnet_forward(params: Params, cfg: IsnetConfig,
                  x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: [B, H, W, 3] normalized.  Returns the 6 side-output LOGIT maps
    [B, H, W, 1], finest (the matte head, side1) first — the torch model's
    pre-sigmoid ``[d1..d6]`` list, each upsampled to input size."""
    _, H, W, _ = x.shape
    h = _conv(params["conv_in"], x, stride=2, padding=1)

    skips = []
    for i, spec in enumerate(cfg.encoder):
        h = _rsu(params[f"stage{i + 1}"], spec, h)
        skips.append(h)
        if i < len(cfg.encoder) - 1:
            h = _maxpool2(h)

    sides = [skips[-1]]  # hx6 feeds side6
    h = skips[-1]
    for j, spec in enumerate(cfg.decoder):
        stage = len(cfg.decoder) - j  # 5..1
        h = _upsample_to(h, skips[stage - 1])
        h = _rsu(params[f"stage{stage}d"], spec,
                 jnp.concatenate([h, skips[stage - 1]], axis=-1))
        sides.append(h)
    sides = sides[::-1]  # hx1d .. hx5d, hx6

    outs = []
    for i, feat in enumerate(sides):
        d = _conv(params[f"side{i + 1}"], feat)
        B, _, _, C = d.shape
        outs.append(jax.image.resize(d, (B, H, W, C), method="bilinear"))
    return outs


# ------------------------------------------------------------------- init


def _conv_init(key, kh: int, kw: int, cin: int, cout: int) -> Params:
    fan = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    return {"w": w * (2.0 / fan) ** 0.5, "b": jnp.zeros((cout,), jnp.float32)}


def _rebnconv_init(key, cin: int, cout: int) -> Params:
    return {
        "conv": _conv_init(key, 3, 3, cin, cout),
        "bn": {"scale": jnp.ones((cout,), jnp.float32),
               "shift": jnp.zeros((cout,), jnp.float32)},
    }


def _rsu_init(key, spec: RSUSpec) -> Params:
    keys = iter(jax.random.split(key, 4 * spec.height + 2))
    p = {"rebnconvin": _rebnconv_init(next(keys), spec.in_ch, spec.out_ch)}
    L = spec.height
    if spec.dilated:
        cin = spec.out_ch
        for i in range(L):
            p[f"rebnconv{i + 1}"] = _rebnconv_init(next(keys), cin, spec.mid_ch)
            cin = spec.mid_ch
        for i in range(L - 1, 0, -1):
            cout = spec.out_ch if i == 1 else spec.mid_ch
            p[f"rebnconv{i}d"] = _rebnconv_init(
                next(keys), 2 * spec.mid_ch, cout)
        return p
    p["rebnconv1"] = _rebnconv_init(next(keys), spec.out_ch, spec.mid_ch)
    for i in range(2, L + 1):
        p[f"rebnconv{i}"] = _rebnconv_init(next(keys), spec.mid_ch, spec.mid_ch)
    for i in range(L - 1, 0, -1):
        cout = spec.out_ch if i == 1 else spec.mid_ch
        p[f"rebnconv{i}d"] = _rebnconv_init(next(keys), 2 * spec.mid_ch, cout)
    return p


def init_isnet_params(key, cfg: IsnetConfig) -> Params:
    keys = iter(jax.random.split(key, len(cfg.encoder) + len(cfg.decoder) + 8))
    p: Params = {"conv_in": _conv_init(
        next(keys), 3, 3, cfg.in_channels, cfg.stem_out)}
    for i, spec in enumerate(cfg.encoder):
        p[f"stage{i + 1}"] = _rsu_init(next(keys), spec)
    for j, spec in enumerate(cfg.decoder):
        p[f"stage{len(cfg.decoder) - j}d"] = _rsu_init(next(keys), spec)
    side_in = [cfg.decoder[-1].out_ch, cfg.decoder[-2].out_ch,
               cfg.decoder[-3].out_ch, cfg.decoder[-4].out_ch,
               cfg.decoder[-5].out_ch, cfg.encoder[-1].out_ch]
    for i, cin in enumerate(side_in):
        p[f"side{i + 1}"] = _conv_init(next(keys), 3, 3, cin, 1)
    return p


# -------------------------------------------------------------- converter


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str, eps: float = 1e-5) -> Params:
    g = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = g / np.sqrt(var + eps)
    return {"scale": jnp.asarray(scale), "shift": jnp.asarray(b - mean * scale)}


def _conv_t(sd: Dict[str, np.ndarray], prefix: str) -> Params:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)  # OIHW
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
            "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))}


def convert_isnet_torch(sd: Dict[str, Any], cfg: IsnetConfig) -> Params:
    """Map an ISNet torch state_dict (RMBG-1.4 / DIS layout: ``conv_in``,
    ``stage{1..6}`` / ``stage{1..5}d`` RSUs whose REBNCONVs are named
    ``rebnconvin|rebnconv{i}|rebnconv{i}d`` with ``conv_s1``/``bn_s1``
    leaves, and ``side{1..6}`` heads) onto the JAX tree, folding each
    BatchNorm into the per-channel scale/shift the forward expects.
    Accepts tensors or numpy arrays; a ``module.`` prefix is stripped."""
    sd = {k[len("module."):] if k.startswith("module.") else k:
          (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}

    def rebnconv(prefix: str) -> Params:
        return {"conv": _conv_t(sd, f"{prefix}.conv_s1"),
                "bn": _fold_bn(sd, f"{prefix}.bn_s1")}

    def rsu(prefix: str, spec: RSUSpec) -> Params:
        p = {"rebnconvin": rebnconv(f"{prefix}.rebnconvin")}
        for i in range(1, spec.height + 1):
            p[f"rebnconv{i}"] = rebnconv(f"{prefix}.rebnconv{i}")
        for i in range(spec.height - 1, 0, -1):
            p[f"rebnconv{i}d"] = rebnconv(f"{prefix}.rebnconv{i}d")
        return p

    p: Params = {"conv_in": _conv_t(sd, "conv_in")}
    for i, spec in enumerate(cfg.encoder):
        p[f"stage{i + 1}"] = rsu(f"stage{i + 1}", spec)
    for j, spec in enumerate(cfg.decoder):
        s = len(cfg.decoder) - j
        p[f"stage{s}d"] = rsu(f"stage{s}d", spec)
    for i in range(6):
        p[f"side{i + 1}"] = _conv_t(sd, f"side{i + 1}")
    return p


def load_isnet(path: str, cfg: IsnetConfig | None = None) -> Tuple[Params, IsnetConfig]:
    """Load RMBG-1.4-style weights from a ``.pth``/``.bin`` (torch pickle)
    or ``.safetensors`` file."""
    cfg = cfg or IsnetConfig.rmbg14()
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    params = convert_isnet_torch(sd, cfg)
    got = params["conv_in"]["w"].shape
    want = (3, 3, cfg.in_channels, cfg.stem_out)
    if got != want or params["stage1"]["rebnconvin"]["conv"]["w"].shape[-1] \
            != cfg.encoder[0].out_ch:
        raise ValueError(
            f"checkpoint at {path} does not match the {want} topology "
            f"(conv_in {got})")
    return params, cfg


# --------------------------------------------------------------- remover


class IsnetRemover:
    """Callable PIL RGB image -> PIL 'L' alpha matte, running the JAX ISNet
    at a fixed ``cfg.size``² input (one jitted TPU dispatch).  Postprocess
    matches RMBG-1.4: sigmoid then min-max normalize the finest side."""

    def __init__(self, params: Params, cfg: IsnetConfig):
        from PIL import Image  # noqa: F401  (PIL is a hard dep of image/)

        self.cfg = cfg
        self._fwd = jax.jit(
            lambda x: isnet_forward(params, cfg, x)[0])

    def __call__(self, image):
        from PIL import Image

        rgb = image.convert("RGB")
        s = self.cfg.size
        x = np.asarray(rgb.resize((s, s)), np.float32) / 255.0
        x = (x - np.asarray(self.cfg.mean)) / np.asarray(self.cfg.std)
        d1 = self._fwd(jnp.asarray(x[None]))
        pred = jax.nn.sigmoid(d1[0, ..., 0])
        pred = (pred - pred.min()) / jnp.maximum(pred.max() - pred.min(), 1e-8)
        mask = Image.fromarray(
            (np.asarray(pred) * 255).astype(np.uint8), mode="L")
        return mask.resize(rgb.size)
