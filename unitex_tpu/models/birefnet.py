"""JAX-native BiRefNet — the RMBG-2.0 matting tower.

The reference's main pipeline runs BriaAI RMBG-2.0 for background removal
(/root/reference/pipeline.py:34-63) via transformers'
``AutoModelForImageSegmentation`` + ``trust_remote_code`` (the modeling file
ships with the checkpoint, not with UniTEX).  RMBG-2.0 is BiRefNet
(ZhengPeng7/BiRefNet, "Bilateral Reference for High-Resolution Dichotomous
Image Segmentation"): a Swin-v1-Large backbone run at two scales, a
context-concatenated squeeze block, and a decoder whose blocks mix
deformable-convolution ASPP attention, gradient-supervision attention maps,
and per-level "image pyramid token" (ipt) patches of the raw input.

This module is a from-scratch JAX implementation of that architecture
(reconstructed from the published BiRefNet model code bundled with the
RMBG-2.0 checkpoint), with a torch-checkpoint converter following the same
convert-and-parity-test pattern as :mod:`unitex_tpu.image.isnet` /
:mod:`unitex_tpu.models.text_jax`.  Inference-only: BatchNorms are folded
into their preceding convs at conversion, dropout is identity, the whole
forward jits into one TPU program at the fixed 1024² input.  The swin
windows, shift masks and relative-position indices are computed in numpy at
trace time (static shapes), and the deformable convs run as a
``lax.scan`` over kernel taps — each tap is one bilinear gather plus an
MXU matmul — instead of the reference's torchvision ``deform_conv2d``
custom CUDA op.

Numeric validation against the real checkpoint requires the RMBG-2.0
weights (absent from this environment — WEIGHTS.md); the parity test
(tests/test_birefnet.py) checks the forward + converter against an
independent torch mirror of the published architecture.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ------------------------------------------------------------------ config


@dataclasses.dataclass(frozen=True)
class BiRefNetConfig:
    """BiRefNet topology.  Defaults = RMBG-2.0 (BiRefNet-general):
    swin_v1_large backbone, dual-scale feature concat (``mul_scl_ipt =
    'cat'`` → doubled lateral channels), 3 context levels into the squeeze
    block, split image-pyramid-token decoration at every decoder level,
    and gradient-attention on levels 4/3/2."""

    # swin backbone
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window: int = 12
    mlp_ratio: float = 4.0
    # birefnet head
    cxt_num: int = 3
    dec_inter: int = 64        # BasicDecBlk inter channels ('fixed' mode)
    aspp_inter: int = 256      # ASPPDeformable in_channelster
    aspp_kernels: Tuple[int, ...] = (1, 3, 7)  # parallel deform branches
    gdt_channels: int = 16     # _N of the gdt conv stacks
    # remover interface
    size: int = 1024
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)

    @property
    def stage_channels(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * (2**i) for i in range(len(self.depths)))

    @property
    def channels(self) -> Tuple[int, ...]:
        """Decoder lateral channels, deepest first, doubled by the
        dual-scale backbone concat."""
        return tuple(2 * c for c in reversed(self.stage_channels))

    @property
    def cxt(self) -> Tuple[int, ...]:
        """Context channels appended to x4 (shallower levels, x1..x3
        order)."""
        if not self.cxt_num:
            return ()
        return tuple(list(self.channels[1:])[::-1][-self.cxt_num :])

    @property
    def ipt_out(self) -> Tuple[int, ...]:
        """ipt block out-channels for levels [5, 4, 3, 2, 1] (the
        ``ipt_cha_opt=1`` = channels//8 option of the reference)."""
        ch = self.channels
        return (ch[0] // 8, ch[0] // 8, ch[1] // 8, ch[2] // 8, ch[3] // 8)

    @staticmethod
    def rmbg20() -> "BiRefNetConfig":
        return BiRefNetConfig()

    @staticmethod
    def tiny() -> "BiRefNetConfig":
        return BiRefNetConfig(
            embed_dim=8,
            depths=(1, 1, 2, 1),
            num_heads=(1, 2, 4, 8),
            window=4,
            dec_inter=8,
            aspp_inter=8,
            gdt_channels=4,
            size=64,
        )


# ------------------------------------------------------- primitive helpers


def _conv(
    p: Params, x: jnp.ndarray, stride: int = 1, pad: Optional[int] = None
) -> jnp.ndarray:
    """NHWC conv; default padding (k-1)//2 each side (torch's SAME-for-odd
    convention used everywhere in the head; the stride-4 patch embed passes
    ``pad=0``)."""
    k = p["kernel"].shape[0]
    if pad is None:
        pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    return y


def _dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _ln(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _resize_ac(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with ``align_corners=True`` semantics (the mode used
    throughout the BiRefNet decoder; jax.image.resize only offers
    half-pixel).  Separable 1D lerp with static numpy index/weight
    tables."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = size
    if (H, W) == (Ho, Wo):
        return x

    def axis_tables(n_in: int, n_out: int):
        if n_out == 1 or n_in == 1:
            idx0 = np.zeros(n_out, np.int32)
            return idx0, idx0, np.zeros(n_out, np.float32)
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        i0 = np.floor(pos).astype(np.int32)
        i0 = np.minimum(i0, n_in - 2)
        w = (pos - i0).astype(np.float32)
        return i0, i0 + 1, w

    y0, y1, wy = axis_tables(H, Ho)
    x = (
        jnp.take(x, y0, axis=-3) * (1.0 - wy[:, None, None])
        + jnp.take(x, y1, axis=-3) * wy[:, None, None]
    )
    x0, x1, wx = axis_tables(W, Wo)
    x = (
        jnp.take(x, x0, axis=-2) * (1.0 - wx[:, None])
        + jnp.take(x, x1, axis=-2) * wx[:, None]
    )
    return x


# ------------------------------------------------------------ swin backbone


def _rel_position_index(w: int) -> np.ndarray:
    coords = np.stack(
        np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(Hp: int, Wp: int, w: int, s: int) -> np.ndarray:
    """[nW, w*w, w*w] additive attention mask for SW-MSA on a padded
    (Hp, Wp) grid."""
    img = np.zeros((Hp, Wp), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -s), slice(-s, None)):
        for ws in (slice(0, -w), slice(-w, -s), slice(-s, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(Hp // w, w, Wp // w, w).transpose(0, 2, 1, 3)
    win = win.reshape(-1, w * w)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(
    p: Params, x: jnp.ndarray, n_heads: int, w: int, mask: Optional[np.ndarray]
) -> jnp.ndarray:
    """x [B, nW, w*w, C]; mask [nW, w*w, w*w] or None."""
    B, nW, N, C = x.shape
    hd = C // n_heads
    qkv = _dense(p["qkv"], x).reshape(B, nW, N, 3, n_heads, hd)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    q = q * (hd**-0.5)
    attn = jnp.einsum("bwqhd,bwkhd->bwhqk", q, k)
    bias = p["bias_table"][jnp.asarray(_rel_position_index(w))]  # [N,N,nH]
    attn = attn + bias.transpose(2, 0, 1)
    if mask is not None:
        attn = attn + jnp.asarray(mask)[None, :, None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bwhqk,bwkhd->bwqhd", attn, v).reshape(B, nW, N, C)
    return _dense(p["proj"], out)


def _swin_block(
    p: Params, x: jnp.ndarray, n_heads: int, w: int, shift: int
) -> jnp.ndarray:
    """x [B, H, W, C] → same.  Pads to window multiples, shifts, windows,
    attends, reverses — the detection-variant SwinTransformerBlock."""
    B, H, W, C = x.shape
    shortcut = x
    x = _ln(p["norm1"], x)
    pb, pr = (-H) % w, (-W) % w
    Hp, Wp = H + pb, W + pr
    x = jnp.pad(x, ((0, 0), (0, pb), (0, pr), (0, 0)))
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = _shift_mask(Hp, Wp, w, shift)
    else:
        mask = None
    x = x.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, (Hp // w) * (Wp // w), w * w, C)
    x = _window_attention(p["attn"], x, n_heads, w, mask)
    x = x.reshape(B, Hp // w, Wp // w, w, w, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hp, Wp, C)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = x[:, :H, :W]
    x = shortcut + x
    h = _ln(p["norm2"], x)
    h = _dense(
        p["mlp"]["fc2"],
        jax.nn.gelu(_dense(p["mlp"]["fc1"], h), approximate=False),
    )
    return x + h


def _patch_merge(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    x = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
        axis=-1,
    )
    return _dense(p["reduction"], _ln(p["norm"], x))


def swin_forward(
    p: Params, cfg: BiRefNetConfig, x: jnp.ndarray
) -> List[jnp.ndarray]:
    """x [B, H, W, 3] → 4 NHWC stage features (layer-normed, the
    detection-backbone ``norm{i}`` outputs)."""
    x = _conv(p["patch_embed"]["proj"], x, stride=4, pad=0)
    x = _ln(p["patch_embed"]["norm"], x)
    feats = []
    for i, stage in enumerate(p["layers"]):
        for j, blk in enumerate(stage["blocks"]):
            shift = 0 if j % 2 == 0 else cfg.window // 2
            x = _swin_block(blk, x, cfg.num_heads[i], cfg.window, shift)
        feats.append(_ln(p["norms"][i], x))
        if stage.get("downsample") is not None:
            x = _patch_merge(stage["downsample"], x)
    return feats


# ----------------------------------------------------- deformable conv ASPP


def _deform_conv(p: Params, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Modulated deformable conv (DCNv2 semantics, matching torchvision's
    ``deform_conv2d`` with the BiRefNet zero-initialized offset/modulator
    convs): offsets and a 2·sigmoid modulator come from regular convs; the
    sampled taps are bilinearly gathered (zeros outside) and contracted on
    the MXU, one ``lax.scan`` step per kernel tap."""
    B, H, W, C = x.shape
    off = _conv(p["offset"], x)          # [B,H,W,2K]  (Δy, Δx per tap)
    mod = 2.0 * jax.nn.sigmoid(_conv(p["modulator"], x))  # [B,H,W,K]
    K = k * k
    off = off.reshape(B, H, W, K, 2)
    pad = (k - 1) // 2
    taps = np.stack(
        np.meshgrid(np.arange(k) - pad, np.arange(k) - pad, indexing="ij")
    ).reshape(2, -1).T.astype(np.float32)            # [K, 2] (dy, dx)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    b_idx = jnp.arange(B)[:, None, None]
    w_k = p["kernel"].reshape(K, C, -1)              # [K, C, O]

    def tap(acc, inp):
        tap_off, wk, mk, dyx = inp
        py = ys + dyx[0] + tap_off[..., 0]
        px = xs + dyx[1] + tap_off[..., 1]
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        wy = py - y0
        wx = px - x0
        val = 0.0
        for oy, wyy in ((y0, 1.0 - wy), (y0 + 1.0, wy)):
            for ox, wxx in ((x0, 1.0 - wx), (x0 + 1.0, wx)):
                iy = jnp.clip(oy.astype(jnp.int32), 0, H - 1)
                ix = jnp.clip(ox.astype(jnp.int32), 0, W - 1)
                inside = (
                    (oy >= 0) & (oy <= H - 1) & (ox >= 0) & (ox <= W - 1)
                )
                g = x[b_idx, iy, ix]                 # [B,H,W,C]
                val = val + g * (wyy * wxx * inside)[..., None]
        acc = acc + jnp.einsum("bhwc,co->bhwo", val * mk[..., None], wk)
        return acc, None

    O = w_k.shape[-1]
    acc0 = jnp.zeros((B, H, W, O), x.dtype)
    acc, _ = jax.lax.scan(
        tap, acc0,
        (off.transpose(3, 0, 1, 2, 4), w_k, mod.transpose(3, 0, 1, 2),
         jnp.asarray(taps)),
    )
    if "bias" in p:
        acc = acc + p["bias"]
    return acc


def _aspp_deformable(p: Params, cfg: BiRefNetConfig, x: jnp.ndarray) -> jnp.ndarray:
    """ASPPDeformable: deformable 1×1 + parallel deformable k×k branches +
    global-average-pool branch, concat → 1×1 conv (+folded BN) → relu."""
    branches = [jax.nn.relu(_deform_conv(p["aspp1"], x, 1))]
    for bp, k in zip(p["deforms"], cfg.aspp_kernels):
        branches.append(jax.nn.relu(_deform_conv(bp, x, k)))
    g = jnp.mean(x, axis=(1, 2), keepdims=True)
    g = jax.nn.relu(_conv(p["gap"], g))
    branches.append(jnp.broadcast_to(g, branches[0].shape))
    y = jnp.concatenate(branches, axis=-1)
    return jax.nn.relu(_conv(p["project"], y))


def _dec_blk(p: Params, cfg: BiRefNetConfig, x: jnp.ndarray) -> jnp.ndarray:
    """BasicDecBlk: conv_in(+BN) → relu → ASPPDeformable → conv_out(+BN)."""
    x = jax.nn.relu(_conv(p["conv_in"], x))
    x = _aspp_deformable(p["aspp"], cfg, x)
    return _conv(p["conv_out"], x)


def _simple_convs(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return _conv(p["conv_out"], _conv(p["conv1"], x))


# ------------------------------------------------------------------ decoder


def _split_patches(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """The decoder's split ipt decoration: tile the input image into
    (H/h, W/w) patches of the target feature size and stack them on the
    channel axis, column-major then row within column — matching the
    reference's ``get_patches_batch`` split/cat order."""
    B, H, W, C = x.shape
    h, w = size
    nr, nc = H // h, W // w
    x = x.reshape(B, nr, h, nc, w, C)
    x = x.transpose(0, 2, 4, 3, 1, 5)       # [B, h, w, nc, nr, C]
    return x.reshape(B, h, w, nc * nr * C)


def birefnet_forward(
    params: Params, cfg: BiRefNetConfig, x: jnp.ndarray
) -> jnp.ndarray:
    """x [B, H, W, 3] (ImageNet-normalized) → matte logits [B, H, W, 1].

    The inference path of BiRefNet.forward: dual-scale swin features →
    context concat → squeeze → ipt-decorated decoder with gdt attention at
    levels 4/3/2 (ms-supervision heads are training-only and skipped)."""
    B, H, W, _ = x.shape
    f_full = swin_forward(params["bb"], cfg, x)
    x_half = _resize_ac(x, (H // 2, W // 2))
    f_half = swin_forward(params["bb"], cfg, x_half)
    feats = [
        jnp.concatenate([f, _resize_ac(g, f.shape[1:3])], axis=-1)
        for f, g in zip(f_full, f_half)
    ]
    x1, x2, x3, x4 = feats
    if cfg.cxt_num:
        cxt = [_resize_ac(f, x4.shape[1:3]) for f in (x1, x2, x3)]
        x4 = jnp.concatenate(cxt[-cfg.cxt_num :] + [x4], axis=-1)
    for sp in params["squeeze"]:
        x4 = _dec_blk(sp, cfg, x4)

    dec = params["decoder"]

    def ipt(level_idx: int, size: Tuple[int, int]) -> jnp.ndarray:
        return _simple_convs(dec["ipt"][level_idx], _split_patches(x, size))

    def gdt_attn(gp: Params, p: jnp.ndarray) -> jnp.ndarray:
        g = jax.nn.relu(_conv(gp["conv"], p))
        return p * jax.nn.sigmoid(_conv(gp["attn"], g))

    # level 4
    x4 = jnp.concatenate([x4, ipt(0, x4.shape[1:3])], axis=-1)
    p4 = _dec_blk(dec["block4"], cfg, x4)
    p4 = gdt_attn(dec["gdt4"], p4)
    _p3 = _resize_ac(p4, x3.shape[1:3]) + _conv(dec["lateral4"], x3)
    # level 3
    _p3 = jnp.concatenate([_p3, ipt(1, _p3.shape[1:3])], axis=-1)
    p3 = _dec_blk(dec["block3"], cfg, _p3)
    p3 = gdt_attn(dec["gdt3"], p3)
    _p2 = _resize_ac(p3, x2.shape[1:3]) + _conv(dec["lateral3"], x2)
    # level 2
    _p2 = jnp.concatenate([_p2, ipt(2, _p2.shape[1:3])], axis=-1)
    p2 = _dec_blk(dec["block2"], cfg, _p2)
    p2 = gdt_attn(dec["gdt2"], p2)
    _p1 = _resize_ac(p2, x1.shape[1:3]) + _conv(dec["lateral2"], x1)
    # level 1
    _p1 = jnp.concatenate([_p1, ipt(3, _p1.shape[1:3])], axis=-1)
    p1 = _dec_blk(dec["block1"], cfg, _p1)
    p1 = _resize_ac(p1, (H, W))
    p1 = jnp.concatenate([p1, ipt(4, (H, W))], axis=-1)
    return _conv(dec["out"], p1)


# --------------------------------------------------------------------- init


def _conv_init(key, k: int, cin: int, cout: int, bias: bool = True) -> Params:
    fan = k * k * cin
    p = {
        "kernel": jax.random.normal(key, (k, k, cin, cout), jnp.float32)
        / math.sqrt(fan)
    }
    if bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def _dense_init(key, cin: int, cout: int, bias: bool = True) -> Params:
    p = {
        "kernel": jax.random.normal(key, (cin, cout), jnp.float32)
        / math.sqrt(cin)
    }
    if bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def _ln_init(c: int) -> Params:
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _deform_init(keys, k: int, cin: int, cout: int) -> Params:
    K = k * k
    return {
        # reference zero-initializes offset/modulator convs; random here
        # would decouple the jnp/torch paths through resampling — tests
        # randomize them through the torch mirror instead
        "offset": _conv_init(next(keys), k, cin, 2 * K),
        "modulator": _conv_init(next(keys), k, cin, K),
        "kernel": jax.random.normal(next(keys), (k, k, cin, cout), jnp.float32)
        / math.sqrt(k * k * cin),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def _aspp_init(keys, cfg: BiRefNetConfig, cin: int, cout: int) -> Params:
    ic = cfg.aspp_inter
    n = 2 + len(cfg.aspp_kernels)
    return {
        "aspp1": _deform_init(keys, 1, cin, ic),
        "deforms": [
            _deform_init(keys, k, cin, ic) for k in cfg.aspp_kernels
        ],
        "gap": _conv_init(next(keys), 1, cin, ic),
        "project": _conv_init(next(keys), 1, n * ic, cout),
    }


def _dec_blk_init(keys, cfg: BiRefNetConfig, cin: int, cout: int) -> Params:
    ic = cfg.dec_inter
    return {
        "conv_in": _conv_init(next(keys), 3, cin, ic),
        "aspp": _aspp_init(keys, cfg, ic, ic),
        "conv_out": _conv_init(next(keys), 3, ic, cout),
    }


def _simple_convs_init(keys, cin: int, cout: int, inter: int = 64) -> Params:
    return {
        "conv1": _conv_init(next(keys), 3, cin, inter),
        "conv_out": _conv_init(next(keys), 3, inter, cout),
    }


def init_birefnet_params(key, cfg: BiRefNetConfig) -> Params:
    keys = iter(jax.random.split(key, 4096))
    ed = cfg.embed_dim
    bb: Params = {
        "patch_embed": {
            "proj": _conv_init(next(keys), 4, 3, ed),
            "norm": _ln_init(ed),
        },
        "layers": [],
        "norms": [_ln_init(c) for c in cfg.stage_channels],
    }
    for i, depth in enumerate(cfg.depths):
        c = cfg.stage_channels[i]
        nh = cfg.num_heads[i]
        blocks = []
        for _ in range(depth):
            blocks.append({
                "norm1": _ln_init(c),
                "attn": {
                    "qkv": _dense_init(next(keys), c, 3 * c),
                    "proj": _dense_init(next(keys), c, c),
                    "bias_table": 0.02 * jax.random.normal(
                        next(keys),
                        ((2 * cfg.window - 1) ** 2, nh), jnp.float32),
                },
                "norm2": _ln_init(c),
                "mlp": {
                    "fc1": _dense_init(next(keys), c, int(c * cfg.mlp_ratio)),
                    "fc2": _dense_init(next(keys), int(c * cfg.mlp_ratio), c),
                },
            })
        stage: Params = {"blocks": blocks, "downsample": None}
        if i < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm": _ln_init(4 * c),
                "reduction": _dense_init(next(keys), 4 * c, 2 * c, bias=False),
            }
        bb["layers"].append(stage)

    ch = cfg.channels
    ipt_out = cfg.ipt_out
    # split ipt in-channels: fixed stride-ratio patch counts × 3
    ipt_in = (3 * 32 * 32, 3 * 16 * 16, 3 * 8 * 8, 3 * 4 * 4, 3)
    n_gdt = cfg.gdt_channels
    dec: Params = {
        "ipt": [
            _simple_convs_init(keys, cin, cout)
            for cin, cout in zip(ipt_in, ipt_out)
        ],
        "block4": _dec_blk_init(keys, cfg, ch[0] + ipt_out[0], ch[1]),
        "block3": _dec_blk_init(keys, cfg, ch[1] + ipt_out[1], ch[2]),
        "block2": _dec_blk_init(keys, cfg, ch[2] + ipt_out[2], ch[3]),
        "block1": _dec_blk_init(keys, cfg, ch[3] + ipt_out[3], ch[3] // 2),
        "lateral4": _conv_init(next(keys), 1, ch[1], ch[1]),
        "lateral3": _conv_init(next(keys), 1, ch[2], ch[2]),
        "lateral2": _conv_init(next(keys), 1, ch[3], ch[3]),
        "gdt4": {"conv": _conv_init(next(keys), 3, ch[1], n_gdt),
                 "attn": _conv_init(next(keys), 1, n_gdt, 1)},
        "gdt3": {"conv": _conv_init(next(keys), 3, ch[2], n_gdt),
                 "attn": _conv_init(next(keys), 1, n_gdt, 1)},
        "gdt2": {"conv": _conv_init(next(keys), 3, ch[3], n_gdt),
                 "attn": _conv_init(next(keys), 1, n_gdt, 1)},
        "out": _conv_init(next(keys), 1, ch[3] // 2 + ipt_out[4], 1),
    }
    return {
        "bb": bb,
        "squeeze": [
            _dec_blk_init(keys, cfg, ch[0] + sum(cfg.cxt), ch[0])
        ],
        "decoder": dec,
    }


# ---------------------------------------------------------------- converter


def _t_conv(sd: Dict[str, np.ndarray], prefix: str) -> Params:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    p: Params = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))
    return p


def _t_conv_bn(
    sd: Dict[str, np.ndarray], conv: str, bn: str, eps: float = 1e-5
) -> Params:
    """Fold ``bn`` (following ``conv``) into the conv kernel/bias.  A
    missing BN (nn.Identity in single-batch configs) degrades to the plain
    conv."""
    if f"{bn}.weight" not in sd:
        return _t_conv(sd, conv)
    w = np.asarray(sd[f"{conv}.weight"], np.float32)
    b = np.asarray(
        sd.get(f"{conv}.bias", np.zeros(w.shape[0])), np.float32
    )
    g = np.asarray(sd[f"{bn}.weight"], np.float32)
    beta = np.asarray(sd[f"{bn}.bias"], np.float32)
    mu = np.asarray(sd[f"{bn}.running_mean"], np.float32)
    var = np.asarray(sd[f"{bn}.running_var"], np.float32)
    s = g / np.sqrt(var + eps)
    return {
        "kernel": jnp.asarray((w * s[:, None, None, None]).transpose(2, 3, 1, 0)),
        "bias": jnp.asarray((b - mu) * s + beta),
    }


def _t_dense(sd, prefix: str) -> Params:
    p: Params = {
        "kernel": jnp.asarray(
            np.asarray(sd[f"{prefix}.weight"], np.float32).T
        )
    }
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))
    return p


def _t_ln(sd, prefix: str) -> Params:
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
        "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
    }


def _t_deform(sd, prefix: str, bn: Optional[str] = None) -> Params:
    """DeformableConv2d (+ trailing BN folded into the regular conv)."""
    reg = (
        _t_conv_bn(sd, f"{prefix}.regular_conv", bn)
        if bn is not None
        else _t_conv(sd, f"{prefix}.regular_conv")
    )
    p: Params = {
        "offset": _t_conv(sd, f"{prefix}.offset_conv"),
        "modulator": _t_conv(sd, f"{prefix}.modulator_conv"),
        "kernel": reg["kernel"],
    }
    if "bias" in reg:
        p["bias"] = reg["bias"]
    return p


def _t_aspp(sd, cfg: BiRefNetConfig, prefix: str) -> Params:
    return {
        "aspp1": _t_deform(
            sd, f"{prefix}.aspp1.atrous_conv", f"{prefix}.aspp1.bn"
        ),
        "deforms": [
            _t_deform(
                sd,
                f"{prefix}.aspp_deforms.{i}.atrous_conv",
                f"{prefix}.aspp_deforms.{i}.bn",
            )
            for i in range(len(cfg.aspp_kernels))
        ],
        "gap": _t_conv_bn(
            sd, f"{prefix}.global_avg_pool.1", f"{prefix}.global_avg_pool.2"
        ),
        "project": _t_conv_bn(sd, f"{prefix}.conv1", f"{prefix}.bn1"),
    }


def _t_dec_blk(sd, cfg: BiRefNetConfig, prefix: str) -> Params:
    return {
        "conv_in": _t_conv_bn(sd, f"{prefix}.conv_in", f"{prefix}.bn_in"),
        "aspp": _t_aspp(sd, cfg, f"{prefix}.dec_att"),
        "conv_out": _t_conv_bn(sd, f"{prefix}.conv_out", f"{prefix}.bn_out"),
    }


def convert_birefnet_torch(sd: Dict[str, Any], cfg: BiRefNetConfig) -> Params:
    """Map a BiRefNet/RMBG-2.0 torch ``state_dict`` onto the jnp tree,
    folding every BatchNorm into its conv.  Training-only heads
    (conv_ms_spvn_*, gdt_convs_pred_*, refinement) are ignored."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    bb: Params = {
        "patch_embed": {
            "proj": _t_conv(sd, "bb.patch_embed.proj"),
            "norm": _t_ln(sd, "bb.patch_embed.norm"),
        },
        "layers": [],
        "norms": [_t_ln(sd, f"bb.norm{i}") for i in range(len(cfg.depths))],
    }
    for i, depth in enumerate(cfg.depths):
        blocks = []
        for j in range(depth):
            pre = f"bb.layers.{i}.blocks.{j}"
            blocks.append({
                "norm1": _t_ln(sd, f"{pre}.norm1"),
                "attn": {
                    "qkv": _t_dense(sd, f"{pre}.attn.qkv"),
                    "proj": _t_dense(sd, f"{pre}.attn.proj"),
                    "bias_table": jnp.asarray(
                        np.asarray(
                            sd[f"{pre}.attn.relative_position_bias_table"],
                            np.float32,
                        )
                    ),
                },
                "norm2": _t_ln(sd, f"{pre}.norm2"),
                "mlp": {
                    "fc1": _t_dense(sd, f"{pre}.mlp.fc1"),
                    "fc2": _t_dense(sd, f"{pre}.mlp.fc2"),
                },
            })
        stage: Params = {"blocks": blocks, "downsample": None}
        if f"bb.layers.{i}.downsample.reduction.weight" in sd:
            stage["downsample"] = {
                "norm": _t_ln(sd, f"bb.layers.{i}.downsample.norm"),
                "reduction": _t_dense(
                    sd, f"bb.layers.{i}.downsample.reduction"
                ),
            }
        bb["layers"].append(stage)

    n_sq = len({
        k.split(".")[1] for k in sd if k.startswith("squeeze_module.")
    })
    dec: Params = {
        "ipt": [
            {
                "conv1": _t_conv(sd, f"decoder.ipt_blk{5 - i}.conv1"),
                "conv_out": _t_conv(sd, f"decoder.ipt_blk{5 - i}.conv_out"),
            }
            for i in range(5)
        ],
        "out": _t_conv(sd, "decoder.conv_out1.0"),
    }
    for lvl in (4, 3, 2, 1):
        dec[f"block{lvl}"] = _t_dec_blk(
            sd, cfg, f"decoder.decoder_block{lvl}"
        )
    for lvl in (4, 3, 2):
        dec[f"lateral{lvl}"] = _t_conv(sd, f"decoder.lateral_block{lvl}.conv")
        dec[f"gdt{lvl}"] = {
            "conv": _t_conv_bn(
                sd, f"decoder.gdt_convs_{lvl}.0", f"decoder.gdt_convs_{lvl}.1"
            ),
            "attn": _t_conv(sd, f"decoder.gdt_convs_attn_{lvl}.0"),
        }
    return {
        "bb": bb,
        "squeeze": [
            _t_dec_blk(sd, cfg, f"squeeze_module.{i}") for i in range(n_sq)
        ],
        "decoder": dec,
    }


def load_birefnet(
    path: str, cfg: Optional[BiRefNetConfig] = None
) -> Tuple[Params, BiRefNetConfig]:
    """Load RMBG-2.0 weights (safetensors or torch .pth) → jnp params."""
    cfg = cfg or BiRefNetConfig.rmbg20()
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(path, framework="np") as f:
            sd = {k: f.get_tensor(k) for k in f.keys()}
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: v.numpy() for k, v in sd.items()}
    return convert_birefnet_torch(sd, cfg), cfg


# ------------------------------------------------------------------ remover


class BirefnetRemover:
    """Callable PIL RGB image → PIL 'L' alpha matte, running the JAX
    BiRefNet on-device at the reference's 1024² ImageNet-normalized
    operating point (pipeline.py:45-49)."""

    def __init__(self, params: Params, cfg: BiRefNetConfig):
        self.params = params
        self.cfg = cfg
        self._fwd = jax.jit(lambda p, x: birefnet_forward(p, cfg, x))

    def __call__(self, image):
        from PIL import Image

        cfg = self.cfg
        rgb = image.convert("RGB")
        x = np.asarray(rgb.resize((cfg.size, cfg.size)), np.float32) / 255.0
        x = (x - np.asarray(cfg.mean)) / np.asarray(cfg.std)
        logits = self._fwd(self.params, jnp.asarray(x[None], jnp.float32))
        pred = jax.nn.sigmoid(logits[0, ..., 0])
        mask = Image.fromarray(
            (np.asarray(pred) * 255).astype(np.uint8), mode="L"
        )
        return mask.resize(rgb.size)
