"""DFDNet deep face dictionary network (basicsr/archs/dfdnet_arch.py,
dfdnet_util.py, vgg_arch.py).

Restores a 512x512 face by swapping degraded VGG-face features of four
facial parts (left_eye, right_eye, nose, mouth) with the most similar
entry of an offline component dictionary at four scales, then decoding
with SFT (spatial-feature-transform) upsampling blocks.

TPU re-architecture of the dynamic-shape parts: the reference crops a
per-image variable-size part box, convs it, and writes it back
(dfdnet_arch.py:107-129) — host-loop, batch-1-only code.  Here every
part op runs on the FULL static-shape feature map:

* crop+bilinear-resize  -> box-parameterized bilinear sampling with
  indices clamped to the box (exactly ``F.interpolate`` of the crop);
* nearest paste-back    -> per-pixel box-relative nearest lookup under
  the box mask;
* the AttentionBlock convs on the crop (zero padding at crop edges)
  -> convs on the mask-zeroed full-map difference with a re-mask after
  every conv: outside-box activations are zeroed exactly where the
  reference's crop sees conv padding, so in-box values are identical
  (parity-tested against a crop-based numpy reference).

The dictionary itself (a torch .pth of [N, C, h, w] tensors per
part/scale) is converted once to NHWC arrays; spectral_norm weights are
resolved at conversion time like the rest of the zoo
(models/sr_convert.py).  The VGG19 extractor is generic (named taps,
vgg_arch.py:12-33 layer list) and doubles as the basicsr PerceptualLoss
backbone.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# VGG19 feature extractor (vgg_arch.py NAMES['vgg19'], taps by layer name)
# ---------------------------------------------------------------------------

VGG19_LAYERS: Tuple[str, ...] = (
    "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1",
    "conv2_1", "relu2_1", "conv2_2", "relu2_2", "pool2",
    "conv3_1", "relu3_1", "conv3_2", "relu3_2", "conv3_3", "relu3_3",
    "conv3_4", "relu3_4", "pool3",
    "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3",
    "conv4_4", "relu4_4", "pool4",
    "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3",
    "conv5_4", "relu5_4", "pool5",
)

_VGG19_WIDTH = {"1": 64, "2": 128, "3": 256, "4": 512, "5": 512}

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _vgg_conv_channels(max_layer: str) -> List[Tuple[str, int, int]]:
    out = []
    cin = 3
    for name in VGG19_LAYERS:
        if name.startswith("conv"):
            cout = _VGG19_WIDTH[name[4]]
            out.append((name, cin, cout))
            cin = cout
        if name == max_layer:
            break
    return out


def init_vgg19_params(key: jax.Array, max_layer: str = "conv5_4") -> Params:
    params: Params = {}
    for name, cin, cout in _vgg_conv_channels(max_layer):
        key, k = jax.random.split(key)
        params[name] = {
            "kernel": jax.random.normal(k, (3, 3, cin, cout))
            / np.sqrt(9.0 * cin),
            "bias": jnp.zeros((cout,), jnp.float32),
        }
    return params


def _conv(p: Params, x: jnp.ndarray, stride: int = 1, pad=None,
          dilation: int = 1) -> jnp.ndarray:
    k = p["kernel"].shape[0]
    if pad is None:
        pad = ((k - 1) // 2) * dilation
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"]
    return y


def vgg19_features(params: Params, x: jnp.ndarray,
                   taps: Sequence[str],
                   use_input_norm: bool = True,
                   range_norm: bool = False) -> Dict[str, jnp.ndarray]:
    """x [B, H, W, 3] -> {tap: feature NHWC}.  ``range_norm`` maps [-1,1]
    to [0,1] first (vgg_arch.py:152-155)."""
    if range_norm:
        x = (x + 1.0) * 0.5
    if use_input_norm:
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    deepest = max(VGG19_LAYERS.index(t) for t in taps)
    out: Dict[str, jnp.ndarray] = {}
    for idx, name in enumerate(VGG19_LAYERS):
        if idx > deepest:
            break
        if name.startswith("conv"):
            x = _conv(params[name], x)
        elif name.startswith("relu"):
            x = jax.nn.relu(x)
        else:  # pool
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
        if name in taps:
            out[name] = x
    return out


# ---------------------------------------------------------------------------
# Blocks (dfdnet_util.py)
# ---------------------------------------------------------------------------

_BLUR3 = (np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32) / 16.0)


def blur3(x: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 binomial blur, zero pad (dfdnet_util.Blur).  The
    reference's hand-written autograd Function is just the standard conv
    vjp — plain depthwise conv differentiates identically."""
    c = x.shape[-1]
    k = jnp.asarray(_BLUR3)[:, :, None, None] * jnp.ones((1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)], feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def _conv_pair(key, cin, cout, k=3) -> Params:
    k1, k2 = jax.random.split(key)
    fan = k * k
    return {
        "conv1": {"kernel": jax.random.normal(k1, (k, k, cin, cout))
                  / np.sqrt(fan * cin),
                  "bias": jnp.zeros((cout,), jnp.float32)},
        "conv2": {"kernel": jax.random.normal(k2, (k, k, cout, cout))
                  / np.sqrt(fan * cout),
                  "bias": jnp.zeros((cout,), jnp.float32)},
    }


def _ms_dilation(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """MSDilationBlock (dfdnet_util.py:121-147): four dilated conv pairs
    (d = 4,3,2,1), concat, fuse, residual."""
    outs = []
    for i, d in enumerate((4, 3, 2, 1)):
        b = p[f"branch{i}"]
        h = _lrelu(_conv(b["conv1"], x, dilation=d))
        outs.append(_conv(b["conv2"], h, dilation=d))
    return _conv(p["fusion"], jnp.concatenate(outs, axis=-1)) + x


def _up_res_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x + _conv(p["conv2"], _lrelu(_conv(p["conv1"], x)))


def _sft_up_block(p: Params, x: jnp.ndarray,
                  guide: jnp.ndarray) -> jnp.ndarray:
    """SFTUpBlock (dfdnet_arch.py:12-53): blur->conv->lrelu(0.04), scale
    and (sigmoid) shift from the updated feature, then x2 bilinear up ->
    conv -> lrelu."""
    h = _lrelu(_conv(p["conv1"], blur3(x)), 0.04)
    scale = _conv(p["scale2"], _lrelu(_conv(p["scale1"], guide)))
    shift = jax.nn.sigmoid(
        _conv(p["shift2"], _lrelu(_conv(p["shift1"], guide))))
    h = h * scale + shift
    b, hh, ww, c = h.shape
    h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "bilinear")
    return _lrelu(_conv(p["convup"], h))


# ---------------------------------------------------------------------------
# Static-shape part swap
# ---------------------------------------------------------------------------

def adaptive_instance_norm(content: jnp.ndarray, style: jnp.ndarray,
                           eps: float = 1e-5) -> jnp.ndarray:
    """content [N, h, w, C] re-statted to style [h, w, C]
    (dfdnet_util.py:58-90; torch uses the unbiased variance)."""
    def stats(f, axes):
        m = jnp.mean(f, axis=axes, keepdims=True)
        n = np.prod([f.shape[a] for a in axes])
        v = jnp.sum((f - m) ** 2, axis=axes, keepdims=True) / max(n - 1, 1)
        return m, jnp.sqrt(v + eps)
    cm, cs = stats(content, (1, 2))
    sm, ss = stats(style, (0, 1))
    return (content - cm) / cs * ss + sm


def box_resize_bilinear(f: jnp.ndarray, box: jnp.ndarray,
                        out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Crop f [H, W, C] to box (x0, y0, x1, y1) and bilinear-resize to
    out_hw — without materializing the dynamic-size crop.  Matches
    ``F.interpolate(crop, out_hw, mode='bilinear', align_corners=False)``:
    half-pixel source coords, fetch indices clamped to the box."""
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    oh, ow = out_hw
    bh = (y1 - y0).astype(jnp.float32)
    bw = (x1 - x0).astype(jnp.float32)
    fy = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * bh / oh - 0.5
    fx = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * bw / ow - 0.5
    fy = jnp.clip(fy, 0.0, jnp.maximum(bh - 1.0, 0.0))
    fx = jnp.clip(fx, 0.0, jnp.maximum(bw - 1.0, 0.0))
    iy0 = jnp.floor(fy)
    ix0 = jnp.floor(fx)
    wy = (fy - iy0)[:, None, None]
    wx = (fx - ix0)[None, :, None]

    def fetch(iy, ix):
        yy = jnp.clip(iy.astype(jnp.int32) + y0, y0, y1 - 1)
        xx = jnp.clip(ix.astype(jnp.int32) + x0, x0, x1 - 1)
        return f[yy[:, None], xx[None, :]]

    v00 = fetch(iy0, ix0)
    v01 = fetch(iy0, ix0 + 1)
    v10 = fetch(iy0 + 1, ix0)
    v11 = fetch(iy0 + 1, ix0 + 1)
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx)


def box_paste_nearest(sel: jnp.ndarray, box: jnp.ndarray,
                      hw: Tuple[int, int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-resize sel [h, w, C] onto the box of a full (H, W) map
    (``F.interpolate(sel, part_size)`` + paste).  Returns (full map with
    sel in the box and 0 elsewhere, box mask [H, W, 1])."""
    H, W = hw
    h, w = sel.shape[0], sel.shape[1]
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    py = jnp.arange(H)
    px = jnp.arange(W)
    bh = jnp.maximum(y1 - y0, 1)
    bw = jnp.maximum(x1 - x0, 1)
    sy = jnp.clip(((py - y0) * h) // bh, 0, h - 1)
    sx = jnp.clip(((px - x0) * w) // bw, 0, w - 1)
    full = sel[sy[:, None], sx[None, :]]
    mask = ((py >= y0) & (py < y1))[:, None] & ((px >= x0) & (px < x1))[None, :]
    mask = mask[:, :, None].astype(sel.dtype)
    return full * mask, mask


def swap_part(attn_p: Params, f: jnp.ndarray, updated: jnp.ndarray,
              dict_feat: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """One dictionary swap (dfdnet_arch.py:107-129) on the full map.

    f / updated: [H, W, C]; dict_feat [N, h, w, C]; box (x0, y0, x1, y1)
    in feature coords.  Returns the new updated map.
    """
    dh, dw = dict_feat.shape[1], dict_feat.shape[2]
    part_resize = box_resize_bilinear(f, box, (dh, dw))
    dict_norm = adaptive_instance_norm(dict_feat, part_resize)
    # similarity conv == per-entry dot product; softmax is monotonic so
    # the argmax is the argmax of the raw scores
    scores = jnp.einsum("hwc,nhwc->n", part_resize, dict_norm)
    sel = jnp.take(dict_norm, jnp.argmax(scores), axis=0)
    swap_full, mask = box_paste_nearest(sel, box, f.shape[:2])
    diff = (swap_full - f) * mask
    h = _lrelu(_conv(attn_p["conv1"], diff[None])[0]) * mask
    attn = _conv(attn_p["conv2"], h[None])[0] * mask
    return jnp.where(mask > 0, attn * swap_full + f, updated)


# ---------------------------------------------------------------------------
# DFDNet
# ---------------------------------------------------------------------------

PARTS: Tuple[str, ...] = ("left_eye", "right_eye", "nose", "mouth")
FEATURE_SIZES: Tuple[int, ...] = (256, 128, 64, 32)
CHANNEL_SIZES: Tuple[int, ...] = (128, 256, 512, 512)
VGG_TAPS: Tuple[str, ...] = ("relu2_2", "relu3_4", "relu4_4", "conv5_4")


@dataclasses.dataclass(frozen=True)
class DFDNetConfig:
    num_feat: int = 64
    image_size: int = 512

    @staticmethod
    def tiny() -> "DFDNetConfig":
        # num_feat is pinned by the fixed VGG tap widths (nf*8 == 512 ==
        # conv5_4 channels, dfdnet_arch.py:72-74); tiny only shrinks the
        # image so the maps are small.
        return DFDNetConfig(num_feat=64, image_size=64)


def init_dfdnet_params(key: jax.Array,
                       cfg: DFDNetConfig = DFDNetConfig()) -> Params:
    nf = cfg.num_feat
    keys = iter(jax.random.split(key, 64))
    p: Params = {"vgg": init_vgg19_params(next(keys), "conv5_4")}
    sizes = tuple(cfg.image_size // (2 ** i) for i in range(1, 5))
    for ch, fs in zip(CHANNEL_SIZES, sizes):
        for part in PARTS:
            p[f"attn_{part}_{fs}"] = _conv_pair(next(keys), ch, ch)
    p["msdilation"] = {
        **{f"branch{i}": _conv_pair(next(keys), nf * 8, nf * 8)
           for i in range(4)},
        "fusion": {"kernel": jax.random.normal(next(keys),
                                               (3, 3, nf * 32, nf * 8))
                   / np.sqrt(9.0 * nf * 32),
                   "bias": jnp.zeros((nf * 8,), jnp.float32)},
    }

    def sft(cin, cout):
        ks = jax.random.split(next(keys), 6)

        def cv(k, ci, co, kk=3):
            return {"kernel": jax.random.normal(k, (kk, kk, ci, co))
                    / np.sqrt(kk * kk * ci),
                    "bias": jnp.zeros((co,), jnp.float32)}
        return {"conv1": cv(ks[0], cin, cout),
                "convup": cv(ks[1], cout, cout),
                "scale1": cv(ks[2], cin, cout),
                "scale2": cv(ks[3], cout, cout),
                "shift1": cv(ks[4], cin, cout),
                "shift2": cv(ks[5], cout, cout)}

    p["upsample0"] = sft(nf * 8, nf * 8)
    p["upsample1"] = sft(nf * 8, nf * 4)
    p["upsample2"] = sft(nf * 4, nf * 2)
    p["upsample3"] = sft(nf * 2, nf)
    k1, k2, k3, k4 = jax.random.split(next(keys), 4)
    p["out"] = {
        "conv": {"kernel": jax.random.normal(k1, (3, 3, nf, nf))
                 / np.sqrt(9.0 * nf),
                 "bias": jnp.zeros((nf,), jnp.float32)},
        "res1": _conv_pair(k2, nf, nf),
        "res2": _conv_pair(k3, nf, nf),
        "final": {"kernel": jax.random.normal(k4, (3, 3, nf, 3))
                  / np.sqrt(9.0 * nf),
                  "bias": jnp.zeros((3,), jnp.float32)},
    }
    return p


def dfdnet_forward(params: Params, dict_feats: Dict[int, Dict[str, jnp.ndarray]],
                   x: jnp.ndarray, part_locations: jnp.ndarray,
                   cfg: DFDNetConfig = DFDNetConfig()) -> jnp.ndarray:
    """x [B, S, S, 3] in [-1, 1]; part_locations [B, 4, 4] int boxes
    (x0, y0, x1, y1) in input-pixel coords, part order = PARTS.
    dict_feats: {feature_size: {part: [N, h, w, C] NHWC}}.
    Returns tanh RGB [B, S, S, 3]  (dfdnet_arch.py:137-169)."""
    nf = cfg.num_feat
    sizes = tuple(cfg.image_size // (2 ** i) for i in range(1, 5))
    vgg = vgg19_features(params["vgg"], x, VGG_TAPS, range_norm=True)

    def one(sample_feats, locs):
        updated = []
        for tap, fs in zip(VGG_TAPS, sizes):
            f = sample_feats[tap]
            upd = f
            boxes = locs * fs // cfg.image_size
            for pi, part in enumerate(PARTS):
                upd = swap_part(params[f"attn_{part}_{fs}"], f, upd,
                                dict_feats[fs][part], boxes[pi])
            updated.append(upd)
        return updated

    updated = jax.vmap(one)(vgg, part_locations)

    h = _ms_dilation(params["msdilation"], vgg["conv5_4"])
    h = _sft_up_block(params["upsample0"], h, updated[3])
    h = _sft_up_block(params["upsample1"], h, updated[2])
    h = _sft_up_block(params["upsample2"], h, updated[1])
    h = _sft_up_block(params["upsample3"], h, updated[0])
    h = _lrelu(_conv(params["out"]["conv"], h))
    h = _up_res_block(params["out"]["res1"], h)
    h = _up_res_block(params["out"]["res2"], h)
    return jnp.tanh(_conv(params["out"]["final"], h))


# ---------------------------------------------------------------------------
# Torch-checkpoint conversion
# ---------------------------------------------------------------------------

def _resolve_sn(sd: Dict[str, np.ndarray], name: str) -> np.ndarray:
    if f"{name}.weight_orig" in sd:
        w = np.asarray(sd[f"{name}.weight_orig"], np.float32)
        u = np.asarray(sd[f"{name}.weight_u"], np.float32)
        v = np.asarray(sd[f"{name}.weight_v"], np.float32)
        return w / float(u @ w.reshape(w.shape[0], -1) @ v)
    return np.asarray(sd[f"{name}.weight"], np.float32)


def _cv(sd, name) -> Params:
    out = {"kernel": jnp.asarray(
        np.transpose(_resolve_sn(sd, name), (2, 3, 1, 0)))}
    if f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))
    return out


def convert_dfdnet(sd: Dict[str, np.ndarray],
                   cfg: DFDNetConfig = DFDNetConfig()) -> Params:
    """basicsr DFDNet state dict -> init_dfdnet_params tree.  Spectral
    norm (weight_orig/u/v) resolved; conv weights OIHW -> HWIO."""
    p: Params = {"vgg": {
        name: _cv(sd, f"vgg_extractor.vgg_net.{name}")
        for name, _, _ in _vgg_conv_channels("conv5_4")}}
    sizes = tuple(cfg.image_size // (2 ** i) for i in range(1, 5))
    for fs_torch, fs in zip(FEATURE_SIZES, sizes):
        for part in PARTS:
            t = f"attn_blocks.{part}_{fs_torch}"
            p[f"attn_{part}_{fs}"] = {"conv1": _cv(sd, f"{t}.0"),
                                      "conv2": _cv(sd, f"{t}.2")}
    p["msdilation"] = {
        **{f"branch{i}": {
            "conv1": _cv(sd, f"multi_scale_dilation.conv_blocks.{i}.0"),
            "conv2": _cv(sd, f"multi_scale_dilation.conv_blocks.{i}.2")}
           for i in range(4)},
        "fusion": _cv(sd, "multi_scale_dilation.conv_fusion"),
    }
    for i in range(4):
        t = f"upsample{i}"
        p[t] = {"conv1": _cv(sd, f"{t}.conv1.1"),
                "convup": _cv(sd, f"{t}.convup.1"),
                "scale1": _cv(sd, f"{t}.scale_block.0"),
                "scale2": _cv(sd, f"{t}.scale_block.2"),
                "shift1": _cv(sd, f"{t}.shift_block.0"),
                "shift2": _cv(sd, f"{t}.shift_block.2")}
    p["out"] = {"conv": _cv(sd, "upsample4.0"),
                "res1": {"conv1": _cv(sd, "upsample4.2.body.0"),
                         "conv2": _cv(sd, "upsample4.2.body.2")},
                "res2": {"conv1": _cv(sd, "upsample4.3.body.0"),
                         "conv2": _cv(sd, "upsample4.3.body.2")},
                "final": _cv(sd, "upsample4.4")}
    return p


def convert_dfdnet_dict(torch_dict: Dict[str, Dict[str, Any]]
                        ) -> Dict[int, Dict[str, jnp.ndarray]]:
    """The facial-component dictionary .pth ({'256': {part: [N,C,h,w]}})
    -> {256: {part: [N,h,w,C]}} (dfdnet_arch.py:79, 143-146)."""
    out: Dict[int, Dict[str, jnp.ndarray]] = {}
    for k, parts in torch_dict.items():
        out[int(k)] = {
            part: jnp.asarray(np.transpose(
                np.asarray(t, np.float32), (0, 2, 3, 1)))
            for part, t in parts.items()}
    return out


# ---------------------------------------------------------------------------
# Crop-based numpy reference (torch semantics) for the swap stage
# ---------------------------------------------------------------------------

def swap_part_reference(attn_p: Params, f: np.ndarray, updated: np.ndarray,
                        dict_feat: np.ndarray, box: np.ndarray) -> np.ndarray:
    """Dynamic-crop reimplementation of dfdnet_arch.swap_feat for parity
    tests: crop -> bilinear resize -> adain -> dot-product match ->
    nearest resize back -> crop-local attention convs -> paste."""
    x0, y0, x1, y1 = [int(v) for v in box]
    part = f[y0:y1, x0:x1]
    dh, dw = dict_feat.shape[1], dict_feat.shape[2]

    def bilinear(img, oh, ow):
        ih, iw = img.shape[:2]
        fy = np.clip((np.arange(oh) + 0.5) * ih / oh - 0.5, 0, max(ih - 1, 0))
        fx = np.clip((np.arange(ow) + 0.5) * iw / ow - 0.5, 0, max(iw - 1, 0))
        y0i = np.floor(fy).astype(int)
        x0i = np.floor(fx).astype(int)
        y1i = np.minimum(y0i + 1, ih - 1)
        x1i = np.minimum(x0i + 1, iw - 1)
        wy = (fy - y0i)[:, None, None]
        wx = (fx - x0i)[None, :, None]
        return (img[y0i][:, x0i] * (1 - wy) * (1 - wx)
                + img[y0i][:, x1i] * (1 - wy) * wx
                + img[y1i][:, x0i] * wy * (1 - wx)
                + img[y1i][:, x1i] * wy * wx)

    pr = bilinear(part, dh, dw)

    def stats(v, axes, n):
        m = v.mean(axis=axes, keepdims=True)
        var = ((v - m) ** 2).sum(axis=axes, keepdims=True) / max(n - 1, 1)
        return m, np.sqrt(var + 1e-5)

    cm, cs = stats(dict_feat, (1, 2), dh * dw)
    sm, ss = stats(pr, (0, 1), dh * dw)
    dnorm = (dict_feat - cm) / cs * ss + sm
    idx = int(np.argmax(np.einsum("hwc,nhwc->n", pr, dnorm)))
    ph, pw = part.shape[:2]
    sy = np.minimum((np.arange(ph) * dh) // max(ph, 1), dh - 1)
    sx = np.minimum((np.arange(pw) * dw) // max(pw, 1), dw - 1)
    swap = dnorm[idx][sy][:, sx]

    def conv3(img, p):
        kern = np.asarray(p["kernel"])
        pad = np.pad(img, ((1, 1), (1, 1), (0, 0)))
        out = np.zeros(img.shape[:2] + (kern.shape[3],), np.float32)
        for dy in range(3):
            for dx in range(3):
                out += pad[dy:dy + img.shape[0], dx:dx + img.shape[1]] @ kern[dy, dx]
        return out + np.asarray(p["bias"])

    h = conv3((swap - part).astype(np.float32), attn_p["conv1"])
    h = np.where(h >= 0, h, 0.2 * h)
    attn = conv3(h, attn_p["conv2"])
    out = updated.copy()
    out[y0:y1, x0:x1] = attn * swap + part
    return out
