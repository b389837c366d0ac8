"""Video super-resolution family from BasicSR's zoo: SPyNet, BasicVSR, EDVR.

The reference vendors BasicSR wholesale (/root/reference/TSD_SR/basicsr/),
whose arch zoo includes the video-SR models; this module provides the two
canonical families in functional jnp:

* ``SPyNet``   — coarse-to-fine optical flow (basicsr/archs/spynet_arch.py
  semantics: 6 pyramid levels, 5-conv 7x7 basic modules, ImageNet
  normalization, x2 flow upsampling with align_corners=True warping).
* ``BasicVSR`` — bidirectional recurrent VSR (basicsr/archs/
  basicvsr_arch.py): SPyNet flows between neighbors, backward/forward
  propagation trunks of no-BN residual blocks over concat(frame,
  flow-warped state), fusion + two pixel-shuffle x2 stages + bilinear
  base skip.
* ``EDVR``     — sliding-window VSR (basicsr/archs/edvr_arch.py): L1-L3
  feature pyramid, PCD (pyramid-cascading-deformable) alignment of each
  neighbor to the center frame with 8 deformable groups
  (ops.basicsr_ops.deform_conv2d), TSA (temporal-spatial attention)
  fusion, residual reconstruction trunk, pixel-shuffle upsampling,
  bilinear center-frame base.
* ``BasicVSR++`` — second-order propagation (basicsr/archs/
  basicvsrpp_arch.py): four backward/forward branches with flow-guided
  second-order deformable alignment; the reference's i==0 / i<=1 Python
  index guards become per-step masks inside one lax.scan per branch.
* ``TOFlow``   — task-oriented flow VSR (basicsr/archs/tof_arch.py):
  4-level BatchNorm SPyNet variant, 7-frame warp + fusion head.
* ``DUF``      — dynamic upsampling filters (basicsr/archs/duf_arch.py):
  3D-conv dense trunk with temporal reduction, per-pixel softmaxed 5x5
  filters applied to the center frame (im2col patches + MXU contraction).

TPU shape: recurrences are lax.scan-ed over time; residual trunks are
stacked [L, ...] and scanned (depth-constant compile, repo convention);
the deformable gather vectorizes over all sampling points.  Params are
nested dicts of f32 leaves, activations NHWC ([T, H, W, C] per clip).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basicsr_ops import deform_conv2d
from ..ops.grid_sample import grid_sample
from .sr_archs import _conv_init, _lrelu01 as _lrelu, _resblock_nobn_init, \
    pixel_shuffle

Params = Dict[str, jnp.ndarray]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _conv(p, x, stride=1):
    # explicit symmetric padding (torch Conv2d(k, stride, padding=(k-1)//2)):
    # XLA "SAME" (sr_archs._conv) pads (0, 1) for stride-2 even sizes, which
    # shifts every strided window one pixel vs torch
    k = p["kernel"].shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]


def _resize2x(x, scale=2.0, method="bilinear"):
    # F.interpolate(..., align_corners=False) semantics (EDVR's PCD/TSA
    # upsample); SPyNet's flow upsampling uses _upflow2 (align_corners=True)
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, int(H * scale), int(W * scale), C), method)


def _upflow2(flow):
    """x2 flow upsampling, F.interpolate(align_corners=True) semantics
    (spynet_arch.py): out[i] samples at i*(H-1)/(2H-1); flow values x2."""
    N, H, W, C = flow.shape

    def interp_axis(x, axis, n_out):
        n_in = x.shape[axis]
        pos = jnp.linspace(0.0, n_in - 1.0, n_out)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        w = (pos - lo).reshape([-1 if a == axis else 1 for a in range(x.ndim)])
        return jnp.take(x, lo, axis) * (1 - w) + jnp.take(x, hi, axis) * w

    return interp_axis(interp_axis(flow, 1, 2 * H), 2, 2 * W) * 2.0


# ------------------------------------------------------------------- SPyNet


SPYNET_LEVELS = 6
_SPY_CHANNELS = ((8, 32), (32, 64), (64, 32), (32, 16), (16, 2))


def init_spynet_params(key: jax.Array) -> List[Params]:
    """6 basic modules of 5 7x7 convs (spynet_arch.py BasicModule)."""
    mods = []
    for lv in range(SPYNET_LEVELS):
        layers = []
        for li, (cin, cout) in enumerate(_SPY_CHANNELS):
            layers.append(
                _conv_init(jax.random.fold_in(key, lv * 8 + li), 7, cin, cout)
            )
        mods.append({"layers": layers})
    return mods


def flow_warp(
    x: jnp.ndarray, flow: jnp.ndarray, padding_mode: str = "zeros"
) -> jnp.ndarray:
    """Warp [N, H, W, C] by flow [N, H, W, 2] (dx, dy in pixels) —
    basicsr flow_warp semantics (align_corners=True; zeros padding by
    default, border inside SPyNet's pyramid)."""
    N, H, W, _ = x.shape
    gy, gx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    px = gx[None] + flow[..., 0]
    py = gy[None] + flow[..., 1]
    nx = 2.0 * px / max(W - 1, 1) - 1.0
    ny = 2.0 * py / max(H - 1, 1) - 1.0
    grid = jnp.stack([nx, ny], axis=-1)
    return jax.vmap(
        lambda img, g: grid_sample(img, g, padding_mode, align_corners=True)
    )(x, grid)


def _spy_module(p, x):
    for li, layer in enumerate(p["layers"]):
        x = _conv(layer, x)
        if li < len(p["layers"]) - 1:
            x = jax.nn.relu(x)
    return x


def spynet_flow(params: List[Params], ref: jnp.ndarray, supp: jnp.ndarray):
    """Optical flow ref->supp: [N, H, W, 3] pairs in [0, 1] -> [N, H, W, 2]
    (dx, dy).  H, W must be multiples of 32 (6-level pyramid)."""
    N, H, W, _ = ref.shape
    assert H % 32 == 0 and W % 32 == 0, "SPyNet needs H, W % 32 == 0"
    ref = (ref - _IMAGENET_MEAN) / _IMAGENET_STD
    supp = (supp - _IMAGENET_MEAN) / _IMAGENET_STD

    refs, supps = [ref], [supp]
    for _ in range(SPYNET_LEVELS - 1):
        refs.append(jax.lax.reduce_window(
            refs[-1], 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0)
        supps.append(jax.lax.reduce_window(
            supps[-1], 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0)

    flow = jnp.zeros_like(refs[-1][..., :2])
    for lv in range(SPYNET_LEVELS):
        r, s = refs[-1 - lv], supps[-1 - lv]
        if lv > 0:
            flow = _upflow2(flow)
        warped = flow_warp(s, flow, padding_mode="border")
        flow = flow + _spy_module(
            params[lv], jnp.concatenate([r, warped, flow], axis=-1)
        )
    return flow


# ----------------------------------------------------------------- BasicVSR


@dataclasses.dataclass(frozen=True)
class BasicVSRConfig:
    num_feat: int = 64
    num_block: int = 30   # residual blocks per propagation trunk

    @classmethod
    def tiny(cls) -> "BasicVSRConfig":
        return cls(num_feat=16, num_block=2)


def _resblocks_stacked_init(key, nf, n):
    blocks = [
        _resblock_nobn_init(jax.random.fold_in(key, i), nf) for i in range(n)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def _resblocks_scan(stacked, x):
    def body(h, blk):
        r = _conv(blk["conv2"], jax.nn.relu(_conv(blk["conv1"], h)))
        return h + r, None

    out, _ = jax.lax.scan(body, x, stacked)
    return out


def _trunk_init(key, cin, nf, n):
    return {
        "head": _conv_init(jax.random.fold_in(key, 99), 3, cin, nf),
        "blocks": _resblocks_stacked_init(key, nf, n),
    }


def _trunk(p, x):
    return _resblocks_scan(p["blocks"], _lrelu(_conv(p["head"], x)))


def init_basicvsr_params(key: jax.Array, cfg: BasicVSRConfig) -> Params:
    nf = cfg.num_feat
    ks = jax.random.split(key, 8)
    return {
        "spynet": init_spynet_params(ks[0]),
        "backward_trunk": _trunk_init(ks[1], nf + 3, nf, cfg.num_block),
        "forward_trunk": _trunk_init(ks[2], nf + 3, nf, cfg.num_block),
        "fusion": _conv_init(ks[3], 1, 2 * nf, nf),
        "upconv1": _conv_init(ks[4], 3, nf, nf * 4),
        "upconv2": _conv_init(ks[5], 3, nf, nf * 4),
        "conv_hr": _conv_init(ks[6], 3, nf, nf),
        "conv_last": _conv_init(ks[7], 3, nf, 3),
    }


def basicvsr_forward(
    params: Params, cfg: BasicVSRConfig, lrs: jnp.ndarray
) -> jnp.ndarray:
    """lrs [T, H, W, 3] in [0, 1] -> [T, 4H, 4W, 3] (x4 VSR,
    basicvsr_arch.py forward: bidirectional propagation + fusion)."""
    T, H, W, _ = lrs.shape
    nf = cfg.num_feat

    # flows between neighbors (basicvsr get_flow): backward propagation
    # warps state at t+1 back to t with flow(lr_t -> lr_{t+1}); forward
    # propagation warps state at t-1 forward with flow(lr_t -> lr_{t-1})
    flows_backward = spynet_flow(params["spynet"], lrs[:-1], lrs[1:])
    flows_forward = spynet_flow(params["spynet"], lrs[1:], lrs[:-1])

    def bwd_step(feat, inp):
        lr, flow = inp
        warped = flow_warp(feat[None], flow[None])[0]
        feat = _trunk(
            params["backward_trunk"],
            jnp.concatenate([lr, warped], axis=-1)[None],
        )[0]
        return feat, feat

    # last frame has no future neighbor: zero flow (state starts at zero)
    zero_flow = jnp.zeros((1, H, W, 2), lrs.dtype)
    _, bwd = jax.lax.scan(
        bwd_step,
        jnp.zeros((H, W, nf), lrs.dtype),
        (lrs[::-1], jnp.concatenate([zero_flow, flows_backward[::-1]], 0)),
    )
    bwd = bwd[::-1]  # [T, H, W, nf]

    def fwd_step(feat, inp):
        lr, flow, bwd_feat = inp
        warped = flow_warp(feat[None], flow[None])[0]
        feat = _trunk(
            params["forward_trunk"],
            jnp.concatenate([lr, warped], axis=-1)[None],
        )[0]
        out = _lrelu(
            _conv(
                params["fusion"],
                jnp.concatenate([bwd_feat, feat], axis=-1)[None],
            )
        )
        out = _lrelu(pixel_shuffle(_conv(params["upconv1"], out), 2))
        out = _lrelu(pixel_shuffle(_conv(params["upconv2"], out), 2))
        out = _lrelu(_conv(params["conv_hr"], out))
        out = _conv(params["conv_last"], out)[0]
        return feat, out

    _, outs = jax.lax.scan(
        fwd_step,
        jnp.zeros((H, W, nf), lrs.dtype),
        (lrs, jnp.concatenate([zero_flow, flows_forward], 0), bwd),
    )
    base = jax.image.resize(lrs, (T, 4 * H, 4 * W, 3), "bilinear")
    return outs + base


# --------------------------------------------------------------------- EDVR


@dataclasses.dataclass(frozen=True)
class EDVRConfig:
    num_feat: int = 64
    num_frame: int = 5
    deformable_groups: int = 8
    num_extract_block: int = 5
    num_reconstruct_block: int = 10

    @classmethod
    def tiny(cls) -> "EDVRConfig":
        return cls(num_feat=16, num_frame=3, deformable_groups=2,
                   num_extract_block=1, num_reconstruct_block=1)


def _dcn_pack_init(key, nf, groups):
    """DCNv2Pack (edvr_arch.py): a conv predicting (o1, o2, mask) from the
    offset feature, then modulated deform conv of the input feature."""
    return {
        "conv_offset": _conv_init(
            jax.random.fold_in(key, 0), 3, nf, groups * 3 * 9, gain=0.01
        ),
        "dcn": _conv_init(jax.random.fold_in(key, 1), 3, nf, nf),
    }


def _dcn_pack(p, x, offset_feat, groups):
    out = _conv(p["conv_offset"], offset_feat)
    o1, o2, mask = jnp.split(out, 3, axis=-1)
    # mmcv layout: offset = cat(o1, o2) along channels, and the kernel reads
    # the flat 2*G*k*k block as interleaved (dy, dx) pairs — so o1 supplies
    # BOTH dy and dx for the first half of the sampling points (it is NOT
    # "o1 = all dy"); deform_conv2d's reshape(..., G, kh, kw, 2) matches
    # that flat pairing exactly
    off = jnp.concatenate([o1, o2], axis=-1)
    return deform_conv2d(
        x, off, p["dcn"]["kernel"], p["dcn"]["bias"],
        mask=jax.nn.sigmoid(mask), deformable_groups=groups,
    )


def _pcd_init(key, nf, groups):
    p = {}
    for lv in (3, 2, 1):
        p[f"offset_conv1_l{lv}"] = _conv_init(
            jax.random.fold_in(key, lv * 10), 3, nf * 2, nf)
        if lv == 3:
            p[f"offset_conv2_l{lv}"] = _conv_init(
                jax.random.fold_in(key, lv * 10 + 1), 3, nf, nf)
        else:
            p[f"offset_conv2_l{lv}"] = _conv_init(
                jax.random.fold_in(key, lv * 10 + 1), 3, nf * 2, nf)
            p[f"offset_conv3_l{lv}"] = _conv_init(
                jax.random.fold_in(key, lv * 10 + 2), 3, nf, nf)
            p[f"feat_conv_l{lv}"] = _conv_init(
                jax.random.fold_in(key, lv * 10 + 3), 3, nf * 2, nf)
        p[f"dcn_l{lv}"] = _dcn_pack_init(
            jax.random.fold_in(key, lv * 10 + 4), nf, groups)
    p["cas_offset_conv1"] = _conv_init(jax.random.fold_in(key, 90), 3, nf * 2, nf)
    p["cas_offset_conv2"] = _conv_init(jax.random.fold_in(key, 91), 3, nf, nf)
    p["cas_dcn"] = _dcn_pack_init(jax.random.fold_in(key, 92), nf, groups)
    return p


def _pcd_align(p, nbr_pyr, ref_pyr, groups):
    """Align one neighbor's 3-level feature pyramid to the reference
    (edvr_arch.py PCDAlignment.forward)."""
    feat, offset = None, None
    for lv in (3, 2, 1):
        off = _lrelu(_conv(
            p[f"offset_conv1_l{lv}"],
            jnp.concatenate([nbr_pyr[lv - 1], ref_pyr[lv - 1]], axis=-1),
        ))
        if lv == 3:
            off = _lrelu(_conv(p[f"offset_conv2_l{lv}"], off))
        else:
            up_off = _resize2x(offset) * 2.0
            off = _lrelu(_conv(
                p[f"offset_conv2_l{lv}"],
                jnp.concatenate([off, up_off], axis=-1),
            ))
            off = _lrelu(_conv(p[f"offset_conv3_l{lv}"], off))
        f = _dcn_pack(p[f"dcn_l{lv}"], nbr_pyr[lv - 1], off, groups)
        if lv < 3:
            up_feat = _resize2x(feat)
            f = _conv(
                p[f"feat_conv_l{lv}"], jnp.concatenate([f, up_feat], axis=-1)
            )
        if lv > 1:
            f = _lrelu(f)
        feat, offset = f, off
    # cascading refinement at L1
    off = _lrelu(_conv(
        p["cas_offset_conv1"], jnp.concatenate([feat, ref_pyr[0]], axis=-1)
    ))
    off = _lrelu(_conv(p["cas_offset_conv2"], off))
    return _lrelu(_dcn_pack(p["cas_dcn"], feat, off, groups))


def _tsa_init(key, nf, nframes):
    return {
        "temporal_attn1": _conv_init(jax.random.fold_in(key, 0), 3, nf, nf),
        "temporal_attn2": _conv_init(jax.random.fold_in(key, 1), 3, nf, nf),
        "feat_fusion": _conv_init(jax.random.fold_in(key, 2), 1, nframes * nf, nf),
        "spatial_attn1": _conv_init(jax.random.fold_in(key, 3), 1, nframes * nf, nf),
        "spatial_attn2": _conv_init(jax.random.fold_in(key, 4), 1, nf * 2, nf),
        "spatial_attn3": _conv_init(jax.random.fold_in(key, 5), 3, nf, nf),
        "spatial_attn4": _conv_init(jax.random.fold_in(key, 6), 1, nf, nf),
        "spatial_attn5": _conv_init(jax.random.fold_in(key, 7), 3, nf, nf),
        "spatial_attn_l1": _conv_init(jax.random.fold_in(key, 8), 1, nf, nf),
        "spatial_attn_l2": _conv_init(jax.random.fold_in(key, 9), 3, nf * 2, nf),
        "spatial_attn_l3": _conv_init(jax.random.fold_in(key, 10), 3, nf, nf),
        "spatial_attn_add1": _conv_init(jax.random.fold_in(key, 11), 1, nf, nf),
        "spatial_attn_add2": _conv_init(jax.random.fold_in(key, 12), 1, nf, nf),
    }


_POOL_PAD = ((0, 0), (1, 1), (1, 1), (0, 0))


def _max_pool3s2(x):
    # torch MaxPool2d(3, stride=2, padding=1): symmetric explicit padding
    # (XLA "SAME" would pad (0, 1) and shift every window)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), _POOL_PAD
    )


def _avg_pool3s2(x):
    # torch AvgPool2d(3, stride=2, padding=1) default count_include_pad:
    # divide by the full 9-cell window, pads counted as zeros
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1), _POOL_PAD
    )
    return s / 9.0


def _tsa_fusion(p, aligned, center_idx):
    """aligned [T, H, W, C] -> fused [1, H, W, C]
    (edvr_arch.py TSAFusion.forward)."""
    T, H, W, C = aligned.shape
    emb_ref = _conv(p["temporal_attn1"], aligned[center_idx][None])
    emb = _conv(p["temporal_attn2"], aligned)
    corr = jnp.sum(emb * emb_ref, axis=-1, keepdims=True)  # [T, H, W, 1]
    prob = jax.nn.sigmoid(corr)
    weighted = (aligned * prob).transpose(1, 2, 0, 3).reshape(1, H, W, T * C)
    feat = _lrelu(_conv(p["feat_fusion"], weighted))

    attn = _lrelu(_conv(p["spatial_attn1"], weighted))
    attn_max = _max_pool3s2(attn)
    attn_avg = _avg_pool3s2(attn)
    attn = _lrelu(_conv(
        p["spatial_attn2"], jnp.concatenate([attn_max, attn_avg], axis=-1)
    ))
    attn_lv = _lrelu(_conv(p["spatial_attn_l1"], attn))
    attn_lv = jnp.concatenate(
        [_max_pool3s2(attn_lv), _avg_pool3s2(attn_lv)], axis=-1
    )
    attn_lv = _lrelu(_conv(p["spatial_attn_l2"], attn_lv))
    attn_lv = _lrelu(_conv(p["spatial_attn_l3"], attn_lv))
    attn_lv = _resize2x(attn_lv)
    attn = _lrelu(_conv(p["spatial_attn3"], attn)) + attn_lv
    attn = _lrelu(_conv(p["spatial_attn4"], attn))
    attn = _resize2x(attn)
    attn = _conv(p["spatial_attn5"], attn)
    attn_add = _conv(
        p["spatial_attn_add2"], _lrelu(_conv(p["spatial_attn_add1"], attn))
    )
    attn = jax.nn.sigmoid(attn)
    return feat * attn * 2 + attn_add


def init_edvr_params(key: jax.Array, cfg: EDVRConfig) -> Params:
    nf = cfg.num_feat
    ks = jax.random.split(key, 12)
    return {
        "conv_first": _conv_init(ks[0], 3, 3, nf),
        "feature_extraction": _resblocks_stacked_init(
            ks[1], nf, cfg.num_extract_block),
        "conv_l2_1": _conv_init(ks[2], 3, nf, nf),
        "conv_l2_2": _conv_init(ks[3], 3, nf, nf),
        "conv_l3_1": _conv_init(ks[4], 3, nf, nf),
        "conv_l3_2": _conv_init(ks[5], 3, nf, nf),
        "pcd": _pcd_init(ks[6], nf, cfg.deformable_groups),
        "tsa": _tsa_init(ks[7], nf, cfg.num_frame),
        "reconstruction": _resblocks_stacked_init(
            ks[8], nf, cfg.num_reconstruct_block),
        "upconv1": _conv_init(ks[9], 3, nf, nf * 4),
        "upconv2": _conv_init(ks[10], 3, nf, 64 * 4),
        "conv_hr": _conv_init(jax.random.fold_in(ks[11], 0), 3, 64, 64),
        "conv_last": _conv_init(jax.random.fold_in(ks[11], 1), 3, 64, 3),
    }


def edvr_forward(params: Params, cfg: EDVRConfig, lrs: jnp.ndarray):
    """lrs [T, H, W, 3] in [0, 1] (T = cfg.num_frame, center = T//2) ->
    [4H, 4W, 3] SR of the center frame (edvr_arch.py EDVR.forward,
    without the optional predeblur/HR-input heads)."""
    T, H, W, _ = lrs.shape
    center = T // 2
    gs = cfg.deformable_groups

    l1 = _lrelu(_conv(params["conv_first"], lrs))
    l1 = _resblocks_scan(params["feature_extraction"], l1)
    l2 = _lrelu(_conv(params["conv_l2_1"], l1, stride=2))
    l2 = _lrelu(_conv(params["conv_l2_2"], l2))
    l3 = _lrelu(_conv(params["conv_l3_1"], l2, stride=2))
    l3 = _lrelu(_conv(params["conv_l3_2"], l3))

    ref_pyr = [l1[center][None], l2[center][None], l3[center][None]]
    aligned = []
    for t in range(T):
        nbr_pyr = [l1[t][None], l2[t][None], l3[t][None]]
        aligned.append(_pcd_align(params["pcd"], nbr_pyr, ref_pyr, gs)[0])
    aligned = jnp.stack(aligned)                      # [T, H, W, nf]

    feat = _tsa_fusion(params["tsa"], aligned, center)
    out = _resblocks_scan(params["reconstruction"], feat)
    out = _lrelu(pixel_shuffle(_conv(params["upconv1"], out), 2))
    out = _lrelu(pixel_shuffle(_conv(params["upconv2"], out), 2))
    out = _lrelu(_conv(params["conv_hr"], out))
    out = _conv(params["conv_last"], out)[0]
    base = jax.image.resize(lrs[center], (4 * H, 4 * W, 3), "bilinear")
    return out + base


# ------------------------------------------------------------------ TOFlow
#
# basicsr/archs/tof_arch.py: 7-frame task-oriented-flow VSR on pre-upsampled
# inputs.  SPyNetTOF is a 4-level pyramid whose basic modules carry
# BatchNorm (eval mode here: stored running statistics folded in).


def _bn_eval(p, x, eps=1e-5):
    """BatchNorm inference: stored running stats (torch eval semantics)."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["offset"]


def _bn_eval_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "offset": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


_SPYTOF_CHANNELS = ((8, 32), (32, 64), (64, 32), (32, 16), (16, 2))


def init_spynet_tof_params(key: jax.Array) -> List[Params]:
    """4 basic modules of 5 7x7 convs; BN after all but the last conv
    (tof_arch.py:16-39; the first four convs are bias-free)."""
    mods = []
    for lv in range(4):
        layers, bns = [], []
        for li, (cin, cout) in enumerate(_SPYTOF_CHANNELS):
            p = _conv_init(jax.random.fold_in(key, lv * 8 + li), 7, cin, cout)
            if li < 4:
                p.pop("bias")
                bns.append(_bn_eval_init(cout))
            layers.append(p)
        mods.append({"layers": layers, "bns": bns})
    return mods


def _conv_nobias(p, x):
    k = p["kernel"].shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def spynet_tof_flow(params: List[Params], ref: jnp.ndarray, supp: jnp.ndarray):
    """ref/supp [N, H, W, 3] (already ImageNet-normalized by the caller, as
    TOFlow does) -> flow [N, H, W, 2]; H, W % 16 == 0 (4 levels)."""
    refs, supps = [ref], [supp]
    for _ in range(3):
        refs.insert(0, jax.lax.reduce_window(
            refs[0], 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0)
        supps.insert(0, jax.lax.reduce_window(
            supps[0], 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0)

    # flow starts one level BELOW the coarsest frames (h/16 vs h/8) and is
    # upsampled at every level including the first (tof_arch.py:85-89)
    N, H8, W8, _ = refs[0].shape
    flow = jnp.zeros((N, H8 // 2, W8 // 2, 2), ref.dtype)
    for lv in range(4):
        flow_up = _upflow2(flow)
        x = jnp.concatenate(
            [refs[lv], flow_warp(supps[lv], flow_up), flow_up], axis=-1)
        for li in range(5):
            p = params[lv]["layers"][li]
            if li < 4:
                x = jax.nn.relu(_bn_eval(params[lv]["bns"][li],
                                         _conv_nobias(p, x)))
            else:
                x = _conv(p, x)
        flow = flow_up + x
    return flow


def init_toflow_params(key: jax.Array) -> Params:
    ks = jax.random.split(key, 5)
    return {
        "spynet": init_spynet_tof_params(ks[0]),
        "conv_1": _conv_init(ks[1], 9, 21, 64),
        "conv_2": _conv_init(ks[2], 9, 64, 64),
        "conv_3": _conv_init(ks[3], 1, 64, 64),
        "conv_4": _conv_init(ks[4], 1, 64, 3),
    }


def toflow_forward(params: Params, lrs: jnp.ndarray,
                   ref_idx: int = 3) -> jnp.ndarray:
    """lrs [7, H, W, 3] in [0, 1] (pre-upsampled to GT size) -> [H, W, 3]
    (tof_arch.py:137-172).  ref_idx=0 for adapt_official_weights inputs
    already reordered by the caller."""
    T, H, W, _ = lrs.shape
    norm = (lrs - _IMAGENET_MEAN) / _IMAGENET_STD
    ref = norm[ref_idx]
    aligned = []
    for i in range(T):
        if i == ref_idx:
            aligned.append(ref)
        else:
            flow = spynet_tof_flow(params["spynet"], ref[None], norm[i][None])
            aligned.append(flow_warp(norm[i][None], flow)[0])
    x = jnp.concatenate(aligned, axis=-1)[None]     # [1, H, W, 21]
    x = jax.nn.relu(_conv(params["conv_1"], x))
    x = jax.nn.relu(_conv(params["conv_2"], x))
    x = jax.nn.relu(_conv(params["conv_3"], x))
    x = _conv(params["conv_4"], x)[0] + ref
    return x * _IMAGENET_STD + _IMAGENET_MEAN


# --------------------------------------------------------------------- DUF
#
# basicsr/archs/duf_arch.py: dynamic upsampling filters.  3D-conv dense
# trunk over the 7-frame clip (BatchNorm3d in eval mode), two heads: a
# residual image and per-pixel 5x5 softmax filters applied to the center
# frame, then pixel shuffle.


def _conv3d(p, x, pad):
    """x [N, T, H, W, C]; kernel [kt, kh, kw, cin, cout]; pad (t, h, w)."""
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1, 1),
        ((pad[0], pad[0]), (pad[1], pad[1]), (pad[2], pad[2])),
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    ) + p["bias"]


def _conv3d_init(key, kt, kh, kw, cin, cout):
    fan_in = kt * kh * kw * cin
    std = 1.0 / np.sqrt(fan_in)
    return {"kernel": jax.random.normal(key, (kt, kh, kw, cin, cout)) * std,
            "bias": jnp.zeros((cout,), jnp.float32)}


@dataclasses.dataclass(frozen=True)
class DUFConfig:
    scale: int = 4
    num_layer: int = 52   # 16 | 28 | 52

    @property
    def num_block(self) -> int:
        return {16: 3, 28: 9, 52: 21}[self.num_layer]

    @property
    def num_grow_ch(self) -> int:
        return {16: 32, 28: 16, 52: 16}[self.num_layer]

    @classmethod
    def tiny(cls) -> "DUFConfig":
        return cls(scale=2, num_layer=16)


def _duf_dense_unit_init(key, cin, gc):
    return {
        "bn1": _bn_eval_init(cin),
        "conv1": _conv3d_init(jax.random.fold_in(key, 0), 1, 1, 1, cin, cin),
        "bn2": _bn_eval_init(cin),
        "conv2": _conv3d_init(jax.random.fold_in(key, 1), 3, 3, 3, cin, gc),
    }


def _duf_dense_unit(p, x, pad_t):
    y = _conv3d(p["conv1"], jax.nn.relu(_bn_eval(p["bn1"], x)), (0, 0, 0))
    return _conv3d(p["conv2"], jax.nn.relu(_bn_eval(p["bn2"], y)),
                   (pad_t, 1, 1))


def init_duf_params(key: jax.Array, cfg: DUFConfig) -> Params:
    nb, gc = cfg.num_block, cfg.num_grow_ch
    ks = jax.random.split(key, nb + 12)
    dense1 = [_duf_dense_unit_init(ks[i], 64 + i * gc, gc)
              for i in range(nb)]
    c1 = 64 + nb * gc
    reduce = [
        _duf_dense_unit_init(ks[nb], c1, gc),
        _duf_dense_unit_init(ks[nb + 1], c1 + gc, gc),
        _duf_dense_unit_init(ks[nb + 2], c1 + 2 * gc, gc),
    ]
    ch = c1 + 3 * gc
    s2 = cfg.scale ** 2
    return {
        "conv3d1": _conv3d_init(ks[nb + 3], 1, 3, 3, 3, 64),
        "dense1": dense1,
        "reduce": reduce,
        "bn3d2": _bn_eval_init(ch),
        "conv3d2": _conv3d_init(ks[nb + 4], 1, 3, 3, ch, 256),
        "conv3d_r1": _conv3d_init(ks[nb + 5], 1, 1, 1, 256, 256),
        "conv3d_r2": _conv3d_init(ks[nb + 6], 1, 1, 1, 256, 3 * s2),
        "conv3d_f1": _conv3d_init(ks[nb + 7], 1, 1, 1, 256, 512),
        "conv3d_f2": _conv3d_init(ks[nb + 8], 1, 1, 1, 512, 25 * s2),
    }


def _dynamic_upsampling_filter(x, filters):
    """x [H, W, 3]; filters [H, W, 25, s2] (softmaxed 5x5 taps) ->
    [H, W, 3*s2] (duf_arch.py:156-179; same filters for all 3 channels).
    The im2col expansion is a patch extraction; the tap contraction rides
    the MXU."""
    H, W, _ = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x[None], (5, 5), (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]   # [H, W, 3*25] (c-major)
    patches = patches.reshape(H, W, 3, 25)
    out = jnp.einsum("hwcp,hwps->hwcs", patches, filters)
    return out.reshape(H, W, 3 * filters.shape[-1])


def duf_forward(params: Params, cfg: DUFConfig, lrs: jnp.ndarray):
    """lrs [7, H, W, 3] in [0, 1] -> [sH, sW, 3] SR of the center frame
    (duf_arch.py:246-277)."""
    T, H, W, _ = lrs.shape
    x = lrs[None]                                   # [1, T, H, W, 3]
    center = x[0, T // 2]
    x = _conv3d(params["conv3d1"], x, (0, 1, 1))
    for unit in params["dense1"]:
        x = jnp.concatenate([x, _duf_dense_unit(unit, x, 1)], axis=-1)
    for unit in params["reduce"]:
        y = _duf_dense_unit(unit, x, 0)
        x = jnp.concatenate([x[:, 1:-1], y], axis=-1)
    x = jax.nn.relu(_bn_eval(params["bn3d2"], x))
    x = jax.nn.relu(_conv3d(params["conv3d2"], x, (0, 1, 1)))

    res = _conv3d(params["conv3d_r2"],
                  jax.nn.relu(_conv3d(params["conv3d_r1"], x, (0, 0, 0))),
                  (0, 0, 0))[0, 0]                  # [H, W, 3*s2]
    filt = _conv3d(params["conv3d_f2"],
                   jax.nn.relu(_conv3d(params["conv3d_f1"], x, (0, 0, 0))),
                   (0, 0, 0))[0, 0]                 # [H, W, 25*s2]
    s2 = cfg.scale ** 2
    # torch views (25, s2): channel index = tap * s2 + shuffle-slot
    filt = jax.nn.softmax(filt.reshape(H, W, 25, s2), axis=2)
    out = _dynamic_upsampling_filter(center, filt) + res
    return pixel_shuffle(out[None], cfg.scale)[0]


# --------------------------------------------------------------- BasicVSR++
#
# basicsr/archs/basicvsrpp_arch.py: four propagation branches
# (backward/forward x 2) with second-order flow-guided deformable
# alignment.  Each branch is one lax.scan; the reference's i==0 / i<=1
# index guards become per-step masks (first step emits the un-aligned
# trunk, second step zeroes the second-order condition).


@dataclasses.dataclass(frozen=True)
class BasicVSRPPConfig:
    mid_channels: int = 64
    num_blocks: int = 7
    max_residue_magnitude: float = 10.0
    deformable_groups: int = 16

    @classmethod
    def tiny(cls) -> "BasicVSRPPConfig":
        return cls(mid_channels=8, num_blocks=1, deformable_groups=2)


_VSRPP_BRANCHES = ("backward_1", "forward_1", "backward_2", "forward_2")


def _soda_init(key, mid, groups):
    """SecondOrderDeformableAlignment (basicvsrpp_arch.py:338-398):
    4-conv offset head (last zero-init) + modulated deform conv."""
    ks = jax.random.split(key, 5)
    return {
        "conv_offset": [
            _conv_init(ks[0], 3, 3 * mid + 4, mid),
            _conv_init(ks[1], 3, mid, mid),
            _conv_init(ks[2], 3, mid, mid),
            _conv_init(ks[3], 3, mid, 27 * groups, gain=1e-8),
        ],
        "dcn": _conv_init(ks[4], 3, 2 * mid, mid),
    }


def _soda(p, cfg, x, extra_feat, flow_1, flow_2):
    """x [N,H,W,2*mid] (feat_prop ‖ feat_n2), extra_feat
    [N,H,W,3*mid] (cond_n1 ‖ current ‖ cond_n2), flows [N,H,W,2] (dx,dy)."""
    G = cfg.deformable_groups
    h = jnp.concatenate([extra_feat, flow_1, flow_2], axis=-1)
    for i, conv in enumerate(p["conv_offset"]):
        h = _conv(conv, h)
        if i < 3:
            h = _lrelu(h)
    o1, o2, mask = jnp.split(h, 3, axis=-1)
    offset = cfg.max_residue_magnitude * jnp.tanh(
        jnp.concatenate([o1, o2], axis=-1))
    n_rep = offset.shape[-1] // 4
    off_1 = offset[..., :offset.shape[-1] // 2] \
        + jnp.tile(flow_1[..., ::-1], (1, 1, 1, n_rep))
    off_2 = offset[..., offset.shape[-1] // 2:] \
        + jnp.tile(flow_2[..., ::-1], (1, 1, 1, n_rep))
    off = jnp.concatenate([off_1, off_2], axis=-1)
    return deform_conv2d(
        x, off, p["dcn"]["kernel"], p["dcn"]["bias"],
        mask=jax.nn.sigmoid(mask), deformable_groups=G)


def init_basicvsrpp_params(key: jax.Array, cfg: BasicVSRPPConfig) -> Params:
    mid = cfg.mid_channels
    ks = jax.random.split(key, 16)
    p: Params = {
        "spynet": init_spynet_params(ks[0]),
        "feat_extract": _trunk_init(ks[1], 3, mid, 5),
        "reconstruction": _trunk_init(ks[2], 5 * mid, mid, 5),
        "upconv1": _conv_init(ks[3], 3, mid, mid * 4),
        "upconv2": _conv_init(ks[4], 3, mid, 64 * 4),
        "conv_hr": _conv_init(ks[5], 3, 64, 64),
        "conv_last": _conv_init(ks[6], 3, 64, 3),
    }
    for i, name in enumerate(_VSRPP_BRANCHES):
        p[f"deform_align_{name}"] = _soda_init(
            ks[7 + 2 * i], mid, cfg.deformable_groups)
        p[f"backbone_{name}"] = _trunk_init(
            ks[8 + 2 * i], (2 + i) * mid, mid, cfg.num_blocks)
    return p


def _vsrpp_propagate(params, cfg, name, spatial, prev_branches, flows,
                     backward):
    """One propagation branch as a scan.  spatial [T,H,W,mid];
    prev_branches: list of [T,H,W,mid] from earlier branches; flows
    [T-1,H,W,2] between consecutive frames.  Returns [T,H,W,mid]."""
    T, H, W, mid = spatial.shape
    da, trunk = params[f"deform_align_{name}"], params[f"backbone_{name}"]

    cur = jnp.concatenate([spatial[:, None]] + [b[:, None] for b in
                          prev_branches], axis=1) if prev_branches else \
        spatial[:, None]                           # [T, 1+P, H, W, mid]
    if backward:
        cur = cur[::-1]
        # step i (frame T-1-i) aligns with flows[T-1-i]; clip the unused
        # first-step index into range
        idx1 = np.clip(T - 1 - np.arange(T), 0, max(T - 2, 0))
        idx2 = np.clip(T - np.arange(T), 0, max(T - 2, 0))
    else:
        idx1 = np.clip(np.arange(T) - 1, 0, max(T - 2, 0))
        idx2 = np.clip(np.arange(T) - 2, 0, max(T - 2, 0))
    f1 = flows[idx1] if T > 1 else jnp.zeros((T, H, W, 2), flows.dtype)
    f2 = flows[idx2] if T > 1 else jnp.zeros((T, H, W, 2), flows.dtype)
    not_first = (jnp.arange(T) >= 1).astype(spatial.dtype)
    second_plus = (jnp.arange(T) >= 2).astype(spatial.dtype)

    def step(carry, inp):
        feat_p, feat_p2 = carry
        cur_i, flow_n1, flow_n2, m1, m2 = inp
        flow_n1 = flow_n1 * m1
        cond_n1 = flow_warp(feat_p[None], flow_n1[None])[0]
        flow_n2c = (flow_n1 + flow_warp(flow_n2[None],
                                        flow_n1[None])[0]) * m2
        feat_n2 = feat_p2 * m2
        cond_n2 = flow_warp(feat_n2[None], flow_n2c[None])[0] * m2
        cond = jnp.concatenate([cond_n1, cur_i[0], cond_n2], axis=-1)
        dcn_in = jnp.concatenate([feat_p, feat_n2], axis=-1)
        aligned = _soda(da, cfg, dcn_in[None], cond[None],
                        flow_n1[None], flow_n2c[None])[0]
        feat_prop = aligned * m1                    # first step: zeros
        trunk_in = jnp.concatenate(
            [cur_i[j] for j in range(cur_i.shape[0])] + [feat_prop], axis=-1)
        feat_prop = feat_prop + _trunk(trunk, trunk_in[None])[0]
        return (feat_prop, feat_p), feat_prop

    zero = jnp.zeros((H, W, mid), spatial.dtype)
    _, outs = jax.lax.scan(
        step, (zero, zero),
        (cur, f1, f2, not_first[:, None, None, None],
         second_plus[:, None, None, None]))
    return outs[::-1] if backward else outs


def basicvsrpp_forward(params: Params, cfg: BasicVSRPPConfig,
                       lqs: jnp.ndarray) -> jnp.ndarray:
    """lqs [T, H, W, 3] in [0, 1] -> [T, 4H, 4W, 3]
    (basicvsrpp_arch.py:273-335, low-res-input x4 variant).  H, W must be
    multiples of 32 (SPyNet pyramid)."""
    T, H, W, _ = lqs.shape
    spatial = _trunk(params["feat_extract"], lqs)
    flows_backward = spynet_flow(params["spynet"], lqs[:-1], lqs[1:]) \
        if T > 1 else jnp.zeros((0, H, W, 2), lqs.dtype)
    flows_forward = spynet_flow(params["spynet"], lqs[1:], lqs[:-1]) \
        if T > 1 else jnp.zeros((0, H, W, 2), lqs.dtype)

    branches = []
    for name in _VSRPP_BRANCHES:
        backward = name.startswith("backward")
        flows = flows_backward if backward else flows_forward
        branches.append(_vsrpp_propagate(
            params, cfg, name, spatial, branches, flows, backward))

    hr = jnp.concatenate([spatial] + branches, axis=-1)  # [T,H,W,5*mid]
    hr = _trunk(params["reconstruction"], hr)
    hr = _lrelu(pixel_shuffle(_conv(params["upconv1"], hr), 2))
    hr = _lrelu(pixel_shuffle(_conv(params["upconv2"], hr), 2))
    hr = _lrelu(_conv(params["conv_hr"], hr))
    hr = _conv(params["conv_last"], hr)
    base = jax.image.resize(lqs, (T, 4 * H, 4 * W, 3), "bilinear")
    return hr + base
