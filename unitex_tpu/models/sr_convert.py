"""Torch-checkpoint converters for the SR model zoo.

BasicSR-trained checkpoints (Real-ESRGAN RRDBNet, MSRResNet, EDSR, RCAN,
SRVGGNetCompact, official SwinIR, SPyNet, BasicVSR, EDVR) load into the
jnp architectures of models/sr_archs.py, models/swinir.py and
models/video_sr.py.  Name maps follow the public basicsr arch modules the
reference vendors (/root/reference/TSD_SR/basicsr/archs/*_arch.py).

Conventions: torch convs [out, in, kh, kw] -> HWIO; torch linears
[out, in] -> [in, out]; per-block Sequential indices -> stacked [L, ...]
leaves (the repo's scan-over-stacked-blocks layout).

All converters take an already-deserialized ``dict[str, np.ndarray]``
(use ``load_state_dict`` for .pth/.safetensors files; BasicSR wraps some
checkpoints as ``{"params": ...}`` / ``{"params_ema": ...}`` — unwrapped
automatically).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def load_state_dict(path: str, prefer_ema: bool = True) -> Dict[str, np.ndarray]:
    """Deserialize a torch .pth / .safetensors file to numpy, unwrapping
    BasicSR's ``params`` / ``params_ema`` containers."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = dict(load_file(path))
    else:
        import torch  # deserialization only

        raw = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(raw, dict):
            for key in (("params_ema",) if prefer_ema else ()) + ("params", "state_dict"):
                if key in raw and isinstance(raw[key], dict):
                    raw = raw[key]
                    break
        sd = {}
        for k, v in raw.items():
            if not hasattr(v, "numpy"):
                continue  # scalar bookkeeping entries (epoch, iter, ...)
            if v.dtype in (torch.bfloat16, torch.float16):
                v = v.float()  # .numpy() rejects bf16
            sd[k] = v.numpy()
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def _c(sd, name) -> Params:
    """Conv2d -> {"kernel" HWIO, "bias"}."""
    w = np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))
    out = {"kernel": jnp.asarray(w)}
    if f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return out


def _lin(sd, name) -> Params:
    out = {"kernel": jnp.asarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return out


def _stack(blocks: List[Params]) -> Params:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def _count(sd, pattern_fn) -> int:
    i = 0
    while pattern_fn(i) in sd:
        i += 1
    return i


# ------------------------------------------------------------------ sr_archs


def convert_rrdbnet(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr rrdbnet_arch.RRDBNet (the Real-ESRGAN backbone)."""
    n = _count(sd, lambda i: f"body.{i}.rdb1.conv1.weight")
    body = [
        {f"rdb{r}": {f"conv{c}": _c(sd, f"body.{i}.rdb{r}.conv{c}")
                     for c in range(1, 6)}
         for r in range(1, 4)}
        for i in range(n)
    ]
    return {
        "conv_first": _c(sd, "conv_first"),
        "body": _stack(body),
        "conv_body": _c(sd, "conv_body"),
        "conv_up1": _c(sd, "conv_up1"),
        "conv_up2": _c(sd, "conv_up2"),
        "conv_hr": _c(sd, "conv_hr"),
        "conv_last": _c(sd, "conv_last"),
    }


def convert_msrresnet(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr srresnet_arch.MSRResNet."""
    n = _count(sd, lambda i: f"body.{i}.conv1.weight")
    p = {
        "conv_first": _c(sd, "conv_first"),
        "body": _stack([
            {"conv1": _c(sd, f"body.{i}.conv1"), "conv2": _c(sd, f"body.{i}.conv2")}
            for i in range(n)
        ]),
        "upconv1": _c(sd, "upconv1"),
        "conv_hr": _c(sd, "conv_hr"),
        "conv_last": _c(sd, "conv_last"),
    }
    if "upconv2.weight" in sd:
        p["upconv2"] = _c(sd, "upconv2")
    return p


def _convert_upsample(sd, prefix: str) -> Params:
    """basicsr arch_util.Upsample Sequential: convs at even indices
    (PixelShuffle modules hold no params)."""
    out, j = {}, 0
    i = 0
    while True:
        if f"{prefix}.{i}.weight" in sd:
            out[f"up{j}"] = _c(sd, f"{prefix}.{i}")
            j += 1
        elif i > 8:
            break
        i += 1
    return out


def convert_edsr(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr edsr_arch.EDSR (mean-shift constants live in the config)."""
    n = _count(sd, lambda i: f"body.{i}.conv1.weight")
    return {
        "conv_first": _c(sd, "conv_first"),
        "body": _stack([
            {"conv1": _c(sd, f"body.{i}.conv1"), "conv2": _c(sd, f"body.{i}.conv2")}
            for i in range(n)
        ]),
        "conv_after_body": _c(sd, "conv_after_body"),
        "upsample": _convert_upsample(sd, "upsample"),
        "conv_last": _c(sd, "conv_last"),
    }


def convert_srvgg(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr srvgg_arch.SRVGGNetCompact: one flat ``body`` ModuleList of
    conv/PReLU pairs; first conv/act and the trailing conv split off."""
    conv_idx = sorted(
        int(k.split(".")[1]) for k in sd
        if k.startswith("body.") and k.endswith(".weight")
        and sd[k].ndim == 4
    )
    act_idx = sorted(
        int(k.split(".")[1]) for k in sd
        if k.startswith("body.") and k.endswith(".weight")
        and sd[k].ndim == 1
    )
    if not act_idx:
        raise ValueError(
            "convert_srvgg: no PReLU parameters in the body — this looks "
            "like an act_type='leakyrelu' SRVGGNetCompact checkpoint; only "
            "the prelu variant (the released realesr-general models) maps "
            "onto this architecture"
        )
    first, *mid_convs, last = conv_idx
    body = [
        {**_c(sd, f"body.{ci}"), "prelu": jnp.asarray(sd[f"body.{ai}.weight"])}
        for ci, ai in zip(mid_convs, act_idx[1:])
    ]
    return {
        "conv_first": _c(sd, f"body.{first}"),
        "prelu_first": jnp.asarray(sd[f"body.{act_idx[0]}.weight"]),
        "body": _stack(body),
        "conv_last": _c(sd, f"body.{last}"),
    }


def convert_rcan(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr rcan_arch.RCAN: body.{g}.residual_group.{b}.rcab.{0,2} convs +
    .rcab.3.attention.{1,3} channel attention; trailing group conv."""
    G = _count(sd, lambda g: f"body.{g}.residual_group.0.rcab.0.weight")
    B = _count(sd, lambda b: f"body.0.residual_group.{b}.rcab.0.weight")
    groups = []
    for g in range(G):
        blocks = []
        for b in range(B):
            base = f"body.{g}.residual_group.{b}"
            blocks.append({
                "conv1": _c(sd, f"{base}.rcab.0"),
                "conv2": _c(sd, f"{base}.rcab.2"),
                "att_down": _c(sd, f"{base}.rcab.3.attention.1"),
                "att_up": _c(sd, f"{base}.rcab.3.attention.3"),
            })
        groups.append({
            "blocks": _stack(blocks),
            "conv": _c(sd, f"body.{g}.residual_group.{B}"),
        })
    return {
        "conv_first": _c(sd, "conv_first"),
        "groups": _stack(groups),
        "conv_after_body": _c(sd, "conv_after_body"),
        "upsample": _convert_upsample(sd, "upsample"),
        "conv_last": _c(sd, "conv_last"),
    }


# -------------------------------------------------------------------- SwinIR


def convert_swinir(sd: Dict[str, np.ndarray]) -> Params:
    """Official SwinIR (classical-SR pixelshuffle head): layers.{i} RSTBs of
    residual_group.blocks.{j}, patch-embed norm, conv_before_upsample."""
    n_groups = _count(sd, lambda i: f"layers.{i}.residual_group.blocks.0.norm1.weight")
    groups = []
    for i in range(n_groups):
        depth = _count(
            sd, lambda j: f"layers.{i}.residual_group.blocks.{j}.norm1.weight")
        layers = []
        for j in range(depth):
            b = f"layers.{i}.residual_group.blocks.{j}"
            layers.append({
                "norm1": {"g": jnp.asarray(sd[f"{b}.norm1.weight"]),
                          "b": jnp.asarray(sd[f"{b}.norm1.bias"])},
                "qkv": _lin(sd, f"{b}.attn.qkv"),
                "proj": _lin(sd, f"{b}.attn.proj"),
                "rel_bias": jnp.asarray(sd[f"{b}.attn.relative_position_bias_table"]),
                "norm2": {"g": jnp.asarray(sd[f"{b}.norm2.weight"]),
                          "b": jnp.asarray(sd[f"{b}.norm2.bias"])},
                "fc1": _lin(sd, f"{b}.mlp.fc1"),
                "fc2": _lin(sd, f"{b}.mlp.fc2"),
            })
        groups.append({"layers": _stack(layers), "conv": _c(sd, f"layers.{i}.conv")})
    p = {
        "conv_first": _c(sd, "conv_first"),
        "groups": groups,
        "norm": {"g": jnp.asarray(sd["norm.weight"]),
                 "b": jnp.asarray(sd["norm.bias"])},
        "conv_after_body": _c(sd, "conv_after_body"),
        "conv_before_upsample": _c(sd, "conv_before_upsample.0"),
        "upsample": _convert_upsample(sd, "upsample"),
        "conv_last": _c(sd, "conv_last"),
    }
    if "patch_embed.norm.weight" in sd:
        p["patch_norm"] = {"g": jnp.asarray(sd["patch_embed.norm.weight"]),
                           "b": jnp.asarray(sd["patch_embed.norm.bias"])}
    return p


# ------------------------------------------------------------------ video SR


def convert_spynet(sd: Dict[str, np.ndarray], prefix: str = "") -> List[Params]:
    """basicsr spynet_arch.SpyNet: basic_module.{i}.basic_module.{0,2,4,6,8}."""
    mods = []
    for i in range(6):
        layers = [
            _c(sd, f"{prefix}basic_module.{i}.basic_module.{j}")
            for j in (0, 2, 4, 6, 8)
        ]
        mods.append({"layers": layers})
    return mods


def convert_basicvsr(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr basicvsr_arch.BasicVSR: spynet + backward/forward
    ConvResidualBlocks (main.0 head conv, main.2.{i} resblocks)."""
    def trunk(name):
        n = _count(sd, lambda i: f"{name}.main.2.{i}.conv1.weight")
        return {
            "head": _c(sd, f"{name}.main.0"),
            "blocks": _stack([
                {"conv1": _c(sd, f"{name}.main.2.{i}.conv1"),
                 "conv2": _c(sd, f"{name}.main.2.{i}.conv2")}
                for i in range(n)
            ]),
        }

    return {
        "spynet": convert_spynet(sd, "spynet."),
        "backward_trunk": trunk("backward_trunk"),
        "forward_trunk": trunk("forward_trunk"),
        "fusion": _c(sd, "fusion"),
        "upconv1": _c(sd, "upconv1"),
        "upconv2": _c(sd, "upconv2"),
        "conv_hr": _c(sd, "conv_hr"),
        "conv_last": _c(sd, "conv_last"),
    }


def convert_edvr(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr edvr_arch.EDVR (TSA fusion variant, no predeblur/HR-input)."""
    def dcn(name):
        return {
            "conv_offset": _c(sd, f"{name}.conv_offset"),
            "dcn": _c(sd, name),
        }

    pcd = {}
    for lv in (3, 2, 1):
        pcd[f"offset_conv1_l{lv}"] = _c(sd, f"pcd_align.offset_conv1.l{lv}")
        pcd[f"offset_conv2_l{lv}"] = _c(sd, f"pcd_align.offset_conv2.l{lv}")
        if lv < 3:
            pcd[f"offset_conv3_l{lv}"] = _c(sd, f"pcd_align.offset_conv3.l{lv}")
            pcd[f"feat_conv_l{lv}"] = _c(sd, f"pcd_align.feat_conv.l{lv}")
        pcd[f"dcn_l{lv}"] = dcn(f"pcd_align.dcn_pack.l{lv}")
    pcd["cas_offset_conv1"] = _c(sd, "pcd_align.cas_offset_conv1")
    pcd["cas_offset_conv2"] = _c(sd, "pcd_align.cas_offset_conv2")
    pcd["cas_dcn"] = dcn("pcd_align.cas_dcnpack")

    tsa_names = (
        "temporal_attn1", "temporal_attn2", "feat_fusion",
        "spatial_attn1", "spatial_attn2", "spatial_attn3", "spatial_attn4",
        "spatial_attn5", "spatial_attn_l1", "spatial_attn_l2",
        "spatial_attn_l3", "spatial_attn_add1", "spatial_attn_add2",
    )
    n_ex = _count(sd, lambda i: f"feature_extraction.{i}.conv1.weight")
    n_re = _count(sd, lambda i: f"reconstruction.{i}.conv1.weight")
    return {
        "conv_first": _c(sd, "conv_first"),
        "feature_extraction": _stack([
            {"conv1": _c(sd, f"feature_extraction.{i}.conv1"),
             "conv2": _c(sd, f"feature_extraction.{i}.conv2")}
            for i in range(n_ex)
        ]),
        "conv_l2_1": _c(sd, "conv_l2_1"),
        "conv_l2_2": _c(sd, "conv_l2_2"),
        "conv_l3_1": _c(sd, "conv_l3_1"),
        "conv_l3_2": _c(sd, "conv_l3_2"),
        "pcd": pcd,
        "tsa": {name: _c(sd, f"fusion.{name}") for name in tsa_names},
        "reconstruction": _stack([
            {"conv1": _c(sd, f"reconstruction.{i}.conv1"),
             "conv2": _c(sd, f"reconstruction.{i}.conv2")}
            for i in range(n_re)
        ]),
        "upconv1": _c(sd, "upconv1"),
        "upconv2": _c(sd, "upconv2"),
        "conv_hr": _c(sd, "conv_hr"),
        "conv_last": _c(sd, "conv_last"),
    }


def convert_ecbsr(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr ecbsr_arch.ECBSR: a flat ``backbone`` Sequential of ECB
    blocks (head, trunk, linear tail), each with conv3x3 + k0/b0/k1/b1
    (1x1->3x3) + three edge branches (k0/b0/scale/bias; the fixed mask
    buffer is a constant here).  Use with ``ecbsr_forward`` or collapse via
    ``ecbsr_reparameterize`` for serving."""
    n_total = _count(sd, lambda i: f"backbone.{i}.conv3x3.weight")

    def ecb(i):
        base = f"backbone.{i}"
        p = {"conv3x3": _c(sd, f"{base}.conv3x3")}
        p["c13_k0"] = {"kernel": jnp.asarray(np.transpose(
            sd[f"{base}.conv1x1_3x3.k0"], (2, 3, 1, 0))),
            "bias": jnp.asarray(sd[f"{base}.conv1x1_3x3.b0"])}
        p["c13_k1"] = {"kernel": jnp.asarray(np.transpose(
            sd[f"{base}.conv1x1_3x3.k1"], (2, 3, 1, 0))),
            "bias": jnp.asarray(sd[f"{base}.conv1x1_3x3.b1"])}
        for br, tname in (("sbx", "sbx"), ("sby", "sby"), ("lpl", "lpl")):
            tb = f"{base}.conv1x1_{tname}"
            p[f"{br}_k0"] = {"kernel": jnp.asarray(np.transpose(
                sd[f"{tb}.k0"], (2, 3, 1, 0))),
                "bias": jnp.asarray(sd[f"{tb}.b0"])}
            p[f"{br}_scale"] = jnp.asarray(sd[f"{tb}.scale"].reshape(-1))
            p[f"{br}_bias"] = jnp.asarray(sd[f"{tb}.bias"].reshape(-1))
        if f"{base}.act.weight" in sd:
            p["prelu"] = jnp.asarray(sd[f"{base}.act.weight"])
        return p

    return {
        "head": ecb(0),
        "body": _stack([ecb(i) for i in range(1, n_total - 1)])
        if n_total > 2 else None,
        "tail": ecb(n_total - 1),
    }


def convert_ridnet(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr ridnet_arch.RIDNet: sub/add MeanShift convs, head/tail,
    body.{i} EAMs (merge dilation branches, ResidualBlockNoBN, enhanced
    residual block, channel attention)."""
    n = _count(sd, lambda i: f"body.{i}.merge.dilation1.0.weight")
    body = []
    for i in range(n):
        b = f"body.{i}"
        body.append({
            "merge": {
                "d1a": _c(sd, f"{b}.merge.dilation1.0"),
                "d1b": _c(sd, f"{b}.merge.dilation1.2"),
                "d2a": _c(sd, f"{b}.merge.dilation2.0"),
                "d2b": _c(sd, f"{b}.merge.dilation2.2"),
                "agg": _c(sd, f"{b}.merge.aggregation.0"),
            },
            "block1": {"conv1": _c(sd, f"{b}.block1.conv1"),
                       "conv2": _c(sd, f"{b}.block1.conv2")},
            "block2": {"conv1": _c(sd, f"{b}.block2.body.0"),
                       "conv2": _c(sd, f"{b}.block2.body.2"),
                       "conv3": _c(sd, f"{b}.block2.body.4")},
            "ca": {"down": _c(sd, f"{b}.ca.attention.1"),
                   "up": _c(sd, f"{b}.ca.attention.3")},
        })
    return {
        "sub_mean": _c(sd, "sub_mean"),
        "add_mean": _c(sd, "add_mean"),
        "head": _c(sd, "head"),
        "body": _stack(body),
        "tail": _c(sd, "tail"),
    }


def _bn(sd, name) -> Params:
    return {"scale": jnp.asarray(sd[f"{name}.weight"]),
            "offset": jnp.asarray(sd[f"{name}.bias"]),
            "mean": jnp.asarray(sd[f"{name}.running_mean"]),
            "var": jnp.asarray(sd[f"{name}.running_var"])}


def convert_toflow(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr tof_arch.TOFlow: spynet.basic_module.{i}.basic_module
    Sequential (convs at 0,3,6,9,12; BNs at 1,4,7,10), conv_1..conv_4."""
    mods = []
    for i in range(4):
        base = f"spynet.basic_module.{i}.basic_module"
        layers, bns = [], []
        for j, idx in enumerate((0, 3, 6, 9, 12)):
            w = np.transpose(sd[f"{base}.{idx}.weight"], (2, 3, 1, 0))
            p = {"kernel": jnp.asarray(w)}
            if f"{base}.{idx}.bias" in sd:
                p["bias"] = jnp.asarray(sd[f"{base}.{idx}.bias"])
            if j < 4:
                bns.append(_bn(sd, f"{base}.{idx + 1}"))
            layers.append(p)
        mods.append({"layers": layers, "bns": bns})
    return {
        "spynet": mods,
        "conv_1": _c(sd, "conv_1"),
        "conv_2": _c(sd, "conv_2"),
        "conv_3": _c(sd, "conv_3"),
        "conv_4": _c(sd, "conv_4"),
    }


def _c3(sd, name) -> Params:
    """Conv3d -> {"kernel" [kt,kh,kw,cin,cout], "bias"}."""
    w = np.transpose(sd[f"{name}.weight"], (2, 3, 4, 1, 0))
    return {"kernel": jnp.asarray(w), "bias": jnp.asarray(sd[f"{name}.bias"])}


def convert_duf(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr duf_arch.DUF: dense_block1.dense_blocks.{i} Sequentials
    (BN 0, conv1x1 2, BN 3, conv3x3 5), dense_block2.temporal_reduce{1..3}
    (same layout), heads conv3d_r1/r2/f1/f2."""
    n = _count(sd, lambda i: f"dense_block1.dense_blocks.{i}.2.weight")

    def unit(prefix):
        return {"bn1": _bn(sd, f"{prefix}.0"), "conv1": _c3(sd, f"{prefix}.2"),
                "bn2": _bn(sd, f"{prefix}.3"), "conv2": _c3(sd, f"{prefix}.5")}

    return {
        "conv3d1": _c3(sd, "conv3d1"),
        "dense1": [unit(f"dense_block1.dense_blocks.{i}") for i in range(n)],
        "reduce": [unit(f"dense_block2.temporal_reduce{i}")
                   for i in (1, 2, 3)],
        "bn3d2": _bn(sd, "bn3d2"),
        "conv3d2": _c3(sd, "conv3d2"),
        "conv3d_r1": _c3(sd, "conv3d_r1"),
        "conv3d_r2": _c3(sd, "conv3d_r2"),
        "conv3d_f1": _c3(sd, "conv3d_f1"),
        "conv3d_f2": _c3(sd, "conv3d_f2"),
    }


def convert_basicvsrpp(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr basicvsrpp_arch.BasicVSRPlusPlus (low-res-input variant):
    spynet + feat_extract/reconstruction ConvResidualBlocks + 4 propagation
    branches (deform_align.{name} SecondOrderDeformableAlignment with
    conv_offset.{0,2,4,6}, backbone.{name} trunks)."""
    def trunk(name):
        n = _count(sd, lambda i: f"{name}.main.2.{i}.conv1.weight")
        return {
            "head": _c(sd, f"{name}.main.0"),
            "blocks": _stack([
                {"conv1": _c(sd, f"{name}.main.2.{i}.conv1"),
                 "conv2": _c(sd, f"{name}.main.2.{i}.conv2")}
                for i in range(n)
            ]),
        }

    p: Params = {
        "spynet": convert_spynet(sd, "spynet."),
        "feat_extract": trunk("feat_extract"),
        "reconstruction": trunk("reconstruction"),
        "upconv1": _c(sd, "upconv1"),
        "upconv2": _c(sd, "upconv2"),
        "conv_hr": _c(sd, "conv_hr"),
        "conv_last": _c(sd, "conv_last"),
    }
    for name in ("backward_1", "forward_1", "backward_2", "forward_2"):
        p[f"deform_align_{name}"] = {
            "conv_offset": [
                _c(sd, f"deform_align.{name}.conv_offset.{i}")
                for i in (0, 2, 4, 6)
            ],
            "dcn": _c(sd, f"deform_align.{name}"),
        }
        p[f"backbone_{name}"] = trunk(f"backbone.{name}")
    return p


def convert_stylegan2_generator(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr stylegan2_arch.StyleGAN2Generator: style_mlp.{1..n}
    EqualLinears (index 0 is the parameter-free NormStyleCode),
    constant_input, style_conv1/to_rgb1, style_convs.{i}/to_rgbs.{i}
    (modulated_conv.weight [1,cout,cin,k,k], modulation EqualLinear,
    noise scalar ``weight``, FusedLeakyReLU ``activate.bias``)."""
    def eq_lin(name):
        return {"weight": jnp.asarray(sd[f"{name}.weight"].T),
                "bias": jnp.asarray(sd[f"{name}.bias"])}

    def mod_conv(name):
        w = sd[f"{name}.weight"][0]                  # [cout, cin, k, k]
        return {"weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "modulation": eq_lin(f"{name}.modulation")}

    def style_conv(name):
        return {"conv": mod_conv(f"{name}.modulated_conv"),
                "noise_weight": jnp.asarray(sd[f"{name}.weight"].reshape(())),
                "act_bias": jnp.asarray(sd[f"{name}.activate.bias"])}

    def to_rgb(name):
        return {"conv": mod_conv(f"{name}.modulated_conv"),
                "bias": jnp.asarray(sd[f"{name}.bias"].reshape(-1))}

    n_mlp = _count(sd, lambda i: f"style_mlp.{i + 1}.weight")
    n_rgb = _count(sd, lambda i: f"to_rgbs.{i}.bias")
    return {
        "style_mlp": [eq_lin(f"style_mlp.{i + 1}") for i in range(n_mlp)],
        "constant_input": jnp.asarray(
            np.transpose(sd["constant_input.weight"][0], (1, 2, 0))),
        "style_conv1": style_conv("style_conv1"),
        "to_rgb1": to_rgb("to_rgb1"),
        "style_convs": [style_conv(f"style_convs.{i}")
                        for i in range(2 * n_rgb)],
        "to_rgbs": [to_rgb(f"to_rgbs.{i}") for i in range(n_rgb)],
    }


def convert_stylegan2_discriminator(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr stylegan2_arch.StyleGAN2Discriminator: conv_body.0 head
    ConvLayer, conv_body.{i>=1} ResBlocks (conv1 [conv,act], conv2
    [smooth,conv,act], skip [smooth,conv]), final conv + linears."""
    def eqc(name, act=None):
        p = {"conv": {"weight": jnp.asarray(
            np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0)))}}
        if f"{name}.bias" in sd:
            p["conv"]["bias"] = jnp.asarray(sd[f"{name}.bias"])
        if act is not None and f"{act}.bias" in sd:
            p["act_bias"] = jnp.asarray(sd[f"{act}.bias"])
        return p

    n_blocks = _count(sd, lambda i: f"conv_body.{i + 1}.conv1.0.weight")
    blocks = []
    for i in range(1, n_blocks + 1):
        b = f"conv_body.{i}"
        blocks.append({
            "conv1": eqc(f"{b}.conv1.0", f"{b}.conv1.1"),
            "conv2": eqc(f"{b}.conv2.1", f"{b}.conv2.2"),
            "skip": eqc(f"{b}.skip.1"),
        })
    return {
        "conv_first": eqc("conv_body.0.0", "conv_body.0.1"),
        "blocks": blocks,
        "final_conv": eqc("final_conv.0", "final_conv.1"),
        "final_linear1": {"weight": jnp.asarray(sd["final_linear.0.weight"].T),
                          "bias": jnp.asarray(sd["final_linear.0.bias"])},
        "final_linear2": {"weight": jnp.asarray(sd["final_linear.1.weight"].T),
                          "bias": jnp.asarray(sd["final_linear.1.bias"])},
    }


def _spectral_resolve(sd, name) -> np.ndarray:
    """Collapse torch spectral_norm state (weight_orig, weight_u, weight_v)
    into the normalized weight: W / (u^T W_mat v).  The power iteration is
    a training-time constraint; serving uses the resolved conv."""
    w = sd[f"{name}.weight_orig"]
    u = sd[f"{name}.weight_u"]
    v = sd[f"{name}.weight_v"]
    sigma = float(u @ w.reshape(w.shape[0], -1) @ v)
    return w / sigma


def _c_sn(sd, name) -> Params:
    """Spectral-normed Conv2d -> {"kernel" HWIO, "bias"?}."""
    if f"{name}.weight_orig" in sd:
        w = _spectral_resolve(sd, name)
    else:
        w = sd[f"{name}.weight"]
    out = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if f"{name}.bias" in sd:
        out["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return out


def convert_hifacegan(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr hifacegan_arch.HiFaceGAN (generator): LIP encoder
    Sequential, SPADE resblocks with spectral-normed convs, to_rgbs.3 (the
    only head used at full-phase inference).  The base class's unused
    ``fc`` conv is ignored."""
    def spade(name):
        return {
            "mlp_shared": _c(sd, f"{name}.mlp_shared.0"),
            "mlp_gamma": _c(sd, f"{name}.mlp_gamma"),
            "mlp_beta": _c(sd, f"{name}.mlp_beta"),
        }

    def resblock(name):
        p = {
            "conv_0": _c_sn(sd, f"{name}.conv_0"),
            "conv_1": _c_sn(sd, f"{name}.conv_1"),
            "norm_0": spade(f"{name}.norm_0"),
            "norm_1": spade(f"{name}.norm_1"),
        }
        if f"{name}.conv_s.weight_orig" in sd or f"{name}.conv_s.weight" in sd:
            p["conv_s"] = _c_sn(sd, f"{name}.conv_s")
            p["norm_s"] = spade(f"{name}.norm_s")
        return p

    # LIP encoder Sequential: 0 conv, (1 IN, 2 relu), then per down block
    # [LIP, conv, IN(, relu)] — LIP at 3+4i, conv at 4+4i
    downs = []
    i = 0
    while f"lip_encoder.model.{3 + 4 * i}.logit.0.weight" in sd:
        base = f"lip_encoder.model.{3 + 4 * i}"
        downs.append({
            "lip": {
                "conv": _c(sd, f"{base}.logit.0"),
                "in_scale": jnp.asarray(sd[f"{base}.logit.1.weight"]),
                "in_offset": jnp.asarray(sd[f"{base}.logit.1.bias"]),
            },
            "conv": _c(sd, f"lip_encoder.model.{4 + 4 * i}"),
        })
        i += 1
    n_rgb = _count(sd, lambda i: f"to_rgbs.{i}.weight")
    return {
        "lip_encoder": {"head": _c(sd, "lip_encoder.model.0"),
                        "downs": downs},
        "head_0": resblock("head_0"),
        "g_middle_0": resblock("g_middle_0"),
        "g_middle_1": resblock("g_middle_1"),
        "ups": [resblock(f"ups.{i}") for i in range(4)],
        "to_rgb": _c(sd, f"to_rgbs.{n_rgb - 1}"),
    }


def convert_hifacegan_discriminator(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr hifacegan_arch.HiFaceGANDiscriminator: discriminator_{d}
    PatchGANs — model0 [conv, lrelu], middles [[spectral conv, IN],
    lrelu], final [conv]."""
    ds = []
    d = 0
    while f"discriminator_{d}.model0.0.weight" in sd:
        base = f"discriminator_{d}"
        layers = [{"conv": _c(sd, f"{base}.model0.0")}]
        n = 1
        while f"{base}.model{n}.0.0.weight_orig" in sd \
                or f"{base}.model{n}.0.0.weight" in sd:
            layers.append({"conv": _c_sn(sd, f"{base}.model{n}.0.0"),
                           "in": jnp.zeros((0,), jnp.float32)})
            n += 1
        layers.append({"conv": _c(sd, f"{base}.model{n}.0")})
        ds.append(layers)
        d += 1
    return {"discriminators": ds}


def convert_unet_discriminator(sd: Dict[str, np.ndarray]) -> Params:
    """basicsr discriminator_arch.UNetDiscriminatorSN
    (discriminator_arch.py:91-151): conv1..conv8 keep their raw
    ``weight_orig`` kernel plus the ``weight_u`` power-iteration buffer
    (the spectral constraint stays live for continued training —
    sr_archs.spectral_normalize re-derives v from u); conv0/conv9 are
    plain convs."""
    p = {"conv0": _c(sd, "conv0"), "conv9": _c(sd, "conv9")}
    for i in range(1, 9):
        name = f"conv{i}"
        p[name] = {
            "kernel": jnp.asarray(np.transpose(
                sd[f"{name}.weight_orig"], (2, 3, 1, 0))),
            "u": jnp.asarray(sd[f"{name}.weight_u"]),
        }
    return p


# BasicSR arch type name -> converter (the registry face of this module;
# shared by scripts/train_sr.py and scripts/test_sr.py for
# pretrain_network_g loading)
CONVERTERS = {
    "RRDBNet": convert_rrdbnet,
    "MSRResNet": convert_msrresnet,
    "EDSR": convert_edsr,
    "RCAN": convert_rcan,
    "SRVGGNetCompact": convert_srvgg,
    "SwinIR": convert_swinir,
    "ECBSR": convert_ecbsr,
    "RIDNet": convert_ridnet,
    "SPyNet": convert_spynet,
    "BasicVSR": convert_basicvsr,
    "BasicVSRPlusPlus": convert_basicvsrpp,
    "EDVR": convert_edvr,
    "TOFlow": convert_toflow,
    "DUF": convert_duf,
    "StyleGAN2GeneratorC": convert_stylegan2_generator,
    "StyleGAN2DiscriminatorC": convert_stylegan2_discriminator,
    "HiFaceGAN": convert_hifacegan,
    "HiFaceGANDiscriminator": convert_hifacegan_discriminator,
    "UNetDiscriminatorSN": convert_unet_discriminator,
}


def convert_for_arch(arch_type: str, path: str):
    """Load + convert a torch checkpoint for a registry arch name."""
    if arch_type not in CONVERTERS:
        raise KeyError(f"no torch converter for arch {arch_type!r}; "
                       f"available: {sorted(CONVERTERS)}")
    return CONVERTERS[arch_type](load_state_dict(path))
