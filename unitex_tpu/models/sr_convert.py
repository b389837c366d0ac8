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
