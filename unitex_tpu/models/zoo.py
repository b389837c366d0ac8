"""Arch registry: BasicSR yml ``type`` names -> our (cfg, init, forward)
bundles (basicsr/utils/registry.py ARCH_REGISTRY + archs/__init__.py
build_network; the reference instantiates ``opt['network_g']`` by class
name with the remaining keys as kwargs).

Forward signature is uniform: ``forward(params, x)`` on a batch —
single-image archs take [N,H,W,C]; video archs take [N,T,h,w,C]
(vmapped over the per-sample forwards).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax

from . import sr_archs as sa
from . import swinir as sw
from . import video_sr as vs


class ArchBundle(NamedTuple):
    cfg: Any
    init: Callable[[jax.Array], Any]
    forward: Callable[[Any, Any], Any]


def _simple(cfg_cls, init_fn, fwd_fn, remap: Dict[str, str]):
    def build(kwargs: Dict[str, Any]) -> ArchBundle:
        mapped = {}
        for k, v in kwargs.items():
            if k in remap:
                k = remap[k]
            if k is None:
                continue
            mapped[k] = tuple(v) if isinstance(v, list) else v
        known = {f.name for f in
                 __import__("dataclasses").fields(cfg_cls)}
        unknown = set(mapped) - known
        if unknown:
            raise ValueError(
                f"{cfg_cls.__name__}: unsupported options {sorted(unknown)}")
        cfg = cfg_cls(**mapped)
        return ArchBundle(cfg, lambda key: init_fn(key, cfg),
                          lambda p, x: fwd_fn(p, cfg, x))
    return build


def _build_swinir(kwargs: Dict[str, Any]) -> ArchBundle:
    kw = dict(kwargs)
    for drop in ("img_size", "upsampler", "resi_connection", "patch_size",
                 "use_checkpoint", "ape", "patch_norm", "qkv_bias",
                 "qk_scale", "drop_rate", "attn_drop_rate", "drop_path_rate"):
        kw.pop(drop, None)
    heads = kw.pop("num_heads", 6)
    if isinstance(heads, (list, tuple)):
        if len(set(heads)) != 1:
            raise ValueError("per-stage head counts must be uniform")
        heads = heads[0]
    cfg = sw.SwinIRConfig(
        in_channels=kw.pop("in_chans", 3),
        embed_dim=kw.pop("embed_dim", 96),
        depths=tuple(kw.pop("depths", (6, 6, 6, 6))),
        num_heads=heads,
        window_size=kw.pop("window_size", 8),
        mlp_ratio=float(kw.pop("mlp_ratio", 4.0)),
        scale=kw.pop("upscale", 4),
        img_range=float(kw.pop("img_range", 1.0)),
    )
    if kw:
        raise ValueError(f"SwinIR: unsupported options {sorted(kw)}")
    return ArchBundle(cfg, lambda key: sw.init_swinir_params(key, cfg),
                      lambda p, x: sw.swinir_forward(p, cfg, x))


def _vmapped(build):
    def wrap(kwargs):
        b = build(kwargs)
        return ArchBundle(
            b.cfg, b.init,
            lambda p, x: jax.vmap(lambda s: b.forward(p, s))(x))
    return wrap


def _build_spynet(kwargs: Dict[str, Any]) -> ArchBundle:
    kwargs = {k: v for k, v in kwargs.items() if k != "load_path"}
    if kwargs:
        raise ValueError(f"SPyNet: unsupported options {sorted(kwargs)}")
    return ArchBundle(
        None, lambda key: vs.init_spynet_params(key),
        lambda p, pair: vs.spynet_flow(p, pair[0], pair[1]))


def _build_hifacegan(kwargs: Dict[str, Any]) -> ArchBundle:
    from . import hifacegan as hf
    kw = {k: v for k, v in kwargs.items() if k in
          ("num_in_ch", "num_feat", "num_d", "n_layers_d")}
    cfg = hf.HiFaceGANConfig(**kw)
    return ArchBundle(cfg, lambda key: hf.init_hifacegan_params(key, cfg),
                      lambda p, x: hf.hifacegan_generator(p, cfg, x))


def _build_hifacegan_d(kwargs: Dict[str, Any]) -> ArchBundle:
    from . import hifacegan as hf
    kw = {k: v for k, v in kwargs.items() if k in
          ("num_in_ch", "num_feat", "num_d", "n_layers_d")}
    cfg = hf.HiFaceGANConfig(**kw)
    conditional = bool(kwargs.get("conditional", True))
    return ArchBundle(
        cfg,
        lambda key: hf.init_hifacegan_discriminator_params(
            key, cfg, conditional=conditional),
        lambda p, x: hf.hifacegan_discriminator(p, cfg, x))


def _stylegan2_cfg(kwargs: Dict[str, Any]):
    from . import stylegan2 as sg
    kw = {k: v for k, v in kwargs.items() if k in
          ("out_size", "num_style_feat", "num_mlp", "channel_multiplier",
           "narrow", "lr_mlp", "stddev_group")}
    rk = kwargs.get("resample_kernel")
    if rk is not None:
        kw["resample_kernel"] = tuple(rk)
    return sg.StyleGAN2Config(**kw)


def _build_stylegan2_g(kwargs: Dict[str, Any]) -> ArchBundle:
    from . import stylegan2 as sg
    cfg = _stylegan2_cfg(kwargs)
    return ArchBundle(
        cfg,
        lambda key: sg.init_stylegan2_generator_params(key, cfg),
        # z [B, num_style_feat] -> image (zero-noise deterministic form;
        # training samples noise/mixing through training/stylegan2)
        lambda p, z: sg.stylegan2_generator(p, cfg, [z]))


def _build_stylegan2_d(kwargs: Dict[str, Any]) -> ArchBundle:
    from . import stylegan2 as sg
    cfg = _stylegan2_cfg(kwargs)
    return ArchBundle(
        cfg,
        lambda key: sg.init_stylegan2_discriminator_params(key, cfg),
        lambda p, x: sg.stylegan2_discriminator(p, cfg, x))


_IN_OUT = {"num_in_ch": "in_channels", "num_out_ch": "out_channels"}

ARCH_REGISTRY: Dict[str, Callable[[Dict[str, Any]], ArchBundle]] = {
    "RRDBNet": _simple(sa.RRDBConfig, sa.init_rrdbnet_params,
                       sa.rrdbnet_forward, dict(_IN_OUT, upscale="scale")),
    "MSRResNet": _simple(sa.MSRResNetConfig, sa.init_msrresnet_params,
                         sa.msrresnet_forward,
                         dict(_IN_OUT, upscale="scale")),
    "EDSR": _simple(sa.EDSRConfig, sa.init_edsr_params, sa.edsr_forward,
                    dict(_IN_OUT, upscale="scale")),
    "RCAN": _simple(sa.RCANConfig, sa.init_rcan_params, sa.rcan_forward,
                    dict(_IN_OUT, upscale="scale")),
    "SRVGGNetCompact": _simple(
        sa.SRVGGConfig, sa.init_srvgg_params, sa.srvgg_forward,
        dict(_IN_OUT, upscale="scale", act_type=None)),
    "ECBSR": _simple(sa.ECBSRConfig, sa.init_ecbsr_params,
                     sa.ecbsr_forward, {}),
    "RIDNet": _simple(sa.RIDNetConfig, sa.init_ridnet_params,
                      sa.ridnet_forward,
                      {"in_ch": "in_channels", "out_ch": "out_channels",
                       "mid_ch": "mid_channels"}),
    "SwinIR": _build_swinir,
    "VGGStyleDiscriminator": _simple(
        sa.VGGDiscriminatorConfig, sa.init_vgg_discriminator_params,
        sa.vgg_discriminator_forward,
        {"num_in_ch": "in_channels"}),
    "UNetDiscriminatorSN": _simple(
        sa.UNetDiscriminatorConfig, sa.init_unet_discriminator_params,
        sa.unet_discriminator_forward, {"num_in_ch": "in_channels"}),
    "EDVR": _vmapped(_simple(
        vs.EDVRConfig, vs.init_edvr_params, vs.edvr_forward,
        {"num_in_ch": None, "num_out_ch": None, "center_frame_idx": None,
         "hr_in": None, "with_predeblur": None, "with_tsa": None})),
    "BasicVSR": _vmapped(_simple(
        vs.BasicVSRConfig, vs.init_basicvsr_params, vs.basicvsr_forward,
        {"spynet_path": None})),
    "BasicVSRPlusPlus": _vmapped(_simple(
        vs.BasicVSRPPConfig, vs.init_basicvsrpp_params,
        vs.basicvsrpp_forward,
        {"spynet_path": None, "cpu_cache_length": None,
         "is_low_res_input": None})),
    "DUF": _vmapped(_simple(vs.DUFConfig, vs.init_duf_params,
                            vs.duf_forward, {})),
    "SPyNet": _build_spynet,
    "HiFaceGAN": _build_hifacegan,
    "SPADEGenerator": _build_hifacegan,
    "HiFaceGANDiscriminator": _build_hifacegan_d,
    "StyleGAN2GeneratorC": _build_stylegan2_g,
    "StyleGAN2DiscriminatorC": _build_stylegan2_d,
}


def build_arch(opt: Dict[str, Any]) -> ArchBundle:
    """opt = {'type': <BasicSR arch name>, **kwargs}
    (archs/__init__.py build_network)."""
    opt = dict(opt)
    name = opt.pop("type")
    if name not in ARCH_REGISTRY:
        raise KeyError(
            f"arch {name!r} not in registry; available: "
            f"{sorted(ARCH_REGISTRY)}")
    return ARCH_REGISTRY[name](opt)
