"""JAX BiRefNet (RMBG-2.0 matting tower) vs an independent torch mirror.

The torch model below is written from the published BiRefNet architecture
(ZhengPeng7/BiRefNet, bundled with the briaai/RMBG-2.0 checkpoint): swin-v1
backbone run at two scales, context-concatenated squeeze, deformable-ASPP
decoder blocks with gdt attention and split image-pyramid-token decoration
— with the upstream state_dict naming, so the parity assert exercises both
the forward numerics and convert_birefnet_torch's key mapping + BatchNorm
folding (the test_isnet.py / test_text_jax.py pattern).  deform_conv2d is
implemented in plain torch (torchvision is absent) with torchvision's
sampling semantics: bilinear taps, zeros outside, modulator mask."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from unitex_tpu.models.birefnet import (  # noqa: E402
    BiRefNetConfig,
    BirefnetRemover,
    convert_birefnet_torch,
    init_birefnet_params,
    birefnet_forward,
)


def deform_conv2d_ref(x, offset, mask, weight, bias, padding):
    """torchvision.ops.deform_conv2d semantics (stride 1, dilation 1,
    one offset group), pure torch."""
    B, C, H, W = x.shape
    O, _, kh, kw = weight.shape
    K = kh * kw
    offset = offset.view(B, K, 2, H, W)
    out = torch.zeros(B, O, H, W, dtype=x.dtype)
    ys = torch.arange(H, dtype=x.dtype).view(1, H, 1)
    xs = torch.arange(W, dtype=x.dtype).view(1, 1, W)
    for k in range(K):
        i, j = divmod(k, kw)
        py = ys + (i - padding) + offset[:, k, 0]
        px = xs + (j - padding) + offset[:, k, 1]
        y0 = torch.floor(py)
        x0 = torch.floor(px)
        wy = py - y0
        wx = px - x0
        val = torch.zeros(B, C, H, W, dtype=x.dtype)
        for oy, wyy in ((y0, 1 - wy), (y0 + 1, wy)):
            for ox, wxx in ((x0, 1 - wx), (x0 + 1, wx)):
                iy = oy.long().clamp(0, H - 1)
                ix = ox.long().clamp(0, W - 1)
                inside = (
                    (oy >= 0) & (oy <= H - 1) & (ox >= 0) & (ox <= W - 1)
                ).to(x.dtype)
                g = x[
                    torch.arange(B).view(B, 1, 1, 1),
                    torch.arange(C).view(1, C, 1, 1),
                    iy.unsqueeze(1),
                    ix.unsqueeze(1),
                ]
                val = val + g * (wyy * wxx * inside).unsqueeze(1)
        val = val * mask[:, k].unsqueeze(1)
        out = out + torch.einsum("bchw,oc->bohw", val, weight[:, :, i, j])
    if bias is not None:
        out = out + bias.view(1, O, 1, 1)
    return out


class DeformableConv2d(nn.Module):
    def __init__(self, cin, cout, kernel_size=3, padding=1):
        super().__init__()
        k = kernel_size
        self.padding = padding
        self.offset_conv = nn.Conv2d(cin, 2 * k * k, k, 1, padding)
        self.modulator_conv = nn.Conv2d(cin, k * k, k, 1, padding)
        self.regular_conv = nn.Conv2d(cin, cout, k, 1, padding, bias=False)

    def forward(self, x):
        offset = self.offset_conv(x)
        modulator = 2.0 * torch.sigmoid(self.modulator_conv(x))
        return deform_conv2d_ref(
            x, offset, modulator, self.regular_conv.weight, None, self.padding
        )


class _ASPPModuleDeformable(nn.Module):
    def __init__(self, cin, planes, kernel_size, padding):
        super().__init__()
        self.atrous_conv = DeformableConv2d(cin, planes, kernel_size, padding)
        self.bn = nn.BatchNorm2d(planes)

    def forward(self, x):
        return F.relu(self.bn(self.atrous_conv(x)))


class ASPPDeformable(nn.Module):
    def __init__(self, cin, cfg: BiRefNetConfig):
        super().__init__()
        ic = cfg.aspp_inter
        self.aspp1 = _ASPPModuleDeformable(cin, ic, 1, 0)
        self.aspp_deforms = nn.ModuleList(
            [
                _ASPPModuleDeformable(cin, ic, k, k // 2)
                for k in cfg.aspp_kernels
            ]
        )
        self.global_avg_pool = nn.Sequential(
            nn.AdaptiveAvgPool2d((1, 1)),
            nn.Conv2d(cin, ic, 1, bias=False),
            nn.BatchNorm2d(ic),
            nn.ReLU(inplace=True),
        )
        self.conv1 = nn.Conv2d(ic * (2 + len(cfg.aspp_kernels)), cin, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cin)

    def forward(self, x):
        xs = [self.aspp1(x)] + [m(x) for m in self.aspp_deforms]
        g = self.global_avg_pool(x)
        xs.append(
            F.interpolate(g, size=xs[0].shape[2:], mode="bilinear", align_corners=True)
        )
        return F.relu(self.bn1(self.conv1(torch.cat(xs, dim=1))))


class BasicDecBlk(nn.Module):
    def __init__(self, cin, cout, cfg: BiRefNetConfig):
        super().__init__()
        ic = cfg.dec_inter
        self.conv_in = nn.Conv2d(cin, ic, 3, 1, 1)
        self.bn_in = nn.BatchNorm2d(ic)
        self.dec_att = ASPPDeformable(ic, cfg)
        self.conv_out = nn.Conv2d(ic, cout, 3, 1, 1)
        self.bn_out = nn.BatchNorm2d(cout)

    def forward(self, x):
        x = F.relu(self.bn_in(self.conv_in(x)))
        x = self.dec_att(x)
        return self.bn_out(self.conv_out(x))


class BasicLatBlk(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 1, 1, 0)

    def forward(self, x):
        return self.conv(x)


class SimpleConvs(nn.Module):
    def __init__(self, cin, cout, inter=64):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, inter, 3, 1, 1)
        self.conv_out = nn.Conv2d(inter, cout, 3, 1, 1)

    def forward(self, x):
        return self.conv_out(self.conv1(x))


# ------------------------------------------------------------ swin backbone


class WindowAttention(nn.Module):
    def __init__(self, dim, window, nh):
        super().__init__()
        self.dim, self.window, self.nh = dim, window, nh
        self.scale = (dim // nh) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window - 1) ** 2, nh)
        )
        coords = torch.stack(
            torch.meshgrid(
                torch.arange(window), torch.arange(window), indexing="ij"
            )
        ).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0) + (window - 1)
        self.register_buffer(
            "relative_position_index",
            rel[..., 0] * (2 * window - 1) + rel[..., 1],
        )
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask):
        B_, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B_, N, 3, self.nh, C // self.nh)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(N, N, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.nh, N, N) + mask.unsqueeze(
                1
            ).unsqueeze(0)
            attn = attn.view(-1, self.nh, N, N)
        attn = attn.softmax(dim=-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B_, N, C))


def window_partition(x, w):
    B, H, W, C = x.shape
    x = x.view(B, H // w, w, W // w, w, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w, w, C)


def window_reverse(windows, w, H, W):
    B = windows.shape[0] // (H * W // w // w)
    x = windows.view(B, H // w, W // w, w, w, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class SwinBlock(nn.Module):
    def __init__(self, dim, nh, window, shift, mlp_ratio):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, window, nh)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x, H, W):
        B, L, C = x.shape
        w = self.window
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        pb, pr = (-H) % w, (-W) % w
        x = F.pad(x, (0, 0, 0, pr, 0, pb))
        Hp, Wp = H + pb, W + pr
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            img = torch.zeros(1, Hp, Wp, 1)
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -self.shift), slice(-self.shift, None)):
                for ws in (slice(0, -w), slice(-w, -self.shift), slice(-self.shift, None)):
                    img[:, hs, ws] = cnt
                    cnt += 1
            mw = window_partition(img, w).view(-1, w * w)
            mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)
        else:
            mask = None
        xw = window_partition(x, w).view(-1, w * w, C)
        xw = self.attn(xw, mask)
        x = window_reverse(xw, w, Hp, Wp)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = x[:, :H, :W].reshape(B, L, C)
        x = shortcut + x
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class PatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, H, W):
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1).view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class SwinBackbone(nn.Module):
    def __init__(self, cfg: BiRefNetConfig):
        super().__init__()
        self.cfg = cfg
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, cfg.embed_dim, 4, 4)
        self.patch_embed.norm = nn.LayerNorm(cfg.embed_dim)
        self.layers = nn.ModuleList()
        for i, depth in enumerate(cfg.depths):
            dim = cfg.stage_channels[i]
            layer = nn.Module()
            layer.blocks = nn.ModuleList(
                [
                    SwinBlock(
                        dim,
                        cfg.num_heads[i],
                        cfg.window,
                        0 if j % 2 == 0 else cfg.window // 2,
                        cfg.mlp_ratio,
                    )
                    for j in range(depth)
                ]
            )
            layer.downsample = (
                PatchMerging(dim) if i < len(cfg.depths) - 1 else None
            )
            self.layers.append(layer)
        for i, c in enumerate(cfg.stage_channels):
            setattr(self, f"norm{i}", nn.LayerNorm(c))

    def forward(self, x):
        x = self.patch_embed.proj(x)
        _, _, H, W = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        outs = []
        for i, layer in enumerate(self.layers):
            for blk in layer.blocks:
                x = blk(x, H, W)
            xo = getattr(self, f"norm{i}")(x)
            outs.append(
                xo.view(-1, H, W, self.cfg.stage_channels[i]).permute(0, 3, 1, 2)
            )
            if layer.downsample is not None:
                x = layer.downsample(x, H, W)
                H, W = (H + 1) // 2, (W + 1) // 2
        return outs


# ------------------------------------------------------------- birefnet top


def _interp(x, size):
    return F.interpolate(x, size=size, mode="bilinear", align_corners=True)


class TorchBiRefNet(nn.Module):
    def __init__(self, cfg: BiRefNetConfig):
        super().__init__()
        self.cfg = cfg
        self.bb = SwinBackbone(cfg)
        ch = cfg.channels
        self.squeeze_module = nn.Sequential(
            BasicDecBlk(ch[0] + sum(cfg.cxt), ch[0], cfg)
        )
        self.decoder = TorchDecoder(cfg)

    def forward(self, x):
        B, C, H, W = x.shape
        f_full = self.bb(x)
        f_half = self.bb(_interp(x, (H // 2, W // 2)))
        x1, x2, x3, x4 = [
            torch.cat([f, _interp(g, f.shape[2:])], 1)
            for f, g in zip(f_full, f_half)
        ]
        if self.cfg.cxt_num:
            x4 = torch.cat(
                [
                    _interp(x1, x4.shape[2:]),
                    _interp(x2, x4.shape[2:]),
                    _interp(x3, x4.shape[2:]),
                ][-self.cfg.cxt_num :]
                + [x4],
                1,
            )
        x4 = self.squeeze_module(x4)
        return self.decoder([x, x1, x2, x3, x4])


class TorchDecoder(nn.Module):
    def __init__(self, cfg: BiRefNetConfig):
        super().__init__()
        self.cfg = cfg
        ch = cfg.channels
        io = cfg.ipt_out
        ipt_in = (3 * 32 * 32, 3 * 16 * 16, 3 * 8 * 8, 3 * 4 * 4, 3)
        self.ipt_blk5 = SimpleConvs(ipt_in[0], io[0])
        self.ipt_blk4 = SimpleConvs(ipt_in[1], io[1])
        self.ipt_blk3 = SimpleConvs(ipt_in[2], io[2])
        self.ipt_blk2 = SimpleConvs(ipt_in[3], io[3])
        self.ipt_blk1 = SimpleConvs(ipt_in[4], io[4])
        self.decoder_block4 = BasicDecBlk(ch[0] + io[0], ch[1], cfg)
        self.decoder_block3 = BasicDecBlk(ch[1] + io[1], ch[2], cfg)
        self.decoder_block2 = BasicDecBlk(ch[2] + io[2], ch[3], cfg)
        self.decoder_block1 = BasicDecBlk(ch[3] + io[3], ch[3] // 2, cfg)
        self.conv_out1 = nn.Sequential(nn.Conv2d(ch[3] // 2 + io[4], 1, 1))
        self.lateral_block4 = BasicLatBlk(ch[1], ch[1])
        self.lateral_block3 = BasicLatBlk(ch[2], ch[2])
        self.lateral_block2 = BasicLatBlk(ch[3], ch[3])
        N = cfg.gdt_channels
        for lvl, c in ((4, ch[1]), (3, ch[2]), (2, ch[3])):
            setattr(
                self,
                f"gdt_convs_{lvl}",
                nn.Sequential(
                    nn.Conv2d(c, N, 3, 1, 1),
                    nn.BatchNorm2d(N),
                    nn.ReLU(inplace=True),
                ),
            )
            setattr(
                self, f"gdt_convs_attn_{lvl}", nn.Sequential(nn.Conv2d(N, 1, 1))
            )

    def get_patches_batch(self, x, p):
        _size_h, _size_w = p.shape[2:]
        patches_batch = []
        for idx in range(x.shape[0]):
            columns_x = torch.split(x[idx], split_size_or_sections=_size_w, dim=-1)
            patches_x = []
            for column_x in columns_x:
                patches_x += [
                    q.unsqueeze(0)
                    for q in torch.split(
                        column_x, split_size_or_sections=_size_h, dim=-2
                    )
                ]
            patches_batch.append(torch.cat(patches_x, dim=1))
        return torch.cat(patches_batch, dim=0)

    def forward(self, features):
        x, x1, x2, x3, x4 = features

        def gdt(lvl, p):
            g = getattr(self, f"gdt_convs_{lvl}")(p)
            return p * getattr(self, f"gdt_convs_attn_{lvl}")(g).sigmoid()

        pb = self.get_patches_batch(x, x4)
        x4 = torch.cat((x4, self.ipt_blk5(_interp(pb, x4.shape[2:]))), 1)
        p4 = gdt(4, self.decoder_block4(x4))
        _p3 = _interp(p4, x3.shape[2:]) + self.lateral_block4(x3)
        pb = self.get_patches_batch(x, _p3)
        _p3 = torch.cat((_p3, self.ipt_blk4(_interp(pb, x3.shape[2:]))), 1)
        p3 = gdt(3, self.decoder_block3(_p3))
        _p2 = _interp(p3, x2.shape[2:]) + self.lateral_block3(x2)
        pb = self.get_patches_batch(x, _p2)
        _p2 = torch.cat((_p2, self.ipt_blk3(_interp(pb, x2.shape[2:]))), 1)
        p2 = gdt(2, self.decoder_block2(_p2))
        _p1 = _interp(p2, x1.shape[2:]) + self.lateral_block2(x1)
        pb = self.get_patches_batch(x, _p1)
        _p1 = torch.cat((_p1, self.ipt_blk2(_interp(pb, x1.shape[2:]))), 1)
        _p1 = _interp(self.decoder_block1(_p1), x.shape[2:])
        pb = self.get_patches_batch(x, _p1)
        _p1 = torch.cat((_p1, self.ipt_blk1(_interp(pb, x.shape[2:]))), 1)
        return self.conv_out1(_p1)


def _randomize(model, g):
    """Non-degenerate BN statistics + nonzero offset/modulator convs so
    the parity covers BN folding AND the deformable resampling path."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.3, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.normal_(1.0, 0.2, generator=g)
                m.bias.normal_(0.0, 0.2, generator=g)
        if isinstance(m, DeformableConv2d):
            with torch.no_grad():
                m.offset_conv.weight.normal_(0.0, 0.05, generator=g)
                m.offset_conv.bias.normal_(0.0, 0.3, generator=g)
                m.modulator_conv.weight.normal_(0.0, 0.05, generator=g)
                m.modulator_conv.bias.normal_(0.0, 0.3, generator=g)


class TestBirefnetParity:
    def test_forward_matches_torch(self):
        cfg = BiRefNetConfig.tiny()
        tm = TorchBiRefNet(cfg).eval()
        g = torch.Generator().manual_seed(0)
        _randomize(tm, g)
        params = convert_birefnet_torch(tm.state_dict(), cfg)
        x = torch.randn(1, 3, cfg.size, cfg.size, generator=g)
        with torch.no_grad():
            ref = tm(x).numpy()[0, 0]
        got = birefnet_forward(
            params, cfg, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        )
        got = np.asarray(got)[0, ..., 0]
        scale = max(np.abs(ref).max(), 1e-6)
        assert np.abs(got - ref).max() / scale < 2e-3, (
            np.abs(got - ref).max(),
            scale,
        )

    def test_init_forward_shapes(self):
        cfg = BiRefNetConfig.tiny()
        params = init_birefnet_params(jax.random.key(0), cfg)
        x = jnp.zeros((1, cfg.size, cfg.size, 3))
        out = birefnet_forward(params, cfg, x)
        assert out.shape == (1, cfg.size, cfg.size, 1)

    def test_full_config_param_shapes(self):
        cfg = BiRefNetConfig.rmbg20()
        assert cfg.channels == (3072, 1536, 768, 384)
        assert cfg.cxt == (384, 768, 1536)
        assert cfg.ipt_out == (384, 384, 192, 96, 48)


class TestBirefnetLoad:
    def test_safetensors_roundtrip(self, tmp_path):
        from safetensors.numpy import save_file

        cfg = BiRefNetConfig.tiny()
        tm = TorchBiRefNet(cfg).eval()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        path = str(tmp_path / "model.safetensors")
        save_file(sd, path)
        from unitex_tpu.models.birefnet import load_birefnet

        params, _ = load_birefnet(path, cfg)
        out = birefnet_forward(
            params, cfg, jnp.zeros((1, cfg.size, cfg.size, 3))
        )
        assert out.shape == (1, cfg.size, cfg.size, 1)
        assert bool(jnp.isfinite(out).all())


class TestBirefnetRemover:
    def test_matte_roundtrip(self):
        from PIL import Image

        cfg = BiRefNetConfig.tiny()
        params = init_birefnet_params(jax.random.key(0), cfg)
        rem = BirefnetRemover(params, cfg)
        img = Image.fromarray(
            (np.random.default_rng(0).random((48, 40, 3)) * 255).astype(
                np.uint8
            )
        )
        matte = rem(img)
        assert matte.mode == "L" and matte.size == img.size
