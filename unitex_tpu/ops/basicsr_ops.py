"""BasicSR's native CUDA ops re-expressed in jnp.

The vendored BasicSR ships three CUDA extensions
(/root/reference/TSD_SR/basicsr/ops/*/src, ~2,240 LoC): ``upfirdn2d``
(StyleGAN2's upsample-FIR-downsample), ``fused_act`` (fused bias +
LeakyReLU with the √2 gain), and ``dcn`` (modulated deformable
convolution v2).  All three are expressible as vectorized XLA ops — pad /
strided conv for upfirdn2d, one fused elementwise for fused_act, and a
bilinear-gather contraction for DCN — so no custom kernels are needed on
TPU; XLA fuses them.

Layout: channel-last [N, H, W, C] everywhere (TPU-native conv layout).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """StyleGAN2 upfirdn: zero-upsample by ``up``, FIR filter, downsample by
    ``down``.  x [N, H, W, C], kernel [kh, kw] -> [N, H', W', C] with
    H' = (H*up + pad0 + pad1 - kh)//down + 1."""
    N, H, W, C = x.shape
    kh, kw = kernel.shape
    p0, p1 = pad

    if up > 1:
        z = jnp.zeros((N, H, up, W, up, C), x.dtype)
        z = z.at[:, :, 0, :, 0, :].set(x)
        x = z.reshape(N, H * up, W * up, C)
    x = jnp.pad(
        x,
        ((0, 0), (max(p0, 0), max(p1, 0)), (max(p0, 0), max(p1, 0)), (0, 0)),
    )
    if p0 < 0 or p1 < 0:
        x = x[
            :,
            max(-p0, 0) : x.shape[1] - max(-p1, 0),
            max(-p0, 0) : x.shape[2] - max(-p1, 0),
        ]
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    kfull = jnp.tile(k[:, :, None, None], (1, 1, 1, C))
    out = jax.lax.conv_general_dilated(
        x, kfull, (down, down), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return out


def make_resample_kernel(k) -> jnp.ndarray:
    """1D/2D FIR kernel, normalized (basicsr upfirdn2d helper)."""
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return jnp.asarray(k / k.sum())


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = 2**0.5,
) -> jnp.ndarray:
    """fused_bias_act: LeakyReLU(x + b) * √2 (ops/fused_act)."""
    if bias is not None:
        x = x + bias
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """Modulated deformable convolution v2 (ops/dcn, 1.7k LoC CUDA) as a
    bilinear-gather + contraction.

    x [N, H, W, Cin]; offset [N, Ho, Wo, G*2*kh*kw] as per-group (dy, dx)
    pairs; weight [kh, kw, Cin, Cout]; mask [N, Ho, Wo, G*kh*kw]
    (sigmoid-activated modulation) -> [N, Ho, Wo, Cout].  With
    ``deformable_groups`` G > 1 each Cin/G channel slab samples at its own
    offsets (EDVR's PCD alignment uses G=8, edvr_arch.py).
    """
    N, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    G = deformable_groups
    Ho = (H + 2 * padding - kh) // stride + 1
    Wo = (W + 2 * padding - kw) // stride + 1

    base_y = jnp.arange(Ho) * stride - padding
    base_x = jnp.arange(Wo) * stride - padding
    ky = jnp.arange(kh)
    kx = jnp.arange(kw)
    # sample positions [Ho, Wo, kh, kw]
    gy = base_y[:, None, None, None] + ky[None, None, :, None]
    gx = base_x[None, :, None, None] + kx[None, None, None, :]

    off = offset.reshape(N, Ho, Wo, G, kh, kw, 2)
    msk = None if mask is None else mask.reshape(N, Ho, Wo, G, kh, kw, 1)
    outs = []
    cg = Cin // G
    for g in range(G):
        py = gy[None] + off[..., g, :, :, 0]
        px = gx[None] + off[..., g, :, :, 1]
        xg = x[..., g * cg : (g + 1) * cg]

        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        wy = py - y0
        wx = px - x0
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)

        def fetch(yi, xi):
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            batch = jnp.arange(N)[:, None, None, None, None]
            val = xg[batch, yc, xc]                  # [N,Ho,Wo,kh,kw,cg]
            inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))[..., None]
            return jnp.where(inb, val, 0.0)

        samp = (
            fetch(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
            + fetch(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
            + fetch(y0 + 1, x0) * (wy * (1 - wx))[..., None]
            + fetch(y0 + 1, x0 + 1) * (wy * wx)[..., None]
        )
        if msk is not None:
            samp = samp * msk[:, :, :, g]
        outs.append(
            jnp.einsum(
                "nhwijc,ijco->nhwo", samp, weight[:, :, g * cg : (g + 1) * cg]
            )
        )
    out = sum(outs)
    if bias is not None:
        out = out + bias
    return out
