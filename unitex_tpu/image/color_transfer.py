"""Color transfer + small mask utilities.

Equivalents of the reference's image toolkit odds and ends:
``color_transfer_ot`` (optimal-transport color matching,
/root/reference/TextureTools/texturetools/image/color_transfer_ot.py) via
the closed-form linear Monge–Kantorovich map between gaussian color
distributions, plus per-channel sorted-quantile (exact 1D OT) transfer; and
``masks_to_boxes`` (image/utils.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def color_transfer_mk(
    source: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Linear Monge–Kantorovich transfer: recolor ``source`` [., 3] (or
    [H, W, 3]) so its mean/covariance match ``target``'s.

    T = Σs^{-1/2} (Σs^{1/2} Σt Σs^{1/2})^{1/2} Σs^{-1/2} — the closed-form
    OT map between gaussians."""
    s = source.reshape(-1, source.shape[-1]).astype(jnp.float32)
    t = target.reshape(-1, target.shape[-1]).astype(jnp.float32)
    mu_s = s.mean(axis=0)
    mu_t = t.mean(axis=0)
    cs = jnp.cov(s.T) + eps * jnp.eye(s.shape[-1])
    ct = jnp.cov(t.T) + eps * jnp.eye(t.shape[-1])

    def sqrtm(m):
        w, v = jnp.linalg.eigh(m)
        return (v * jnp.sqrt(jnp.clip(w, eps, None))) @ v.T

    def inv_sqrtm(m):
        w, v = jnp.linalg.eigh(m)
        return (v / jnp.sqrt(jnp.clip(w, eps, None))) @ v.T

    cs_h = sqrtm(cs)
    cs_ih = inv_sqrtm(cs)
    T = cs_ih @ sqrtm(cs_h @ ct @ cs_h) @ cs_ih
    out = (s - mu_s) @ T.T + mu_t
    return out.reshape(source.shape)


def color_transfer_quantile(source: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Exact per-channel 1D OT (sorted-quantile matching), host-side numpy."""
    s = source.reshape(-1, source.shape[-1])
    t = target.reshape(-1, target.shape[-1])
    out = np.empty_like(s)
    for c in range(s.shape[-1]):
        order = np.argsort(s[:, c], kind="stable")
        ranks = np.empty_like(order)
        ranks[order] = np.arange(len(order))
        t_sorted = np.sort(t[:, c])
        idx = (ranks.astype(np.float64) / max(len(s) - 1, 1) * (len(t) - 1)).astype(
            np.int64
        )
        out[:, c] = t_sorted[idx]
    return out.reshape(source.shape)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W] bool -> [N, 4] (x1, y1, x2, y2) inclusive boxes; empty
    masks give zeros (torchvision masks_to_boxes semantics)."""
    N, H, W = masks.shape
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    big = jnp.int32(1 << 30)
    any_mask = masks.any(axis=(1, 2))
    x1 = jnp.min(jnp.where(masks, xs, big), axis=(1, 2))
    y1 = jnp.min(jnp.where(masks, ys, big), axis=(1, 2))
    x2 = jnp.max(jnp.where(masks, xs, -1), axis=(1, 2))
    y2 = jnp.max(jnp.where(masks, ys, -1), axis=(1, 2))
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1).astype(jnp.float32)
    return jnp.where(any_mask[:, None], boxes, 0.0)
