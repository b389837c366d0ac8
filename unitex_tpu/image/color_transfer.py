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


def bilateral_filter(
    img: jnp.ndarray,
    sigma_v: float = 5.0,
    sigma_xy: float = 16.0,
    radius: int | None = None,
) -> jnp.ndarray:
    """Edge-preserving bilateral filter of [H, W, C]: gaussian in space
    (``sigma_xy``) times gaussian in color distance (``sigma_v``), reflect
    borders.  Window offsets ride one ``lax.scan`` (one compiled body for
    the whole window).  cv2.bilateralFilter derives the window from
    sigmaSpace when d=0; we default radius to round(1.5*sigma_xy)."""
    import jax

    if radius is None:
        radius = max(1, int(round(1.5 * sigma_xy)))
    H, W, C = img.shape
    img = img.astype(jnp.float32)  # scan carry must match the f32 weights
    x = jnp.pad(img, ((radius, radius), (radius, radius), (0, 0)), mode="reflect")
    dy, dx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    offs = jnp.asarray(np.stack([dy.ravel(), dx.ravel()], axis=-1))
    w_sp = jnp.asarray(
        np.exp(-(dy.ravel() ** 2 + dx.ravel() ** 2) / (2.0 * sigma_xy**2)),
        jnp.float32,
    )
    center = x[radius : radius + H, radius : radius + W]

    def body(carry, inp):
        acc, wacc = carry
        off, ws = inp
        shifted = jax.lax.dynamic_slice(
            x, (radius + off[0], radius + off[1], 0), (H, W, C)
        )
        dv2 = jnp.sum((shifted - center) ** 2, axis=-1, keepdims=True)
        w = ws * jnp.exp(-dv2 / (2.0 * sigma_v**2))
        return (acc + w * shifted, wacc + w), None

    (acc, wacc), _ = jax.lax.scan(
        body,
        (jnp.zeros_like(center), jnp.zeros((H, W, 1), jnp.float32)),
        (offs, w_sp),
    )
    return acc / jnp.maximum(wacc, 1e-20)


def color_transfer_sliced_ot(
    source: jnp.ndarray,
    target: jnp.ndarray,
    key=None,
    steps: int = 10,
    batch_size: int = 5,
    reg_sigma_xy: float = 16.0,
    reg_sigma_v: float = 5.0,
    reg_radius: int | None = None,
) -> jnp.ndarray:
    """Sliced optimal-transport color transfer — the reference's ``CTSOT``
    (color_transfer_ot.py:10-42): per solver step, project both color
    clouds onto ``batch_size`` random directions, advect the source by the
    sorted-projection difference along each direction, average; then
    regularize the residual with a bilateral filter so the transfer follows
    edges (the cv2.bilateralFilter step, here our jnp bilateral).  Output is
    NOT clipped, matching the reference's contract.

    source/target: [H, W, C] float; target may have any H, W (it is only
    read as a color cloud, padded/truncated to the source count by
    resampling with replacement when sizes differ)."""
    import jax

    if key is None:
        key = jax.random.PRNGKey(0)
    H, W, C = source.shape
    src = source.reshape(-1, C).astype(jnp.float32)
    dst = target.reshape(-1, C).astype(jnp.float32)
    N = src.shape[0]
    if dst.shape[0] != N:
        # sorted-projection matching needs equal counts: resample the target
        k_rs, key = jax.random.split(key)
        idx = jax.random.randint(k_rs, (N,), 0, dst.shape[0])
        dst = dst[idx]

    dirs = jax.random.normal(key, (steps, batch_size, C), jnp.float32)
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
    )

    def one_step(cur, dirs_b):
        def one_dir(adv, d):
            ps = cur @ d
            pt = dst @ d
            ids = jnp.argsort(ps)
            a = jnp.sort(pt) - ps[ids]
            return adv.at[ids].add(a[:, None] * d), None

        adv, _ = jax.lax.scan(one_dir, jnp.zeros_like(cur), dirs_b)
        return cur + adv / batch_size, None

    new_src, _ = jax.lax.scan(one_step, src, dirs)
    new_src = new_src.reshape(H, W, C)
    if reg_sigma_xy != 0.0:
        new_src = source + bilateral_filter(
            new_src - source, reg_sigma_v, reg_sigma_xy, radius=reg_radius
        )
    return new_src
