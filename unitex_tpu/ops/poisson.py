"""On-device Poisson blending and diffusion inpainting.

The reference shells out to OpenCV for both — ``cv2.seamlessClone``
(NORMAL_CLONE) with a GPU->CPU->GPU round-trip per image
(/root/reference/TextureTools/texturetools/image/image_fusion.py:12-58) and
``cv2.inpaint(INPAINT_NS)`` (image_outpainting.py:6-42).  On TPU both are
iterative elliptic solves that vectorize cleanly:

* :func:`poisson_blend` — solve ∇²f = ∇²src inside the mask with dst
  Dirichlet boundary (seamless cloning's NORMAL_CLONE semantics) by damped
  Jacobi iteration — each iteration is one 4-neighbour convolution.
* :func:`diffusion_inpaint` — fill masked pixels by repeated neighbour
  averaging (the steady-state heat equation the Navier–Stokes inpainting
  approximates for smooth regions).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _laplacian(x: jnp.ndarray) -> jnp.ndarray:
    """4-neighbour Laplacian with edge replication, channel-last [H, W, C]."""
    up = jnp.concatenate([x[:1], x[:-1]], axis=0)
    down = jnp.concatenate([x[1:], x[-1:]], axis=0)
    left = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    right = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    return up + down + left + right - 4.0 * x


def _neighbor_sum(x: jnp.ndarray) -> jnp.ndarray:
    up = jnp.concatenate([x[:1], x[:-1]], axis=0)
    down = jnp.concatenate([x[1:], x[-1:]], axis=0)
    left = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    right = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    return up + down + left + right


@partial(jax.jit, static_argnames=("n_iters",))
def poisson_blend(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    mask: jnp.ndarray,
    n_iters: int = 200,
) -> jnp.ndarray:
    """Seamlessly clone ``src`` into ``dst`` inside ``mask``.

    src/dst [H, W, C], mask [H, W, 1] bool.  Jacobi iteration on
    f = (Σ_nbr f + div) / 4 where div is src's Laplacian; outside the mask
    f is clamped to dst (Dirichlet boundary).
    """
    div = -_laplacian(src)
    m = mask.astype(src.dtype)

    def body(_, f):
        f_new = (_neighbor_sum(f) + div) * 0.25
        return jnp.where(mask, f_new, dst)

    f0 = jnp.where(mask, src, dst)
    return jax.lax.fori_loop(0, n_iters, body, f0)


def soft_blend(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    mask: jnp.ndarray,
    feather: int = 5,
) -> jnp.ndarray:
    """Feathered alpha compositing (``image_fusion_soft``): blur the mask
    edge and lerp — the cheap alternative to the Poisson solve."""
    from .image_ops import gaussian_blur

    alpha = gaussian_blur(mask.astype(src.dtype), 2 * feather + 1)
    alpha = jnp.clip(alpha, 0.0, 1.0)
    return src * alpha + dst * (1.0 - alpha)


@partial(jax.jit, static_argnames=("n_iters",))
def diffusion_inpaint(
    image: jnp.ndarray,
    hole_mask: jnp.ndarray,
    n_iters: int = 200,
) -> jnp.ndarray:
    """Fill ``hole_mask`` pixels by harmonic interpolation from the valid
    region (image_outpainting's INPAINT_NS capability for smooth fills).

    image [H, W, C], hole_mask [H, W, 1] bool (True = to fill).  Jacobi
    relaxation converges to the harmonic function with the valid pixels as
    Dirichlet boundary; the hole is seeded with the valid-region mean."""
    valid = ~hole_mask
    n_valid = jnp.maximum(valid.sum(), 1)
    mean = jnp.sum(image * valid, axis=(0, 1), keepdims=True) / n_valid

    def body(_, f):
        f_new = _neighbor_sum(f) * 0.25
        return jnp.where(hole_mask, f_new, image)

    f0 = jnp.where(hole_mask, mean, image)
    return jax.lax.fori_loop(0, n_iters, body, f0)
