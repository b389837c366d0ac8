"""LTM (texture-function VAE) training.

The reference's LTM is unreleased — ``build_ltm`` points at a missing
package (/root/reference/pipeline.py:131-137) and the shipped pipeline runs
the no-LTM ablation.  unitex_tpu ships the model (models/ltm.py, interface
recovered from pipeline.py:463-559) AND a trainer, so the stage-2.2
field-inpainting path is actually trainable: batches are colored surface
samplings of textured meshes, split into an encoder ("visible") set and a
supervision ("query") set; the objective is masked-field reconstruction +
KL (models/ltm.ltm_vae_loss).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..geometry.io.mesh_io import HostMesh
from ..models.ltm import LTMConfig, init_ltm_params, ltm_vae_loss


@dataclasses.dataclass(frozen=True)
class LTMTrainConfig:
    learning_rate: float = 1e-4
    kl_weight: float = 1e-4
    max_grad_norm: float = 1.0
    n_visible: int = 4096
    n_query: int = 2048


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LTMTrainState:
    step: jnp.ndarray
    params: Dict[str, Any]
    opt_state: Any


def create_ltm_state(
    key: jax.Array, cfg: LTMConfig, tcfg: LTMTrainConfig
) -> Tuple[LTMTrainState, optax.GradientTransformation]:
    params = init_ltm_params(key, cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.adamw(tcfg.learning_rate),
    )
    return (
        LTMTrainState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
        ),
        tx,
    )


@partial(jax.jit, static_argnames=("cfg", "tcfg", "tx"))
def ltm_train_step(
    state: LTMTrainState,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: LTMConfig,
    tcfg: LTMTrainConfig,
    tx: optax.GradientTransformation,
) -> Tuple[LTMTrainState, jnp.ndarray]:
    """batch: 'points' [N,3], 'colors' [N,C], 'valid' [N] (encoder set),
    'query_points' [M,3], 'query_colors' [M,C]."""

    def loss_fn(p):
        return ltm_vae_loss(
            p, cfg, batch["points"], batch["colors"], batch["valid"],
            batch["query_points"], batch["query_colors"], key,
            kl_weight=tcfg.kl_weight,
        )

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return (
        LTMTrainState(step=state.step + 1, params=params, opt_state=opt_state),
        loss,
    )


def random_field_colors(
    key: jax.Array,
    points: jnp.ndarray,
    n_fourier: int = 10,
    max_freq: float = 2.5,
    n_rbf: int = 6,
) -> jnp.ndarray:
    """Random smooth RGB field evaluated at ``points`` [N, 3] -> [N, 3] in
    [0.05, 0.95].

    The family spans what textures on unit-box meshes look like at the
    scale the fill operates on: a random AFFINE field (the round-trip
    oracle's GT texture is affine in position, scripts/oracle_campaign.py),
    low-frequency random Fourier components, and RBF blobs.  Per-field
    normalization to a fixed range keeps the sigmoid decode head
    (models/ltm.decode_field) in its responsive band.  All device-side —
    colors are resampled per train step from a fixed point bank at ~zero
    host cost."""
    ka, kf, kp, kw, kr, kc, ks = jax.random.split(key, 7)
    A = jax.random.normal(ka, (3, 3)) * 0.8            # affine part
    freqs = jax.random.uniform(kf, (n_fourier, 3), minval=-max_freq,
                               maxval=max_freq)
    phase = jax.random.uniform(kp, (n_fourier,), maxval=2 * jnp.pi)
    w = jax.random.normal(kw, (n_fourier, 3)) / jnp.sqrt(n_fourier)
    mu = jax.random.uniform(kr, (n_rbf, 3), minval=-1.0, maxval=1.0)
    sig = jax.random.uniform(ks, (n_rbf,), minval=0.15, maxval=0.6)
    amp = jax.random.normal(kc, (n_rbf, 3)) * 0.7

    g = points @ A.T
    ang = points @ freqs.T + phase                      # [N, F]
    g = g + jnp.sin(ang) @ w
    d2 = jnp.sum((points[:, None, :] - mu[None]) ** 2, -1)  # [N, R]
    g = g + jnp.exp(-d2 / (2 * sig**2)) @ amp
    lo = jnp.min(g, axis=0, keepdims=True)
    hi = jnp.max(g, axis=0, keepdims=True)
    return 0.05 + 0.9 * (g - lo) / jnp.maximum(hi - lo, 1e-6)


def occlusion_split(
    key: jax.Array,
    points: jnp.ndarray,
    colors: jnp.ndarray,
    n_query: int,
    n_holes: int = 6,
    r_min: float = 0.08,
    r_max: float = 0.35,
) -> Dict[str, jnp.ndarray]:
    """Occlusion-shaped train batch: contiguous spherical HOLES around
    random surface points are hidden from the encoder (valid=False) and
    supervised as queries — the inference regime (renderer_inverse
    _fill_invisible_knn: occluded texels form contiguous patches, not a
    fine random scatter; the original random split only taught
    interpolation between densely surrounding context).  Static shapes:
    the encoder keeps all N points with a validity mask; the query set is
    hole-points-first (shuffled) topped up with visible points."""
    kc, kr, kq = jax.random.split(key, 3)
    N = points.shape[0]
    centers = points[jax.random.randint(kc, (n_holes,), 0, N)]
    radii = jax.random.uniform(kr, (n_holes,), minval=r_min, maxval=r_max)
    d2 = jnp.sum((points[:, None, :] - centers[None]) ** 2, -1)
    in_hole = jnp.any(d2 < radii[None] ** 2, axis=-1)
    shuffle = jax.random.uniform(kq, (N,))
    qidx = jnp.argsort(jnp.where(in_hole, shuffle, 1.0 + shuffle))[:n_query]
    return {
        "points": points,
        "colors": colors,
        "valid": ~in_hole,
        "query_points": points[qidx],
        "query_colors": colors[qidx],
    }


@partial(jax.jit, static_argnames=("n_query",))
def sample_device_batch(
    key: jax.Array, points: jnp.ndarray, n_query: int
) -> Dict[str, jnp.ndarray]:
    """One jitted data step: fresh random field + fresh occlusion holes on
    a pregenerated surface point set (build_point_bank)."""
    kf, kh = jax.random.split(key)
    colors = random_field_colors(kf, points)
    return occlusion_split(kh, points, colors, n_query)


def build_point_bank(
    n_meshes: int, n_points: int, seed: int = 0
) -> np.ndarray:
    """Host-side, once: area-weighted surface samples of randomized
    primitives (tori/knots/spheres/compounds/cups — the oracle geometry
    family with jittered parameters) -> [n_meshes, n_points, 3] in the
    unit box scaled by 0.85 (the oracle's mesh scale)."""
    from ..geometry.primitives import (
        make_compound, make_cup, make_icosphere, make_torus, make_trefoil,
    )
    from ..geometry.sampling import sample_surface

    rng = np.random.default_rng(seed)
    bank = np.empty((n_meshes, n_points, 3), np.float32)
    for i in range(n_meshes):
        kind = i % 5
        if kind == 0:
            m = make_icosphere(3, radius=float(rng.uniform(0.6, 1.0)))
        elif kind == 1:
            m = make_torus(
                major_radius=float(rng.uniform(0.5, 0.8)),
                minor_radius=float(rng.uniform(0.15, 0.35)),
                n_major=64, n_minor=32,
            )
        elif kind == 2:
            m = make_trefoil(
                tube_radius=float(rng.uniform(0.15, 0.3)),
                n_major=128, n_minor=24,
            )
        elif kind == 3:
            m = make_compound(subdivisions=3, n_major=64, n_minor=24)
        else:
            m = make_cup(
                radius=float(rng.uniform(0.4, 0.6)),
                wall=float(rng.uniform(0.06, 0.12)),
                n_theta=64,
                tilt_deg=float(rng.uniform(0.0, 50.0)),
            )
        pts, _ = sample_surface(m, n_points, seed=int(rng.integers(1 << 31)))
        bank[i] = 0.85 * pts / max(1e-6, np.abs(pts).max())
    return bank


def sample_ltm_batch(
    mesh: HostMesh, tcfg: LTMTrainConfig, seed: int = 0
) -> Dict[str, jnp.ndarray]:
    """Host-side batch builder: colored area-weighted surface samples of a
    textured mesh, split into encoder and query sets (the shapes the
    pipeline feeds the field at inference, pipeline.py:463-559)."""
    from ..texture.remapping import _sample_source_colors

    n = tcfg.n_visible + tcfg.n_query
    pts, cols = _sample_source_colors(mesh, n, seed)
    rng = np.random.default_rng(seed + 1)
    perm = rng.permutation(n)
    vis, qry = perm[: tcfg.n_visible], perm[tcfg.n_visible :]
    return {
        "points": jnp.asarray(pts[vis]),
        "colors": jnp.asarray(cols[vis]),
        "valid": jnp.ones((tcfg.n_visible,), bool),
        "query_points": jnp.asarray(pts[qry]),
        "query_colors": jnp.asarray(cols[qry]),
    }
