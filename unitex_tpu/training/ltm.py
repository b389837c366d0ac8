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
