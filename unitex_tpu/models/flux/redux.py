"""FLUX Redux image-prompt conditioning.

The reference declares a Redux path (``PBRFluxPriorReduxPipeline``,
flux_piplines/texturing/pipeline.py:146-180: SigLIP image features ->
Redux projection -> 729 image-prompt tokens replacing the T5 stream) but
never loads it at inference — ``redux_id`` is computed and unused
(/root/reference/pipeline.py:86) and the released flow passes
``redux_image=None``.  We provide the full Redux projection (the
FluxPriorReduxPipeline "image embedder": Linear 1152 -> 4096*3, SiLU,
Linear -> 4096) with a weights loader.  The SigLIP backbone is JAX-native
(models/siglip.py, on-device — preferred when weights exist); the HF
transformers host path remains as a fallback for torch-format checkpoints,
and callers can always pass precomputed SigLIP features.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import linear, linear_init

SIGLIP_DIM = 1152
T5_DIM = 4096
N_TOKENS = 729  # 27x27 SigLIP patch grid


def init_redux_params(key, siglip_dim: int = SIGLIP_DIM, t5_dim: int = T5_DIM):
    k1, k2 = jax.random.split(key)
    return {
        "up": linear_init(k1, siglip_dim, t5_dim * 3),
        "down": linear_init(k2, t5_dim * 3, t5_dim),
    }


def redux_project(params, siglip_features: jnp.ndarray) -> jnp.ndarray:
    """SigLIP patch features [B, 729, 1152] -> image-prompt embeds
    [B, 729, 4096] (ReduxImageEncoder: up-project, SiLU, down-project)."""
    x = linear(params["up"], siglip_features)
    return linear(params["down"], jax.nn.silu(x))


def redux_image_ids(n_tokens: int = N_TOKENS) -> jnp.ndarray:
    """Text-stream position ids for the redux tokens (zeros, like txt_ids)."""
    return jnp.zeros((n_tokens, 3), jnp.float32)


def load_redux_params(path: str) -> Dict[str, Any]:
    """Load a diffusers FluxPriorReduxPipeline image_embedder state dict."""
    from .loader import iter_safetensors

    sd = iter_safetensors(path)

    def lin(prefix):
        return {
            "kernel": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
        }

    return {"up": lin("redux_up"), "down": lin("redux_down")}


class ReduxConditioner:
    """Image -> FLUX prompt-stream embeddings.

    With SigLIP weights under ``pretrain_root`` the image runs through HF
    transformers (host CPU); otherwise call with precomputed features."""

    def __init__(self, pretrain_root: Optional[str] = None, params=None):
        self.params = params
        self.siglip = None          # host-torch fallback
        self.processor = None
        self.siglip_jax = None      # (params, config) — preferred
        if pretrain_root is not None:
            redux_dir = os.path.join(pretrain_root, "flux", "redux")
            if params is None and os.path.isdir(redux_dir):
                try:
                    self.params = load_redux_params(redux_dir)
                except (OSError, KeyError):
                    pass
            siglip_dir = os.path.join(pretrain_root, "siglip")
            if os.path.isdir(siglip_dir):
                try:
                    from ..siglip import load_siglip

                    self.siglip_jax = load_siglip(siglip_dir)
                except (OSError, KeyError, ValueError, ImportError):
                    try:
                        from transformers import (
                            SiglipImageProcessor,
                            SiglipVisionModel,
                        )

                        self.processor = SiglipImageProcessor.from_pretrained(
                            siglip_dir
                        )
                        self.siglip = SiglipVisionModel.from_pretrained(
                            siglip_dir
                        ).eval()
                    except (OSError, ImportError):
                        pass

    def features_from_image(self, image) -> jnp.ndarray:
        if self.siglip_jax is not None:
            from ..siglip import preprocess_siglip, siglip_forward

            sp, scfg = self.siglip_jax
            return siglip_forward(sp, scfg, preprocess_siglip(image, scfg))
        assert self.siglip is not None, "SigLIP weights not loaded"
        import torch

        inputs = self.processor(images=image, return_tensors="pt")
        with torch.no_grad():
            out = self.siglip(**inputs).last_hidden_state
        return jnp.asarray(out.float().numpy())

    def __call__(
        self, image=None, siglip_features: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (prompt_embeds [B, 729, 4096], txt_ids [729, 3]) to feed
        ``run_flux_pipeline(prompt_embeds=...)`` — the redux tokens replace
        the T5 stream (texturing/pipeline.py:625-631)."""
        assert self.params is not None, "redux projection weights not loaded"
        if siglip_features is None:
            siglip_features = self.features_from_image(image)
        embeds = redux_project(self.params, siglip_features)
        return embeds, redux_image_ids(embeds.shape[1])
