"""Text encoders for training-time prompt conditioning.

The released inference path needs no text encoders (zero CLIP-pooled +
zero T5 embeddings, flux_piplines/texturing/pipeline.py:538-543); training
loads CLIP-L and T5-XXL to embed the trigger prompt '[MVFLUX]'
(trainer.py:165-181).  Host-side HF transformers (CPU torch) producing
numpy embeddings for the JAX trainers; without local weights,
``zero_embeddings`` gives the inference-parity nulls.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def zero_embeddings(
    batch: int = 1,
    max_sequence_length: int = 512,
    t5_dim: int = 4096,
    clip_dim: int = 768,
) -> Tuple[np.ndarray, np.ndarray]:
    """(prompt_embeds [B, S, 4096], pooled [B, 768]) — the null conditioning
    the released pipeline runs with."""
    return (
        np.zeros((batch, max_sequence_length, t5_dim), np.float32),
        np.zeros((batch, clip_dim), np.float32),
    )


class FluxTextEncoders:
    """CLIP-L pooled + T5 sequence embeddings (the FLUX conditioning pair)."""

    def __init__(self, pretrain_root: str, max_sequence_length: int = 512):
        import torch
        from transformers import (
            CLIPTextModel,
            CLIPTokenizer,
            T5EncoderModel,
            T5TokenizerFast,
        )

        self.torch = torch
        self.max_sequence_length = max_sequence_length
        clip_dir = os.path.join(pretrain_root, "flux", "text_encoder")
        t5_dir = os.path.join(pretrain_root, "flux", "text_encoder_2")
        self.clip_tokenizer = CLIPTokenizer.from_pretrained(
            os.path.join(pretrain_root, "flux", "tokenizer")
        )
        self.clip = CLIPTextModel.from_pretrained(clip_dir).eval()
        self.t5_tokenizer = T5TokenizerFast.from_pretrained(
            os.path.join(pretrain_root, "flux", "tokenizer_2")
        )
        self.t5 = T5EncoderModel.from_pretrained(t5_dir).eval()

    def __call__(self, prompts) -> Tuple[np.ndarray, np.ndarray]:
        torch = self.torch
        if isinstance(prompts, str):
            prompts = [prompts]
        with torch.no_grad():
            clip_in = self.clip_tokenizer(
                prompts, padding="max_length", max_length=77,
                truncation=True, return_tensors="pt",
            )
            pooled = self.clip(**clip_in).pooler_output.float().numpy()
            t5_in = self.t5_tokenizer(
                prompts, padding="max_length",
                max_length=self.max_sequence_length,
                truncation=True, return_tensors="pt",
            )
            seq = self.t5(t5_in.input_ids).last_hidden_state.float().numpy()
        return seq, pooled


class JaxFluxTextEncoders:
    """On-device CLIP-L pooled + T5 sequence embeddings (models/text_jax.py).

    Weights load straight from the FLUX checkpoint's safetensors dirs (no
    torch modules instantiated); only tokenization stays on the host.  The
    T5-XXL encode — a 4.7B-parameter matmul workload — runs jitted on the
    TPU instead of CPU torch.  Pass a ``(data, model)`` jax Mesh to run the
    T5 tensor-parallel (parallel.sharding.t5_param_shardings)."""

    def __init__(
        self, pretrain_root: str, max_sequence_length: int = 512, mesh=None
    ):
        import jax

        from .flux.loader import iter_safetensors
        from .text_jax import (
            clip_config_from_sd,
            clip_text_forward,
            convert_clip_text,
            convert_t5_encoder,
            t5_config_from_sd,
            t5_encoder_forward,
        )
        from transformers import CLIPTokenizer, T5TokenizerFast

        self.max_sequence_length = max_sequence_length
        flux = os.path.join(pretrain_root, "flux")
        self.clip_tokenizer = CLIPTokenizer.from_pretrained(
            os.path.join(flux, "tokenizer")
        )
        self.t5_tokenizer = T5TokenizerFast.from_pretrained(
            os.path.join(flux, "tokenizer_2")
        )
        clip_sd = iter_safetensors(os.path.join(flux, "text_encoder"))
        t5_sd = iter_safetensors(os.path.join(flux, "text_encoder_2"))
        self.clip_cfg = clip_config_from_sd(clip_sd)
        self.t5_cfg = t5_config_from_sd(t5_sd)
        self.clip_params = convert_clip_text(clip_sd, self.clip_cfg)
        self.t5_params = convert_t5_encoder(t5_sd, self.t5_cfg)
        if mesh is not None:
            from ..parallel.sharding import shard_params, t5_param_shardings

            self.t5_params = shard_params(
                self.t5_params, t5_param_shardings(self.t5_params, mesh)
            )
        self._clip_fwd = jax.jit(
            lambda p, ids: clip_text_forward(p, self.clip_cfg, ids)
        )
        self._t5_fwd = jax.jit(
            lambda p, ids: t5_encoder_forward(p, self.t5_cfg, ids)
        )

    def __call__(self, prompts) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(prompts, str):
            prompts = [prompts]
        clip_ids = np.asarray(
            self.clip_tokenizer(
                prompts, padding="max_length", max_length=77, truncation=True
            ).input_ids,
            np.int32,
        )
        t5_ids = np.asarray(
            self.t5_tokenizer(
                prompts,
                padding="max_length",
                max_length=self.max_sequence_length,
                truncation=True,
            ).input_ids,
            np.int32,
        )
        _, pooled = self._clip_fwd(self.clip_params, clip_ids)
        seq = self._t5_fwd(self.t5_params, t5_ids)
        return np.asarray(seq, np.float32), np.asarray(pooled, np.float32)


def build_text_encoders(
    pretrain_root: Optional[str],
    max_sequence_length: int = 512,
    backend: str = "jax",
):
    """Text encoders when weights exist locally, else None (callers fall
    back to :func:`zero_embeddings`).  ``backend='jax'`` (default) runs the
    encoders on-device via models/text_jax.py; ``'torch'`` keeps the
    host-side HF wrapper."""
    if pretrain_root is None:
        return None
    if backend == "jax":
        try:
            return JaxFluxTextEncoders(pretrain_root, max_sequence_length)
        except (OSError, ValueError, KeyError, ImportError) as e:
            print(f"[text] jax encoders unavailable ({e}); trying torch")
    try:
        return FluxTextEncoders(pretrain_root, max_sequence_length)
    except (OSError, ValueError, ImportError) as e:
        print(f"[text] encoders unavailable ({e}); using null embeddings")
        return None
