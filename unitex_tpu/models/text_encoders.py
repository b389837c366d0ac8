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


def build_text_encoders(
    pretrain_root: Optional[str], max_sequence_length: int = 512
):
    """FluxTextEncoders when weights exist locally, else None (callers fall
    back to :func:`zero_embeddings`)."""
    if pretrain_root is None:
        return None
    try:
        return FluxTextEncoders(pretrain_root, max_sequence_length)
    except (OSError, ValueError, ImportError) as e:
        print(f"[text] encoders unavailable ({e}); using null embeddings")
        return None
