"""FLUX MMDiT configuration.

Architecture hyperparameters of black-forest-labs/FLUX.1-dev
(FluxTransformer2DModel), the backbone the reference adapts with texture and
delight LoRAs (/root/reference/pipeline.py:81-127).  ``tiny()`` is a
scaled-down config for CPU tests (same topology, 1000x fewer params).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64
    num_layers: int = 19            # dual-stream blocks
    num_single_layers: int = 38     # single-stream blocks
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096   # T5 hidden
    pooled_projection_dim: int = 768  # CLIP pooled
    guidance_embeds: bool = True
    axes_dims_rope: Tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 10000.0
    mlp_ratio: float = 4.0
    dtype: str = "bfloat16"
    # rematerialize block bodies under grad: activations are recomputed in
    # the backward pass instead of stored per layer — required to fit LoRA
    # training of the 12B model in 16 GB/chip HBM
    remat: bool = False
    # serving-mode int8 QK^T in the flash-attention kernel (forward-only;
    # keep False for training — the qk8 kernel has no VJP)
    attn_qk8: bool = False
    # sequence-parallel ring attention: name of the mesh axis the token
    # sequence is sharded over.  The forward must then run inside
    # shard_map over that axis with sequence-sharded hidden/context/ids
    # (models/flux/sp.py flux_forward_sp does this) — every non-attention
    # op is token-local, and attention rotates K/V blocks around the ring
    # (ops/ring_attention.py).  The reference has no SP (SURVEY §5): its
    # 13.8k-token joint sequence fits one GPU; this is the TPU-native
    # long-context answer for >6-view / higher-res grids.
    seq_axis: "str | None" = None
    # SP scheme when seq_axis is set: "ulysses" (two all_to_all reshards,
    # full-sequence flash attention on a head slice — least ICI traffic at
    # UniTEX lengths, needs heads % axis == 0), "ring" (K/V rotation,
    # O(S/n) K/V memory — for >100k-token sequences or head counts that
    # don't divide the axis), or "auto" (ulysses when the head count
    # divides the axis, ring otherwise).  See ops/ring_attention.py.
    sp_mode: str = "auto"
    # tensor-parallel axis INSIDE a shard_map (the TPxPP composition,
    # models/flux/pp.py): block kernels arrive as Megatron column/row
    # SHARDS (heads/mlp split over this axis) and the block functions psum
    # after the out/ff/proj_out row-parallel matmuls.  Distinct from the
    # jit-level GSPMD TP (parallel/sharding.flux_param_shardings), which
    # needs no model-code awareness; shard_map bodies are per-device
    # programs, so here the collective is explicit.  When set,
    # num_attention_heads must already be the LOCAL head count.
    tp_axis: "str | None" = None

    @property
    def hidden_size(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def mlp_dim(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @classmethod
    def flux1_dev(cls) -> "FluxConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "FluxConfig":
        """4-head/32-dim test model: same topology, runs on CPU in tests."""
        return cls(
            in_channels=16,
            num_layers=2,
            num_single_layers=2,
            attention_head_dim=32,
            num_attention_heads=4,
            joint_attention_dim=64,
            pooled_projection_dim=32,
            axes_dims_rope=(8, 12, 12),
            dtype="float32",
        )
