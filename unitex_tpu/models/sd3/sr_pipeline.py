"""TSD-SR: one-step SD3 x4 super-resolution with tiled latents + tiled VAE.

Equivalent of ``TSDSRPipeline`` (/root/reference/TSD_SR/sr_pipeline.py:169-277):
bicubic x4 upscale -> (LoRA'd) VAE encode -> ONE SD3 transformer step at
t=1000 over gaussian-weighted latent tiles (64² latent tiles, overlap 8,
:68-165) -> latent = input - velocity -> tiled VAE decode -> wavelet/adain
color fix.  Prompt conditioning is a precomputed fixed embedding loaded
from disk (:220-222) or zeros.

The tiled VAE replaces the reference's VAEHook task-queue
(TSD_SR/utils/vaehook.py) with overlap-blended tiles: each tile is
encoded/decoded independently and feathered together — same
memory-bounding purpose, simpler and fully jit-able per tile.
"""

from __future__ import annotations

import contextlib
import dataclasses
import math
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..flux.vae import VAEConfig, vae_decode_jit, vae_encode_jit
from .color_fix import adain_color_fix, wavelet_color_fix
from .config import SD3Config
from .model import sd3_forward


import functools


@functools.partial(jax.jit, static_argnames=("cfg",))
def _sd3_tile_step(params, cfg, lat_tiles, prompt, t, pooled):
    """One jitted transformer dispatch over a tile batch — cached across
    calls so the mesh path doesn't retrace per tile chunk."""
    return sd3_forward(params, cfg, lat_tiles, prompt, t, pooled)


# Jitted glue: under FLUX co-residency (scripts/e2e_production.py --sr,
# ~1.5 GB HBM headroom) the eager 2048² glue chains OOM — every eager op's
# OUTPUT allocates at dispatch time, racing the executing queue, so a
# 10-op chain transiently holds 10 full-resolution buffers.  One program
# per stage lets XLA schedule/reuse the temps (the r04 probe died in the
# eager wavelet color fix after the jitted encode/step/decode passed).

def _chunked_put(tree, dev, chunk_bytes=256 * 1024 * 1024):
    """device_put a weight tree in bounded chunks with drain fences: one
    batched put of a ~2.2 GB tree transiently holds staging + final
    buffers for many leaves at once and OOMs nondeterministically at
    ~4 GB free (r04 --sr staging OOM); fencing every ``chunk_bytes``
    bounds the in-flight footprint.  One retry after a drain covers a
    straggling async free."""
    def _is_alloc_failure(e: Exception) -> bool:
        # retry ONLY allocation failures — shape/dtype/device bugs must
        # surface immediately, not after a drain + doubled latency
        txt = str(e).lower()
        return ("resource_exhausted" in txt or "resource exhausted" in txt
                or "out of memory" in txt or "allocat" in txt)

    leaves, treedef = jax.tree.flatten(tree)
    out, acc = [], 0
    for leaf in leaves:
        try:
            put = jax.device_put(leaf, dev)
        except RuntimeError as e:  # jaxlib XlaRuntimeError subclasses this
            if not _is_alloc_failure(e):
                raise
            np.asarray(jnp.zeros((), jnp.float32) + 1.0)  # drain + retry
            put = jax.device_put(leaf, dev)
        out.append(put)
        acc += leaf.nbytes
        if acc >= chunk_bytes:
            np.asarray(put.ravel()[0])
            acc = 0
    return jax.tree.unflatten(treedef, out)


@functools.partial(jax.jit, static_argnames=("upscale",))
def _upscale_clip_jit(image, upscale):
    H, W, C = image.shape
    up = jax.image.resize(
        image, (H * upscale, W * upscale, C), method="bicubic")
    return jnp.clip(up, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("align",))
def _sr_finish_jit(decoded, up, align):
    out = jnp.clip(decoded[0] * 0.5 + 0.5, 0.0, 1.0)
    if align == "wavelet":
        out = wavelet_color_fix(out, up)
    elif align == "adain":
        out = adain_color_fix(out, up)
    return jnp.clip(out, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("offs", "pt", "H", "W"))
def _assemble_decode_jit(t_out, wgt, offs, pt, H, W):
    """Gaussian-blended overlap-tile assembly as ONE program (the eager
    loop dispatched ~2 full-resolution buffer allocations per tile)."""
    out = jnp.zeros((1, H, W, t_out.shape[-1]), jnp.float32)
    cnt = jnp.zeros((1, H, W, 1), jnp.float32)
    for n, (py, px) in enumerate(offs):
        out = jax.lax.dynamic_update_slice(
            out,
            jax.lax.dynamic_slice(
                out, (0, py, px, 0), (1, pt, pt, out.shape[-1]))
            + t_out[n : n + 1] * wgt,
            (0, py, px, 0),
        )
        cnt = jax.lax.dynamic_update_slice(
            cnt,
            jax.lax.dynamic_slice(cnt, (0, py, px, 0), (1, pt, pt, 1)) + wgt,
            (0, py, px, 0),
        )
    return out / jnp.maximum(cnt, 1e-8)


def gaussian_tile_weights(tile: int, var: float = 0.01) -> jnp.ndarray:
    """[tile, tile] gaussian blend mask (sr_pipeline.py:51-66)."""
    mid = (tile - 1) / 2.0
    x = np.arange(tile, dtype=np.float64)
    g = np.exp(-((x - mid) ** 2) / (tile * tile) / (2 * var)) / np.sqrt(2 * np.pi * var)
    w = np.outer(g, g)
    # floor keeps edge weights out of f32-denormal territory (the division
    # by the contributor sum would otherwise lose precision at tile borders)
    w = np.maximum(w, w.max() * 1e-6)
    return jnp.asarray(w, jnp.float32)


def _tile_offsets(size: int, tile: int, overlap: int):
    """Start offsets covering [0, size) with the reference's grid walk:
    stride (tile - overlap), last tile clamped to the end."""
    if size <= tile:
        return [0]
    stride = tile - overlap
    offs = list(range(0, size - tile, stride))
    offs.append(size - tile)
    return offs


def tiled_apply(
    fn,
    x: jnp.ndarray,
    tile: int,
    overlap: int,
    out_scale: int = 1,
    out_channels: Optional[int] = None,
):
    """Apply ``fn`` ([1, t, t, C] -> [1, t*s, t*s, C']) over overlapping
    tiles of x [1, H, W, C], gaussian-blending the results."""
    _, H, W, C = x.shape
    if H <= tile and W <= tile:
        return fn(x)
    Co = out_channels if out_channels is not None else C
    s = out_scale
    out = jnp.zeros((1, H * s, W * s, Co), jnp.float32)
    cnt = jnp.zeros((1, H * s, W * s, 1), jnp.float32)
    w = gaussian_tile_weights(tile * s)[None, :, :, None]
    for oy in _tile_offsets(H, tile, overlap):
        for ox in _tile_offsets(W, tile, overlap):
            t_in = jax.lax.dynamic_slice(
                x, (0, oy, ox, 0), (1, min(tile, H), min(tile, W), C)
            )
            t_out = fn(t_in).astype(jnp.float32)
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(
                    out, (0, oy * s, ox * s, 0), t_out.shape
                )
                + t_out * w,
                (0, oy * s, ox * s, 0),
            )
            cnt = jax.lax.dynamic_update_slice(
                cnt,
                jax.lax.dynamic_slice(cnt, (0, oy * s, ox * s, 0), (1,) + t_out.shape[1:3] + (1,))
                + w,
                (0, oy * s, ox * s, 0),
            )
    return out / jnp.maximum(cnt, 1e-8)


def tiled_apply_batched(
    fn,
    x: jnp.ndarray,
    tile: int,
    overlap: int,
    tile_batch: int = 8,
    out_channels: Optional[int] = None,
):
    """Like :func:`tiled_apply` but stacks tiles and calls ``fn`` on
    [tb, t, t, C] batches — one big MXU dispatch per chunk instead of one
    per tile (the transformer path's throughput win; the reference batches
    a row of tiles at a time, sr_pipeline.py:124-128)."""
    _, H, W, C = x.shape
    if H <= tile and W <= tile:
        return fn(x)
    Co = out_channels if out_channels is not None else C
    offs = [
        (oy, ox)
        for oy in _tile_offsets(H, tile, overlap)
        for ox in _tile_offsets(W, tile, overlap)
    ]
    tiles = jnp.concatenate(
        [
            jax.lax.dynamic_slice(x, (0, oy, ox, 0), (1, tile, tile, C))
            for oy, ox in offs
        ],
        axis=0,
    )
    outs = []
    for i in range(0, len(offs), tile_batch):
        outs.append(fn(tiles[i : i + tile_batch]))
    t_out = jnp.concatenate(outs, axis=0).astype(jnp.float32)
    out = jnp.zeros((1, H, W, Co), jnp.float32)
    cnt = jnp.zeros((1, H, W, 1), jnp.float32)
    w = gaussian_tile_weights(tile)[None, :, :, None]
    for n, (oy, ox) in enumerate(offs):
        out = jax.lax.dynamic_update_slice(
            out,
            jax.lax.dynamic_slice(out, (0, oy, ox, 0), (1, tile, tile, Co))
            + t_out[n : n + 1] * w,
            (0, oy, ox, 0),
        )
        cnt = jax.lax.dynamic_update_slice(
            cnt,
            jax.lax.dynamic_slice(cnt, (0, oy, ox, 0), (1, tile, tile, 1)) + w,
            (0, oy, ox, 0),
        )
    return out / jnp.maximum(cnt, 1e-8)


@dataclasses.dataclass
class TSDSRConfig:
    upscale: int = 4
    process_size: int = 512
    latent_tile: int = 64
    latent_overlap: int = 8
    vae_encoder_tile: int = 512
    vae_decoder_tile: int = 128
    timestep: float = 1000.0
    align_method: str = "wavelet"      # wavelet | adain | nofix
    tile_batch: int = 8                # latent tiles per transformer call
    vae_encode_batch: int = 8          # 512² pixel tiles per VAE-encode call
    # decode activations are the HBM peak (128² latent -> 1024² x 512-ch):
    # f32 8-tile batches OOM a 16 GB v5e chip (2 measured safe); bf16 with
    # input-dtype group_norm application halves the peak so 8 fits, and
    # measured 3.0-3.5 s vs batch-4's 4.6-5.3 s for the full 512²->2048²
    # stage (same process, 5 reps each).  group_norm statistics stay f32;
    # the output is uint8-quantized downstream, so bf16's ~3-digit
    # mantissa sits below the 1-LSB quantization floor.
    # 0 = AUTO: pick the largest of (8, 4, 2, 1) whose estimated peak fits
    # the chip's CURRENT free HBM (the TPU-idiomatic form of the
    # reference's memory-adaptive VAEHook tile sizing, TSD_SR/utils/
    # vaehook.py:82-127 — adaptivity at process level, shapes stay static
    # so nothing recompiles).  Matters when SD3 co-resides with the 12 GB
    # int8 FLUX on one 16 GB chip (scripts/e2e_production.py --sr).
    vae_decode_batch: int = 8
    vae_decode_dtype: str = "bfloat16"  # "float32" to force full precision
    # W8A8 int8 serving for the SD3 transformer blocks (the same transform
    # as FLUX's, models/flux/quantize.py — SD3 shares the linear dispatch);
    # q/k and AdaLN stay bf16 per the measured selective policy
    int8_serving: bool = False
    # host_params: keep the SD3/VAE trees on the HOST and device_put them
    # once per __call__, dropping the device copies afterwards.  The
    # co-residency answer for max-memory serving: 12 GB int8 FLUX + 2.3 GB
    # SD3 resident left <1.5 GB of HBM — less than the denoise/bake temps
    # need (r04 E2E --sr OOM) — so the SR stage stages its weights in and
    # out instead (~2.3 GB over the transfer tunnel per asset, tens of
    # seconds; the stage runs once per asset after the bake)
    host_params: bool = False
    # nibble-pack the transformer kernels for the staging transfer
    # (ops/quant.pack_int4_tree) and unpack device-side back to the
    # standard int8 serving nodes.  int4 is a TRANSFER grid here, but it
    # is lossy — opt-in.  Measured (INT4_STAGING_r05, production
    # SD3-medium, random-init): full packing (stage_pack_bf16=True, W8A8
    # + bf16 linears) cuts the staged tree 3.06 -> 1.19 GB and the
    # staging wall 70 -> 29 s median, SR output delta 30.6 dB PSNR vs
    # int8 staging; W8A8-kernels-only (stage_pack_bf16=False) is gentler
    # (42.0 dB) but only trims 17% of the bytes — the bf16 q/k + AdaLN +
    # embedder kernels dominate the tree.
    stage_pack_int4: bool = False
    stage_pack_bf16: bool = True


class TSDSRPipeline:
    """Callable: [H, W, 3] float image in [0,1] -> x4 upscaled image.

    With ``pretrain_root`` pointing at SD3 + TSD-SR LoRA weights it runs the
    real model; weightless (None) it degrades to bicubic + identity (for
    pipeline plumbing tests).

    ``mesh``: optional ``jax.sharding.Mesh`` with ('data', 'model') axes —
    the SD3 transformer is tensor-parallel over 'model' (Megatron col/row,
    parallel/sharding.sd3_param_shardings) and the latent tile batches are
    data-parallel over 'data', so the heaviest pipeline stage scales over
    a v5e-8.  VAE params stay replicated; its tile batches are
    data-parallel like the transformer's.  The stage is VAE-dominated:
    batching + jitting the ~50 per-tile VAE dispatches measured
    12.4 s -> 4.73 s single-chip at 512²→2048² (int8_serving is neutral
    here — the transformer is a minor fraction of the stage)."""

    def __init__(
        self,
        pretrain_root: Optional[str] = None,
        cfg: TSDSRConfig = TSDSRConfig(),
        sd3_cfg: SD3Config = SD3Config.sd3_medium(),
        transformer_params: Optional[Dict[str, Any]] = None,
        vae_params: Optional[Dict[str, Any]] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,
        pooled_embeds: Optional[jnp.ndarray] = None,
        mesh: Optional[Any] = None,
    ):
        self.cfg = cfg
        self.sd3_cfg = sd3_cfg
        self.vae_cfg = VAEConfig.sd3()
        self.transformer_params = transformer_params
        self.vae_params = vae_params
        self.prompt_embeds = prompt_embeds
        self.pooled_embeds = pooled_embeds
        self.mesh = mesh
        if pretrain_root is not None and transformer_params is None:
            self._try_load(pretrain_root)
        if cfg.int8_serving and self.transformer_params is not None:
            from ...ops.quant import quantize_linears

            self.transformer_params = quantize_linears(self.transformer_params)
        if mesh is not None and self.transformer_params is not None:
            from ...parallel.sharding import sd3_param_shardings, shard_params

            self.transformer_params = shard_params(
                self.transformer_params,
                sd3_param_shardings(self.transformer_params, mesh),
            )

    def _try_load(self, root: str) -> None:
        from ..flux.loader import iter_safetensors, vae_params_from_state_dict
        from .loader import sd3_params_from_state_dict

        tdir = os.path.join(root, "sd3", "transformer")
        vdir = os.path.join(root, "sd3", "vae")
        try:
            self.transformer_params = sd3_params_from_state_dict(
                iter_safetensors(tdir), self.sd3_cfg
            )
            self.vae_params = vae_params_from_state_dict(
                iter_safetensors(vdir), self.vae_cfg
            )
            emb = os.path.join(root, "tsdsr", "prompt_embeds.npz")
            if os.path.exists(emb):
                z = np.load(emb)
                self.prompt_embeds = jnp.asarray(z["prompt_embeds"])
                self.pooled_embeds = jnp.asarray(z["pooled_embeds"])
        except (FileNotFoundError, OSError) as e:
            print(f"[tsdsr] SD3 weights not found ({e}); bicubic fallback")

    # ---------------------------------------------------------------- ops

    def _upscale(self, image: jnp.ndarray) -> jnp.ndarray:
        H, W, C = image.shape
        s = self.cfg.upscale
        return jax.image.resize(image, (H * s, W * s, C), method="bicubic")

    @contextlib.contextmanager
    def staged(self):
        """host_params staging window: device_put the weight trees once,
        run any number of :meth:`__call__`/:meth:`_infer` inside, restore
        the host refs on exit (the caller must fence — pull results to the
        host — before the window closes so the dropped device copies
        actually free; ``block_until_ready`` does not fence through the
        remote-exec tunnel)."""
        if (not self.cfg.host_params or getattr(self, "_staged", False)
                or self.transformer_params is None
                or self.vae_params is None):
            yield
            return
        host_t, host_v = self.transformer_params, self.vae_params
        dev = jax.devices()[0]
        # drain the device queue before the transfer: device_put
        # allocates on arrival while queued programs (e.g. a pending
        # denoise) still hold their temps — pulling the result of a
        # fresh trivial program through the FIFO queue fences them
        # (block_until_ready does not fence through the remote tunnel)
        np.asarray(jnp.zeros((), jnp.float32) + jnp.ones((), jnp.float32))
        if self.cfg.stage_pack_int4:
            if not hasattr(self, "_host_packed_t"):
                from ...ops.quant import pack_int4_tree, unpack_int4_tree

                # one-time host pack (~seconds); the packed tree rides
                # every later window's transfer at half the bytes and
                # unpacks on device.  NO buffer donation: device_put of an
                # already-on-device leaf ALIASES it, so a donated unpack
                # would delete the caller's own pass-through arrays; the
                # packed+unpacked transient (~3.3 GB at SD3-medium) fits
                # the measured ~4.6 GB staged-SR headroom
                # pack_bf16_wo: the W8A8 kernels are only ~1 GB of the
                # 3.06 GB SD3 tree (INT4_STAGING_r05) — the bf16 q/k +
                # AdaLN + embedder linears must pack too (weight-only
                # int4 -> kernel_int8_wo) for the transfer cut to matter
                self._host_packed_t = pack_int4_tree(
                    host_t, pack_bf16_wo=self.cfg.stage_pack_bf16)
                self._unpack_jit = jax.jit(unpack_int4_tree)
            self.transformer_params = self._unpack_jit(
                _chunked_put(self._host_packed_t, dev))
        else:
            self.transformer_params = _chunked_put(host_t, dev)
        self.vae_params = _chunked_put(host_v, dev)
        self._staged = True
        try:
            yield
        finally:
            self._staged = False
            self.transformer_params, self.vae_params = host_t, host_v

    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        if (not self.cfg.host_params or getattr(self, "_staged", False)
                or self.transformer_params is None
                or self.vae_params is None):
            return self._infer(image)
        with self.staged():
            out = self._infer(image)
            # host round-trip fence (see staged()) before the device
            # weight copies drop
            return jnp.asarray(np.asarray(out))

    def _infer(self, image: jnp.ndarray) -> jnp.ndarray:
        image = jnp.asarray(image, jnp.float32)
        up = _upscale_clip_jit(image, self.cfg.upscale)
        if self.transformer_params is None or self.vae_params is None:
            return up

        x = up[None] * 2.0 - 1.0
        cfg = self.cfg

        if max(x.shape[1:3]) > cfg.vae_encoder_tile:
            lq_latent = self._tiled_encode(x)
        else:
            lq_latent = vae_encode_jit(self.vae_params, self.vae_cfg, x)

        B = 1
        S_txt = 154 if self.prompt_embeds is None else self.prompt_embeds.shape[-2]
        prompt = (
            self.prompt_embeds
            if self.prompt_embeds is not None
            else jnp.zeros((B, S_txt, self.sd3_cfg.joint_attention_dim))
        )
        if prompt.ndim == 2:
            prompt = prompt[None]
        pooled = (
            self.pooled_embeds
            if self.pooled_embeds is not None
            else jnp.zeros((B, self.sd3_cfg.pooled_projection_dim))
        )
        if pooled.ndim == 1:
            pooled = pooled[None]
        def step(lat_tiles):
            nb = lat_tiles.shape[0]
            tprompt = jnp.broadcast_to(prompt, (nb,) + prompt.shape[1:])
            t = jnp.full((nb,), cfg.timestep, jnp.float32)
            tpooled = jnp.broadcast_to(pooled, (nb,) + pooled.shape[1:])
            if self.mesh is not None:
                from ...parallel.sharding import data_sharding

                # the 'data' axis requires a divisible batch: pad the tile
                # chunk with repeats and slice the results back
                dsize = self.mesh.shape["data"]
                pad = (-nb) % dsize
                tiles = lat_tiles
                if pad:
                    tiles = jnp.concatenate(
                        [tiles,
                         jnp.broadcast_to(
                             tiles[:1], (pad,) + tiles.shape[1:])],
                        axis=0,
                    )
                    tprompt = jnp.broadcast_to(
                        prompt, (nb + pad,) + prompt.shape[1:])
                    t = jnp.full((nb + pad,), cfg.timestep, jnp.float32)
                    tpooled = jnp.broadcast_to(
                        pooled, (nb + pad,) + pooled.shape[1:])
                with jax.set_mesh(self.mesh):
                    tiles = jax.device_put(
                        tiles, data_sharding(self.mesh, 4))
                    out = _sd3_tile_step(
                        self.transformer_params, self.sd3_cfg, tiles,
                        tprompt, t, tpooled,
                    )
                return out[:nb]
            # jitted single-device step: eager sd3_forward materializes a
            # bf16 dequant copy of every int8 kernel and every glue
            # intermediate as its own dispatch-time allocation — under
            # FLUX co-residency (~1.5 GB headroom) that alone OOMs; one
            # compiled program lets XLA schedule/reuse the temps
            return _sd3_tile_step(
                self.transformer_params, self.sd3_cfg, lat_tiles,
                tprompt, t, tpooled,
            )

        pred = tiled_apply_batched(
            step, lq_latent, cfg.latent_tile, cfg.latent_overlap,
            tile_batch=cfg.tile_batch,
            out_channels=self.vae_cfg.latent_channels,
        )
        latent_stu = lq_latent - pred

        out = self._tiled_decode(latent_stu)
        return _sr_finish_jit(out, up, cfg.align_method)

    def _run_tile_batches(self, fn, tiles: jnp.ndarray, bs: int) -> jnp.ndarray:
        """Run ``fn`` over [N, t, t, C] stacked tiles in ``bs``-sized
        chunks — one big dispatch per chunk instead of one per tile (each
        eager dispatch also pays the host->device round-trip).  On a mesh
        the chunk batch is data-parallel (padded to the 'data' axis)."""
        outs = []
        for i in range(0, tiles.shape[0], bs):
            chunk = tiles[i : i + bs]
            if self.mesh is not None:
                from ...parallel.sharding import data_sharding

                nb = chunk.shape[0]
                pad = (-nb) % self.mesh.shape["data"]
                if pad:
                    chunk = jnp.concatenate(
                        [chunk,
                         jnp.broadcast_to(
                             chunk[:1], (pad,) + chunk.shape[1:])],
                        axis=0,
                    )
                with jax.set_mesh(self.mesh):
                    chunk = jax.device_put(
                        chunk, data_sharding(self.mesh, 4))
                    outs.append(fn(chunk)[:nb])
            else:
                outs.append(fn(chunk))
        return jnp.concatenate(outs, axis=0)

    def _tiled_encode(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        ds = self.vae_cfg.downscale
        tile = cfg.vae_encoder_tile
        _, H, W, _ = x.shape
        offs = [
            (oy, ox)
            for oy in _tile_offsets(H, tile, tile // 4)
            for ox in _tile_offsets(W, tile, tile // 4)
        ]
        tiles = jnp.concatenate(
            [
                jax.lax.dynamic_slice(
                    x, (0, oy, ox, 0), (1, tile, tile, x.shape[-1]))
                for oy, ox in offs
            ],
            axis=0,
        )
        t_out = self._run_tile_batches(
            lambda b: vae_encode_jit(self.vae_params, self.vae_cfg, b),
            tiles, self.cfg.vae_encode_batch,
        ).astype(jnp.float32)
        lat = jnp.zeros((1, H // ds, W // ds, self.vae_cfg.latent_channels), jnp.float32)
        cnt = jnp.zeros((1, H // ds, W // ds, 1), jnp.float32)
        w = gaussian_tile_weights(tile // ds)[None, :, :, None]
        lt = tile // ds
        for n, (oy, ox) in enumerate(offs):
            ly, lx = oy // ds, ox // ds
            lat = jax.lax.dynamic_update_slice(
                lat,
                jax.lax.dynamic_slice(
                    lat, (0, ly, lx, 0), (1, lt, lt, lat.shape[-1]))
                + t_out[n : n + 1] * w,
                (0, ly, lx, 0),
            )
            cnt = jax.lax.dynamic_update_slice(
                cnt,
                jax.lax.dynamic_slice(cnt, (0, ly, lx, 0), (1, lt, lt, 1)) + w,
                (0, ly, lx, 0),
            )
        return lat / jnp.maximum(cnt, 1e-8)

    def _auto_decode_batch(self) -> int:
        """Resolve ``vae_decode_batch == 0``: largest of (8, 4, 2, 1) whose
        estimated activation peak fits the chip's free HBM, computed ONCE
        per process (static shapes — no recompiles).  Peak anchor: the
        measured ~1.6 GB/tile (bf16, 128² decoder tile; f32 doubles it),
        scaled by (tile/128)² and dtype, with a 20% safety margin.  Falls
        back to the measured-safe batch 2 when memory stats are
        unavailable (CPU, or a runtime without the stats API)."""
        cached = getattr(self, "_auto_batch", None)
        if cached is not None:
            return cached
        per_tile = 1.6e9 * (self.cfg.vae_decoder_tile / 128.0) ** 2
        if self.cfg.vae_decode_dtype != "bfloat16":
            per_tile *= 2.0
        batch = 2
        try:
            stats = jax.devices()[0].memory_stats() or {}
            free = stats["bytes_limit"] - stats["bytes_in_use"]
        except (KeyError, AttributeError, TypeError, RuntimeError):
            free = None
        if free is not None:
            batch = 1
            for b in (8, 4, 2):
                if b * per_tile <= 0.8 * free:
                    batch = b
                    break
        self._auto_batch = batch
        return batch

    def _tiled_decode(self, lat: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        ds = self.vae_cfg.downscale
        tile = cfg.vae_decoder_tile
        _, h, w_, C = lat.shape
        dec_dtype = jnp.bfloat16 if cfg.vae_decode_dtype == "bfloat16" \
            else jnp.float32
        lat = lat.astype(dec_dtype)
        if h <= tile and w_ <= tile:
            return vae_decode_jit(
                self.vae_params, self.vae_cfg, lat
            ).astype(jnp.float32)
        offs = [
            (oy, ox)
            for oy in _tile_offsets(h, tile, tile // 4)
            for ox in _tile_offsets(w_, tile, tile // 4)
        ]
        tiles = jnp.concatenate(
            [
                jax.lax.dynamic_slice(lat, (0, oy, ox, 0), (1, tile, tile, C))
                for oy, ox in offs
            ],
            axis=0,
        )
        decode_batch = (self.cfg.vae_decode_batch
                        or self._auto_decode_batch())
        t_out = self._run_tile_batches(
            lambda b: vae_decode_jit(self.vae_params, self.vae_cfg, b),
            tiles, decode_batch,
        ).astype(jnp.float32)
        wgt = gaussian_tile_weights(tile * ds)[None, :, :, None]
        return _assemble_decode_jit(
            t_out, wgt,
            tuple((oy * ds, ox * ds) for oy, ox in offs),
            tile * ds, h * ds, w_ * ds,
        )
