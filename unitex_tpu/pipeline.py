"""End-to-end texture generation pipeline.

API-compatible equivalent of ``CustomRGBTextureFullPipeline``
(/root/reference/pipeline.py:141-632): one RGB reference image + an
untextured mesh -> a textured GLB, through

  step_1_1        mesh preprocess -> reference-image matting -> 6-view
                  geometry conditioning renders -> FLUX texture pass ->
                  FLUX delight pass (-> optional TSD-SR upscale)
  step_2_ablition multi-view back-projection bake -> textured_mesh.glb
                  (the released no-LTM path, pipeline.py:620-632)

Artifact names match the reference so downstream tooling ports unchanged:
``processed_mesh.obj``, ``rembg_image.png``, ``processed_image.png``,
``mv_alpha/ccm/normal.png``, ``camera_info.npz``, ``mv_rgb_w_light.png``,
``mv_rgb.png``, ``textured_mesh.glb``, ``visable_uv_mask.png``,
``valid_uv_mask.png``, ``completed_uv.png``.

Unlike the reference, the filesystem is not the inter-stage bus: stages
pass in-memory arrays and *also* dump the artifacts for inspection/parity.

Weights: ``pretrain_models`` points at a root containing
``flux/transformer`` + ``flux/vae`` safetensors and the two LoRAs
(``texture_lora.safetensors`` / ``delight_lora.safetensors``).  Without
weights, ``require_weights=False`` substitutes a documented geometry-shaded
stand-in for the diffusion output so the geometry/bake stack still runs
end-to-end (CI, smoke tests).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DEFAULT_CONFIG, PipelineConfig
from .geometry.io.mesh_io import HostMesh, load_mesh, save_mesh, save_obj
from .geometry.mesh import Mesh
from .geometry.uv_atlas import preprocess_blank_mesh
from .image.process_image import preprocess_reference_image
from .image.rembg import build_background_remover
from .models.flux.config import FluxConfig
from .models.flux.pipeline import FluxPipelineConfig, run_flux_pipeline
from .models.flux.vae import VAEConfig
from .render.conditioning import (
    grid_to_strip,
    grid_to_views,
    render_geometry_condition,
    strip_to_grid,
)
from .render.renderer_inverse import bake_texture
from .utils.image_io import load_image, save_image, to_uint8
from .utils.timer import CPUTimer

from contextlib import nullcontext as _nullcontext


@jax.jit
def _u8_to_f32_jit(x):
    return x.astype(jnp.float32) / 255.0


class RGBTextureFullPipelineBase:
    """Owns the models + renderers (reference pipeline.py:141-166)."""

    def __init__(
        self,
        pretrain_models: Optional[str] = None,
        super_resolutions: bool = False,
        seed: int = 63,
        config: PipelineConfig = DEFAULT_CONFIG,
        require_weights: bool = False,
        save_artifacts: bool = True,
        int8_serving: bool | str = False,
        async_io: bool = False,
        random_weights: bool = False,
        params_cache: Optional[str] = None,
        params_cache_int4: bool = False,
    ):
        from .utils import enable_compilation_cache

        enable_compilation_cache()
        self.config = config
        self.seed = seed
        self.super_resolutions = super_resolutions
        self.pretrain_models = pretrain_models
        # async_io: final GLB encode+write (0.8-2.6 s of host PNG/GLB
        # encoding per asset) runs on a single-thread writer pool so it
        # overlaps the NEXT job's device work in a batch driver.  The
        # single thread preserves write order; call flush_io() before
        # consuming outputs (batch drivers flush at end of queue).
        self.async_io = async_io
        self._io_pool = None
        self._io_pending = []
        if async_io:
            from concurrent.futures import ThreadPoolExecutor

            self._io_pool = ThreadPoolExecutor(max_workers=1)
        # int8_serving: False (bf16) | True (W8A8, the measured-fastest
        # serving mode) | "max_memory" (+ weight-only int8 for q/k/AdaLN —
        # the full 12B fits one 16 GB chip).  LoRA adapters are then
        # runtime-attached (lora.attach_lora) instead of kernel-merged.
        self.int8_serving = int8_serving
        # params_cache: directory holding the POST-quantization serving
        # tree (utils/param_cache.py) — the TPU analog of the reference's
        # prequantized-NF4 checkpoint branch (reference pipeline.py:74-96).
        # Building the 12B serving tree (load/init -> bf16 -> int8) costs
        # ~45 min of single-core host time; the cache is one file read.
        # The filename is keyed by the quantization mode so a mode switch
        # never reads a mismatched tree.
        self.params_cache = params_cache
        # params_cache_int4: store the int8 serving kernels 4-bit in the
        # cache (ops/quant.pack_int4_tree, group-64) and unpack ON DEVICE
        # after the transfer — halves both the cache file read and the
        # ~12 GB host->device transfer a fresh process pays (~40 MB/s
        # tunnel).  The closest analog of the reference's prequantized-NF4
        # checkpoint (pipeline.py:74-96): like NF4 it is a lossy 4-bit
        # weight grid, so it is OPT-IN; the process that BUILDS the cache
        # serves exact int8, later cache-loading processes serve the int4
        # re-grid.  Requires an int8 serving mode.
        self.params_cache_int4 = params_cache_int4 and bool(int8_serving)
        self._flux_cache_packed = False
        # kinds whose on-disk cache failed validation this process: the
        # rebuilt tree may then OVERWRITE the stale file (otherwise the
        # cache would never refresh after a quantizer change, ADVICE r03)
        self._stale_caches: set = set()
        # production serving can skip the intermediate artifact PNGs
        # (2048^2 encodes cost seconds each); final outputs always save
        self.save_artifacts = save_artifacts
        self.rembg = build_background_remover(pretrain_models)
        self.flux_cfg = FluxConfig.flux1_dev()
        self.vae_cfg = VAEConfig.flux()
        self._flux_loaded = False
        self.device_mesh = None
        self.transformer_params = None
        self.vae_params = None
        self.texture_lora = None
        self.delight_lora = None
        self.sr_pipeline = None
        if pretrain_models is not None:
            self._try_load_weights(require_weights)
        elif random_weights:
            # production-SCALE random init: the E2E measurement path when
            # no checkpoints exist in the environment (WEIGHTS.md) — real
            # 12B shapes, real LoRA attach, real quantization, same
            # compiled programs as the weighted pipeline
            self._init_random_weights()
        elif require_weights:
            raise FileNotFoundError("pretrain_models is required")
        if super_resolutions:
            from .models.sd3.sr_pipeline import TSDSRPipeline

            # share the FLUX device mesh: SD3 runs tensor-parallel over
            # 'model' and tile-batches data-parallel over 'data'
            self.sr_pipeline = TSDSRPipeline(
                pretrain_models, mesh=self.device_mesh
            )

    # bump when the serving-tree layout produced by quantize_flux_params /
    # the npz encoding changes: a version mismatch invalidates old caches
    # instead of silently serving a stale tree (ADVICE r03)
    _PARAMS_CACHE_VERSION = 1

    def _cache_path(self, kind: str) -> Optional[str]:
        if not self.params_cache:
            return None
        mode = {False: "bf16", True: "int8", "max_memory": "int8wo"}[
            self.int8_serving
        ]
        if self.params_cache_int4:
            mode += "4"
        return os.path.join(self.params_cache, f"{kind}_{mode}.npz")

    def _cache_meta(self, kind: str) -> Dict[str, Any]:
        """Cache fingerprint: format/quantizer version + source checkpoint
        identity (path+mtime) — the things leaf-shape validation cannot
        catch (same shapes, different weights)."""
        if self.pretrain_models:
            tdir = os.path.join(self.pretrain_models, "flux", "transformer")
            try:
                src = f"{tdir}:{os.path.getmtime(tdir):.0f}"
            except OSError:
                src = tdir
        else:
            src = kind  # random-init caches carry the seed in the kind name
        return {"version": self._PARAMS_CACHE_VERSION, "source": src}

    def _expected_serving_tree(self):
        """Abstract (eval_shape) serving tree for the current flux_cfg +
        quantization mode — the ground truth a cached tree must match."""
        from .models.flux.model import init_flux_params

        def build(key):
            p = init_flux_params(key, self.flux_cfg)
            p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
            if self.int8_serving:
                from .models.flux.quantize import quantize_flux_params

                p = quantize_flux_params(
                    p, weight_only_rest=(self.int8_serving == "max_memory")
                )
            return p
        return jax.eval_shape(build, jax.random.key(0))

    def _validate_cached_tree(self, tree) -> Optional[str]:
        """Leaf path/shape/dtype check of a cache-loaded tree against the
        config-derived expectation; returns a mismatch description or
        None.  A stale cache (config change, quantizer change) otherwise
        surfaces as wrong weights or a late confusing shape error."""
        import jax.tree_util as jtu

        exp = jtu.tree_flatten_with_path(self._expected_serving_tree())[0]
        got = jtu.tree_flatten_with_path(tree)[0]
        if len(exp) != len(got):
            return f"leaf count {len(got)} != expected {len(exp)}"
        for (pe, le), (pg, lg) in zip(exp, got):
            if pe != pg:
                return f"leaf path {jtu.keystr(pg)} != expected {jtu.keystr(pe)}"
            if tuple(le.shape) != tuple(lg.shape):
                return (f"{jtu.keystr(pe)}: shape {tuple(lg.shape)} != "
                        f"expected {tuple(le.shape)}")
            if jnp.dtype(le.dtype) != jnp.dtype(lg.dtype):
                return (f"{jtu.keystr(pe)}: dtype {jnp.dtype(lg.dtype)} != "
                        f"expected {jnp.dtype(le.dtype)}")
        return None

    def _load_cached_tree(self, kind: str):
        path = self._cache_path(kind)
        if not (path and os.path.exists(path)):
            return None
        from .utils.param_cache import load_meta, load_params

        meta = load_meta(path)
        if meta is not None and meta != self._cache_meta(kind):
            print(f"[pipeline] params cache STALE {path}: fingerprint "
                  f"{meta} != {self._cache_meta(kind)}; rebuilding")
            self._stale_caches.add(kind)
            return None
        t0 = time.perf_counter()
        tree = load_params(path)
        if self.params_cache_int4:
            # the stored tree is nibble-packed: validate its UNPACKED
            # abstract shape against the serving expectation
            from .ops.quant import unpack_int4_tree

            try:
                err = self._validate_cached_tree(
                    jax.eval_shape(unpack_int4_tree, tree))
            except Exception as e:  # malformed pack: treat as stale
                err = f"int4 unpack failed: {e}"
            self._flux_cache_packed = err is None
        else:
            err = self._validate_cached_tree(tree)
        if err is not None:
            print(f"[pipeline] params cache STALE {path}: {err}; rebuilding")
            self._stale_caches.add(kind)
            return None
        print(f"[pipeline] params cache hit {path} "
              f"({time.perf_counter() - t0:.1f}s)")
        return tree

    def _store_cached_tree(self, kind: str, tree) -> None:
        path = self._cache_path(kind)
        if path and (not os.path.exists(path) or kind in self._stale_caches):
            from .utils.param_cache import save_params

            t0 = time.perf_counter()
            if self.params_cache_int4:
                from .ops.quant import pack_int4_tree

                tree = pack_int4_tree(tree)
            save_params(path, tree, meta=self._cache_meta(kind))
            self._stale_caches.discard(kind)
            print(f"[pipeline] params cache write {path} "
                  f"({time.perf_counter() - t0:.1f}s)")

    def _try_load_weights(self, require: bool) -> None:
        from .models.flux.loader import load_flux_transformer, load_vae
        from .models.flux.lora import load_lora_safetensors

        root = self.pretrain_models
        tdir = os.path.join(root, "flux", "transformer")
        vdir = os.path.join(root, "flux", "vae")
        try:
            # STAGE ON HOST: load/cast/quantize on the cpu backend, then
            # device_put the final serving tree.  Committing the 24 GB bf16
            # tree to the accelerator first would OOM the single-chip
            # "max_memory" mode this exists for (16 GB HBM), and doubles
            # peak HBM in every other mode.
            host = jax.devices("cpu")[0]
            cached = self._load_cached_tree("flux")
            with jax.default_device(host):
                if cached is None:
                    self.transformer_params = load_flux_transformer(
                        tdir, self.flux_cfg
                    )
                else:
                    self.transformer_params = cached
                self.vae_params = load_vae(vdir, self.vae_cfg)
                for name in ("texture", "delight"):
                    p = os.path.join(root, f"{name}_lora.safetensors")
                    if os.path.exists(p):
                        lora = load_lora_safetensors(
                            p,
                            self.flux_cfg.num_layers,
                            self.flux_cfg.num_single_layers,
                        )
                        setattr(self, f"{name}_lora", lora)
                if cached is None:
                    self.transformer_params = jax.tree.map(
                        lambda x: x.astype(jnp.bfloat16),
                        self.transformer_params,
                    )
                    if self.int8_serving:
                        from .models.flux.quantize import quantize_flux_params

                        self.transformer_params = quantize_flux_params(
                            self.transformer_params,
                            weight_only_rest=(
                                self.int8_serving == "max_memory"
                            ),
                        )
                    self._store_cached_tree("flux", self.transformer_params)
            self._place_flux_params()
        except (FileNotFoundError, OSError) as e:
            if require:
                raise
            print(f"[pipeline] FLUX weights not found ({e}); running weightless")

    def _init_random_weights(self) -> None:
        """Random-init the serving tree at PRODUCTION scale (numpy host
        init — f32 12B jax.random temporaries would blow the 16 GB HBM and
        threefry is minutes-slow on CPU), cast/quantize/place exactly like
        :meth:`_try_load_weights`.  Outputs are meaningless images; every
        compiled program, transfer, and memory footprint is the real
        one."""
        from .models.flux.lora import init_lora_params
        from .models.flux.model import init_flux_params_numpy
        from .models.flux.vae import init_vae_params

        host = jax.devices("cpu")[0]
        cached = self._load_cached_tree("flux_random_s0")
        with jax.default_device(host):
            if cached is None:
                self.transformer_params = init_flux_params_numpy(
                    self.flux_cfg, seed=0
                )
            else:
                self.transformer_params = cached
            # an int4-packed cache load needs the UNPACKED leaf names and
            # [L, d_in, d_out] shapes for LoRA sizing — init_lora_params
            # only reads shapes, so the abstract unpack suffices
            lora_src = self.transformer_params
            if self._flux_cache_packed:
                from .ops.quant import unpack_int4_tree

                lora_src = jax.eval_shape(unpack_int4_tree, lora_src)
            self.texture_lora = init_lora_params(
                jax.random.key(1), lora_src, rank=16
            )
            self.delight_lora = init_lora_params(
                jax.random.key(2), lora_src, rank=16
            )
            self.vae_params = init_vae_params(jax.random.key(3), self.vae_cfg)
            if cached is None:
                self.transformer_params = jax.tree.map(
                    lambda x: jnp.asarray(x, jnp.bfloat16),
                    self.transformer_params,
                )
                if self.int8_serving:
                    from .models.flux.quantize import quantize_flux_params

                    self.transformer_params = quantize_flux_params(
                        self.transformer_params,
                        weight_only_rest=(self.int8_serving == "max_memory"),
                    )
                self._store_cached_tree("flux_random_s0",
                                        self.transformer_params)
        self._place_flux_params()
        self._flux_loaded = True

    def _place_flux_params(self) -> None:
        """Move the host serving tree to the device(s).  An int4-packed
        cache load transfers the packed tree (half the ~12 GB / ~40 MB/s
        tunnel crossing) and unpacks ON DEVICE; multi-device placement
        unpacks on the host first (the Megatron shardings are keyed to the
        serving-tree leaf names/shapes), keeping correctness there at the
        cost of the transfer win — the single-chip max_memory mode is what
        the packed cache exists for."""
        if jax.device_count() > 1:
            from .parallel.mesh import make_mesh
            from .parallel.sharding import flux_param_shardings, shard_params

            if self._flux_cache_packed:
                from .ops.quant import unpack_int4_tree

                host = jax.devices("cpu")[0]
                with jax.default_device(host):
                    self.transformer_params = unpack_int4_tree(
                        self.transformer_params)
                self._flux_cache_packed = False
            self.device_mesh = make_mesh(
                data=self.config.parallel.data_size, model=-1
            )
            self.transformer_params = shard_params(
                self.transformer_params,
                flux_param_shardings(self.transformer_params, self.device_mesh),
            )
        else:
            dev = jax.devices()[0]
            self.transformer_params = jax.device_put(
                self.transformer_params, dev
            )
            if self._flux_cache_packed:
                from .ops.quant import unpack_int4_tree

                self.transformer_params = jax.jit(unpack_int4_tree)(
                    self.transformer_params)
                self._flux_cache_packed = False
            self.vae_params = jax.device_put(self.vae_params, dev)
        self._flux_loaded = True

    def prewarm(self, n_faces_hint: int = 20_000) -> Dict[str, float]:
        """Load/compile the device executables for the default operating
        point BEFORE the first real job: runs every device stage once on a
        synthetic asset at the default shape bucket (a fresh process
        otherwise spends ~3.5-5 min of cached-executable loads inside
        job 1 — CLAUDE.md measured facts).  Returns the per-stage warm-up
        seconds, which is also the cold-start breakdown VERDICT r02 #9
        asked for.  Serving calls this from the device worker at startup
        (TextureJobServer prewarm=True) so it overlaps the first job's
        host-side preprocessing."""
        import tempfile
        import time as _time

        from .geometry.io.mesh_io import save_mesh
        from .geometry.primitives import make_icosphere

        timings: Dict[str, float] = {}
        with tempfile.TemporaryDirectory(prefix="prewarm_") as d:
            # icosphere at the face budget's default bucket
            subdiv, faces = 2, 320
            while faces * 4 <= max(n_faces_hint, 1280):
                subdiv, faces = subdiv + 1, faces * 4
            mesh_path = os.path.join(d, "prewarm.obj")
            save_mesh(mesh_path, make_icosphere(subdiv))
            img = np.full((256, 256, 3), 255, np.uint8)
            img[64:192, 64:192] = [180, 80, 40]
            img_path = os.path.join(d, "prewarm.png")
            from PIL import Image

            Image.fromarray(img).save(img_path)

            t0 = _time.perf_counter()
            processed, ref_image = self.preprocess_job(d, img_path, mesh_path)
            timings["host_preprocess"] = _time.perf_counter() - t0

            t0 = _time.perf_counter()
            condition = self.render_geometry_images_stage(d, processed)
            jax.block_until_ready(condition["alpha"])
            timings["render_geometry"] = _time.perf_counter() - t0

            t0 = _time.perf_counter()
            mv_rgb = self.infer_mv_stage(d, ref_image, condition)
            timings["infer_mv"] = _time.perf_counter() - t0

            t0 = _time.perf_counter()
            self.reproject_stage(
                d, condition["mesh"], mv_rgb, condition, processed
            )
            self.flush_io()
            timings["reproject"] = _time.perf_counter() - t0
        return {k: round(v, 2) for k, v in timings.items()}

    # ---------------------------------------------------------- async io

    def _submit_io(self, fn, *args):
        """Run ``fn(*args)`` now (sync mode) or enqueue it on the ordered
        single-thread writer pool (async_io)."""
        if self._io_pool is None:
            fn(*args)
        else:
            self._io_pending.append(self._io_pool.submit(fn, *args))

    def flush_io(self) -> None:
        """Join all pending async writes, re-raising the first failure."""
        pending, self._io_pending = self._io_pending, []
        for f in pending:
            f.result()

    # ------------------------------------------------------------ stages

    def preprocess_job(self, save_dir: str, image_path: str, mesh_path: str):
        """All host-side CPU preprocessing of one job (mesh normalize/
        decimate/unwrap + reference-image matting), split out so a batch
        driver can run it in a worker thread OVERLAPPED with the device
        work of the previous job (host/device pipelining; the reference is
        strictly sequential, pipeline.py:594-617).  Returns the
        ``preprocessed`` tuple accepted by ``__call__``."""
        cache = os.path.join(save_dir, "cache")
        os.makedirs(cache, exist_ok=True)
        mesh = self.preprocess_blank_mesh_stage(cache, mesh_path)
        ref = self.preprocess_reference_image_stage(cache, image_path)
        return mesh, ref

    @CPUTimer("preprocess_blank_mesh")
    def preprocess_blank_mesh_stage(self, save_dir: str, mesh_path: str) -> HostMesh:
        mesh = load_mesh(mesh_path)
        mesh = preprocess_blank_mesh(
            mesh,
            min_faces=self.config.mesh.min_faces,
            max_faces=self.config.mesh.max_faces,
            uv_size=self.config.mesh.uv_size,
            gutter=self.config.mesh.uv_gutter,
        )
        save_obj(os.path.join(save_dir, "processed_mesh.obj"), mesh)
        return mesh

    @CPUTimer("preprocess_reference_image")
    def preprocess_reference_image_stage(self, save_dir: str, image_path: str):
        from PIL import Image

        img = Image.open(image_path).convert("RGB").resize((1024, 1024))
        out = preprocess_reference_image(
            img, H=1024, W=1024, scale=0.95, color="grey",
            background_remover=self.rembg,
        )
        out.save(os.path.join(save_dir, "rembg_image.png"))
        small = out.convert("RGB").resize((512, 512))
        small.save(os.path.join(save_dir, "processed_image.png"))
        return np.asarray(small, np.float32) / 255.0

    @CPUTimer("render_geometry_images")
    def render_geometry_images_stage(
        self, save_dir: str, mesh: HostMesh
    ) -> Dict[str, jnp.ndarray]:
        cam = self.config.camera
        device_mesh = Mesh(
            jnp.asarray(mesh.vertices * self.config.mesh.scale_to),
            jnp.asarray(mesh.faces),
            uv=jnp.asarray(mesh.uv) if mesh.uv is not None else None,
            faces_uv=jnp.asarray(mesh.faces_uv) if mesh.faces_uv is not None else None,
        )
        # bucket the static shapes so differently-sized assets in a batch
        # share compiled programs (exported artifacts stay unpadded)
        from .geometry.mesh import pad_mesh_to_bucket

        device_mesh = pad_mesh_to_bucket(
            device_mesh, self.config.mesh.shape_bucket
        )
        out = render_geometry_condition(
            device_mesh,
            view_size=cam.view_size,
            radius=cam.radius,
            ortho_scale=cam.ortho_scale,
            background=0.5,
            rows=cam.rows,
            cols=cam.cols,
            # max_memory serving: the conditioning render's full-grid
            # gather tail measured 2.0 GB of temps — too big next to the
            # 12 GB int8 FLUX (+2.3 GB SD3 with --sr); slab it (r04)
            row_chunk=(64 if self.int8_serving == "max_memory"
                       and self._flux_loaded else None),
            tile_batch=(8 if self.int8_serving == "max_memory"
                        and self._flux_loaded else 64),
        )
        if self.save_artifacts:
            save_image(os.path.join(save_dir, "mv_alpha.png"), out["alpha"])
            save_image(os.path.join(save_dir, "mv_ccm.png"), out["ccm"])
            save_image(os.path.join(save_dir, "mv_normal.png"), out["normal"])
        np.savez(
            os.path.join(save_dir, "camera_info.npz"),
            c2ws=np.asarray(out["c2ws"]),
            intrinsics=np.asarray(out["intrinsics"]),
            perspective=np.asarray(self.config.camera.perspective),
        )
        out["mesh"] = device_mesh
        return out

    @CPUTimer("infer_mv")
    def infer_mv_stage(
        self,
        save_dir: str,
        reference_image: np.ndarray,
        condition: Dict[str, jnp.ndarray],
        apply_sr: bool = True,
    ) -> jnp.ndarray:
        """Texture + delight FLUX passes over the 1x6 strip
        (pipeline.py:231-289).  Returns the delighted 2x3 grid [0,1].

        ``apply_sr=False`` defers the TSD-SR stage: batch drivers denoise a
        WINDOW of assets first, then run every grid's SR inside one
        ``sr_pipeline.staged()`` weight-staging window (amortizing the
        ~2.3 GB host->device SD3 transfer that per-asset staging pays per
        asset), calling :meth:`_apply_sr` themselves."""
        dcfg = self.config.diffusion
        # control = 0.5*normal + 0.5*ccm, grid -> strip with down-view flip
        control_grid = 0.5 * condition["normal"] + 0.5 * condition["ccm"]
        control_strip = grid_to_strip(control_grid)

        if self._flux_loaded:
            from .models.flux.lora import attach_lora, merge_lora

            # int8 base kernels cannot be LoRA-merged; attach the exact
            # low-rank delta at runtime instead
            apply_lora = attach_lora if self.int8_serving else merge_lora
            pipe_cfg = FluxPipelineConfig(
                height=dcfg.height,
                width=dcfg.width,
                num_inference_steps=dcfg.num_inference_steps,
                guidance_scale=dcfg.guidance_scale,
                max_sequence_length=dcfg.max_sequence_length,
                velocity_reuse=dcfg.velocity_reuse,
            )
            # optional seed-exact replay of the reference's torch.Generator
            # stream: one generator threaded across both passes, draws in
            # upstream order (noise -> dual eps -> control eps per pass)
            plan_tex = plan_del = {}
            if dcfg.torch_rng_parity:
                import torch

                from .models.flux.pipeline import torch_reference_rng

                gen = torch.Generator().manual_seed(self.seed)
                vs = self.vae_cfg.downscale
                hl, wl = dcfg.height // vs, dcfg.width // vs
                dl = dcfg.dual_size // vs
                C = self.vae_cfg.latent_channels
                p = torch_reference_rng(
                    gen, (hl, wl), dual_hw=(dl, dl), control_hw=(hl, wl),
                    latent_channels=C,
                )
                plan_tex = {
                    "noise": p["noise"],
                    "dual_eps": p["dual_eps"],
                    "control_eps": p["control_eps"],
                }
                p = torch_reference_rng(
                    gen, (hl, wl), control_hw=(hl, wl), latent_channels=C
                )
                plan_del = {"noise": p["noise"], "control_eps": p["control_eps"]}

            # dual conditioning at the configured resolution (the host
            # preprocess always emits 512² — matches the production
            # dual_size, but small configs must not silently push a
            # 512²-latent dual token stream)
            dual = jnp.asarray(reference_image)
            ds = dcfg.dual_size
            if dual.shape[:2] != (ds, ds):
                dual = jax.image.resize(
                    dual, (ds, ds, dual.shape[-1]), "bilinear"
                )
            # texture pass: adapters [1, 0]
            params_tex = apply_lora(
                self.transformer_params,
                [(self.texture_lora, 1.0), (self.delight_lora, 0.0)],
            )
            strip_w_light = run_flux_pipeline(
                params_tex, self.flux_cfg, self.vae_params, self.vae_cfg,
                jax.random.key(self.seed), pipe_cfg,
                control_image=control_strip,
                dual_image=dual,
                **plan_tex,
            )
            if self.save_artifacts:
                save_image(
                    os.path.join(save_dir, "mv_rgb_w_light.png"), strip_w_light
                )
            # delight pass: adapters [0, 1], control = stage-1 output, no dual
            params_del = apply_lora(
                self.transformer_params, [(self.delight_lora, 1.0)]
            )
            strip_delight = run_flux_pipeline(
                params_del, self.flux_cfg, self.vae_params, self.vae_cfg,
                jax.random.key(self.seed), pipe_cfg,
                control_image=strip_w_light,
                **plan_del,
            )
        else:
            # weightless stand-in: the control strip itself (geometry-shaded)
            strip_w_light = control_strip
            if self.save_artifacts:
                save_image(
                    os.path.join(save_dir, "mv_rgb_w_light.png"), strip_w_light
                )
            strip_delight = strip_w_light

        mv_rgb = strip_to_grid(strip_delight)
        if apply_sr:
            mv_rgb = self._apply_sr(mv_rgb, save_dir)
        if self.save_artifacts and (apply_sr or self.sr_pipeline is None):
            save_image(os.path.join(save_dir, "mv_rgb.png"), mv_rgb)
        return mv_rgb

    def _apply_sr(self, mv_rgb, save_dir=None):
        """TSD-SR on the delighted grid (reference pipeline.py:268-289);
        per-VIEW under max-memory co-residency, whole-grid otherwise."""
        if self.sr_pipeline is not None:
            if self.save_artifacts and save_dir is not None:
                save_image(os.path.join(save_dir, "mv_rgb_lr.png"), mv_rgb)
            if self.int8_serving == "max_memory" and self._flux_loaded:
                # low-HBM SR: per-VIEW instead of the reference's whole
                # 2x3 grid — the grid's full-resolution glue buffers
                # (x4 bicubic output, color-fix pyramids at 4096x6144)
                # don't fit next to the 12 GB FLUX + staged SD3; per-view
                # bounds them to 2048^2 (~50 MB).  One staging window
                # serves all 6 views (sr_pipeline.staged()); each view is
                # pulled to the host before the window closes so the
                # dropped device weights actually free.  Color-fix
                # statistics become per-view (the reference's are
                # per-grid) — under the uint8 quantization floor.
                cam = self.config.camera
                views = grid_to_views(mv_rgb, cam.rows, cam.cols)
                # FENCE before the staging device_put: dispatch-side
                # allocations (the 2.3 GB staged weights, the SR tile
                # programs) land IMMEDIATELY, racing the still-executing
                # denoise queue whose temps are live — 12 GB params +
                # denoise temps + staged SD3 overcommits the chip (the
                # r04 --sr encode OOM).  Pulling the views to the host
                # drains the queue first (block_until_ready does not
                # fence through the remote-exec tunnel).
                views = np.asarray(views)
                staged = getattr(self.sr_pipeline, "staged",
                                 None) or (lambda: _nullcontext())
                from .utils.image_io import to_uint8_device

                # adain align: its statistics are GLOBAL per channel, so a
                # per-view transfer genuinely diverges from the reference's
                # per-grid one (COLORFIX_DELTA_r05: mean |d| 0.013, 79% of
                # pixels over the uint8 floor).  The transfer is an affine
                # per channel, so per-grid semantics are recovered EXACTLY:
                # run the views align-free, aggregate grid statistics, and
                # apply one grid-level affine on the host.  (wavelet stays
                # per-view: its deviation is under the uint8 floor for 99%
                # of pixels — seam-band kernel support only.)
                sr_cfg = getattr(self.sr_pipeline, "cfg", None)
                align = getattr(sr_cfg, "align_method", None)
                grid_adain = align == "adain"
                if grid_adain:
                    sr_cfg.align_method = "nofix"
                ups = None
                try:
                    with staged():
                        # pull each SR view QUANTIZED: the tunnel moves
                        # ~40 MB/s (r05 probe), so a 2048² view crosses as
                        # 12.5 MB uint8 in ~0.35 s instead of 50 MB f32 in
                        # ~1.6 s (~7 s/asset over 6 views); the texture is
                        # uint8-quantized downstream anyway
                        sr_views = [
                            np.asarray(to_uint8_device(self.sr_pipeline(v)))
                            for v in views
                        ]
                        if grid_adain:
                            # the adain SOURCE is the bicubic upscale
                            from .models.sd3.sr_pipeline import \
                                _upscale_clip_jit

                            ups = [
                                np.asarray(to_uint8_device(_upscale_clip_jit(
                                    jnp.asarray(v), sr_cfg.upscale)))
                                for v in views
                            ]
                finally:
                    if grid_adain:
                        sr_cfg.align_method = align
                if grid_adain:
                    t = np.stack(sr_views).astype(np.float32) / 255.0
                    s = np.stack(ups).astype(np.float32) / 255.0
                    ax = (0, 1, 2)
                    a = (s.std(axis=ax) + 1e-5) / (t.std(axis=ax) + 1e-5)
                    b = s.mean(axis=ax) - a * t.mean(axis=ax)
                    sr_views = [
                        (np.clip(a * v + b, 0.0, 1.0) * 255.0 + 0.5)
                        .astype(np.uint8)
                        for v in t
                    ]
                # assemble the grid on the HOST: a device copy of the x4
                # grid (300 MB f32) would sit resident through the bake on
                # top of the views themselves; downstream re-puts only
                # what it needs (and re-puts it as uint8, 4x cheaper)
                mv_rgb = np.concatenate(
                    [np.concatenate(sr_views[r * cam.cols:(r + 1) * cam.cols],
                                    axis=1)
                     for r in range(cam.rows)], axis=0)
            else:
                mv_rgb = self.sr_pipeline(mv_rgb)
        return mv_rgb

    @CPUTimer("reproject_and_query_field")
    def reproject_stage(
        self,
        save_dir: str,
        mesh: Mesh,
        mv_rgb_grid: jnp.ndarray,
        condition: Dict[str, jnp.ndarray],
        processed_mesh: HostMesh,
    ) -> str:
        bcfg = self.config.bake
        # uint8 grids (the quantized-pull SR path) cross the tunnel at 1/4
        # the bytes; convert to f32 on DEVICE after the put
        mv_rgb_grid = jnp.asarray(mv_rgb_grid)
        if mv_rgb_grid.dtype == jnp.uint8:
            mv_rgb_grid = _u8_to_f32_jit(mv_rgb_grid)
        views = grid_to_views(mv_rgb_grid, self.config.camera.rows, self.config.camera.cols)
        out = bake_texture(
            mesh,
            views,
            condition["c2ws"],
            condition["intrinsics"],
            uv_size=bcfg.uv_size,
            perspective=self.config.camera.perspective,
            method="reproject",
            grad_norm_threshold=bcfg.grad_norm_threshold,
            ray_normal_angle_threshold=bcfg.ray_normal_angle_threshold,
            depth_eps=bcfg.depth_eps,
            # max_memory serving keeps ~12 GB of int8 12B params resident:
            # the full-grid visibility gather (~2.5 GB temps at 2048²,
            # r04 memory_analysis) OOMed the 16 GB chip — scan views AND
            # row-chunk the per-view texel math (0.62 GB temps at
            # row_chunk=256); also shrink the KNN-fill distance-matrix
            # chunk (4096x65536 f32 would be another 1.07 GB spike)
            low_hbm=(self.int8_serving == "max_memory" and self._flux_loaded),
            **({"knn_chunk": 1024}
               if self.int8_serving == "max_memory" and self._flux_loaded
               else {}),
            # SR-scaled views (2048² instead of 512²): render the bake
            # GEOMETRY at the camera's 512² (the proven plain-serving
            # memory regime — SR only sharpens color; the visibility
            # test is then bit-identical to the non-SR bake) and sample
            # color at the SR resolution; also slab the tail 4x finer
            **({"low_hbm_row_chunk": 64,
                "geometry_size": (self.config.camera.view_size,
                                  self.config.camera.view_size)}
               if self.int8_serving == "max_memory" and self._flux_loaded
               and views.shape[1] > self.config.camera.view_size else {}),
        )
        # quantize on device: the 2048² texture crosses the tunnel as uint8
        # (12.6 MB) instead of f32 (50 MB) — measured 2.5-3.0 s saved
        from .utils.image_io import to_uint8_device

        tex_dev = to_uint8_device(out["texture"])
        glb_path = os.path.join(save_dir, "textured_mesh.glb")
        if self._io_pool is not None and not self.save_artifacts:
            # fast serving: the device->host texture pull (~0.7 s through
            # the tunnel) rides the ordered writer thread with the GLB
            # encode, overlapping the next job's device dispatches
            def _pull_encode_save(path, pm, tex):
                save_mesh(path, HostMesh(
                    pm.vertices, pm.faces, uv=pm.uv, faces_uv=pm.faces_uv,
                    texture=np.asarray(tex),
                ))

            self._submit_io(_pull_encode_save, glb_path, processed_mesh, tex_dev)
            return glb_path

        tex_u8 = np.asarray(tex_dev)
        if self.save_artifacts:
            save_image(
                os.path.join(save_dir, "visable_uv_mask.png"),
                np.asarray(to_uint8_device(
                    out["mask_visible_any"].astype(jnp.float32))),
            )
            save_image(
                os.path.join(save_dir, "valid_uv_mask.png"),
                np.asarray(to_uint8_device(out["mask_2d"].astype(jnp.float32))),
            )
            save_image(os.path.join(save_dir, "completed_uv.png"), tex_u8)

        textured = HostMesh(
            processed_mesh.vertices,
            processed_mesh.faces,
            uv=processed_mesh.uv,
            faces_uv=processed_mesh.faces_uv,
            texture=tex_u8,
        )
        self._submit_io(save_mesh, glb_path, textured)
        return glb_path

    @CPUTimer("export_video")
    def export_video_stage(self, save_dir: str, glb_path: str, name: str) -> None:
        from .render.video import export_orbit_video

        export_orbit_video(
            glb_path,
            os.path.join(save_dir, os.path.splitext(name)[0] + ".mp4"),
            n_frames=self.config.orbit_frames,
            size=self.config.orbit_size,
            fps=self.config.orbit_fps,
        )


class RGBTextureFullPipeline(RGBTextureFullPipelineBase):
    """The LTM-enabled driver (reference pipeline.py:568-617):
    ``step_seq=['step_1_1', 'step_2_1']``; ``step_2_2`` is the LTM-
    inpainting variant — invisible texels are filled by the texture-function
    VAE instead of KNN (``infer_field``/``reproject_and_query_field``
    inpainting=True, pipeline.py:410-564)."""

    def __init__(self, *args, ltm_params=None, ltm_cfg=None,
                 ltm_auto: float | None = 0.93, **kwargs):
        """``ltm_auto``: per-asset fill policy threshold — meshes whose
        chart is at least this fraction visible take the k=8 IDW +
        relaxation fill instead of the LTM field (the measured ORACLE_r05
        split: the field wins every case under ~90% visible by 2.8-4.5 dB
        but loses the 96.6%-visible torus by 2.5; 0.93 is the midpoint).
        ``None`` always uses the field (the reference step_2_2 behavior,
        pipeline.py:410-564)."""
        super().__init__(*args, **kwargs)
        self.ltm_auto = ltm_auto
        if isinstance(ltm_params, str):
            # a scripts/train_ltm.py checkpoint path: the npz meta carries
            # the LTMConfig fields (utils/param_cache.py fingerprint)
            from .models.ltm import LTMConfig
            from .utils.param_cache import load_meta, load_params

            meta = load_meta(ltm_params) or {}
            if ltm_cfg is None:
                ltm_cfg = LTMConfig(**meta.get("config", {}))
            ltm_params = load_params(ltm_params)
        self.ltm_params = ltm_params
        self.ltm_cfg = ltm_cfg

    def reproject_with_field(
        self, save_dir, mesh, mv_rgb_grid, condition, processed_mesh
    ) -> str:
        """step_2_2: bake with the LTM query_field as the inpainting hook."""
        from .models.ltm import make_query_field
        from .render.conditioning import grid_to_views
        from .render.renderer_inverse import bake_texture

        assert self.ltm_params is not None, "step_2_2 needs LTM weights"
        bcfg = self.config.bake
        mv_rgb_grid = jnp.asarray(mv_rgb_grid)
        if mv_rgb_grid.dtype == jnp.uint8:
            mv_rgb_grid = _u8_to_f32_jit(mv_rgb_grid)
        views = grid_to_views(
            mv_rgb_grid, self.config.camera.rows, self.config.camera.cols
        )
        out = bake_texture(
            mesh, views, condition["c2ws"], condition["intrinsics"],
            uv_size=bcfg.uv_size,
            perspective=self.config.camera.perspective,
            method="reproject",
            grad_norm_threshold=bcfg.grad_norm_threshold,
            ray_normal_angle_threshold=bcfg.ray_normal_angle_threshold,
            depth_eps=bcfg.depth_eps,
            filt_gradient_points=True,   # inpainting path filters gradients
            query_field=make_query_field(self.ltm_params, self.ltm_cfg),
            # auto policy fallback settings (used only when the asset is
            # >= ltm_auto visible and the IDW branch is taken)
            query_field_auto=self.ltm_auto,
            fill_k=8, fill_relax_iters=50,
            # same max-memory regime as reproject_stage: with the 12 GB
            # int8 FLUX resident the full-grid visibility gather OOMs
            low_hbm=(self.int8_serving == "max_memory" and self._flux_loaded),
            **({"knn_chunk": 1024}
               if self.int8_serving == "max_memory" and self._flux_loaded
               else {}),
        )
        from .utils.image_io import to_uint8_device

        tex_u8 = np.asarray(to_uint8_device(out["texture"]))
        save_image(os.path.join(save_dir, "completed_uv.png"), tex_u8)
        textured = HostMesh(
            processed_mesh.vertices, processed_mesh.faces,
            uv=processed_mesh.uv, faces_uv=processed_mesh.faces_uv,
            texture=tex_u8,
        )
        glb_path = os.path.join(save_dir, "textured_mesh.glb")
        self._submit_io(save_mesh, glb_path, textured)
        return glb_path

    def __call__(
        self, save_dir, image_path, mesh_path, clear_cache=False,
        preprocessed=None,
    ):
        cache = os.path.join(save_dir, "cache")
        os.makedirs(cache, exist_ok=True)
        if preprocessed is None:
            preprocessed = self.preprocess_job(save_dir, image_path, mesh_path)
        processed_mesh, ref_image = preprocessed
        condition = self.render_geometry_images_stage(cache, processed_mesh)
        mv_rgb = self.infer_mv_stage(cache, ref_image, condition)
        if self.ltm_params is not None:
            glb_path = self.reproject_with_field(
                cache, condition["mesh"], mv_rgb, condition, processed_mesh
            )
        else:
            glb_path = self.reproject_stage(
                cache, condition["mesh"], mv_rgb, condition, processed_mesh
            )
        import shutil

        rembg_out = os.path.join(save_dir, "rembg_image.png")
        glb_out = os.path.join(save_dir, "textured_mesh.glb")
        shutil.copy(os.path.join(cache, "rembg_image.png"), rembg_out)
        # ordered behind the async GLB write (same single-thread pool)
        self._submit_io(shutil.copy, glb_path, glb_out)
        if clear_cache:
            self._submit_io(shutil.rmtree, cache)
        return rembg_out, glb_out


class CustomRGBTextureFullPipeline(RGBTextureFullPipelineBase):
    """The shipped entry point (pipeline.py:620-632): step_1_1 +
    step_2_ablition (no-LTM bake)."""

    def __call__(
        self,
        save_dir: str,
        image_path: str,
        mesh_path: str,
        clear_cache: bool = False,
        export_video: bool = False,
        preprocessed=None,
    ) -> Tuple[str, str]:
        cache = os.path.join(save_dir, "cache")
        os.makedirs(cache, exist_ok=True)

        # step_1_1 (host half possibly prefetched by a batch driver)
        if preprocessed is None:
            preprocessed = self.preprocess_job(save_dir, image_path, mesh_path)
        processed_mesh, ref_image = preprocessed
        condition = self.render_geometry_images_stage(cache, processed_mesh)
        mv_rgb = self.infer_mv_stage(cache, ref_image, condition)

        # step_2_ablition
        glb_path = self.reproject_stage(
            cache, condition["mesh"], mv_rgb, condition, processed_mesh
        )
        if export_video:
            self.flush_io()  # the exporter re-loads the GLB from disk
            self.export_video_stage(cache, glb_path, "textured_mesh.mp4")

        import shutil

        rembg_out = os.path.join(save_dir, "rembg_image.png")
        glb_out = os.path.join(save_dir, "textured_mesh.glb")
        shutil.copy(os.path.join(cache, "rembg_image.png"), rembg_out)
        # ordered behind the async GLB write (same single-thread pool)
        self._submit_io(shutil.copy, glb_path, glb_out)
        if clear_cache:
            self._submit_io(shutil.rmtree, cache)
        return rembg_out, glb_out
