"""Training data pipeline.

The reference trainers consume pre-rendered multi-view datasets (keys
``training_image``/``rgbs``/``native_normals``/ccm per
flux_piplines/{texturing,delight}/trainer.py data paths; the dataset code
lives in the external UniTEX-FLUX repo).  This module provides:

* ``SyntheticTextureDataset`` — renders (control, target) training pairs on
  the fly from procedural meshes + procedural textures, exercising the full
  geometry/render stack; the shape contract matches what
  ``training.flux_lora.flow_match_loss`` consumes.
* ``iterate_host_sharded`` — per-host data sharding for multi-host meshes
  (each host yields its slice of the global batch; jax.make_array_from
  single-device arrays composes them).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SyntheticTextureDataset:
    """Procedural (control grid, textured target grid) pairs at toy or full
    resolution."""

    view_size: int = 64
    rows: int = 2
    cols: int = 3
    seed: int = 0

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from ..geometry.mesh import Mesh
        from ..geometry.primitives import make_icosphere, make_torus
        from ..geometry.uv_atlas import unwrap_atlas
        from ..render.conditioning import render_geometry_condition
        from ..render.renderer import render_views
        from ..render.renderer_inverse import uv_render

        rng = np.random.default_rng(self.seed)
        makers = [lambda: make_icosphere(3), make_torus]
        while True:
            host = unwrap_atlas(
                makers[int(rng.integers(len(makers)))](), size=128, gutter=2
            )
            mesh = Mesh(
                jnp.asarray(host.vertices * 0.9),
                jnp.asarray(host.faces),
                uv=jnp.asarray(host.uv),
                faces_uv=jnp.asarray(host.faces_uv),
            )
            cond = render_geometry_condition(
                mesh, view_size=self.view_size, rows=self.rows, cols=self.cols
            )
            # procedural "ground-truth" texture: random low-frequency color
            # field of 3D position
            w = rng.normal(size=(3, 3)).astype(np.float32)
            uv_out = uv_render(mesh, 128, pixel_tile=0)
            pos = np.asarray(uv_out["position"])
            tex = 0.5 + 0.4 * np.tanh(pos @ w.T)
            tex = jnp.asarray(np.where(np.asarray(uv_out["mask"]), tex, 0.0))
            target = render_views(
                mesh, cond["c2ws"], cond["intrinsics"],
                (self.view_size, self.view_size),
                map_attr=tex, render_uv=True, render_map_attr=True,
            )
            from ..render.conditioning import views_to_grid

            target_grid = views_to_grid(target.map_attr, self.rows, self.cols)
            control_grid = 0.5 * cond["normal"] + 0.5 * cond["ccm"]
            yield {
                "target": np.asarray(target_grid),
                "control": np.asarray(control_grid),
            }


@dataclasses.dataclass
class DirectoryTextureDataset:
    """Pre-rendered multi-view training pairs from disk.

    The pipeline's own stage artifacts double as the training schema
    (run the geometry stages over a mesh corpus to build a dataset —
    the reference's dataset renderer lives in its external UniTEX-FLUX
    repo, README.md:100-101).  One subdirectory per asset containing:

      ``mv_normal.png`` + ``mv_ccm.png``  -> texture-mode control
                                             (the 0.5/0.5 mix of infer_mv)
      ``mv_rgb_w_light.png``              -> texture-mode target and
                                             delight-mode control
      ``mv_rgb.png``                      -> delight-mode target (albedo)
      ``processed_image.png``             -> dual/reference image
                                             (texture mode only — the
                                             inference delight pass takes
                                             no dual, pipeline.py:263-279)

    Everything is converted to the 1x6 FLUX strip layout through the
    pipeline's OWN grid<->strip permutations (render/conditioning.py), so
    control pixel (i, j) corresponds to target pixel (i, j) exactly as at
    serving time: mv_normal/ccm/rgb are stored as 2x3 frtbld grids (mv_rgb
    possibly SR-upscaled — resized back to the control resolution), while
    mv_rgb_w_light is already the strip.

    Yields ``{"target", "control"[, "dual"]}`` float arrays in [0, 1],
    shuffled per epoch.
    """

    root: str
    mode: str = "texture"  # or "delight"
    seed: int = 0
    with_dual: bool = True

    def _required(self) -> tuple:
        if self.mode == "texture":
            return ("mv_normal.png", "mv_ccm.png", "mv_rgb_w_light.png")
        if self.mode == "delight":
            return ("mv_rgb_w_light.png", "mv_rgb.png")
        raise ValueError(f"mode {self.mode!r} (texture | delight)")

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import glob
        import os

        from ..utils.image_io import load_image

        need = self._required()

        def resolve(d):
            # artifacts either at the sample root or under its cache/
            # subdir (raw batch_pipeline.py output dirs work as-is)
            for base in (d, os.path.join(d, "cache")):
                if all(os.path.exists(os.path.join(base, f)) for f in need):
                    return base
            return None

        samples = sorted(
            base
            for d in glob.glob(os.path.join(self.root, "*"))
            if os.path.isdir(d) and (base := resolve(d)) is not None
        )
        if not samples:
            raise FileNotFoundError(
                f"no sample dirs with {need} under {self.root!r}"
            )
        import jax
        import jax.numpy as jnp

        from ..render.conditioning import grid_to_strip

        rng = np.random.default_rng(self.seed)
        while True:
            for i in rng.permutation(len(samples)):
                d = samples[i]
                get = lambda f: load_image(os.path.join(d, f))
                if self.mode == "texture":
                    grid = 0.5 * get("mv_normal.png") + 0.5 * get("mv_ccm.png")
                    control = np.asarray(grid_to_strip(jnp.asarray(grid)))
                    target = get("mv_rgb_w_light.png")  # saved as the strip
                else:
                    control = get("mv_rgb_w_light.png")
                    tgt_grid = jnp.asarray(get("mv_rgb.png"))
                    tgt = grid_to_strip(tgt_grid)
                    if tgt.shape[:2] != control.shape[:2]:
                        # SR-upscaled albedo: bring back to control res
                        tgt = jax.image.resize(
                            tgt, (*control.shape[:2], 3), "bilinear")
                    target = np.asarray(tgt)
                ex = {"target": target, "control": control}
                dual_path = os.path.join(d, "processed_image.png")
                if (
                    self.with_dual
                    and self.mode == "texture"  # delight serves without dual
                    and os.path.exists(dual_path)
                ):
                    ex["dual"] = load_image(dual_path)
                yield ex


def iterate_host_sharded(
    iterator: Iterator[Dict[str, np.ndarray]],
    global_batch: int,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Batch an example stream, yielding this host's slice of each global
    batch (the per-host data sharding the reference gets from accelerate's
    DistributedSampler)."""
    n_hosts = jax.process_count()
    host = jax.process_index()
    per_host = global_batch // max(n_hosts, 1)
    buf: list = []
    for ex in iterator:
        buf.append(ex)
        if len(buf) == global_batch:
            sl = buf[host * per_host : (host + 1) * per_host]
            yield {
                k: np.stack([e[k] for e in sl]) for k in sl[0].keys()
            }
            buf = []
