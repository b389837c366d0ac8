"""Unified RGB/PBR render wrappers (render/unify capability —
unified_{rgb,pbr}_renderer.py, bit-rotted upstream)."""

import jax.numpy as jnp
import numpy as np

from unitex_tpu.geometry.primitives import make_icosphere
from unitex_tpu.geometry.uv_atlas import unwrap_atlas
from unitex_tpu.render.unify import (
    generate_cameras_v1,
    generate_cameras_v2,
    unified_pbr_render,
    unified_rgb_render,
)


def _textured_sphere():
    hm = unwrap_atlas(make_icosphere(2), size=64, gutter=1)
    tex = np.zeros((64, 64, 3), np.uint8)
    tex[:, :, 0] = 255  # red atlas
    hm.texture = tex
    return hm


def _coverage(frames, background=1.0):
    """Fraction of non-background pixels per frame."""
    bg = np.all(np.abs(frames.astype(np.float32) / 255.0 - background) < 0.02, axis=-1)
    return (~bg).mean(axis=(1, 2))


class TestCameras:
    def test_v1_orbit_shapes(self):
        c2ws, intr = generate_cameras_v1(8, perspective=True)
        assert c2ws.shape == (8, 4, 4) and intr.shape == (3, 3)
        # camera positions stay on the radius-2.8 ring
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(c2ws[:, :3, 3]), axis=-1), 2.8, atol=1e-5
        )

    def test_v2_intrinsics_sweep(self):
        c2ws, intr = generate_cameras_v2(4, perspective=True)
        assert c2ws.shape == (4, 4, 4) and intr.shape == (4, 3, 3)
        # one fixed pose, focal length decreasing as fov grows
        np.testing.assert_allclose(np.asarray(c2ws[0]), np.asarray(c2ws[-1]))
        f = np.asarray(intr[:, 0, 0])
        assert (np.diff(f) < 0).all()


class TestUnifiedRGB:
    def test_textured_orbit(self):
        frames = unified_rgb_render(_textured_sphere(), n_frames=4, size=48)
        assert frames.shape == (4, 48, 48, 3) and frames.dtype == np.uint8
        cov = _coverage(frames)
        assert (cov > 0.1).all()
        # textured render: foreground is the red atlas color
        fg = frames[0][~np.all(frames[0] == 255, axis=-1)]
        assert fg[:, 0].mean() > 150 and fg[:, 1].mean() < 80

    def test_untextured_falls_back_to_normals(self):
        frames = unified_rgb_render(make_icosphere(2), n_frames=2, size=48)
        assert frames.shape == (2, 48, 48, 3)
        assert _coverage(frames).min() > 0.1

    def test_v2_sweep_zooms_out(self):
        frames = unified_rgb_render(
            _textured_sphere(), n_frames=4, size=48, cameras="v2"
        )
        cov = _coverage(frames)
        assert cov[0] > cov[-1] > 0  # wider fov -> smaller object


class TestUnifiedPBR:
    def test_outputs_and_metallic_effect(self):
        hm = _textured_sphere()
        out = unified_pbr_render(hm, n_frames=2, size=48)
        for k in ("rgb", "diffuse", "specular"):
            assert out[k].shape == (2, 48, 48, 3) and out[k].dtype == np.uint8
        assert out["diffuse"].astype(int).sum() > 0

        # fully metallic kills the diffuse lobe
        hm.metallic_roughness = np.full((64, 64, 3), 255, np.uint8)  # rough+metal
        out_m = unified_pbr_render(hm, n_frames=2, size=48)
        assert out_m["diffuse"].astype(int).sum() < 0.05 * out["diffuse"].astype(int).sum()

    def test_lambda_scales(self):
        hm = _textured_sphere()
        dark = unified_pbr_render(hm, n_frames=1, size=32, lambda_diffuse=0.0,
                                  lambda_specular=0.0, background=0.0)
        assert dark["rgb"].max() == 0
