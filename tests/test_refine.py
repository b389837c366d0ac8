"""Differentiable texture / camera-pose refinement (the reference's
texture/reprojection/mesh_refine.py capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.camera.generator import generate_box_views_c2ws, generate_intrinsics
from unitex_tpu.camera.rotation import (
    axis_angle_to_matrix,
    matrix_to_rotation_6d,
    rotation_6d_to_matrix,
)
from unitex_tpu.geometry.mesh import Mesh
from unitex_tpu.geometry.primitives import make_cube
from unitex_tpu.render.renderer import render_views
from unitex_tpu.texture.refine import (
    PoseRefineConfig,
    TextureRefineConfig,
    refine_poses,
    refine_texture,
)

TEX = 64
RES = 64


@pytest.fixture(scope="module")
def scene():
    m = make_cube(1.2)
    mesh = Mesh(
        vertices=jnp.asarray(m.vertices), faces=jnp.asarray(m.faces),
        uv=jnp.asarray(m.uv), faces_uv=jnp.asarray(m.faces_uv))
    c2ws = generate_box_views_c2ws(radius=2.8)
    intr = generate_intrinsics(0.9, 0.9, fov=False, degree=False)
    # smooth ground-truth texture (bilinear sampling can represent it)
    yy, xx = np.mgrid[0:TEX, 0:TEX].astype(np.float32) / TEX
    gt_tex = jnp.asarray(np.stack(
        [0.5 + 0.4 * np.sin(6 * xx), 0.5 + 0.4 * np.cos(5 * yy),
         0.5 + 0.35 * np.sin(4 * (xx + yy))], -1))
    targets = render_views(
        mesh, c2ws, intr, (RES, RES), map_attr=gt_tex, render_map_attr=True
    ).map_attr
    return mesh, c2ws, intr, gt_tex, targets


def test_rotation_6d_roundtrip():
    R = axis_angle_to_matrix(jnp.asarray([0.2, -0.7, 0.4]))
    R2 = rotation_6d_to_matrix(matrix_to_rotation_6d(R))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)
    # orthonormality for arbitrary 6d vectors
    M = rotation_6d_to_matrix(jnp.asarray([1.0, 2.0, 0.5, -1.0, 0.3, 2.0]))
    np.testing.assert_allclose(np.asarray(M @ M.T), np.eye(3), atol=1e-6)
    assert float(jnp.linalg.det(M)) == pytest.approx(1.0, abs=1e-5)


class TestTextureRefine:
    def test_recovers_texture(self, scene):
        mesh, c2ws, intr, gt_tex, targets = scene
        cfg = TextureRefineConfig(texture_size=TEX, steps=150, lr=0.1, tv_weight=0.0)
        tex, losses = refine_texture(mesh, c2ws, intr, targets, cfg=cfg)
        assert tex.shape == (TEX, TEX, 3)
        assert float(losses[-1]) < float(losses[0]) / 20.0
        # re-render with the refined texture: must match the targets closely
        rendered = render_views(
            mesh, c2ws, intr, (RES, RES), map_attr=tex, render_map_attr=True
        ).map_attr
        alpha = render_views(mesh, c2ws, intr, (RES, RES)).alpha
        err = float((jnp.abs(rendered - targets) * alpha).sum()
                    / (alpha.sum() * 3))
        assert err < 0.02, err

    def test_init_texture_warm_start(self, scene):
        mesh, c2ws, intr, gt_tex, targets = scene
        cfg = TextureRefineConfig(texture_size=TEX, steps=10, lr=0.05, tv_weight=0.0)
        tex, losses = refine_texture(
            mesh, c2ws, intr, targets, init_texture=gt_tex, cfg=cfg)
        # starting at the answer: loss starts (and stays) tiny
        assert float(losses[0]) < 1e-4

    def test_tv_regularizer_smooths(self, scene):
        mesh, c2ws, intr, _, targets = scene
        base = TextureRefineConfig(texture_size=TEX, steps=60, lr=0.1, tv_weight=0.0)
        reg = TextureRefineConfig(texture_size=TEX, steps=60, lr=0.1, tv_weight=1e-2)
        tex0, _ = refine_texture(mesh, c2ws, intr, targets, cfg=base)
        tex1, _ = refine_texture(mesh, c2ws, intr, targets, cfg=reg)

        def tv(t):
            return float(jnp.mean((t[1:] - t[:-1]) ** 2)
                         + jnp.mean((t[:, 1:] - t[:, :-1]) ** 2))

        assert tv(tex1) < tv(tex0)


class TestPoseRefine:
    """Photometric pose alignment: the observable quantity is where surface
    points land in the image, so recovery is measured in *reprojection*
    pixels (matrix-space error has photometrically-null directions — e.g.
    depth translation — that the objective cannot and need not fix)."""

    @pytest.fixture(scope="class")
    def persp_scene(self, scene):
        mesh, c2ws, _, gt_tex, _ = scene
        intr = generate_intrinsics(49.1, 49.1, fov=True, degree=True)
        outs = render_views(
            mesh, c2ws, intr, (RES, RES), perspective=True,
            map_attr=gt_tex, render_map_attr=True, render_world_position=True)
        return mesh, c2ws, intr, gt_tex, outs

    @staticmethod
    def _reproj_px(a, b, intr, wpos, alpha):
        from unitex_tpu.camera.conversion import c2w_to_w2c, intr_to_proj

        proj = intr_to_proj(intr, perspective=True)
        ph = jnp.concatenate([wpos, jnp.ones_like(wpos[..., :1])], -1)
        M = a.shape[0]

        def ndc(c2w):
            cam = jnp.einsum("mhwc,mdc->mhwd", ph, c2w_to_w2c(c2w))
            clip = jnp.einsum("mhwc,dc->mhwd", cam, proj)
            w = clip[..., 3:4]
            return clip[..., :2] / jnp.maximum(jnp.abs(w), 1e-8) * jnp.sign(w)

        d = jnp.linalg.norm(ndc(a) - ndc(b), axis=-1, keepdims=True) * (RES / 2)
        return float((d * alpha).sum() / alpha.sum())

    @staticmethod
    def _perturb(c2ws, seed=0):
        rng = np.random.default_rng(seed)
        bad = []
        for i in range(c2ws.shape[0]):
            aa = jnp.asarray(rng.normal(scale=0.02, size=3).astype(np.float32))
            c = np.asarray(c2ws[i]).copy()
            c[:3, :3] = np.asarray(axis_angle_to_matrix(aa)) @ c[:3, :3]
            c[:3, 3] += rng.normal(scale=0.01, size=3).astype(np.float32)
            bad.append(c)
        return jnp.asarray(np.stack(bad))

    def test_recovers_perturbed_poses(self, persp_scene):
        mesh, c2ws, intr, gt_tex, outs = persp_scene
        bad = self._perturb(c2ws)
        err0 = self._reproj_px(bad, c2ws, intr, outs.world_position, outs.alpha)
        refined, losses = refine_poses(
            mesh, bad, intr, outs.map_attr, gt_tex, perspective=True,
            cfg=PoseRefineConfig(steps=200, lr=1e-3))
        err1 = self._reproj_px(refined, c2ws, intr, outs.world_position, outs.alpha)
        assert float(losses[-1]) < 0.05 * float(losses[0])
        assert err0 > 1.0          # perturbation is super-pixel
        assert err1 < 0.5          # refined alignment is sub-half-pixel
        assert err1 < 0.35 * err0  # and a large relative improvement

    def test_true_pose_is_stationary(self, persp_scene):
        mesh, c2ws, intr, gt_tex, outs = persp_scene
        refined, losses = refine_poses(
            mesh, c2ws, intr, outs.map_attr, gt_tex, perspective=True,
            cfg=PoseRefineConfig(steps=5, lr=1e-3))
        # already at the optimum: loss tiny from step 0, poses barely move
        assert float(losses[0]) < 5e-3
        assert float(jnp.abs(refined - c2ws).max()) < 0.02
