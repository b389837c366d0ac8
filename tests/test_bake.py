"""Stage-2 bake tests, including the texture round-trip oracle the reference
uses as its de-facto correctness check (renderer_inverse.py test_gt:732-827):
texture -> render 6 views -> re-bake -> the baked texture must reproduce the
original on visible texels, and re-rendered views must match."""

import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.geometry.mesh import Mesh
from unitex_tpu.geometry.primitives import make_icosphere, make_torus
from unitex_tpu.geometry.uv_atlas import unwrap_atlas
from unitex_tpu.ops.image_ops import (
    boundary_mask,
    dilate_mask,
    erode_mask,
    gaussian_blur,
    pull_push,
    ring_close_mask,
)
from unitex_tpu.render.conditioning import condition_cameras
from unitex_tpu.render.renderer import render_views
from unitex_tpu.render.renderer_inverse import (
    bake_texture,
    mv_render,
    uv_render,
    view_visibility,
)

UV = 128
VIEW = 64


@pytest.fixture(scope="module")
def sphere_mesh():
    m = make_icosphere(3)
    m = unwrap_atlas(m, size=UV, gutter=2)
    return Mesh(
        jnp.asarray(m.vertices * 0.85),
        jnp.asarray(m.faces),
        uv=jnp.asarray(m.uv),
        faces_uv=jnp.asarray(m.faces_uv),
    )


def _procedural_texture(mesh):
    """Bake a smooth function of 3D position into the UV atlas."""
    uv_out = uv_render(mesh, UV, pixel_tile=0)
    pos = uv_out["position"]
    tex = 0.5 + 0.5 * pos / 0.85  # rgb = normalized position
    return jnp.where(uv_out["mask"], tex, 0.0), uv_out


class TestImageOps:
    def test_pull_push_fills_holes(self):
        rng = np.random.default_rng(0)
        color = jnp.asarray(rng.uniform(0.4, 0.6, (32, 32, 3)).astype(np.float32))
        mask = np.ones((32, 32, 1), bool)
        mask[10:20, 10:20] = False
        out = pull_push(color * mask, jnp.asarray(mask))
        # valid texels unchanged
        np.testing.assert_allclose(
            np.asarray(out)[~mask[..., 0] == False], np.asarray(color)[mask[..., 0]]
        )
        # holes filled with something near the surrounding mean
        hole = np.asarray(out)[10:20, 10:20]
        assert np.all(hole > 0.3) and np.all(hole < 0.7)

    def test_ring_close(self):
        mask = np.ones((16, 16, 1), bool)
        mask[8, 8] = False  # pinhole
        closed = ring_close_mask(jnp.asarray(mask), (3,))
        assert bool(np.asarray(closed)[8, 8, 0])
        # large holes stay open
        mask[2:7, 2:7] = False
        closed = ring_close_mask(jnp.asarray(mask), (3,))
        assert not bool(np.asarray(closed)[4, 4, 0])

    def test_ring_close_matches_dense_conv(self):
        # the separable box-sum form must equal the reference dense kxk
        # ring conv (k^2 border / -1 interior) bit-for-bit, including the
        # sequential k=3 -> k=5 mask update and batched leading axes
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        mask = rng.random((2, 33, 47, 1)) > 0.35

        def dense_ring_close(m, ks):
            for k in ks:
                kern = np.full((k, k), -1.0, dtype=np.float32)
                kern[0, :] = kern[-1, :] = kern[:, 0] = kern[:, -1] = float(k * k)
                x = m.astype(jnp.float32)[..., 0]
                conv = jax.lax.conv_general_dilated(
                    x[..., None], jnp.asarray(kern)[..., None, None],
                    (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )[..., 0]
                thresh = ((k - 1) ** 2 - 1) * ((k - 2) ** 2)
                m = m | (conv >= thresh)[..., None]
            return m

        got = ring_close_mask(jnp.asarray(mask), (3, 5))
        want = dense_ring_close(jnp.asarray(mask), (3, 5))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # unbatched [H, W, 1] input too
        got2 = ring_close_mask(jnp.asarray(mask[0]), (3, 5))
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(want[0]))

    def test_boundary_and_morphology(self):
        mask = np.zeros((16, 16, 1), bool)
        mask[4:12, 4:12] = True
        inner, outer = boundary_mask(jnp.asarray(mask), 3)
        inner = np.asarray(inner)[..., 0]
        outer = np.asarray(outer)[..., 0]
        assert inner[4, 8] and not inner[8, 8]
        assert outer[3, 8] and not outer[8, 8]
        er = np.asarray(erode_mask(jnp.asarray(mask), 3))[..., 0]
        di = np.asarray(dilate_mask(jnp.asarray(mask), 3))[..., 0]
        assert er.sum() == 6 * 6 and di.sum() == 10 * 10

    def test_gaussian_blur_preserves_mean(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
        out = gaussian_blur(img, 5)
        assert abs(float(out.mean()) - float(img.mean())) < 0.01


class TestVisibility:
    def test_sphere_every_texel_visible_somewhere(self, sphere_mesh):
        c2ws, intr = condition_cameras()
        mv = mv_render(sphere_mesh, c2ws, intr, (VIEW, VIEW))
        uv = uv_render(sphere_mesh, UV, pixel_tile=0)
        vis = view_visibility(uv, mv, c2ws, None)
        mask = np.asarray(uv["mask"])[..., 0]
        seen = np.asarray(vis["visible"].any(axis=0))[..., 0]
        # a convex sphere: ~every atlas texel is visible from some box view
        frac = seen[mask].mean()
        assert frac > 0.95, frac

    def test_front_view_sees_only_front(self, sphere_mesh):
        c2ws, intr = condition_cameras()
        mv = mv_render(sphere_mesh, c2ws, intr, (VIEW, VIEW))
        uv = uv_render(sphere_mesh, UV, pixel_tile=0)
        vis = view_visibility(uv, mv, c2ws, None)
        v0 = np.asarray(vis["visible"][0])[..., 0]  # front view (+z storage)
        pos = np.asarray(uv["position"])
        mask = np.asarray(uv["mask"])[..., 0]
        z = pos[..., 2]
        # visible-from-front texels are overwhelmingly on the +z hemisphere
        assert z[v0 & mask].mean() > 0.3
        # back hemisphere texels (z < -0.3) are not front-visible
        back = mask & (z < -0.3)
        assert v0[back].mean() < 0.05


class TestRoundTrip:
    @pytest.mark.parametrize("method", ["reproject", "kdtree"])
    def test_texture_roundtrip(self, sphere_mesh, method):
        tex, uv_out = _procedural_texture(sphere_mesh)
        c2ws, intr = condition_cameras()
        out = render_views(
            sphere_mesh, c2ws, intr, (VIEW, VIEW),
            map_attr=tex, render_uv=True, render_map_attr=True,
        )
        views = out.map_attr  # [6, VIEW, VIEW, 3]
        baked = bake_texture(
            sphere_mesh, views, c2ws, intr,
            uv_size=UV, method=method,
            knn_max_ref=8192, knn_chunk=2048, uv_pixel_tile=0,
        )
        mask = np.asarray(uv_out["mask"])[..., 0]
        vis_any = np.asarray(baked["mask_visible_any"])[..., 0]
        orig = np.asarray(tex)
        rec = np.asarray(baked["texture"])
        ok = mask & vis_any
        # ignore seam-boundary blur texels by eroding the comparison region
        err = np.abs(rec - orig)[ok]
        mse = float((err**2).mean())
        psnr = -10 * np.log10(max(mse, 1e-10))
        assert psnr > 20, f"{method}: roundtrip PSNR {psnr:.1f} dB"

    def test_rerender_matches(self, sphere_mesh):
        tex, _ = _procedural_texture(sphere_mesh)
        c2ws, intr = condition_cameras()
        out = render_views(
            sphere_mesh, c2ws, intr, (VIEW, VIEW),
            map_attr=tex, render_uv=True, render_map_attr=True,
        )
        baked = bake_texture(
            sphere_mesh, out.map_attr, c2ws, intr,
            uv_size=UV, method="reproject",
            knn_max_ref=8192, knn_chunk=2048, uv_pixel_tile=0,
        )
        out2 = render_views(
            sphere_mesh, c2ws, intr, (VIEW, VIEW),
            map_attr=baked["texture"], render_uv=True, render_map_attr=True,
        )
        a = np.asarray(out.map_attr)
        b = np.asarray(out2.map_attr)
        m = np.asarray(out.alpha) > 0.5
        mse = float(((a - b)[m.repeat(3, -1) if m.shape[-1] == 1 else m] ** 2).mean())
        psnr = -10 * np.log10(max(mse, 1e-10))
        assert psnr > 22, f"re-render PSNR {psnr:.1f} dB"


class TestPBRBake:
    def test_nine_channel_bake(self, sphere_mesh):
        """C=9 PBR bake (albedo/metallic-roughness/bump, renderer_inverse.py
        infer's image_attrs.shape[-1]==9 path)."""
        tex, uv_out = _procedural_texture(sphere_mesh)
        # synthesize 9-channel view attrs: [albedo | MR | bump]
        c2ws, intr = condition_cameras()
        out = render_views(
            sphere_mesh, c2ws, intr, (VIEW, VIEW),
            map_attr=tex, render_uv=True, render_map_attr=True,
        )
        albedo = out.map_attr
        mr = jnp.concatenate(
            [jnp.zeros_like(albedo[..., :1]), albedo[..., :1] * 0.5,
             jnp.full_like(albedo[..., :1], 0.8)], axis=-1
        )
        bump = jnp.full_like(albedo, 0.5)
        views9 = jnp.concatenate([albedo, mr, bump], axis=-1)
        baked = bake_texture(
            sphere_mesh, views9, c2ws, intr,
            uv_size=UV, method="reproject",
            knn_max_ref=8192, knn_chunk=2048, uv_pixel_tile=0,
        )
        assert baked["texture"].shape == (UV, UV, 9)
        mask = np.asarray(uv_out["mask"])[..., 0]
        vis = np.asarray(baked["mask_visible_any"])[..., 0]
        ok = mask & vis
        rec = np.asarray(baked["texture"])
        # albedo channels round-trip
        err = np.abs(rec[..., :3] - np.asarray(tex))[ok]
        assert (err ** 2).mean() < 0.01
        # constant bump survives exactly-ish
        assert np.abs(rec[..., 6:9][ok] - 0.5).mean() < 0.05


class TestFillCompaction:
    """_fill_invisible_knn query compaction (measured 3.2 s -> <0.4 s at a
    2048² bake): compact and dense paths must agree exactly."""

    def test_compact_matches_dense(self):
        from unitex_tpu.render.renderer_inverse import _fill_invisible_knn

        rng = np.random.default_rng(0)
        N = 5000
        pos = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
        col = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))
        vis = jnp.asarray(rng.uniform(size=N) < 0.7)
        inv = ~vis & jnp.asarray(rng.uniform(size=N) < 0.5)
        a = _fill_invisible_knn(pos, col, vis, inv,
                                max_ref=4096, chunk=1024, max_fill=4096)
        b = _fill_invisible_knn(pos, col, vis, inv,
                                max_ref=4096, chunk=1024, max_fill=1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        keep = ~np.asarray(inv)
        np.testing.assert_array_equal(np.asarray(a)[keep], np.asarray(col)[keep])

    def test_compact_matches_dense_k8_chunked_blend(self):
        """k=8 IDW with Q > chunk exercises the CHUNKED neighbor-color
        blend (one [Q, k, 3] gather lane-padded 42.7x to a 16 GB temp in
        the cup oracle's dense fallback — the r05 compile-OOM)."""
        from unitex_tpu.render.renderer_inverse import _fill_invisible_knn

        rng = np.random.default_rng(2)
        N = 5000
        pos = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
        col = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))
        vis = jnp.asarray(rng.uniform(size=N) < 0.7)
        inv = ~vis & jnp.asarray(rng.uniform(size=N) < 0.5)
        a = _fill_invisible_knn(pos, col, vis, inv, k=8,
                                max_ref=4096, chunk=1024, max_fill=4096)
        b = _fill_invisible_knn(pos, col, vis, inv, k=8,
                                max_ref=4096, chunk=1024, max_fill=1)
        # and an unchunked reference: chunk larger than every Q
        c = _fill_invisible_knn(pos, col, vis, inv, k=8,
                                max_ref=4096, chunk=8192, max_fill=1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(b), np.asarray(c), atol=1e-5)

    def test_query_field_auto_policy(self):
        """query_field_auto (the ORACLE_r05 LTM-vs-IDW split): a
        near-fully-visible chart must take the IDW branch (field not
        called), a heavily occluded one must call the field — and the
        field fill must suppress the relaxation iterations (composing
        them is the measured ORACLE_r05_ltm_relax negative)."""
        from unitex_tpu.render.renderer_inverse import _finish_reproject_blur

        rng = np.random.default_rng(3)
        H = 32
        pos = jnp.asarray(rng.normal(size=(H, H, 3)).astype(np.float32))
        color = jnp.asarray(rng.uniform(size=(H, H, 3)).astype(np.float32))
        mask_2d = jnp.ones((H, H, 1), bool)   # rast masks are [H, W, 1]
        boundary = jnp.zeros((H, H, 1), bool)

        def run(visible_frac, auto):
            called = {"n": 0}

            def field(pts, cols, q, visible_mask=None, query_mask=None):
                called["n"] += 1
                return jnp.full((q.shape[0], 3), 0.5, jnp.float32)

            mask_cur = jnp.asarray(
                rng.uniform(size=(H, H, 1)) < visible_frac)
            out = _finish_reproject_blur(
                {"mask": mask_2d, "position": pos}, color, mask_cur,
                boundary, mask_cur,
                method="gaussian", kernel_size_blur=3,
                knn_max_ref=256, knn_chunk=128, query_field=field,
                fill_k=8, fill_relax_iters=50, query_field_auto=auto,
            )
            return called["n"], out, mask_cur

        n_visible, _, _ = run(0.98, auto=0.93)
        assert n_visible == 0, "98%-visible chart must take the IDW branch"
        n_occluded, out, mask_cur = run(0.50, auto=0.93)
        assert n_occluded == 1, "50%-visible chart must call the field"
        # relax suppressed: filled texels keep the field's exact constant
        # (boundary is empty so no blur touches them; 50 Jacobi iterations
        # would have mixed them with visible neighbors)
        filled = np.asarray(out["texture"])[~np.asarray(mask_cur)[..., 0]]
        np.testing.assert_array_equal(filled, 0.5)
        n_off, _, _ = run(0.98, auto=None)
        assert n_off == 1, "auto=None keeps the always-field behavior"

    def test_zero_fill_short_circuit(self):
        from unitex_tpu.render.renderer_inverse import _fill_invisible_knn

        rng = np.random.default_rng(1)
        pos = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        col = jnp.asarray(rng.uniform(size=(64, 3)).astype(np.float32))
        vis = jnp.ones(64, bool)
        out = _fill_invisible_knn(pos, col, vis, jnp.zeros(64, bool))
        assert out is col


class TestFusedVisibilityPaste:
    def test_fused_matches_eager_composition(self, sphere_mesh):
        """The jitted _visibility_paste (one scanned XLA program, the
        serving path) equals the eager view_visibility -> priority-paste
        composition it replaced."""
        from unitex_tpu.render.renderer_inverse import (
            VIEW_PRIORITY,
            _visibility_paste,
        )
        from unitex_tpu.ops.image_ops import boundary_mask as _bm

        tex, uv = _procedural_texture(sphere_mesh)
        c2ws, intr = condition_cameras()
        out = render_views(
            sphere_mesh, c2ws, intr, (VIEW, VIEW),
            map_attr=tex, render_uv=True, render_map_attr=True,
        )
        views = out.map_attr
        mv = mv_render(sphere_mesh, c2ws, intr, (VIEW, VIEW))
        vis = view_visibility(uv, mv, c2ws, views)

        # eager composition (the pre-fusion bake_reproject_blur paste loop)
        H2, W2 = uv["mask"].shape[:2]
        C = views.shape[-1]
        color_ref = jnp.zeros((H2, W2, C), views.dtype)
        mask_ref = jnp.zeros((H2, W2, 1), bool)
        boundary_ref = jnp.zeros((H2, W2, 1), bool)
        for i in VIEW_PRIORITY:
            extra = (~mask_ref) & vis["visible"][i]
            color_ref = jnp.where(extra, vis["colors"][i], color_ref)
            mask_ref = mask_ref | extra
            b_in, b_out = _bm(extra, 3)
            boundary_ref = boundary_ref | b_in | b_out
        boundary_ref = dilate_mask(boundary_ref, 3)
        boundary_ref = boundary_ref & erode_mask(uv["mask"], 2 * (3 // 2) + 5)

        color, mask_cur, boundary, vis_any, vis_pv = _visibility_paste(
            uv["position"], uv["mask"], uv["tri"], uv["face_normal"],
            mv["mvp"], mv["w2cs"], c2ws, mv["depth"], mv["tri"],
            mv["mask"] & mv["mask_visible"], views,
            perspective=False, ray_normal_angle_threshold=100.0,
            depth_eps=5e-3, visibility_mode="depth", ring_kernels=(3, 5),
            priority=VIEW_PRIORITY, kernel_size_boundary=3,
            kernel_size_boundary_blur=3,
        )
        np.testing.assert_array_equal(np.asarray(mask_cur), np.asarray(mask_ref))
        np.testing.assert_array_equal(np.asarray(boundary), np.asarray(boundary_ref))
        np.testing.assert_array_equal(
            np.asarray(vis_any), np.asarray(vis["visible"].any(axis=0)))
        np.testing.assert_array_equal(
            np.asarray(vis_pv), np.asarray(vis["visible"]))
        np.testing.assert_allclose(
            np.asarray(color), np.asarray(color_ref), atol=1e-6)


class TestOcclusionQualityUpgrades:
    """Round-3 occlusion-quality options: cosine winner-take-all paste,
    k>1 IDW invisible fill, seam-aware fill relaxation (VERDICT r02 #3)."""

    @pytest.fixture(scope="class")
    def torus_mesh(self):
        m = make_torus(n_major=48, n_minor=32)
        m = unwrap_atlas(m, size=UV, gutter=2)
        return Mesh(
            jnp.asarray(m.vertices * 0.85),
            jnp.asarray(m.faces),
            uv=jnp.asarray(m.uv),
            faces_uv=jnp.asarray(m.faces_uv),
        )

    def _roundtrip(self, mesh, **bake_kwargs):
        uv_out = uv_render(mesh, UV, pixel_tile=0)
        tex = jnp.where(
            uv_out["mask"], 0.5 + 0.5 * uv_out["position"] / 0.85, 0.0
        )
        c2ws, intr = condition_cameras()
        out = render_views(
            mesh, c2ws, intr, (VIEW, VIEW),
            map_attr=tex, render_uv=True, render_map_attr=True,
        )
        baked = bake_texture(
            mesh, out.map_attr, c2ws, intr,
            uv_size=UV, method="reproject",
            knn_max_ref=8192, knn_chunk=2048, uv_pixel_tile=0,
            **bake_kwargs,
        )
        mask = np.asarray(uv_out["mask"])[..., 0]
        err = (np.asarray(baked["texture"]) - np.asarray(tex))[mask]
        mse = float((err**2).mean())
        return -10 * np.log10(max(mse, 1e-10)), baked

    def test_cosine_paste_not_worse_on_consistent_views(self, torus_mesh):
        """With views rendered from one consistent texture, picking the
        most head-on view per texel must match or beat the fixed priority
        order (grazing samples are strictly noisier)."""
        p_pri, _ = self._roundtrip(torus_mesh, paste_mode="priority")
        p_cos, _ = self._roundtrip(torus_mesh, paste_mode="cosine")
        assert p_cos > p_pri - 0.5, (p_cos, p_pri)

    def test_idw_fill_and_relax_improve_all_texel_psnr(self, torus_mesh):
        """On a smooth ground truth, k=8 IDW fill + relaxation must beat
        the k=1 hard copy over ALL chart texels (visible + filled)."""
        p_k1, baked = self._roundtrip(torus_mesh, fill_k=1)
        vis_frac = float(
            np.asarray(baked["mask_visible_any"]).mean()
        )
        p_k8, _ = self._roundtrip(torus_mesh, fill_k=8, fill_relax_iters=20)
        assert p_k8 >= p_k1 - 0.2, (p_k8, p_k1, vis_frac)

    def test_relax_fill_holds_visible_fixed(self):
        from unitex_tpu.render.renderer_inverse import _relax_fill

        rng = np.random.default_rng(0)
        color = jnp.asarray(rng.random((16, 16, 3)), jnp.float32)
        support = jnp.ones((16, 16, 1), bool)
        update = jnp.zeros((16, 16, 1), bool).at[4:8, 4:8].set(True)
        out = _relax_fill(color, update, support, 10)
        np.testing.assert_array_equal(
            np.asarray(out)[~np.asarray(update)[..., 0]],
            np.asarray(color)[~np.asarray(update)[..., 0]],
        )
        # updated region moves toward the neighborhood average
        assert not np.allclose(
            np.asarray(out)[4:8, 4:8], np.asarray(color)[4:8, 4:8]
        )

    def test_compound_primitive_bakes(self):
        from unitex_tpu.geometry.primitives import make_compound

        m = make_compound(subdivisions=2, n_major=24, n_minor=12)
        assert m.vertices.shape[0] > 0
        m = unwrap_atlas(m, size=UV, gutter=2)
        mesh = Mesh(
            jnp.asarray(m.vertices * 0.85),
            jnp.asarray(m.faces),
            uv=jnp.asarray(m.uv),
            faces_uv=jnp.asarray(m.faces_uv),
        )
        psnr, baked = TestOcclusionQualityUpgrades._roundtrip(
            self, mesh, paste_mode="cosine", fill_k=8, fill_relax_iters=10
        )
        assert np.isfinite(psnr) and psnr > 10, psnr
        assert bool(jnp.isfinite(baked["texture"]).all())


class TestLowHbmBake:
    def test_scan_matches_vmapped(self, sphere_mesh):
        """low_hbm=True (lax.scan over views, one view's peak footprint —
        the mode that co-resides with the 12 GB int8 12B on a 16 GB chip)
        must produce the same bake as the vmapped program."""
        tex, uv_out = _procedural_texture(sphere_mesh)
        c2ws, intr = condition_cameras()
        out = render_views(
            sphere_mesh, c2ws, intr, (VIEW, VIEW),
            map_attr=tex, render_uv=True, render_map_attr=True,
        )
        kw = dict(
            uv_size=UV, method="reproject",
            knn_max_ref=8192, knn_chunk=2048, uv_pixel_tile=0,
        )
        a = bake_texture(sphere_mesh, out.map_attr, c2ws, intr, **kw)
        b = bake_texture(
            sphere_mesh, out.map_attr, c2ws, intr, low_hbm=True, **kw
        )
        np.testing.assert_allclose(
            np.asarray(a["texture"]), np.asarray(b["texture"]), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(a["visible_per_view"]),
            np.asarray(b["visible_per_view"]),
        )

    def test_row_chunked_matches_full(self, sphere_mesh):
        """row_chunk (lax.map row slabs of the pointwise texel math inside
        each scanned view — the r04 fix for the 2.5 GB full-grid gather
        temps that OOMed next to the 12 GB resident params) must be
        bit-identical to the unchunked scan."""
        tex, uv_out = _procedural_texture(sphere_mesh)
        c2ws, intr = condition_cameras()
        out = render_views(
            sphere_mesh, c2ws, intr, (VIEW, VIEW),
            map_attr=tex, render_uv=True, render_map_attr=True,
        )
        kw = dict(
            uv_size=UV, method="reproject", low_hbm=True,
            knn_max_ref=8192, knn_chunk=2048, uv_pixel_tile=0,
        )
        a = bake_texture(
            sphere_mesh, out.map_attr, c2ws, intr,
            low_hbm_row_chunk=None, **kw,
        )
        b = bake_texture(
            sphere_mesh, out.map_attr, c2ws, intr,
            low_hbm_row_chunk=UV // 4, **kw,
        )
        np.testing.assert_array_equal(
            np.asarray(a["texture"]), np.asarray(b["texture"])
        )
        np.testing.assert_array_equal(
            np.asarray(a["visible_per_view"]),
            np.asarray(b["visible_per_view"]),
        )


class TestGeometrySizeDecoupling:
    def test_sr_scaled_color_keeps_plain_visibility(self, sphere_mesh):
        """geometry_size (max-memory --sr: visibility at the camera's
        512², SR color at 2048²) — the visibility decision must be
        IDENTICAL to the same-res bake (it never looks at color), and the
        texture must bake from the hi-res color at the same texels."""
        tex, uv_out = _procedural_texture(sphere_mesh)
        c2ws, intr = condition_cameras()
        out = render_views(
            sphere_mesh, c2ws, intr, (VIEW, VIEW),
            map_attr=tex, render_uv=True, render_map_attr=True,
        )
        views = np.asarray(out.map_attr)
        # x2 "SR" views: nearest upsample (keeps per-pixel values)
        views_hi = views.repeat(2, axis=1).repeat(2, axis=2)
        kw = dict(
            uv_size=UV, method="reproject", low_hbm=True,
            knn_max_ref=8192, knn_chunk=2048, uv_pixel_tile=0,
        )
        a = bake_texture(sphere_mesh, jnp.asarray(views), c2ws, intr, **kw)
        b = bake_texture(
            sphere_mesh, jnp.asarray(views_hi), c2ws, intr,
            geometry_size=(VIEW, VIEW), **kw,
        )
        # visibility is color-independent => identical across resolutions
        np.testing.assert_array_equal(
            np.asarray(a["visible_per_view"]),
            np.asarray(b["visible_per_view"]),
        )
        # colors: nearest-x2 upsample sampled at the same NDC points is
        # close to the original bilinear sample (not exact: tap windows
        # shift by half a fine pixel)
        ta, tb = np.asarray(a["texture"]), np.asarray(b["texture"])
        assert np.isfinite(tb).all()
        assert np.abs(ta - tb).mean() < 0.05, np.abs(ta - tb).mean()
