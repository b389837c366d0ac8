import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.geometry.primitives import make_icosphere
from unitex_tpu.geometry.uv_atlas import unwrap_atlas
from unitex_tpu.render.volume import (
    discretize_3d,
    grid_sample_3d,
    splat_points_to_grid,
    triplane_query,
    undiscretize_3d,
)
from unitex_tpu.texture.remapping import remap_texture


class TestVolume:
    def test_grid_sample_3d_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as TF

        rng = np.random.default_rng(0)
        vol = rng.uniform(0, 1, (5, 6, 7, 2)).astype(np.float32)
        coords = rng.uniform(-1.2, 1.2, (40, 3)).astype(np.float32)
        ours = grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords))
        t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]  # [1,C,D,H,W]
        t_grid = torch.from_numpy(coords)[None, :, None, None, :]
        ref = TF.grid_sample(
            t_vol, t_grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )[0, :, :, 0, 0].T.numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_triplane_sum_vs_concat(self):
        rng = np.random.default_rng(1)
        planes = jnp.asarray(rng.uniform(0, 1, (3, 8, 8, 4)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(-1, 1, (10, 3)).astype(np.float32))
        s = triplane_query(planes, coords, "sum")
        c = triplane_query(planes, coords, "concat")
        assert s.shape == (10, 4) and c.shape == (10, 12)
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(c[:, :4] + c[:, 4:8] + c[:, 8:]), atol=1e-6
        )

    def test_discretize_3d_roundtrip(self):
        coords = jnp.asarray([[0.3, -0.5, 0.9]])
        vox = discretize_3d(coords, 64)
        back = undiscretize_3d(jnp.floor(vox), 64)
        assert np.abs(np.asarray(back) - np.asarray(coords)).max() < 2.0 / 64

    def test_splat_points(self):
        pts = jnp.asarray([[-0.9, -0.9, -0.9], [0.9, 0.9, 0.9]])
        vals = jnp.asarray([[1.0], [3.0]])
        grid = splat_points_to_grid(pts, vals, 4)
        assert float(grid[0, 0, 0, 0]) == 1.0
        assert float(grid[3, 3, 3, 0]) == 3.0
        assert float(grid[1, 1, 1, 0]) == 0.0


class TestRemap:
    def test_remap_between_unwraps(self):
        """Same sphere, two different UV layouts: colors must survive the
        transfer (position-dependent texture)."""
        sphere = make_icosphere(3)
        src = unwrap_atlas(sphere, size=128, gutter=2)
        # paint source texture from a position-based function via its charts
        import jax.numpy as jnp
        from unitex_tpu.geometry.mesh import Mesh
        from unitex_tpu.render.renderer_inverse import uv_render

        src_mesh = Mesh(
            jnp.asarray(src.vertices), jnp.asarray(src.faces),
            uv=jnp.asarray(src.uv), faces_uv=jnp.asarray(src.faces_uv),
        )
        uv_out = uv_render(src_mesh, 128, pixel_tile=0)
        tex = 0.5 + 0.5 * uv_out["position"]
        src.texture = (np.clip(np.asarray(tex), 0, 1) * 255).astype(np.uint8)

        # target: different chart layout (finer mesh -> different unwrap)
        dst = unwrap_atlas(make_icosphere(3), size=64, gutter=1)
        out = remap_texture(src, dst, uv_size=64, n_samples=20000, k=3, knn_chunk=2048)
        # verify: for target texels, baked color == positional function
        dst_mesh = Mesh(
            jnp.asarray(dst.vertices), jnp.asarray(dst.faces),
            uv=jnp.asarray(dst.uv), faces_uv=jnp.asarray(dst.faces_uv),
        )
        dst_uv = uv_render(dst_mesh, 64, pixel_tile=0)
        mask = np.asarray(dst_uv["mask"])[..., 0]
        expect = np.clip(0.5 + 0.5 * np.asarray(dst_uv["position"]), 0, 1)
        err = np.abs(out - expect)[mask]
        assert err.mean() < 0.05, err.mean()


class TestColorTransfer:
    def test_vertex_colors_to_uv_texture(self):
        """The texture/transfer capability (transfer_kerner.color_transfer_v_uv):
        src vertex colors -> dst UV texture, dst unwrapped on the fly."""
        from unitex_tpu.texture.remapping import color_transfer_v_uv

        sphere = make_icosphere(3)
        # position-based vertex paint
        sphere.vertex_colors = np.clip(
            0.5 + 0.5 * sphere.vertices, 0.0, 1.0
        ).astype(np.float32)
        dst = make_icosphere(3)  # no UVs
        out = color_transfer_v_uv(sphere, dst, uv_size=64, n_samples=20000)
        assert out.uv is not None and out.faces_uv is not None
        assert out.texture.shape == (64, 64, 3) and out.texture.dtype == np.uint8

        import jax.numpy as jnp
        from unitex_tpu.geometry.mesh import Mesh
        from unitex_tpu.render.renderer_inverse import uv_render

        dst_mesh = Mesh(
            jnp.asarray(out.vertices), jnp.asarray(out.faces),
            uv=jnp.asarray(out.uv), faces_uv=jnp.asarray(out.faces_uv),
        )
        dst_uv = uv_render(dst_mesh, 64, pixel_tile=0)
        mask = np.asarray(dst_uv["mask"])[..., 0]
        expect = np.clip(0.5 + 0.5 * np.asarray(dst_uv["position"]), 0, 1)
        err = np.abs(out.texture.astype(np.float32) / 255.0 - expect)[mask]
        assert err.mean() < 0.05, err.mean()


class TestQueryExtensions:
    def test_box_query_matches_triplane_pairs(self):
        import numpy as np
        from unitex_tpu.render.volume import box_query, triplane_query

        rng = np.random.default_rng(0)
        planes = jnp.asarray(rng.normal(size=(3, 8, 8, 4)).astype(np.float32))
        # box with each plane duplicated = 2x the triplane sum
        faces = jnp.asarray(np.repeat(np.asarray(planes), 2, axis=0))
        coords = jnp.asarray(rng.uniform(-1, 1, size=(10, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(box_query(faces, coords)),
            2 * np.asarray(triplane_query(planes, coords, mode="sum")),
            rtol=1e-5, atol=1e-5)

    def test_discretize_2d_roundtrip(self):
        import numpy as np
        from unitex_tpu.render.volume import discretize_2d, undiscretize_2d

        H = W = 16
        pix = jnp.stack(jnp.meshgrid(jnp.arange(W), jnp.arange(H), indexing="xy"), -1)
        ndc = undiscretize_2d(pix, H, W)
        back = discretize_2d(ndc, H, W)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(pix))

    def test_discretize_2d_torch_parity(self):
        import numpy as np
        torch = pytest.importorskip("torch")
        from unitex_tpu.render.volume import discretize_2d

        rng = np.random.default_rng(1)
        g = rng.uniform(-0.999, 0.999, size=(50, 2)).astype(np.float32)
        # reference discretize_2d (query.py:136-149)
        uf = g[:, 0] * 0.5 + 0.5
        vf = g[:, 1] * 0.5 + 0.5
        expect = np.stack([np.floor(uf * 32), np.floor(vf * 24)], -1).astype(np.int64)
        ours = discretize_2d(jnp.asarray(g), 24, 32)
        np.testing.assert_array_equal(np.asarray(ours), expect)

    def test_make_grids(self):
        import numpy as np
        from unitex_tpu.render.volume import make_grid_2d, make_grid_3d

        g2 = make_grid_2d(4, 8)
        assert g2.shape == (4, 8, 2)
        # x varies along axis 1, centers symmetric about 0
        np.testing.assert_allclose(float(g2[0, 0, 0] + g2[0, -1, 0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(g2[0, 0, 1] + g2[-1, 0, 1]), 0.0, atol=1e-6)
        g3 = make_grid_3d(2, 4, 8)
        assert g3.shape == (2, 4, 8, 3)
        np.testing.assert_allclose(float(g3[0, 0, 0, 2]), -0.5, atol=1e-6)


class TestCauchyQueries:
    """query_circle / query_cylinder (reference query.py:202-233; the
    reference's query_cylinder is FIXME-incomplete — ours completes the
    same per-ring integral with linear z interpolation)."""

    def test_query_circle_torch_parity(self):
        import numpy as np
        torch = pytest.importorskip("torch")
        from unitex_tpu.render.volume import query_circle

        rng = np.random.default_rng(0)
        B, N, Cc, Wc = 2, 17, 3, 64
        pos = (rng.uniform(-0.5, 0.5, size=(B, N, 2))).astype(np.float32)
        circ = rng.normal(size=(B, Cc, Wc)).astype(np.float32)

        # reference query_circle semantics, verbatim in torch
        tpos, tcirc = torch.from_numpy(pos), torch.from_numpy(circ)
        tcirc = torch.cat([tcirc, tcirc[..., [0]]], dim=-1)
        t = torch.linspace(0, 1, Wc + 1)
        d_t = torch.gradient(t)[0]
        gamma = torch.complex(
            torch.cos(2 * torch.pi * t), torch.sin(2 * torch.pi * t))
        d_gamma = torch.complex(
            -2 * torch.pi * torch.sin(2 * torch.pi * t),
            2 * torch.pi * torch.cos(2 * torch.pi * t)) * d_t
        z = torch.view_as_complex(tpos)[..., None, None]
        f_gamma = tcirc.permute(0, 2, 1).unsqueeze(-3)
        c = f_gamma * d_gamma[:, None] / (gamma[:, None] - z)
        expect = (c.sum(dim=-2) / (2j * torch.pi)).real.numpy()

        ours = query_circle(jnp.asarray(pos), jnp.asarray(circ))
        np.testing.assert_allclose(np.asarray(ours), expect, atol=2e-5)

    def test_query_circle_reconstructs_holomorphic(self):
        """Real boundary channels cos θ = (γ + 1/γ)/2 and sin θ: the Cauchy
        integral keeps only the holomorphic half (the 1/γ residues cancel),
        so the interior values are Re(z/2) = x/2 and Re(-iz/2) = y/2 — i.e.
        pos/2 (up to the reference quadrature's O(1/Wc) bias)."""
        import numpy as np
        from unitex_tpu.render.volume import query_circle

        Wc = 512
        th = np.arange(Wc) / Wc * 2 * np.pi
        circ = np.stack([np.cos(th), np.sin(th)])[None].astype(np.float32)
        rng = np.random.default_rng(1)
        pos = rng.uniform(-0.6, 0.6, size=(1, 40, 2)).astype(np.float32)
        out = np.asarray(query_circle(jnp.asarray(pos), jnp.asarray(circ)))
        np.testing.assert_allclose(out, pos[0][None] / 2, atol=2e-2)

    def test_query_cylinder_interpolates_rings(self):
        import numpy as np
        from unitex_tpu.render.volume import query_circle, query_cylinder

        rng = np.random.default_rng(2)
        B, N, Cc, Dc, Wc = 1, 9, 2, 4, 32
        cyl = rng.normal(size=(B, Cc, Dc, Wc)).astype(np.float32)
        xy = rng.uniform(-0.4, 0.4, size=(B, N, 2)).astype(np.float32)

        # exactly on ring k: must equal the plain circle query of slice k
        for k in (0, 2):
            zk = -1.0 + 2.0 * k / (Dc - 1)
            pos = np.concatenate([xy, np.full((B, N, 1), zk, np.float32)], -1)
            out = query_cylinder(jnp.asarray(pos), jnp.asarray(cyl))
            ref = query_circle(jnp.asarray(xy), jnp.asarray(cyl[:, :, k]))
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5)

        # midway between rings 1 and 2: mean of the two slice queries
        zm = -1.0 + 2.0 * 1.5 / (Dc - 1)
        pos = np.concatenate([xy, np.full((B, N, 1), zm, np.float32)], -1)
        out = query_cylinder(jnp.asarray(pos), jnp.asarray(cyl))
        r1 = query_circle(jnp.asarray(xy), jnp.asarray(cyl[:, :, 1]))
        r2 = query_circle(jnp.asarray(xy), jnp.asarray(cyl[:, :, 2]))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray((r1 + r2) / 2), atol=2e-5)

        # single-ring cylinder: pure circle query at any z
        one = cyl[:, :, :1]
        pos = np.concatenate([xy, np.full((B, N, 1), 0.7, np.float32)], -1)
        out = query_cylinder(jnp.asarray(pos), jnp.asarray(one))
        ref = query_circle(jnp.asarray(xy), jnp.asarray(one[:, :, 0]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
