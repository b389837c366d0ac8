import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.camera import (
    c2ws_to_ray_matrices,
    generate_box_views_c2ws,
    generate_intrinsics,
    get_mvp,
)
from unitex_tpu.geometry.primitives import make_cube, make_icosphere
from unitex_tpu.ops.grid_sample import grid_sample, sample_texture
from unitex_tpu.ops.knn import knn, knn_gather_blend
from unitex_tpu.ops.rasterize import interpolate, rasterize, rasterize_uv
from unitex_tpu.ops.raytrace import ray_triangle_intersect


def _clip_verts(mesh, view=0, radius=2.8, scale=1.0):
    c2ws = generate_box_views_c2ws(radius)
    intr = generate_intrinsics(scale, scale, fov=False)
    mvp = get_mvp(c2ws[view][None], intr[None], perspective=False)[0]
    v = jnp.asarray(mesh.vertices)
    vh = jnp.concatenate([v, jnp.ones_like(v[:, :1])], axis=-1)
    return vh @ mvp.T


class TestRasterize:
    def test_sphere_coverage(self):
        sphere = make_icosphere(3)
        clip = _clip_verts(sphere)
        rast = rasterize(clip, jnp.asarray(sphere.faces), (64, 64))
        mask = np.asarray(rast.mask)
        # unit sphere with ortho scale 1 covers the full frame circle:
        # area ratio ~ pi/4 of ndc square
        frac = mask.mean()
        assert 0.7 < frac < 0.85
        # center pixel hit, corners empty
        assert mask[32, 32]
        assert not mask[0, 0] and not mask[-1, -1]

    def test_depth_ordering(self):
        """Two stacked quads: the nearer one must win the z-test."""
        # front camera looks along -z (storage); nearer = larger z
        verts = jnp.asarray(
            [
                # far quad at z=0, full frame
                [-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0],
                # near quad at z=0.5, center
                [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5],
            ],
            dtype=jnp.float32,
        )
        faces = jnp.asarray(
            [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], dtype=jnp.int32
        )
        from unitex_tpu.geometry.io.mesh_io import HostMesh

        mesh = HostMesh(np.asarray(verts), np.asarray(faces))
        clip = _clip_verts(mesh)
        rast = rasterize(clip, faces, (64, 64))
        tri = np.asarray(rast.tri)
        assert tri[32, 32] in (2, 3)  # center: near quad
        assert tri[4, 4] in (0, 1)    # corner: far quad only

    def test_barycentric_interpolation_linear(self):
        """Interpolating vertex positions must reproduce the surface point."""
        sphere = make_icosphere(3)
        clip = _clip_verts(sphere)
        faces = jnp.asarray(sphere.faces)
        rast = rasterize(clip, faces, (128, 128))
        pos = interpolate(jnp.asarray(sphere.vertices), rast, faces)
        mask = np.asarray(rast.mask)
        p = np.asarray(pos)[mask]
        r = np.linalg.norm(p, axis=-1)
        # interpolated points lie on chords of the unit sphere
        assert r.max() < 1.001
        assert r.mean() > 0.95

    def test_pixel_tiling_matches_single_tile(self):
        sphere = make_icosphere(2)
        clip = _clip_verts(sphere)
        faces = jnp.asarray(sphere.faces)
        full = rasterize(clip, faces, (64, 64))
        tiled = rasterize(clip, faces, (64, 64), pixel_tile=16)
        np.testing.assert_array_equal(np.asarray(full.tri), np.asarray(tiled.tri))
        np.testing.assert_allclose(
            np.asarray(full.bary), np.asarray(tiled.bary), atol=1e-6
        )

    def test_face_chunking_invariance(self):
        sphere = make_icosphere(2)
        clip = _clip_verts(sphere)
        faces = jnp.asarray(sphere.faces)
        a = rasterize(clip, faces, (64, 64), face_chunk=64)
        b = rasterize(clip, faces, (64, 64), face_chunk=512)
        np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))

    def test_uv_rasterization(self):
        cube = make_cube()
        rast = rasterize_uv(
            jnp.asarray(cube.uv), jnp.asarray(cube.faces_uv), 64
        )
        mask = np.asarray(rast.mask)
        # cube atlas covers most of its 3x2 chart layout
        assert mask.mean() > 0.8
        # v-up convention: uv (0.1, 0.9) is near the TOP of the image
        iy = int((1 - 0.9) * 64)
        ix = int(0.1 * 64)
        assert mask[iy, ix]

    def test_orientation_y_down(self):
        """A vertex at +y (storage up) must land in the upper image half."""
        sphere = make_icosphere(2)
        v = sphere.vertices * 0.3
        v[:, 1] += 0.6  # shift up
        from unitex_tpu.geometry.io.mesh_io import HostMesh

        mesh = HostMesh(v, sphere.faces)
        clip = _clip_verts(mesh)
        rast = rasterize(clip, jnp.asarray(sphere.faces), (64, 64))
        mask = np.asarray(rast.mask)
        ys = np.nonzero(mask.any(axis=1))[0]
        assert ys.mean() < 32  # upper half


class TestRayTrace:
    def test_sphere_hits(self):
        sphere = make_icosphere(3)
        n = 64
        # orthographic rays from +z down -z
        xs = np.linspace(-1.5, 1.5, n, dtype=np.float32)
        gx, gy = np.meshgrid(xs, xs, indexing="xy")
        rays_o = np.stack([gx, gy, np.full_like(gx, 3.0)], axis=-1).reshape(-1, 3)
        rays_d = np.broadcast_to([0.0, 0.0, -1.0], rays_o.shape).astype(np.float32)
        hits = ray_triangle_intersect(
            jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.asarray(sphere.vertices), jnp.asarray(sphere.faces),
            ray_chunk=1024, face_chunk=512,
        )
        hit = np.asarray(hits.hit).reshape(n, n)
        r = np.sqrt(gx**2 + gy**2)
        # rays within the sphere silhouette hit; outside miss
        assert hit[r < 0.9].mean() > 0.99
        assert hit[r > 1.05].mean() < 0.01
        # hit locations lie on the sphere (front surface z>0)
        loc = np.asarray(hits.loc).reshape(n, n, 3)[hit & (r < 0.9)]
        np.testing.assert_allclose(np.linalg.norm(loc, axis=-1), 1.0, atol=0.02)
        assert (loc[:, 2] > 0).all()

    def test_rays_match_rasterizer(self):
        """Ray tracing through pixel centers must agree with the rasterizer's
        visible surface — the round-trip oracle of renderer_inverse test_gt."""
        sphere = make_icosphere(3)
        c2ws = generate_box_views_c2ws(2.8)[:1]
        intr = generate_intrinsics(1.0, 1.0, fov=False)[None]
        H = W = 32
        rays_o, rays_d = c2ws_to_ray_matrices(c2ws, intr, H, W, perspective=False)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        hits = ray_triangle_intersect(
            rays_o, rays_d,
            jnp.asarray(sphere.vertices), jnp.asarray(sphere.faces),
            ray_chunk=1024, face_chunk=512,
        )
        clip = _clip_verts(sphere)
        rast = rasterize(clip, jnp.asarray(sphere.faces), (H, W))
        rt_mask = np.asarray(hits.hit).reshape(H, W)
        rs_mask = np.asarray(rast.mask)
        # masks agree except possibly at silhouette pixels
        disagree = (rt_mask != rs_mask).mean()
        assert disagree < 0.05
        # where both hit: same triangle or a depth-equal neighbor
        both = rt_mask & rs_mask
        rt_tri = np.asarray(hits.tri).reshape(H, W)
        rs_tri = np.asarray(rast.tri)
        same = (rt_tri == rs_tri)[both].mean()
        assert same > 0.9


class TestKNN:
    def test_exact_small(self):
        rng = np.random.default_rng(0)
        refs = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        qs = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
        d, i = knn(jnp.asarray(qs), jnp.asarray(refs), k=4, chunk=64)
        # scipy oracle
        from scipy.spatial import cKDTree

        tree = cKDTree(refs)
        d_ref, i_ref = tree.query(qs, k=4)
        np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), i_ref)

    def test_ref_valid_mask(self):
        refs = np.asarray([[0, 0, 0], [10, 0, 0], [0.1, 0, 0]], dtype=np.float32)
        valid = jnp.asarray([True, True, False])
        qs = np.zeros((1, 3), dtype=np.float32)
        d, i = knn(jnp.asarray(qs), jnp.asarray(refs), k=2, ref_valid=valid)
        assert int(i[0, 0]) == 0
        assert int(i[0, 1]) == 1  # masked point 2 sorts behind

    def test_gather_blend(self):
        refs = np.asarray([[0, 0, 0], [1, 0, 0]], dtype=np.float32)
        vals = np.asarray([[1.0], [3.0]], dtype=np.float32)
        q = np.asarray([[0.5, 0, 0]], dtype=np.float32)
        out = knn_gather_blend(jnp.asarray(q), jnp.asarray(refs), jnp.asarray(vals), k=2)
        np.testing.assert_allclose(np.asarray(out), [[2.0]], atol=1e-5)


class TestGridSample:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as TF

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (7, 9, 3)).astype(np.float32)
        grid = rng.uniform(-1.2, 1.2, (50, 2)).astype(np.float32)
        ours = grid_sample(jnp.asarray(img), jnp.asarray(grid), padding_mode="zeros")
        t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
        t_grid = torch.from_numpy(grid)[None, :, None, :]
        theirs = TF.grid_sample(
            t_img, t_grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )[0, :, :, 0].T.numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_border_mode_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as TF

        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (5, 5, 2)).astype(np.float32)
        grid = rng.uniform(-1.5, 1.5, (40, 2)).astype(np.float32)
        ours = grid_sample(jnp.asarray(img), jnp.asarray(grid), padding_mode="border")
        t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
        t_grid = torch.from_numpy(grid)[None, :, None, :]
        theirs = TF.grid_sample(
            t_img, t_grid, mode="bilinear", padding_mode="border", align_corners=False
        )[0, :, :, 0].T.numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_sample_texture_v_up(self):
        # texture with distinct top and bottom rows
        tex = np.zeros((4, 4, 1), dtype=np.float32)
        tex[0] = 1.0  # top row = v near 1
        out = sample_texture(jnp.asarray(tex), jnp.asarray([[0.5, 0.99], [0.5, 0.01]]))
        assert float(out[0, 0]) > 0.9
        assert float(out[1, 0]) < 0.1
