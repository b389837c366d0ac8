import jax.numpy as jnp
import numpy as np

from unitex_tpu.geometry.mesh import Mesh
from unitex_tpu.geometry.primitives import make_cube, make_icosphere
from unitex_tpu.render.conditioning import (
    condition_cameras,
    grid_to_strip,
    grid_to_views,
    render_geometry_condition,
    strip_to_grid,
    views_to_grid,
)
from unitex_tpu.render.renderer import render_views


def _sphere_mesh(sub=3, scale=0.95):
    s = make_icosphere(sub)
    return Mesh(jnp.asarray(s.vertices * scale), jnp.asarray(s.faces))


class TestRenderer:
    def test_normals_point_at_cameras(self):
        """Each box view must see surface normals facing it (center pixel
        camera_normal z ~ +1 toward camera)."""
        mesh = _sphere_mesh()
        c2ws, intr = condition_cameras()
        out = render_views(
            mesh, c2ws, intr, (64, 64), render_camera_normal=True,
        )
        cn = np.asarray(out.camera_normal)
        for v in range(6):
            center = cn[v, 32, 32]
            assert center[2] > 0.9, f"view {v}: {center}"

    def test_world_position_matches_view(self):
        """Front view center pixel sees the surface point nearest +z."""
        mesh = _sphere_mesh()
        c2ws, intr = condition_cameras()
        out = render_views(
            mesh, c2ws, intr, (64, 64), render_world_position=True,
        )
        wp = np.asarray(out.world_position)
        # frtbld view 0 = front (+z in storage frame)
        center = wp[0, 32, 32]
        np.testing.assert_allclose(center, [0, 0, 0.95], atol=0.02)

    def test_alpha_silhouette(self):
        mesh = _sphere_mesh()
        c2ws, intr = condition_cameras()
        out = render_views(mesh, c2ws, intr, (64, 64))
        a = np.asarray(out.alpha)[..., 0]
        frac = a.mean(axis=(1, 2))
        # sphere silhouette = pi * 0.95^2 / 4 of the frame from every view
        expect = np.pi * 0.95**2 / 4.0
        np.testing.assert_allclose(frac, expect, atol=0.05)

    def test_map_attr_texture_sampling(self):
        cube = make_cube()
        mesh = Mesh(
            jnp.asarray(cube.vertices * 0.8),
            jnp.asarray(cube.faces),
            uv=jnp.asarray(cube.uv),
            faces_uv=jnp.asarray(cube.faces_uv),
        )
        tex = jnp.ones((64, 64, 3)) * jnp.asarray([1.0, 0.0, 0.0])
        c2ws, intr = condition_cameras()
        out = render_views(
            mesh, c2ws, intr, (32, 32),
            map_attr=tex, render_uv=True, render_map_attr=True,
        )
        m = np.asarray(out.map_attr)
        a = np.asarray(out.alpha)
        inside = a[..., 0] > 0.5
        assert np.abs(m[inside] - np.asarray([1.0, 0.0, 0.0])).max() < 1e-5


class TestGrids:
    def test_views_grid_roundtrip(self):
        rng = np.random.default_rng(0)
        views = jnp.asarray(rng.uniform(0, 1, (6, 8, 8, 3)).astype(np.float32))
        grid = views_to_grid(views, 2, 3)
        assert grid.shape == (16, 24, 3)
        back = grid_to_views(grid, 2, 3)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(views))

    def test_grid_strip_roundtrip(self):
        rng = np.random.default_rng(1)
        grid = jnp.asarray(rng.uniform(0, 1, (16, 24, 3)).astype(np.float32))
        strip = grid_to_strip(grid)
        assert strip.shape == (8, 48, 3)
        back = strip_to_grid(strip)
        np.testing.assert_allclose(np.asarray(back), np.asarray(grid), atol=1e-7)

    def test_strip_permutation_semantics(self):
        """Cell k of the frtbld grid lands at the pinned strip position."""
        # label each cell with a constant
        views = jnp.stack([jnp.full((4, 4, 1), float(i)) for i in range(6)])
        grid = views_to_grid(views, 2, 3)
        strip = grid_to_strip(grid)
        strip_cells = [float(strip[0, i * 4, 0]) for i in range(6)]
        # frtbld cells: 0=front 1=right 2=top 3=back 4=left 5=down
        # expected strip order: front, left, right, back, top, down
        assert strip_cells == [0.0, 4.0, 1.0, 3.0, 2.0, 5.0]

    def test_down_view_flip(self):
        views = np.zeros((6, 4, 4, 1), dtype=np.float32)
        views[5, 0, 0, 0] = 1.0  # mark top-left of the down view
        grid = views_to_grid(jnp.asarray(views), 2, 3)
        strip = grid_to_strip(grid)
        cells = grid_to_views(strip, 1, 6)
        # down view is the last strip cell, rotated 180: mark moved to bottom-right
        assert float(cells[5, -1, -1, 0]) == 1.0
        assert float(cells[5, 0, 0, 0]) == 0.0


class TestConditioning:
    def test_geometry_condition_outputs(self):
        mesh = _sphere_mesh()
        out = render_geometry_condition(mesh, view_size=32)
        assert out["alpha"].shape == (64, 96, 1)
        assert out["ccm"].shape == (64, 96, 3)
        assert out["normal"].shape == (64, 96, 3)
        ccm = np.asarray(out["ccm"])
        alpha = np.asarray(out["alpha"])
        # background is grey 0.5
        bg = alpha[..., 0] < 0.5
        np.testing.assert_allclose(ccm[bg], 0.5, atol=1e-6)
        # foreground ccm within [0,1]
        assert ccm.min() >= 0.0 and ccm.max() <= 1.0
        # normals on the sphere: front view center pixel normal ~ +z -> 0.5*(n+1)
        normal = np.asarray(out["normal_views"])
        np.testing.assert_allclose(normal[0, 16, 16], [0.5, 0.5, 1.0], atol=0.05)


class TestVisibility:
    def test_visible_faces_sphere(self):
        from unitex_tpu.render.renderer import get_visible_faces, get_visible_vertices

        mesh = _sphere_mesh(2)
        c2ws, intr = condition_cameras()
        fvis = np.asarray(get_visible_faces(mesh, c2ws, intr, (64, 64)))
        assert fvis.shape == (6, mesh.faces.shape[0])
        # each view sees roughly a hemisphere's worth of faces
        frac = fvis.mean(axis=1)
        assert (frac > 0.2).all() and (frac < 0.7).all()
        # every face of a convex sphere is visible from some view
        assert fvis.any(axis=0).mean() > 0.99
        vvis = np.asarray(get_visible_vertices(mesh, c2ws, intr, (64, 64)))
        assert vvis.shape == (6, mesh.vertices.shape[0])
        assert vvis.any(axis=0).mean() > 0.99


def test_draw_point_cloud():
    from unitex_tpu.render.renderer import draw_point_cloud

    pts = jnp.asarray([[0.0, 0.0], [-1.0, -1.0], [2.0, 0.0]])  # last off-screen
    img = np.asarray(draw_point_cloud(pts, 8, 8))
    assert img.shape == (8, 8, 1)
    assert img[4, 4, 0]      # center
    assert img[0, 0, 0]      # top-left corner
    assert img.sum() == 2    # off-screen point dropped
