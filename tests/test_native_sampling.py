"""Native C++ kernel tests (dual-implementation parity) + sampling tests."""

import numpy as np
import pytest

from unitex_tpu.geometry.primitives import make_cube, make_icosphere
from unitex_tpu.geometry.sampling import (
    find_sharp_edges,
    fps,
    geometry_sampling,
    sample_sharp_edges,
    sample_surface,
)
from unitex_tpu.native import meshproc


class TestNativeBuild:
    def test_builds(self):
        assert meshproc.available(), "g++ build of meshproc failed"


class TestDecimate:
    def test_native_decimate_sphere(self):
        sphere = make_icosphere(4)  # 5120 faces
        v, f = meshproc.qem_decimate(sphere.vertices, sphere.faces, 500)
        assert 250 <= len(f) <= 520
        r = np.linalg.norm(v, axis=-1)
        assert 0.8 < r.min() and r.max() < 1.05
        # closed manifold: edges shared by exactly 2 faces
        edges = np.sort(
            np.concatenate([f[:, (0, 1)], f[:, (1, 2)], f[:, (2, 0)]]), axis=1
        )
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).mean() > 0.9

    def test_native_matches_python_quality(self):
        """Native and Python QEM should preserve the sphere comparably."""
        from unitex_tpu.geometry.process import _qem_decimate_py
        from unitex_tpu.geometry.io.mesh_io import HostMesh

        sphere = make_icosphere(3)
        v_c, f_c = meshproc.qem_decimate(sphere.vertices, sphere.faces, 300)
        py = _qem_decimate_py(HostMesh(sphere.vertices, sphere.faces), 300)

        def mean_radius_err(verts):
            return np.abs(np.linalg.norm(verts, axis=-1) - 1.0).mean()

        assert mean_radius_err(v_c) < 0.08
        assert abs(mean_radius_err(v_c) - mean_radius_err(py.vertices)) < 0.05

    def test_native_speed(self):
        """200k-face production budget must decimate in seconds, not minutes."""
        import time

        sphere = make_icosphere(6)  # 81920 faces
        t0 = time.perf_counter()
        v, f = meshproc.qem_decimate(sphere.vertices, sphere.faces, 20000)
        dt = time.perf_counter() - t0
        assert len(f) <= 20100
        assert dt < 30.0, f"native decimation too slow: {dt:.1f}s"


class TestFPS:
    def test_fps_matches_numpy(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
        idx_c = fps(pts, 64)
        idx_np = meshproc._fps_numpy(pts, 64)
        np.testing.assert_array_equal(idx_c, idx_np)

    def test_fps_spreads_points(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1, 1, (5000, 3)).astype(np.float32)
        idx = fps(pts, 100)
        assert len(np.unique(idx)) == 100
        sel = pts[idx]
        # min pairwise distance of FPS >> random selection
        def min_pdist(x):
            d = np.linalg.norm(x[:, None] - x[None], axis=-1)
            np.fill_diagonal(d, np.inf)
            return d.min()

        rand = pts[rng.choice(5000, 100, replace=False)]
        assert min_pdist(sel) > 2.0 * min_pdist(rand)


class TestSampling:
    def test_surface_sampling_on_sphere(self):
        sphere = make_icosphere(3)
        pts, nrm = sample_surface(sphere, 5000)
        r = np.linalg.norm(pts, axis=-1)
        assert 0.93 < r.min() and r.max() <= 1.001
        # normals point outward
        cos = np.einsum("ij,ij->i", nrm, pts / r[:, None])
        assert cos.mean() > 0.95

    def test_sharp_edges_cube_vs_sphere(self):
        cube = make_cube()
        edges = find_sharp_edges(cube, 15.0)
        assert len(edges) == 12  # the cube's 12 geometric edges (not diagonals)
        sphere = make_icosphere(3)
        assert len(find_sharp_edges(sphere, 15.0)) == 0

    def test_sample_sharp_edges_cube(self):
        cube = make_cube(size=2.0)
        pts, dirs = sample_sharp_edges(cube, 1200)
        assert len(pts) > 600
        # all samples lie on the cube's edges: two coordinates at +-1
        on_edge = (np.abs(np.abs(pts) - 1.0) < 1e-5).sum(axis=1) >= 2
        assert on_edge.mean() > 0.99

    def test_geometry_sampling_budget(self):
        sphere = make_icosphere(3)
        out = geometry_sampling(sphere, n_samples=5000, n_fps=512)
        assert out["surface_points"].shape == (512, 3)
        assert out["sharp_points"].shape[0] == 0
