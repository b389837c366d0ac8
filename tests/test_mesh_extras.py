"""Tangent frames, edge-Laplacian smoothing, simple vertex smoothing, and
fixed-radius (query_ball) neighbor search.

References: mesh/structure.py:550-592 (_compute_vertex_tangent),
:743-784 (_laplacian_v2 / laplacian_func / laplacian_loss),
uv_atlas.py:70 (filter_smooth_simple x3), pcd/knn/knn_cupy.py:856+
(query_ball_point).  Each jnp implementation is checked against a direct
numpy reference (the dual-implementation pattern).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from unitex_tpu.geometry.io.mesh_io import HostMesh
from unitex_tpu.geometry.mesh import (
    compute_vertex_normals,
    compute_vertex_tangents,
    laplacian_loss,
    laplacian_smooth,
)
from unitex_tpu.geometry.primitives import make_icosphere
from unitex_tpu.geometry.process import smooth_simple
from unitex_tpu.geometry.topology import unique_edges
from unitex_tpu.ops.knn import query_ball


def _tangents_ref(v, f, uv, fuv):
    """Direct per-face loop with the reference's exact update rule."""
    V = v.shape[0]
    tangents = np.zeros((V, 3))
    tansum = np.zeros((V, 3))
    for fi in range(f.shape[0]):
        p = v[f[fi]]
        t = uv[fuv[fi]]
        pe1, pe2 = p[1] - p[0], p[2] - p[0]
        ue1, ue2 = t[1] - t[0], t[2] - t[0]
        nom = pe1 * ue2[1] - pe2 * ue1[1]
        denom = ue1[0] * ue2[1] - ue1[1] * ue2[0]
        denom = max(denom, 1e-6) if denom > 0 else min(denom, -1e-6)
        tang = nom / denom
        for c in range(3):
            tangents[f[fi, c]] += tang
            tansum[f[fi, c]] += 1.0
    tangents = tangents / np.maximum(tansum, 1.0)
    tangents /= np.maximum(np.linalg.norm(tangents, axis=-1, keepdims=True), 1e-20)
    nrm = np.asarray(compute_vertex_normals(jnp.asarray(v), jnp.asarray(f)))
    tangents -= (tangents * nrm).sum(-1, keepdims=True) * nrm
    return tangents / np.maximum(
        np.linalg.norm(tangents, axis=-1, keepdims=True), 1e-20
    )


class TestVertexTangents:
    def _grid_mesh(self):
        # 3x3 planar grid in xz, uv = (x, z) -> tangent (dP/du) must be +x
        n = 3
        xs, zs = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
        v = np.stack([xs, np.zeros_like(xs), zs], -1).reshape(-1, 3)
        faces = []
        for i in range(n - 1):
            for j in range(n - 1):
                a, b, c, d = i * n + j, i * n + j + 1, (i + 1) * n + j, (i + 1) * n + j + 1
                faces += [[a, b, d], [a, d, c]]
        f = np.asarray(faces, np.int32)
        uv = np.stack([v[:, 0], v[:, 2]], -1)
        return v.astype(np.float32), f, uv.astype(np.float32)

    def test_planar_grid_aligns_with_u(self):
        v, f, uv = self._grid_mesh()
        tng = np.asarray(compute_vertex_tangents(jnp.asarray(v), jnp.asarray(f), jnp.asarray(uv)))
        np.testing.assert_allclose(tng, np.tile([1.0, 0, 0], (v.shape[0], 1)), atol=1e-5)

    def test_matches_loop_reference_on_sphere(self):
        m = make_icosphere(subdivisions=1)
        rng = np.random.default_rng(0)
        uv = rng.uniform(0.05, 0.95, size=(m.n_vertices, 2)).astype(np.float32)
        got = np.asarray(
            compute_vertex_tangents(
                jnp.asarray(m.vertices), jnp.asarray(m.faces), jnp.asarray(uv)
            )
        )
        want = _tangents_ref(m.vertices, m.faces, uv, m.faces)
        np.testing.assert_allclose(got, want, atol=1e-4)
        # orthogonal to the vertex normals, unit length
        nrm = np.asarray(compute_vertex_normals(jnp.asarray(m.vertices), jnp.asarray(m.faces)))
        assert np.abs((got * nrm).sum(-1)).max() < 1e-4
        np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-4)

    def test_separate_uv_topology(self):
        v, f, uv = self._grid_mesh()
        # give the uv its own (identical) index buffer — must not change result
        a = compute_vertex_tangents(jnp.asarray(v), jnp.asarray(f), jnp.asarray(uv), jnp.asarray(f))
        b = compute_vertex_tangents(jnp.asarray(v), jnp.asarray(f), jnp.asarray(uv))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestLaplacian:
    def _adj_ref(self, v, edges, V, passes):
        adj = [[] for _ in range(V)]
        for e0, e1 in edges:
            adj[e0].append(e1)
            adj[e1].append(e0)
        x = v.copy()
        for _ in range(passes):
            x = np.stack(
                [x[a].mean(0) if a else np.zeros(v.shape[1]) for a in adj]
            )
        return x

    def test_depth_semantics(self):
        m = make_icosphere(subdivisions=1)
        edges = unique_edges(m.faces)
        v = jnp.asarray(m.vertices)
        # depth=1 is identity (laplacian_func base case)
        same = laplacian_smooth(v, jnp.asarray(edges), m.n_vertices, depth=1)
        np.testing.assert_allclose(np.asarray(same), m.vertices, atol=0)
        got = np.asarray(laplacian_smooth(v, jnp.asarray(edges), m.n_vertices, depth=3))
        want = self._adj_ref(m.vertices.astype(np.float64), edges, m.n_vertices, 2)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_loss_shrinks_sphere_norm(self):
        m = make_icosphere(subdivisions=1)
        edges = jnp.asarray(unique_edges(m.faces))
        l1 = float(laplacian_loss(jnp.asarray(m.vertices), edges, m.n_vertices, depth=1))
        l3 = float(laplacian_loss(jnp.asarray(m.vertices), edges, m.n_vertices, depth=3))
        assert abs(l1 - 1.0) < 1e-5  # unit sphere vertex norm
        assert 0.0 < l3 < l1  # neighbor means pull inside the sphere


class TestSmoothSimple:
    def test_matches_adjacency_reference(self):
        m = make_icosphere(subdivisions=1)
        edges = unique_edges(m.faces)
        deg = np.bincount(edges.reshape(-1), minlength=m.n_vertices)
        v = m.vertices.astype(np.float64)
        for _ in range(3):
            nbr = np.zeros_like(v)
            np.add.at(nbr, edges[:, 0], v[edges[:, 1]])
            np.add.at(nbr, edges[:, 1], v[edges[:, 0]])
            v = (v + nbr) / (1.0 + deg)[:, None]
        out = smooth_simple(HostMesh(m.vertices, m.faces), iterations=3)
        np.testing.assert_allclose(out.vertices, v.astype(np.float32), atol=1e-6)
        # smoothing a sphere shrinks it, keeps the center
        assert np.linalg.norm(out.vertices, axis=-1).mean() < 0.99
        np.testing.assert_allclose(out.vertices.mean(0), 0.0, atol=1e-6)
        assert out.faces is m.faces

    def test_zero_iterations_noop(self):
        m = make_icosphere(subdivisions=0)
        out = smooth_simple(m, iterations=0)
        np.testing.assert_allclose(out.vertices, m.vertices)


class TestQueryBall:
    def test_scipy_parity(self):
        scipy_spatial = pytest.importorskip("scipy.spatial")
        rng = np.random.default_rng(3)
        ref = rng.uniform(size=(300, 3)).astype(np.float32)
        q = rng.uniform(size=(97, 3)).astype(np.float32)
        radius = 0.22
        idx, mask, counts = query_ball(
            jnp.asarray(q), jnp.asarray(ref), radius, cap=64, chunk=64
        )
        idx, mask, counts = map(np.asarray, (idx, mask, counts))
        tree = scipy_spatial.cKDTree(ref)
        lists = tree.query_ball_point(q, radius)
        for i, want in enumerate(lists):
            assert counts[i] == len(want)
            got = set(idx[i][mask[i]].tolist())
            assert got == set(want)

    def test_cap_keeps_nearest(self):
        rng = np.random.default_rng(4)
        ref = rng.normal(size=(50, 2)).astype(np.float32)
        q = np.zeros((1, 2), np.float32)
        idx, mask, counts = query_ball(jnp.asarray(q), jnp.asarray(ref), 10.0, cap=5)
        d = np.linalg.norm(ref, axis=-1)
        assert int(counts[0]) == 50  # true count is uncapped
        assert bool(np.asarray(mask)[0].all())
        got = set(np.asarray(idx)[0].tolist())
        assert got == set(np.argsort(d)[:5].tolist())

    def test_ref_valid_mask(self):
        ref = np.asarray([[0.0, 0], [0.1, 0], [5.0, 5]], np.float32)
        q = np.zeros((1, 2), np.float32)
        valid = jnp.asarray([True, False, True])
        idx, mask, counts = query_ball(
            jnp.asarray(q), jnp.asarray(ref), 1.0, cap=3, ref_valid=valid
        )
        assert int(counts[0]) == 1
        assert set(np.asarray(idx)[0][np.asarray(mask)[0]].tolist()) == {0}


class TestParseColor:
    def test_specs(self):
        from unitex_tpu.utils.color import color_to_uint8, parse_color

        assert parse_color(None) is None
        np.testing.assert_allclose(parse_color("grey"), [128 / 255.0] * 3)  # PIL #808080, what the reference actually composites
        np.testing.assert_allclose(parse_color("white"), [1.0, 1.0, 1.0])
        np.testing.assert_allclose(parse_color("aliceblue"),
                                   np.array([0xF0, 0xF8, 0xFF]) / 255.0)
        np.testing.assert_allclose(parse_color(0.5), [0.5])
        np.testing.assert_allclose(parse_color((0.1, 0.2, 0.3)),
                                   [0.1, 0.2, 0.3], rtol=1e-6)
        assert color_to_uint8("#ff0080") == (255, 0, 128)
        with pytest.raises(NotImplementedError):
            parse_color("not-a-color")
        with pytest.raises(NotImplementedError):
            parse_color((0.1, 0.2))

    def test_process_image_accepts_any_spec(self):
        from PIL import Image

        from unitex_tpu.image.process_image import preprocess_reference_image

        img = Image.new("RGBA", (64, 64), (0, 0, 0, 0))
        img.paste((200, 10, 10, 255), (20, 20, 44, 44))
        out = preprocess_reference_image(img, H=32, W=32, color="navy")
        corner = np.array(out)[0, 0, :3]
        np.testing.assert_array_equal(corner, [0, 0, 128])
