import os

import numpy as np
import pytest

from unitex_tpu.geometry.io.mesh_io import (
    HostMesh,
    load_mesh,
    save_mesh,
    load_obj,
    save_obj,
    load_ply,
    save_ply,
    load_glb,
    save_glb,
)
from unitex_tpu.geometry.primitives import make_cube, make_icosphere, make_torus
from unitex_tpu.geometry.process import (
    loop_subdivide,
    merge_close_vertices,
    normalize_to_unit_cube,
    preprocess_blank_mesh_geometry,
    qem_decimate,
    remove_degenerate_faces,
    remove_unreferenced_vertices,
)
from unitex_tpu.geometry.uv_atlas import unwrap_atlas


def test_primitives_shapes():
    cube = make_cube()
    assert cube.n_faces == 12 and cube.n_vertices == 8
    sphere = make_icosphere(2)
    assert sphere.n_faces == 20 * 16
    np.testing.assert_allclose(np.linalg.norm(sphere.vertices, axis=-1), 1.0, atol=1e-5)
    torus = make_torus()
    assert torus.n_faces == 32 * 16 * 2


def test_cup_primitive_watertight_manifold():
    """Deep-cavity oracle primitive (VERDICT r03 #6): the tilted open cup
    must be a closed 2-manifold with outward orientation — the visibility
    depth test it stresses assumes a watertight occluder."""
    from collections import Counter

    from unitex_tpu.geometry.primitives import make_cup

    m = make_cup(n_theta=48)
    V = np.asarray(m.vertices, np.float64)
    F = np.asarray(m.faces)
    edges = Counter()
    for f in F:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            edges[(int(a), int(b))] += 1
    assert all(c == 1 for c in edges.values())  # consistent orientation
    assert all((b, a) in edges for (a, b) in edges)  # no boundary edges
    vol = np.einsum(
        "ij,ij->i", V[F[:, 0]], np.cross(V[F[:, 1]], V[F[:, 2]])
    ).sum() / 6.0
    assert vol > 0  # outward (CCW from outside)
    assert np.abs(V).max() <= 1.0 + 1e-6  # unit box like the other prims
    # the cavity is real: interior floor sits well inside the outer hull
    areas = 0.5 * np.linalg.norm(
        np.cross(V[F[:, 1]] - V[F[:, 0]], V[F[:, 2]] - V[F[:, 0]]), axis=-1
    )
    assert areas.min() > 0


def test_obj_roundtrip(tmp_path):
    cube = make_cube()
    path = str(tmp_path / "cube.obj")
    save_obj(path, cube)
    back = load_obj(path)
    np.testing.assert_allclose(back.vertices, cube.vertices, atol=1e-6)
    np.testing.assert_array_equal(back.faces, cube.faces)
    np.testing.assert_allclose(back.uv, cube.uv, atol=1e-6)
    np.testing.assert_array_equal(back.faces_uv, cube.faces_uv)


def test_obj_texture_roundtrip(tmp_path):
    cube = make_cube()
    cube.texture = (np.random.default_rng(0).uniform(0, 255, (16, 16, 3))).astype(np.uint8)
    path = str(tmp_path / "tex.obj")
    save_obj(path, cube)
    back = load_obj(path)
    assert back.texture is not None
    np.testing.assert_array_equal(back.texture, cube.texture)


def test_ply_roundtrip(tmp_path):
    sphere = make_icosphere(1)
    sphere.vertex_colors = np.random.default_rng(0).uniform(0, 1, (sphere.n_vertices, 3)).astype(np.float32)
    path = str(tmp_path / "s.ply")
    save_ply(path, sphere)
    back = load_ply(path)
    np.testing.assert_allclose(back.vertices, sphere.vertices, atol=1e-6)
    np.testing.assert_array_equal(back.faces, sphere.faces)
    err = np.abs(back.vertex_colors - sphere.vertex_colors).max()
    assert err <= 1.0 / 255.0 + 1e-6


def test_glb_roundtrip(tmp_path):
    cube = make_cube()
    cube.texture = (np.random.default_rng(1).uniform(0, 255, (32, 32, 3))).astype(np.uint8)
    path = str(tmp_path / "cube.glb")
    save_glb(path, cube)
    back = load_glb(path)
    assert back.n_faces == cube.n_faces
    # welded per-corner layout: vertex positions per face triangle must match
    orig_tris = np.sort(cube.vertices[cube.faces].round(5).reshape(cube.n_faces, -1), axis=-1)
    back_tris = np.sort(back.vertices[back.faces].round(5).reshape(back.n_faces, -1), axis=-1)
    np.testing.assert_allclose(
        np.sort(orig_tris, axis=0), np.sort(back_tris, axis=0), atol=1e-5
    )
    assert back.texture is not None
    np.testing.assert_array_equal(back.texture, cube.texture)
    assert back.uv is not None
    # uv roundtrip through v-flip is identity
    uv_orig = np.sort(cube.uv[cube.faces_uv].reshape(-1, 6), axis=0)
    uv_back = np.sort(back.uv[back.faces_uv].reshape(-1, 6), axis=0)
    np.testing.assert_allclose(uv_orig, uv_back, atol=1e-6)


def test_dispatch(tmp_path):
    cube = make_cube()
    for ext in ("obj", "ply", "glb"):
        path = str(tmp_path / f"m.{ext}")
        save_mesh(path, cube)
        m = load_mesh(path)
        assert m.n_faces == 12


def test_merge_close_vertices():
    cube = make_cube()
    # duplicate all vertices with a tiny offset and reindex half the faces
    v2 = np.concatenate([cube.vertices, cube.vertices + 1e-10], axis=0)
    f2 = cube.faces.copy()
    f2[::2] += 8
    m = HostMesh(v2.astype(np.float32), f2)
    merged = merge_close_vertices(m, eps=1e-6)
    merged = remove_unreferenced_vertices(merged)
    assert merged.n_vertices == 8
    assert merged.n_faces == 12


def test_normalize():
    sphere = make_icosphere(1, radius=3.0)
    sphere.vertices += 5.0
    normed = normalize_to_unit_cube(sphere, scale=0.95)
    assert abs(np.abs(normed.vertices).max() - 0.95) < 1e-5
    center = (normed.vertices.min(0) + normed.vertices.max(0)) / 2
    np.testing.assert_allclose(center, 0.0, atol=1e-5)


def test_loop_subdivide_sphere():
    sphere = make_icosphere(1)
    sub = loop_subdivide(sphere, 1)
    assert sub.n_faces == sphere.n_faces * 4
    # subdivided sphere stays close to the unit sphere (loop shrinks slightly)
    r = np.linalg.norm(sub.vertices, axis=-1)
    assert 0.85 < r.min() and r.max() < 1.01


def test_qem_decimate_sphere():
    sphere = make_icosphere(3)  # 1280 faces
    dec = qem_decimate(sphere, 300, use_native=False)
    assert dec.n_faces <= 300
    assert dec.n_faces > 100
    # decimated vertices stay near the sphere
    r = np.linalg.norm(dec.vertices, axis=-1)
    assert 0.8 < r.min() and r.max() < 1.1
    # topology stays closed: every edge shared by exactly 2 faces
    edges = np.sort(
        np.concatenate([dec.faces[:, (0, 1)], dec.faces[:, (1, 2)], dec.faces[:, (2, 0)]]),
        axis=1,
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.95


def test_preprocess_budget():
    sphere = make_icosphere(2)  # 320 faces
    out = preprocess_blank_mesh_geometry(sphere, min_faces=1000, max_faces=10000)
    assert 1000 <= out.n_faces <= 10000
    assert np.abs(out.vertices).max() <= 1.0 + 1e-5


def _uv_overlap_fraction(mesh: HostMesh, res: int = 256) -> float:
    """Rasterize UV triangles by sampling; fraction of texels covered by >1 chart."""
    count = np.zeros((res, res), dtype=np.int32)
    uv = mesh.uv[mesh.faces_uv] * res  # [F, 3, 2]
    for tri in uv:
        lo = np.floor(tri.min(0)).astype(int)
        hi = np.ceil(tri.max(0)).astype(int)
        lo = np.clip(lo, 0, res - 1)
        hi = np.clip(hi, 0, res)
        if (hi <= lo).any():
            continue
        xs = np.arange(lo[0], hi[0]) + 0.5
        ys = np.arange(lo[1], hi[1]) + 0.5
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        p = np.stack([gx, gy], -1).reshape(-1, 2)
        a, b, c = tri
        d = (b - a)[0] * (c - a)[1] - (b - a)[1] * (c - a)[0]
        if abs(d) < 1e-12:
            continue
        w0 = ((b - p)[:, 0] * (c - p)[:, 1] - (b - p)[:, 1] * (c - p)[:, 0]) / d
        w1 = ((c - p)[:, 0] * (a - p)[:, 1] - (c - p)[:, 1] * (a - p)[:, 0]) / d
        w2 = 1 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        ii = p[inside].astype(int)
        np.add.at(count, (ii[:, 0], ii[:, 1]), 1)
    covered = count > 0
    if covered.sum() == 0:
        return 1.0
    return float((count > 1).sum() / covered.sum())


@pytest.mark.parametrize("maker", [make_icosphere, make_torus])
def test_unwrap_atlas(maker):
    mesh = maker()
    out = unwrap_atlas(mesh, size=512, gutter=2)
    assert out.uv is not None and out.faces_uv is not None
    assert out.uv.min() >= 0.0 and out.uv.max() <= 1.0
    assert out.faces_uv.shape == out.faces.shape
    # charts must not overlap (tiny tolerance for raster sampling error)
    assert _uv_overlap_fraction(out) < 0.02
    # decent coverage of the atlas: uv area is a reasonable fraction
    assert (out.uv.max(0) - out.uv.min(0)).min() > 0.2


def test_sample_pbr_attribute():
    import jax.numpy as jnp
    from unitex_tpu.geometry.mesh import PBRMesh, sample_pbr_attribute

    cube = make_cube()
    mesh = PBRMesh(
        jnp.asarray(cube.vertices), jnp.asarray(cube.faces),
        uv=jnp.asarray(cube.uv), faces_uv=jnp.asarray(cube.faces_uv),
    )
    face_idx = jnp.asarray([0, 5])
    bary = jnp.asarray([[1.0, 0.0, 0.0], [0.2, 0.3, 0.5]])
    # [V, C] vertex form: sampling vertex positions reproduces the surface point
    pts = sample_pbr_attribute(mesh, mesh.vertices, face_idx, bary)
    tri = np.asarray(cube.vertices)[np.asarray(cube.faces)[np.asarray(face_idx)]]
    expect = np.einsum("nkc,nk->nc", tri, np.asarray(bary))
    np.testing.assert_allclose(np.asarray(pts), expect, atol=1e-6)
    # [C] constant form broadcasts
    const = sample_pbr_attribute(mesh, jnp.asarray([0.5, 0.25, 0.125]), face_idx, bary)
    np.testing.assert_allclose(np.asarray(const), [[0.5, 0.25, 0.125]] * 2)
    # [H, W, C] map form samples through the UV layer
    tex = jnp.ones((8, 8, 3)) * 0.75
    mapped = sample_pbr_attribute(mesh, tex, face_idx, bary)
    np.testing.assert_allclose(np.asarray(mapped), 0.75, atol=1e-6)


def test_erode_face_mask():
    import jax.numpy as jnp
    from unitex_tpu.geometry.mesh import erode_face_mask

    sphere = make_icosphere(2)
    faces = jnp.asarray(sphere.faces)
    V = sphere.n_vertices
    # select the +z hemisphere of faces
    centroid_z = sphere.vertices[sphere.faces].mean(axis=1)[:, 2]
    mask = jnp.asarray(centroid_z > 0)
    eroded = erode_face_mask(faces, mask, V, rings=1)
    e = np.asarray(eroded)
    m = np.asarray(mask)
    assert e.sum() < m.sum()           # strictly shrinks
    assert not (e & ~m).any()          # subset of the original
    # two rings shrink further
    e2 = np.asarray(erode_face_mask(faces, mask, V, rings=2))
    assert e2.sum() < e.sum()


def test_glb_pbr_export(tmp_path):
    import json, struct

    cube = make_cube()
    rng = np.random.default_rng(0)
    cube.texture = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    cube.metallic_roughness = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    cube.normal_map = np.full((16, 16, 3), 128, np.uint8)
    path = str(tmp_path / "pbr.glb")
    save_glb(path, cube)
    # parse the JSON chunk and verify the PBR material wiring
    with open(path, "rb") as f:
        f.read(12)
        clen, ctype = struct.unpack("<II", f.read(8))
        gltf = json.loads(f.read(clen))
    mat = gltf["materials"][0]
    assert "metallicRoughnessTexture" in mat["pbrMetallicRoughness"]
    assert "normalTexture" in mat
    assert len(gltf["images"]) == 3
    # base color still loads back
    back = load_glb(path)
    np.testing.assert_array_equal(back.texture, cube.texture)


def test_unwrap_open_and_flat_meshes():
    """Boundary edges (open hemisphere) and degenerate normal bins (flat
    plane) must unwrap without overlap."""
    s = make_icosphere(3)
    keep = s.vertices[s.faces].mean(axis=1)[:, 2] > 0
    hemi = HostMesh(s.vertices, s.faces[keep])
    out = unwrap_atlas(hemi, size=256, gutter=2)
    assert out.uv.min() >= 0 and out.uv.max() <= 1
    assert _uv_overlap_fraction(out) < 0.02

    n = 16
    xs, ys = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n), indexing="ij")
    v = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3).astype(np.float32)
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            f += [[a, a + 1, a + n + 1], [a, a + n + 1, a + n]]
    plane = HostMesh(v, np.asarray(f, np.int32))
    out2 = unwrap_atlas(plane, size=256, gutter=2)
    assert _uv_overlap_fraction(out2) < 0.02


class TestShapeBucketing:
    def test_padded_mesh_renders_identically(self):
        """pad_mesh_to_bucket must be invisible: identical raster/bake
        results, changed (bucketed) static shapes."""
        import jax.numpy as jnp

        from unitex_tpu.geometry.mesh import Mesh, pad_mesh_to_bucket
        from unitex_tpu.geometry.primitives import make_icosphere
        from unitex_tpu.geometry.uv_atlas import unwrap_atlas
        from unitex_tpu.render.conditioning import render_geometry_condition

        host = unwrap_atlas(make_icosphere(2), size=64, gutter=2)
        mesh = Mesh(
            jnp.asarray(host.vertices * 0.9), jnp.asarray(host.faces),
            uv=jnp.asarray(host.uv), faces_uv=jnp.asarray(host.faces_uv),
        )
        padded = pad_mesh_to_bucket(mesh, 512)
        assert padded.faces.shape[0] % 512 == 0
        assert padded.vertices.shape[0] % 512 == 0
        assert padded.faces.shape[0] != mesh.faces.shape[0]

        a = render_geometry_condition(mesh, view_size=32)
        b = render_geometry_condition(padded, view_size=32)
        for k in ("alpha", "ccm", "normal"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-5,
                err_msg=f"{k} changed under padding",
            )

    def test_zero_bucket_is_identity(self):
        import jax.numpy as jnp

        from unitex_tpu.geometry.mesh import Mesh, pad_mesh_to_bucket
        from unitex_tpu.geometry.primitives import make_icosphere

        s = make_icosphere(1)
        mesh = Mesh(jnp.asarray(s.vertices), jnp.asarray(s.faces))
        assert pad_mesh_to_bucket(mesh, 0) is mesh

    def test_uv_bucket_pinned_to_vertex_bucket(self):
        """Assets in one face/vertex bucket must share ALL static shapes:
        a UV count straddling its own pow2 boundary (e.g. 15000 vs 18000
        under bucket 16384) must not split the bucket into two compiled
        programs — UV pads to 2x the padded vertex count."""
        import jax.numpy as jnp

        from unitex_tpu.geometry.mesh import Mesh, pad_mesh_to_bucket

        def mesh_with(nv, nuv, nf):
            rng = np.random.default_rng(nv)
            return Mesh(
                jnp.asarray(rng.normal(size=(nv, 3)).astype(np.float32)),
                jnp.asarray(rng.integers(0, nv, size=(nf, 3)).astype(np.int32)),
                uv=jnp.asarray(rng.random((nuv, 2)).astype(np.float32)),
                faces_uv=jnp.asarray(
                    rng.integers(0, nuv, size=(nf, 3)).astype(np.int32)),
            )

        a = pad_mesh_to_bucket(mesh_with(900, 950, 1800), 1024)
        b = pad_mesh_to_bucket(mesh_with(950, 1100, 1900), 1024)
        assert a.vertices.shape == b.vertices.shape
        assert a.faces.shape == b.faces.shape
        assert a.uv.shape == b.uv.shape, (a.uv.shape, b.uv.shape)
        assert a.uv.shape[0] >= 1100
