"""Tests for the auxiliary-tool gap fill: closest-point queries,
spatial/near-surface/PBR sampling, visibility checks, glTF header parsing,
media grids, rotation augmentation, panorama stitching, and isosurface
extraction."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.geometry.io.mesh_io import HostMesh, dump_glb, save_glb
from unitex_tpu.geometry.io.mesh_header import load_mesh_header, parse_mesh_info
from unitex_tpu.geometry.primitives import make_cube, make_icosphere
from unitex_tpu.ops.closest_point import (
    closest_point_on_mesh,
    closest_point_on_mesh_ref,
)


def _sphere():
    return make_icosphere(subdivisions=1, radius=1.0)


class TestClosestPoint:
    def test_matches_numpy_reference(self):
        mesh = _sphere()
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1.5, 1.5, size=(64, 3)).astype(np.float32)
        d_ref, f_ref, uvw_ref = closest_point_on_mesh_ref(
            pts, mesh.vertices, mesh.faces
        )
        cp = closest_point_on_mesh(
            jnp.asarray(pts), jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            exact=True,
        )
        np.testing.assert_allclose(np.asarray(cp.distance), d_ref, atol=1e-5)
        # the face can differ when a point projects onto a shared edge:
        # require the projected points to agree instead of the indices
        proj_ref = np.einsum(
            "nkc,nk->nc", mesh.vertices[mesh.faces[f_ref]], uvw_ref
        )
        np.testing.assert_allclose(np.asarray(cp.point), proj_ref, atol=1e-4)

    def test_fast_mode_matches_exact(self):
        mesh = _sphere()
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1.2, 1.2, size=(128, 3)).astype(np.float32)
        v = jnp.asarray(mesh.vertices)
        f = jnp.asarray(mesh.faces)
        exact = closest_point_on_mesh(jnp.asarray(pts), v, f, exact=True)
        fast = closest_point_on_mesh(jnp.asarray(pts), v, f, k=8)
        np.testing.assert_allclose(
            np.asarray(fast.distance), np.asarray(exact.distance), atol=1e-4
        )

    def test_on_surface_distance_zero(self):
        mesh = make_cube()
        # face centroids are on the surface
        tri = mesh.vertices[mesh.faces]
        pts = tri.mean(axis=1).astype(np.float32)
        cp = closest_point_on_mesh(
            jnp.asarray(pts), jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            exact=True,
        )
        np.testing.assert_allclose(np.asarray(cp.distance), 0.0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(cp.uvw).sum(-1), 1.0, atol=1e-5
        )


class TestSpatialSampling:
    def test_sample_spatial(self):
        from unitex_tpu.geometry.sampling import sample_spatial

        mesh = _sphere()
        samples, face_idx, uvw = sample_spatial(mesh, n_samples=128, seed=3)
        assert samples.shape == (128, 3)
        assert face_idx.shape == (128,)
        assert (face_idx >= 0).all() and (face_idx < mesh.n_faces).all()
        np.testing.assert_allclose(uvw.sum(-1), 1.0, atol=1e-4)
        # projections land on the named faces
        proj = np.einsum(
            "nkc,nk->nc", mesh.vertices[mesh.faces[face_idx]], uvw
        )
        d, _, _ = closest_point_on_mesh_ref(proj, mesh.vertices, mesh.faces)
        np.testing.assert_allclose(d, 0.0, atol=1e-4)

    def test_sample_near_surface_stays_near(self):
        from unitex_tpu.geometry.sampling import sample_near_surface

        mesh = _sphere()
        samples, face_idx, uvw = sample_near_surface(
            mesh, n_samples=256, seed=4, depth=6
        )
        offset = 2.0 / 2**6
        # every sample is within the offset band around the (faceted) surface
        d, _, _ = closest_point_on_mesh_ref(samples, mesh.vertices, mesh.faces)
        assert (d <= offset * 1.01).all()
        proj = np.einsum(
            "nkc,nk->nc", mesh.vertices[mesh.faces[face_idx]], uvw
        )
        np.testing.assert_allclose(
            np.linalg.norm(samples - proj, axis=-1), d, atol=1e-4
        )

    def test_sample_pbr_mesh_constant_attr(self):
        from unitex_tpu.geometry.mesh import PBRMesh
        from unitex_tpu.geometry.sampling import sample_pbr_mesh

        host = make_cube()
        pbr = PBRMesh(
            vertices=jnp.asarray(host.vertices),
            faces=jnp.asarray(host.faces.astype(np.int32)),
            albedo=jnp.array([0.25, 0.5, 0.75]),
            roughness=jnp.array([0.5]),
        )
        pts, face_idx, attrs = sample_pbr_mesh(pbr, n_samples=64, seed=5)
        assert pts.shape == (64, 3)
        np.testing.assert_allclose(
            np.asarray(attrs["albedo"]), np.tile([0.25, 0.5, 0.75], (64, 1))
        )
        assert "metallic" not in attrs


class TestVisibility:
    def test_self_rt_inner_outer(self):
        from unitex_tpu.ops.visibility import self_rt

        mesh = make_cube()
        pts = jnp.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
        mask = self_rt(
            pts, jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces), n_rays=16
        )
        assert bool(mask[0]) is True
        assert bool(mask[1]) is False

    def test_cross_rt(self):
        from unitex_tpu.ops.visibility import cross_rt

        mesh = make_cube()
        pts = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0]])
        outer = jnp.array([[3.0, 0.0, 0.0], [0.0, 3.0, 0.0], [0.0, 0.0, 3.0]])
        mask = cross_rt(
            pts, outer, jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
        )
        assert bool(mask[0]) is True     # center: blocked from every side
        assert bool(mask[1]) is False    # above the cube: seen from +z

    def test_sphere_rt(self):
        from unitex_tpu.ops.visibility import sphere_rt, sphere_rt_views

        mesh = make_cube()
        v = jnp.asarray(mesh.vertices)
        f = jnp.asarray(mesh.faces)
        tids = np.asarray(sphere_rt(v, f, n_rays=64))
        assert tids.shape == (64,)
        assert (tids >= 0).all()  # rays aimed at the origin all hit the cube
        tids6 = np.asarray(sphere_rt_views(v, f, n_cameras=6))
        assert (tids6 >= 0).all()


class TestMeshHeader:
    def test_glb_header_roundtrip(self, tmp_path):
        mesh = make_cube()
        path = str(tmp_path / "cube.glb")
        save_glb(path, mesh)
        header = load_mesh_header(path)
        assert "meshes" in header and len(header["meshes"]) == 1
        info = parse_mesh_info(path)
        # the writer may seam-split vertices; triangle count is invariant
        assert info["V"] >= mesh.n_vertices
        assert info["F"] == mesh.n_faces
        assert info["NC"] == 1

    def test_dump_glb(self, tmp_path):
        mesh = make_cube()
        path = str(tmp_path / "sub" / "geom.glb")
        dump_glb(mesh.vertices, mesh.faces, path)
        info = parse_mesh_info(path)
        assert info["V"] >= mesh.n_vertices
        assert info["F"] == mesh.n_faces

    def test_gltf_and_other_ext(self, tmp_path):
        p = tmp_path / "mesh.gltf"
        p.write_text(json.dumps({"meshes": [], "buffers": [{"byteLength": 4}]}))
        h = load_mesh_header(str(p))
        assert "buffers" not in h
        assert load_mesh_header(str(tmp_path / "mesh.obj")) == {"meshes": []}


class TestMediaGrids:
    def test_str_coding(self):
        from unitex_tpu.utils.media_grids import (
            decode_array_to_str,
            encode_str_to_array,
        )

        arr = encode_str_to_array("asset_01", width=32)
        assert arr.shape == (32,) and arr.dtype == np.uint8
        assert decode_array_to_str(arr) == "asset_01"

    def test_make_image_grid(self, tmp_path):
        from unitex_tpu.utils.media_grids import make_image_grid

        rng = np.random.default_rng(0)
        rows = [
            [rng.uniform(size=(64, 64, 3)), rng.uniform(size=(64, 384, 3))]
            for _ in range(5)
        ]
        pages = make_image_grid(
            rows, str(tmp_path), rows_per_page=3, cell_size=(64, 64)
        )
        assert len(pages) == 2
        assert all(os.path.exists(p) for p in pages)
        from PIL import Image

        page0 = np.asarray(Image.open(pages[0]))
        assert page0.shape[0] == 3 * 64
        # divider column is black
        assert (page0[:, 63, :3] == 0).all()

    def test_make_training_video(self, tmp_path):
        from PIL import Image

        from unitex_tpu.utils.media_grids import make_training_video

        for step in (0, 100, 20):
            arr = np.full((32, 32, 3), step % 255, np.uint8)
            Image.fromarray(arr).save(tmp_path / f"{step:05d}_res.png")
        out = make_training_video(
            str(tmp_path / "*_res.png"), str(tmp_path / "train.gif"), fps=5
        )
        assert os.path.exists(out)


class TestRotationAugment:
    def test_identity(self):
        from unitex_tpu.training.rotation_augment import apply_euler_2d

        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, size=(6, 16, 16, 4), dtype=np.uint8)
        out = apply_euler_2d(imgs, np.zeros(3, np.float32))
        np.testing.assert_array_equal(out, imgs)

    def test_composition(self):
        from unitex_tpu.training.rotation_augment import apply_euler_2d

        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 255, size=(6, 16, 16, 4), dtype=np.uint8)
        once = apply_euler_2d(imgs, np.array([0.0, 0.0, 90.0]))
        twice = apply_euler_2d(once, np.array([0.0, 0.0, 90.0]))
        direct = apply_euler_2d(imgs, np.array([0.0, 0.0, 180.0]))
        np.testing.assert_array_equal(twice, direct)

    def test_ccm_roundtrip(self):
        from unitex_tpu.training.rotation_augment import (
            ccms_to_vertices,
            vertices_to_ccms,
        )

        rng = np.random.default_rng(2)
        ccms = rng.integers(0, 255, size=(6, 8, 8, 4), dtype=np.uint8)
        ccms[..., 3] = 255
        pts = ccms_to_vertices(ccms)
        assert pts.shape == (6 * 8 * 8, 3)
        back = vertices_to_ccms(ccms, pts)
        # re-encoding the decoded points reproduces the colors (+-1 quantum)
        assert (
            np.abs(back[..., :3].astype(int) - ccms[..., :3].astype(int)) <= 1
        ).all()

    def test_view_permutation_is_permutation(self):
        from unitex_tpu.training.rotation_augment import euler_to_index

        for euler in ([90.0, 0, 0], [0, 90.0, 0], [0, 0, 90.0], [90.0, 0, 90.0]):
            idx0, idx1 = euler_to_index(np.asarray(euler, np.float32))
            assert sorted(idx0.tolist()) == [0, 1, 2, 3, 4, 5]
            assert ((idx1 >= 0) & (idx1 < 4)).all()


class TestPanorama:
    def test_constant_cubemap(self):
        from unitex_tpu.image.panorama import cubemap_to_panorama

        faces = [np.full((32, 32, 3), 0.5, np.float32) for _ in range(6)]
        pano = np.asarray(cubemap_to_panorama(faces, height=64, width=128))
        assert pano.shape == (64, 128, 3)
        np.testing.assert_allclose(pano, 0.5, atol=1e-3)

    def test_face_directions(self):
        from unitex_tpu.image.panorama import cubemap_to_panorama

        # distinct gray levels per face; up/down get the inverse of the
        # loader's pre-transpose so the stitched values stay face-constant
        faces = [
            np.full((32, 32, 3), (i + 1) / 10.0, np.float32) for i in range(6)
        ]
        pano = np.asarray(
            cubemap_to_panorama(faces, height=64, width=128, average=False)
        )
        # front face (+y forward) is at lon 0 => column W/2, row H/2
        assert abs(pano[32, 64, 0] - 0.1) < 1e-3
        # up face at the top row's center
        assert abs(pano[1, 64, 0] - 0.5) < 1e-3

    def test_perspective_mask(self):
        from unitex_tpu.image.panorama import perspective_to_panorama

        img = jnp.ones((16, 16, 3))
        pano, mask = perspective_to_panorama(img, 90.0, 0.0, 0.0, 32, 64)
        m = np.asarray(mask)[..., 0]
        assert m[16, 32] == 1.0      # straight ahead covered
        assert m[16, 0] == 0.0       # behind not covered


class TestFieldVis:
    def test_create_grid_convention(self):
        from unitex_tpu.render.field_vis import create_grid

        vals = create_grid(lambda x, y, z: x, 4, 4, 8)
        assert vals.shape == (4, 4, 8)
        # x varies along W with the half-texel offset
        np.testing.assert_allclose(
            vals[0, 0], np.linspace(-1, 1, 9, dtype=np.float32)[:8] + 1 / 8.0
        )

    def test_sphere_isosurface(self):
        from unitex_tpu.render.field_vis import create_grid, marching_tetrahedra

        r0 = 0.6
        vals = create_grid(
            lambda x, y, z: r0 - np.sqrt(x * x + y * y + z * z), 24, 24, 24
        )
        verts, faces = marching_tetrahedra(vals, iso=0.0)
        assert len(faces) > 100
        r = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(r, r0, atol=0.05)
        # outward orientation: normals point away from the center
        tri = verts[faces]
        nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        cen = tri.mean(axis=1)
        agree = (np.einsum("ij,ij->i", nrm, cen) > 0).mean()
        assert agree > 0.99
        # surface area close to 4 pi r^2
        area = 0.5 * np.linalg.norm(nrm, axis=-1).sum()
        assert abs(area - 4 * np.pi * r0**2) / (4 * np.pi * r0**2) < 0.1

    def test_export(self, tmp_path):
        from unitex_tpu.render.field_vis import export_isosurface

        out = export_isosurface(
            lambda x, y, z: 0.5 - np.sqrt(x * x + y * y + z * z),
            str(tmp_path / "iso.obj"),
            resolution=12,
        )
        assert os.path.exists(out)


class TestTopology:
    def _strip(self):
        # two triangles sharing edge (1, 2); uv split into two charts so the
        # shared position edge is a UV seam
        vertices = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
        )
        faces = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
        uv = np.array(
            [[0.0, 0.0], [0.4, 0.0], [0.0, 0.4],    # chart A
             [0.6, 0.0], [1.0, 0.0], [0.6, 0.4]],   # chart B
            np.float32,
        )
        faces_uv = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
        return vertices, faces, uv, faces_uv

    def test_get_boundary(self):
        from unitex_tpu.geometry.topology import get_boundary

        _, faces, _, _ = self._strip()
        # the open strip: every vertex is on the boundary
        assert sorted(get_boundary(faces).tolist()) == [0, 1, 2, 3]
        # a closed cube has no boundary
        cube = make_cube()
        assert len(get_boundary(cube.faces.astype(np.int64))) == 0

    def test_dilate_erode(self):
        from unitex_tpu.geometry.topology import (
            dilate_face_mask,
            erode_face_mask,
        )

        cube = make_cube()
        f = cube.faces.astype(np.int64)
        mask = np.zeros(len(f), bool)
        mask[0] = True
        grown = dilate_face_mask(f, mask, cube.n_vertices, rings=1)
        assert grown.sum() > 1 and grown[0]
        shrunk = erode_face_mask(f, grown, cube.n_vertices, rings=1)
        assert shrunk.sum() < grown.sum()

    def test_boundary_tex_finds_the_seam(self):
        from unitex_tpu.geometry.topology import get_boundary_tex

        v, f, uv, fuv = self._strip()
        v_pos, v_tex, f_sel_pos, f_sel_tex = get_boundary_tex(f, fuv)
        # the shared edge (1, 2) is interior in pos but boundary in uv
        assert sorted(v_pos.tolist()) == [1, 2]
        assert sorted(v_tex.tolist()) == [1, 2, 3, 5]
        assert len(f_sel_pos) == 2  # both faces touch the seam

    def test_paired_triples(self):
        from unitex_tpu.geometry.topology import get_boundary_tex

        v, f, uv, fuv = self._strip()
        _, _, tri_pos, tri_tex = get_boundary_tex(f, fuv, paired=True)
        assert tri_pos.shape == (2, 2, 3)  # one seam half-edge per face
        for e in range(tri_pos.shape[0]):
            # both groups share the position edge, opposite dual vertices
            assert sorted(tri_pos[e, 0, :2].tolist()) == [1, 2]
            assert sorted(tri_pos[e, 1, :2].tolist()) == [1, 2]
            assert tri_pos[e, 0, 2] != tri_pos[e, 1, 2]

    def test_seams_submesh_reverse(self):
        from unitex_tpu.geometry.topology import get_seams_submesh

        v, f, uv, fuv = self._strip()
        verts, f_sel, uv2, fuv_sel = get_seams_submesh(v, f, uv, fuv)
        assert f_sel.shape[1] == 3 and len(f_sel) == len(fuv_sel)
        # mirrored dual coords moved, seam-edge coords unchanged
        assert not np.allclose(uv2, uv)
        np.testing.assert_allclose(uv2[1], uv[1])
        np.testing.assert_allclose(uv2[2], uv[2])


class TestVolumeHelpers:
    def test_scale_tensor(self):
        from unitex_tpu.render.volume import scale_tensor

        x = jnp.array([0.0, 0.5, 1.0])
        np.testing.assert_allclose(
            np.asarray(scale_tensor(x, (0.0, 1.0), (-1.0, 1.0))), [-1, 0, 1]
        )

    def test_contract_to_unisphere(self):
        from unitex_tpu.render.volume import contract_to_unisphere

        bbox = (-1.0, 1.0)
        inside = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
        out = np.asarray(contract_to_unisphere(inside, bbox, unbounded=True))
        np.testing.assert_allclose(out[0], 0.5, atol=1e-6)
        # far points squash inside [0, 1]
        far = jnp.array([[100.0, 0.0, 0.0], [0.0, -1e6, 0.0]])
        out = np.asarray(contract_to_unisphere(far, bbox, unbounded=True))
        assert (out >= 0.0).all() and (out <= 1.0).all()
        # bounded mode is a plain bbox normalize
        out = np.asarray(contract_to_unisphere(inside, bbox, unbounded=False))
        np.testing.assert_allclose(out[1], [0.75, 0.5, 0.5], atol=1e-6)


class TestLensBlur:
    def test_constant_preserved(self):
        from unitex_tpu.ops.image_ops import lens_blur

        img = jnp.full((33, 33, 3), 0.5)
        out = np.asarray(lens_blur(img))
        # joint kernel normalization: the center (away from the zero-padded
        # border) keeps the constant value
        np.testing.assert_allclose(out[10:-10, 10:-10], 0.5, atol=2e-3)

    def test_matches_direct_2d_convolution(self):
        from scipy.signal import convolve2d

        from unitex_tpu.ops.image_ops import _lens_kernels, lens_blur

        rng = np.random.default_rng(0)
        img = rng.uniform(size=(24, 24, 2)).astype(np.float32)
        gamma = 5.0
        out = np.asarray(lens_blur(jnp.asarray(img)))

        kernels, _ = _lens_kernels(3.0, 5)
        x = np.power(img, gamma)
        acc = np.zeros_like(x)
        for re, im, A, B in kernels:
            k1 = np.asarray(re) + 1j * np.asarray(im)
            k2 = np.outer(k1, k1)
            for c in range(x.shape[-1]):
                conv = convolve2d(x[..., c], k2, mode="same")
                acc[..., c] += A * conv.real + B * conv.imag
        ref = np.clip(np.power(np.maximum(acc, 0.0), 1.0 / gamma), 0.0, 1.0)
        np.testing.assert_allclose(out, ref, atol=1e-3)


class TestUVDilation:
    def test_fills_holes_with_neighbor_color(self):
        from unitex_tpu.ops.image_ops import uv_dilation

        color = np.zeros((16, 16, 3), np.float32)
        mask = np.zeros((16, 16, 1), bool)
        color[:, :8] = [1.0, 0.0, 0.0]
        mask[:, :8] = True   # left half valid red, right half holes
        out = np.asarray(uv_dilation(jnp.asarray(color), jnp.asarray(mask)))
        # holes flood-fill toward red; everything finite in [0, 1]
        assert out[8, 15, 0] > 0.5
        assert np.isfinite(out).all() and (out >= 0).all() and (out <= 1).all()

    def test_max_iters_limits_growth(self):
        from unitex_tpu.ops.image_ops import uv_dilation

        color = np.zeros((16, 16, 3), np.float32)
        mask = np.zeros((16, 16, 1), bool)
        color[8, 0] = [0.0, 1.0, 0.0]
        mask[8, 0] = True
        out = np.asarray(
            uv_dilation(jnp.asarray(color), jnp.asarray(mask), max_iters=2)
        )
        # 2 iterations of a 3x3 kernel reach at most 2 texels away
        assert out[8, 2, 1] > 0.0
        assert out[8, 10, 1] == 0.0

    def test_full_mask_is_identity(self):
        from unitex_tpu.ops.image_ops import uv_dilation

        rng = np.random.default_rng(0)
        color = rng.uniform(size=(8, 8, 3)).astype(np.float32)
        mask = np.ones((8, 8, 1), bool)
        out = np.asarray(uv_dilation(jnp.asarray(color), jnp.asarray(mask)))
        np.testing.assert_allclose(out, color, atol=1e-6)


class TestPointCloudContainer:
    def test_split_concat_roundtrip(self):
        from unitex_tpu.geometry.mesh import (
            PointCloud,
            concat_point_clouds,
            split_point_cloud,
        )

        rng = np.random.default_rng(0)
        pc = PointCloud(
            points=jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32)),
            colors=jnp.asarray(rng.uniform(size=(10, 3)).astype(np.float32)),
        )
        parts = split_point_cloud(pc, [3, 7])
        assert parts[0].points.shape == (3, 3)
        assert parts[1].colors.shape == (7, 3)
        assert parts[0].normals is None
        merged, intervals = concat_point_clouds(parts)
        np.testing.assert_array_equal(np.asarray(merged.points), np.asarray(pc.points))
        np.testing.assert_array_equal(
            np.asarray(intervals), [[0, 3, 3], [3, 10, 7]]
        )

    def test_concat_drops_partial_fields(self):
        from unitex_tpu.geometry.mesh import PointCloud, concat_point_clouds

        a = PointCloud(points=jnp.zeros((2, 3)), colors=jnp.zeros((2, 3)))
        b = PointCloud(points=jnp.ones((3, 3)))
        merged, _ = concat_point_clouds([a, b])
        assert merged.colors is None and merged.points.shape == (5, 3)
