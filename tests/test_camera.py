import jax.numpy as jnp
import numpy as np
import pytest

from unitex_tpu.camera import (
    c2w_to_w2c,
    c2ws_to_ray_matrices,
    c2ws_to_rays,
    discretize,
    euler_angles_to_matrix,
    generate_box_views_c2ws,
    generate_intrinsics,
    generate_orbit_views_c2ws,
    get_mvp,
    intr_to_proj,
    lookat_to_matrix,
    matrix_to_euler_angles,
    matrix_to_quaternion,
    proj_to_intr,
    project,
    quaternion_to_matrix,
    undiscretize,
    unproject,
)

RADIUS = 2.8

# the six frbltd box-view c2ws pinned by the reference (generator.py:153-185)
REF_BOX = np.asarray(
    [
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, RADIUS], [0, 0, 0, 1]],
        [[0, 0, 1, RADIUS], [0, 1, 0, 0], [-1, 0, 0, 0], [0, 0, 0, 1]],
        [[-1, 0, 0, 0], [0, 1, 0, 0], [0, 0, -1, -RADIUS], [0, 0, 0, 1]],
        [[0, 0, -1, -RADIUS], [0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
        [[1, 0, 0, 0], [0, 0, 1, RADIUS], [0, -1, 0, 0], [0, 0, 0, 1]],
        [[-1, 0, 0, 0], [0, 0, -1, -RADIUS], [0, -1, 0, 0], [0, 0, 0, 1]],
    ],
    dtype=np.float32,
)


def test_box_views_match_reference_constants():
    c2ws = np.asarray(generate_box_views_c2ws(RADIUS))
    np.testing.assert_allclose(c2ws, REF_BOX, atol=1e-6)


def test_box_views_are_rigid():
    c2ws = generate_box_views_c2ws(RADIUS)
    rot = c2ws[:, :3, :3]
    eye = jnp.eye(3)[None].repeat(6, axis=0)
    np.testing.assert_allclose(rot @ jnp.swapaxes(rot, -1, -2), eye, atol=1e-6)
    det = jnp.linalg.det(rot)
    np.testing.assert_allclose(det, jnp.ones(6), atol=1e-6)


def test_c2w_w2c_roundtrip():
    c2ws = generate_box_views_c2ws(RADIUS)
    w2cs = c2w_to_w2c(c2ws)
    prod = w2cs @ c2ws
    np.testing.assert_allclose(prod, jnp.eye(4)[None].repeat(6, axis=0), atol=1e-5)


def test_intrinsics_ortho_vs_fov():
    intr = generate_intrinsics(49.1, 49.1, fov=True, degree=True)
    assert intr.shape == (3, 3)
    assert float(intr[0, 2]) == 0.5
    ortho = generate_intrinsics(1.0, 1.0, fov=False)
    np.testing.assert_allclose(np.asarray(ortho)[0, 0], 1.0)


def test_proj_intr_roundtrip():
    for persp in (True, False):
        intr = generate_intrinsics(0.8, 0.8, fov=False)
        proj = intr_to_proj(intr, perspective=persp)
        back = proj_to_intr(proj, perspective=persp)
        np.testing.assert_allclose(np.asarray(back), np.asarray(intr), atol=1e-6)


def test_ortho_projection_front_view():
    """Mesh coords use the storage frame where the front camera is +z looking
    along -z with identity rotation; a point (x, y, 0) lands at ndc (x, -y)
    after the y-flip (y-down screen)."""
    c2w = generate_box_views_c2ws(RADIUS)[0]
    intr = generate_intrinsics(1.0, 1.0, fov=False)
    mvp = get_mvp(c2w[None], intr[None], perspective=False)[0]
    pt = jnp.asarray([0.3, 0.2, 0.0, 1.0])
    clip = mvp @ pt
    ndc = clip[:2] / clip[3]
    np.testing.assert_allclose(np.asarray(ndc), [0.3, -0.2], atol=1e-5)


def test_project_unproject_roundtrip():
    intr = generate_intrinsics(49.1, 49.1, fov=True, degree=True)
    pts = jnp.asarray([[0.1, 0.2, -2.0, 1.0], [-0.3, 0.1, -3.0, 1.0]])
    ndc, w = project(pts, intr, perspective=True)
    back = unproject(ndc, w, intr, perspective=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_discretize_roundtrip():
    """floor(discretize(ndc)) indexes a pixel whose center (undiscretize)
    is within half a pixel of the original ndc point."""
    ndc = jnp.asarray([[0.25, -0.5], [-0.99, 0.99]])
    idx = jnp.floor(discretize(ndc, H=64, W=128))
    center = undiscretize(idx, H=64, W=128)
    err = np.abs(np.asarray(center) - np.asarray(ndc))
    assert (err[:, 0] <= 1.0 / 128 + 1e-6).all()
    assert (err[:, 1] <= 2.0 / 64 + 1e-6).all()
    # pixel centers are exact fixed points
    centers = undiscretize(jnp.asarray([[3.0, 5.0]]), H=64, W=128)
    np.testing.assert_allclose(
        np.asarray(jnp.floor(discretize(centers, H=64, W=128))), [[3.0, 5.0]]
    )


def test_rays_from_front_camera():
    c2ws = generate_box_views_c2ws(RADIUS)
    rays_o, rays_d = c2ws_to_rays(c2ws[:1])
    # front camera sits at +x world, looking along -x
    np.testing.assert_allclose(np.asarray(rays_o)[0], [RADIUS, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rays_d)[0], [-1, 0, 0], atol=1e-6)


def test_ray_matrices_ortho():
    c2ws = generate_box_views_c2ws(RADIUS)[:1]
    intr = generate_intrinsics(1.0, 1.0, fov=False)[None]
    rays_o, rays_d = c2ws_to_ray_matrices(c2ws, intr, H=4, W=4, perspective=False)
    assert rays_o.shape == (1, 4, 4, 3)
    d = np.asarray(rays_d)[0]
    # all ortho rays parallel to view dir
    np.testing.assert_allclose(d, np.broadcast_to(d[0, 0], d.shape), atol=1e-6)
    o = np.asarray(rays_o)[0]
    # ortho ray origins spread across the image plane: the front view's image
    # plane spans storage axes 0 (right) and 1 (up); axis 2 (depth) is fixed
    assert np.ptp(o[..., 0]) > 0 and np.ptp(o[..., 1]) > 0
    np.testing.assert_allclose(np.ptp(o[..., 2]), 0.0, atol=1e-6)


def test_orbit_views_on_ring():
    c2ws = generate_orbit_views_c2ws(8, radius=2.0, height=0.5)
    pos = np.asarray(c2ws[..., :3, 3])
    np.testing.assert_allclose(np.linalg.norm(pos, axis=-1), 2.0, atol=1e-5)
    # storage frame stores (semantic y, z, x): height (semantic z) is index 1
    np.testing.assert_allclose(pos[..., 1], 0.5, atol=1e-6)


def test_lookat_top_uses_reference_tangent():
    c2w = lookat_to_matrix(jnp.asarray([[0.0, 0.0, RADIUS]]))
    np.testing.assert_allclose(np.asarray(c2w)[0], REF_BOX[4], atol=1e-6)


@pytest.mark.parametrize("convention", ["XYZ", "ZYX"])
def test_euler_roundtrip(convention):
    rng = np.random.default_rng(0)
    ang = jnp.asarray(rng.uniform(-1.0, 1.0, size=(5, 3)), dtype=jnp.float32)
    mat = euler_angles_to_matrix(ang, convention)
    back = matrix_to_euler_angles(mat, convention)
    mat2 = euler_angles_to_matrix(back, convention)
    np.testing.assert_allclose(np.asarray(mat2), np.asarray(mat), atol=1e-5)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(1)
    ang = jnp.asarray(rng.uniform(-2.0, 2.0, size=(10, 3)), dtype=jnp.float32)
    mat = euler_angles_to_matrix(ang, "XYZ")
    quat = matrix_to_quaternion(mat)
    mat2 = quaternion_to_matrix(quat)
    np.testing.assert_allclose(np.asarray(mat2), np.asarray(mat), atol=1e-4)


class TestQuaternionAlgebra:
    def test_multiply_matches_matrix_product(self):
        import jax

        from unitex_tpu.camera.rotation import (
            matrix_to_quaternion,
            quaternion_multiply,
            quaternion_to_matrix,
            random_rotations,
        )

        r = random_rotations(4, jax.random.PRNGKey(0))
        qa = matrix_to_quaternion(r[:2])
        qb = matrix_to_quaternion(r[2:])
        qm = quaternion_multiply(qa, qb)
        np.testing.assert_allclose(
            np.asarray(quaternion_to_matrix(qm)),
            np.asarray(r[:2] @ r[2:]),
            atol=1e-5,
        )

    def test_apply_matches_matrix(self):
        import jax

        from unitex_tpu.camera.rotation import (
            matrix_to_quaternion,
            quaternion_apply,
            random_rotations,
        )

        key = jax.random.PRNGKey(1)
        r = random_rotations(3, key)
        q = matrix_to_quaternion(r)
        pts = jax.random.normal(jax.random.PRNGKey(2), (3, 3))
        np.testing.assert_allclose(
            np.asarray(quaternion_apply(q, pts)),
            np.asarray(jnp.einsum("nij,nj->ni", r, pts)),
            atol=1e-5,
        )

    def test_invert(self):
        import jax

        from unitex_tpu.camera.rotation import (
            quaternion_invert,
            quaternion_raw_multiply,
            random_quaternions,
        )

        q = random_quaternions(5, jax.random.PRNGKey(3))
        ident = quaternion_raw_multiply(q, quaternion_invert(q))
        np.testing.assert_allclose(
            np.asarray(ident),
            np.tile([1.0, 0, 0, 0], (5, 1)),
            atol=1e-5,
        )

    def test_axis_angle_roundtrip(self):
        import jax

        from unitex_tpu.camera.rotation import (
            axis_angle_to_quaternion,
            matrix_to_axis_angle,
            quaternion_to_axis_angle,
            random_rotations,
            axis_angle_to_matrix,
        )

        aa = jnp.array([[0.3, -0.2, 0.5], [1e-8, 0.0, 0.0], [0.0, 0.0, 0.0]])
        q = axis_angle_to_quaternion(aa)
        back = quaternion_to_axis_angle(q)
        np.testing.assert_allclose(np.asarray(back), np.asarray(aa), atol=1e-6)
        r = random_rotations(4, jax.random.PRNGKey(4))
        aa2 = matrix_to_axis_angle(r)
        np.testing.assert_allclose(
            np.asarray(axis_angle_to_matrix(aa2)), np.asarray(r), atol=1e-5
        )

    def test_random_rotations_are_rotations(self):
        import jax

        from unitex_tpu.camera.rotation import random_rotations

        r = np.asarray(random_rotations(8, jax.random.PRNGKey(5)))
        np.testing.assert_allclose(
            r @ r.transpose(0, 2, 1), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)
