"""Rotation representation conversions in pure jnp.

Semantics match the PyTorch3D-style conventions the reference relies on
(/root/reference/TextureTools/texturetools/camera/rotation.py): right-handed,
intrinsic rotations, ``convention`` strings like ``"XYZ"`` meaning
R = R_X(a) @ R_Y(b) @ R_Z(c) applied to column vectors.
"""

from __future__ import annotations

import jax.numpy as jnp


def _axis_angle_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices about a named axis for a batch of angles [...]. -> [..., 3, 3]"""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    o = jnp.ones_like(angle)
    z = jnp.zeros_like(angle)
    if axis == "X":
        rows = (o, z, z, z, c, -s, z, s, c)
    elif axis == "Y":
        rows = (c, z, s, z, o, z, -s, z, c)
    elif axis == "Z":
        rows = (c, -s, z, s, c, z, z, z, o)
    else:
        raise ValueError(f"invalid axis {axis!r}")
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """[..., 3] euler angles (radians) -> [..., 3, 3] rotation matrices."""
    if len(convention) != 3:
        raise ValueError("convention must have 3 letters")
    mats = [
        _axis_angle_rotation(axis, euler_angles[..., i])
        for i, axis in enumerate(convention)
    ]
    return mats[0] @ mats[1] @ mats[2]


def _angle_from_tan(axis, other_axis, data, horizontal, tait_bryan):
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ("XY", "YZ", "ZX")
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3] euler angles (radians)."""
    if len(convention) != 3:
        raise ValueError("convention must have 3 letters")
    i0 = "XYZ".index(convention[0])
    i2 = "XYZ".index(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in (-1, 2) else 1.0), -1.0, 1.0)
        )
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1.0, 1.0))
    o = (
        _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan),
        central,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan),
    )
    return jnp.stack(o, axis=-1)


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) unit quaternions -> [..., 3, 3]."""
    r, i, j, k = (quaternions[..., n] for n in range(4))
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w, x, y, z).  Branch-free Shepperd method."""
    m00, m01, m02 = matrix[..., 0, 0], matrix[..., 0, 1], matrix[..., 0, 2]
    m10, m11, m12 = matrix[..., 1, 0], matrix[..., 1, 1], matrix[..., 1, 2]
    m20, m21, m22 = matrix[..., 2, 0], matrix[..., 2, 1], matrix[..., 2, 2]

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    q_abs = jnp.stack(
        [
            safe_sqrt(1.0 + m00 + m11 + m22),
            safe_sqrt(1.0 + m00 - m11 - m22),
            safe_sqrt(1.0 - m00 + m11 - m22),
            safe_sqrt(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    flr = 0.1
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))
    best = jnp.argmax(q_abs, axis=-1)
    quat = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    return quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] axis-angle (Rodrigues) -> [..., 3, 3]."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    axis = axis_angle / jnp.maximum(angle, 1e-12)
    half = angle[..., 0] * 0.5
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)[..., None]
    return quaternion_to_matrix(jnp.concatenate([w[..., None], xyz], axis=-1))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] continuous 6D rotation representation -> [..., 3, 3]
    (Zhou et al. 2019, the parameterization the reference's pose-refine
    tools use: texture/reprojection/mesh_refine.py rotation params).
    Gram-Schmidt on the two embedded column vectors."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 6]: the first two rows, flattened (inverse of
    rotation_6d_to_matrix up to Gram-Schmidt)."""
    return matrix[..., :2, :].reshape(*matrix.shape[:-2], 6)


# -------------------------------------------------- quaternion algebra
# (rotation.py:373-601: the quaternion toolbox the PyTorch3D-style module
# ships — standardization, Hamilton products, inversion, point rotation,
# axis-angle bridges, and random rotation sampling)


def standardize_quaternion(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Flip to the non-negative-real-part representative of each rotation."""
    return jnp.where(quaternions[..., :1] < 0, -quaternions, quaternions)


def quaternion_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product [..., 4] x [..., 4] -> [..., 4] (w, x, y, z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, standardized to non-negative real part."""
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(quaternion: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion = the inverse rotation."""
    return quaternion * jnp.asarray([1.0, -1.0, -1.0, -1.0], quaternion.dtype)


def quaternion_apply(quaternion: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate points [..., 3] by unit quaternions [..., 4]: q p q^{-1}."""
    zeros = jnp.zeros_like(point[..., :1])
    p = jnp.concatenate([zeros, point], axis=-1)
    out = quaternion_raw_multiply(
        quaternion_raw_multiply(quaternion, p), quaternion_invert(quaternion)
    )
    return out[..., 1:]


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] Rodrigues vector -> unit quaternion (w, x, y, z); uses the
    small-angle Taylor form of sin(t/2)/t below 1e-6 like the reference."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angle * 0.5
    small = jnp.abs(angle) < 1e-6
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle**2) / 48.0, jnp.sin(half) / jnp.maximum(angle, 1e-30)
    )
    return jnp.concatenate(
        [jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1
    )


def quaternion_to_axis_angle(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> Rodrigues vector; small-angle-safe like the
    forward direction."""
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norms, quaternions[..., :1])
    angle = 2.0 * half
    small = jnp.abs(angle) < 1e-6
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle**2) / 48.0, jnp.sin(half) / jnp.maximum(angle, 1e-30)
    )
    return quaternions[..., 1:] / sin_half_over_angle


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3] Rodrigues vector."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def random_quaternions(n: int, key) -> jnp.ndarray:
    """n uniform random unit quaternions with non-negative real part
    (rotation.py:313-334)."""
    import jax

    q = jax.random.normal(key, (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return standardize_quaternion(q)


def random_rotations(n: int, key) -> jnp.ndarray:
    """n uniform random rotation matrices [n, 3, 3]."""
    return quaternion_to_matrix(random_quaternions(n, key))


def random_rotation(key) -> jnp.ndarray:
    """One uniform random rotation matrix [3, 3]."""
    return random_rotations(1, key)[0]
