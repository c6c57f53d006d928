"""Quaternion / rotation helpers (wxyz convention, like MuJoCo).

Replaces the reference's scipy.spatial.transform.Rotation usage
(e.g. ref sawyer_reach_v3.py:104-105) with closed-form jnp — batched and
jit-friendly. Note the reference emits scipy quats in xyzw order for object
observations; `quat_to_xyzw` converts.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity():
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_mul(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q, v):
    """Rotate vector v by quaternion q (wxyz)."""
    qv = jnp.concatenate([jnp.zeros(v.shape[:-1] + (1,)), v], axis=-1)
    return quat_mul(quat_mul(q, qv), quat_conj(q))[..., 1:]


def axis_angle_quat(axis, angle):
    """Unit quaternion for rotation of `angle` about (unit) `axis`."""
    half = angle / 2.0
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )


def quat_integrate(q, omega, dt):
    """Integrate angular velocity omega (world frame) over dt."""
    dq = jnp.concatenate([jnp.zeros(q.shape[:-1] + (1,)), omega * dt], axis=-1)
    qn = q + 0.5 * quat_mul(dq, q)
    return qn / jnp.sqrt(jnp.maximum(jnp.sum(qn * qn, axis=-1, keepdims=True), 1e-24))


def quat_nlerp(q, p, alpha):
    """Normalized lerp q -> p by fraction alpha, sign-corrected for the
    double cover (used for the engine's orientation relaxations: grip droop,
    support righting). Exact enough for the small angles involved."""
    p = p * jnp.sign(jnp.sum(q * p, axis=-1, keepdims=True) + 1e-30)
    out = q + alpha * (p - q)
    return out / jnp.sqrt(jnp.maximum(jnp.sum(out * out, axis=-1, keepdims=True), 1e-24))


def quat_to_mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def mat_to_quat(m):
    """3x3 rotation matrix -> wxyz quaternion (branchless, Shepperd-style)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(w, x, y, z):
        return jnp.stack([w, x, y, z], axis=-1)

    q0 = mk(1 + tr, m21 - m12, m02 - m20, m10 - m01)
    q1 = mk(m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20)
    q2 = mk(m02 - m20, m01 + m10, 1 + m11 - m00 - m22, m12 + m21)
    q3 = mk(m10 - m01, m02 + m20, m12 + m21, 1 + m22 - m00 - m11)

    cases = jnp.stack([q0, q1, q2, q3], axis=-2)
    diag = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(diag, axis=-1)
    q = jnp.take_along_axis(cases, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return q / jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-24))


def quat_to_xyzw(q):
    """wxyz -> xyzw (scipy convention used by the reference's object quats)."""
    return jnp.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def quat_from_xyzw(q):
    return jnp.concatenate([q[..., 3:], q[..., :3]], axis=-1)


def euler_z_quat(angle):
    """Quaternion for yaw rotation about +z."""
    return axis_angle_quat(jnp.array([0.0, 0.0, 1.0]), jnp.asarray(angle))


def norm(x, axis=-1):
    """L2 norm with a NaN-free gradient at zero (jnp.linalg.norm's VJP is
    0/0 there; zero vectors are routine in padded slots)."""
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis), 1e-24))


def safe_normalize(v, eps=1e-9):
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-24))
    return v / jnp.maximum(n, eps)
