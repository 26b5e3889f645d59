"""Batched rotation math in JAX (API surface mirrors the reference's
gymnasium_robotics/utils/rotations.py:113-461; conventions identical: intrinsic
'xyz' Euler sequence, scalar-first (w,x,y,z) quaternions, leading batch dims).

All functions are pure jnp and differentiable; they are used both by env code
(e.g. HandManipulate goal rotations, manipulate.py:87-115 in the reference) and
available to users for on-device relabeling.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = jnp.finfo(jnp.float32).eps * 4.0


# ---------------------------------------------------------------------------
# Euler (intrinsic xyz) <-> matrix / quaternion
# ---------------------------------------------------------------------------

def euler2mat(euler):
    euler = jnp.asarray(euler)
    ai, aj, ak = -euler[..., 2], -euler[..., 1], -euler[..., 0]
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    # layout matches the reference numerically (rotations.py:113-137)
    out = jnp.stack(
        [
            cj * ci, cj * si, -sj,
            sj * cs - sc, sj * ss + cc, cj * sk,
            sj * cc + ss, sj * sc - cs, cj * ck,
        ],
        axis=-1,
    )
    return out.reshape(euler.shape[:-1] + (3, 3))


def euler2quat(euler):
    euler = jnp.asarray(euler)
    ai, aj, ak = euler[..., 2] / 2, -euler[..., 1] / 2, euler[..., 0] / 2
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    return jnp.stack(
        [
            cj * cc + sj * ss,
            cj * cs - sj * sc,
            -(cj * ss + sj * cc),
            cj * sc - sj * cs,
        ],
        axis=-1,
    )


def mat2euler(mat):
    mat = jnp.asarray(mat)
    cy = jnp.sqrt(mat[..., 2, 2] ** 2 + mat[..., 1, 2] ** 2)
    cond = cy > _EPS
    ez = jnp.where(
        cond,
        -jnp.arctan2(mat[..., 0, 1], mat[..., 0, 0]),
        -jnp.arctan2(-mat[..., 1, 0], mat[..., 1, 1]),
    )
    ey = -jnp.arctan2(-mat[..., 0, 2], cy)
    ex = jnp.where(cond, -jnp.arctan2(mat[..., 1, 2], mat[..., 2, 2]), 0.0)
    return jnp.stack([ex, ey, ez], axis=-1)


def mat2quat(mat):
    from gymnasium_robotics_tpu.physics.math import mat_to_quat

    return mat_to_quat(jnp.asarray(mat))


def quat2mat(quat):
    from gymnasium_robotics_tpu.physics.math import quat_to_mat

    q = jnp.asarray(quat)
    n = jnp.sum(q * q, axis=-1, keepdims=True)
    q = q / jnp.sqrt(jnp.maximum(n, _EPS))
    return quat_to_mat(q)


def quat2euler(quat):
    return mat2euler(quat2mat(quat))


# ---------------------------------------------------------------------------
# Quaternion algebra
# ---------------------------------------------------------------------------

def quat_identity(shape=()):
    out = jnp.zeros(tuple(shape) + (4,))
    return out.at[..., 0].set(1.0)


def quat_conjugate(q):
    q = jnp.asarray(q)
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_mul(q0, q1):
    q0, q1 = jnp.asarray(q0), jnp.asarray(q1)
    w0, x0, y0, z0 = q0[..., 0], q0[..., 1], q0[..., 2], q0[..., 3]
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    return jnp.stack(
        [
            w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
            w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
            w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
            w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
        ],
        axis=-1,
    )


def quat_rot_vec(q, v0):
    q, v0 = jnp.asarray(q), jnp.asarray(v0)
    q_v0 = jnp.concatenate([jnp.zeros_like(v0[..., :1]), v0], axis=-1)
    return quat_mul(q, quat_mul(q_v0, quat_conjugate(q)))[..., 1:]


def quat2axisangle(quat):
    quat = jnp.asarray(quat)
    sin_a_2 = jnp.linalg.norm(quat[..., 1:], axis=-1)
    theta = 2.0 * jnp.arctan2(sin_a_2, quat[..., 0])
    theta = normalize_angles(theta)
    axis = quat[..., 1:] / jnp.maximum(sin_a_2, 1e-12)[..., None]
    return axis * theta[..., None]


def subtract_euler(e1, e2):
    """Angular difference of two euler rotations (reference rotations.py:235)."""
    q1 = euler2quat(e1)
    q2 = euler2quat(e2)
    q_diff = quat_mul(q1, quat_conjugate(q2))
    return quat2euler(q_diff)


def normalize_angles(angles):
    angles = jnp.asarray(angles)
    return jnp.mod(angles + jnp.pi, 2 * jnp.pi) - jnp.pi


def round_to_straight_angles(angles):
    angles = jnp.round(jnp.asarray(angles) / (jnp.pi / 2)) * (jnp.pi / 2)
    return normalize_angles(angles)


def euler2point_euler(euler):
    e = jnp.asarray(euler)
    assert e.shape[-1] == 3
    return jnp.concatenate(
        [jnp.sin(e[..., :2]), jnp.cos(e[..., :2]), e[..., 2:]], axis=-1
    )


def point_euler2euler(euler):
    e = jnp.asarray(euler)
    angle = jnp.arctan2(e[..., :2], e[..., 2:4])
    return jnp.concatenate([angle, e[..., 4:]], axis=-1)


def quat2point_quat(quat):
    q = jnp.asarray(quat)
    angle = (jnp.arccos(jnp.clip(q[..., :1], -1, 1)) * 2)
    xyz = q[..., 1:]
    denom = jnp.sin(angle / 2)
    xyz = jnp.where(jnp.abs(denom) > 1e-9, xyz / jnp.where(denom == 0, 1, denom), xyz)
    return jnp.concatenate([jnp.sin(angle), jnp.cos(angle), xyz], axis=-1)


def point_quat2quat(quat):
    q = jnp.asarray(quat)
    angle = jnp.arctan2(q[..., :1], q[..., 1:2])
    qw = jnp.cos(angle / 2)
    qxyz = q[..., 2:] * jnp.sin(angle / 2)
    return jnp.concatenate([qw, qxyz], axis=-1)


def unit_vector(data, axis=None):
    data = jnp.asarray(data, dtype=jnp.float64 if False else None)
    n = jnp.linalg.norm(data, axis=axis, keepdims=axis is not None)
    return data / jnp.maximum(n, 1e-12)


def quat_slerp(quat0, quat1, fraction, spin=0, shortestpath=True):
    q0 = unit_vector(jnp.asarray(quat0))
    q1 = unit_vector(jnp.asarray(quat1))
    d = jnp.sum(q0 * q1, axis=-1)
    if shortestpath:
        q1 = jnp.where((d < 0.0)[..., None], -q1, q1)
        d = jnp.abs(d)
    angle = jnp.arccos(jnp.clip(d, -1, 1)) + spin * jnp.pi
    isin = 1.0 / jnp.maximum(jnp.sin(angle), 1e-12)
    s0 = jnp.sin((1.0 - fraction) * angle) * isin
    s1 = jnp.sin(fraction * angle) * isin
    out = q0 * s0[..., None] + q1 * s1[..., None]
    small = jnp.abs(angle) < _EPS
    return jnp.where(small[..., None], q0, out)


def get_parallel_rotations():
    """The 24 axis-aligned rotations (reference rotations.py:394-408), used by
    'parallel' Shadow-Hand goal sampling. Host-side helper (returns numpy)."""
    import itertools

    import numpy as np

    mult90 = [0, np.pi / 2, -np.pi / 2, np.pi]
    parallel_rotations = []
    for euler in itertools.product(mult90, repeat=3):
        canonical = np.asarray(mat2euler(euler2mat(np.array(euler))))
        canonical = np.round(canonical / (np.pi / 2))
        if canonical[0] == -2:
            canonical[0] = 2
        if canonical[2] == -2:
            canonical[2] = 2
        canonical = canonical * (np.pi / 2)
        if all((canonical != r).any() for r in parallel_rotations):
            parallel_rotations.append(canonical)
    assert len(parallel_rotations) == 24
    return parallel_rotations
