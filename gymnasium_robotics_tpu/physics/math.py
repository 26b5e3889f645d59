"""Quaternion and spatial (6D) rigid-body algebra for the batched physics core.

Conventions follow MuJoCo (reference: gymnasium_robotics/utils/rotations.py:36-106):
quaternions are scalar-first ``(w, x, y, z)``; Euler sequence is intrinsic 'xyz'.
Spatial motion vectors are ``(angular(3), linear(3))`` stacked into 6-vectors; all
functions broadcast over leading batch dimensions so they can be used inside ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity() -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
    """Hamilton product u * v, broadcasting over leading dims."""
    w1, x1, y1, z1 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    w2, x2, y2, z2 = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rot(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_rot_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rot(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Quaternion -> 3x3 rotation matrix (batched)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> quaternion (w,x,y,z), branch-free for vmap."""
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    # Four candidate constructions; pick the numerically best via where.
    qw = jnp.stack(
        [
            1.0 + tr,
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
        ],
        axis=-1,
    )
    qx = jnp.stack(
        [
            m[..., 2, 1] - m[..., 1, 2],
            1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
            m[..., 0, 1] + m[..., 1, 0],
            m[..., 0, 2] + m[..., 2, 0],
        ],
        axis=-1,
    )
    qy = jnp.stack(
        [
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 0, 1] + m[..., 1, 0],
            1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
            m[..., 1, 2] + m[..., 2, 1],
        ],
        axis=-1,
    )
    qz = jnp.stack(
        [
            m[..., 1, 0] - m[..., 0, 1],
            m[..., 0, 2] + m[..., 2, 0],
            m[..., 1, 2] + m[..., 2, 1],
            1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
        ],
        axis=-1,
    )
    diag = jnp.stack([m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]], axis=-1)
    best = jnp.argmax(
        jnp.stack([tr, diag[..., 0], diag[..., 1], diag[..., 2]], axis=-1), axis=-1
    )
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrate quaternion by angular velocity omega (in the same frame the
    quaternion maps FROM, i.e. local frame -> q * exp(w dt), MuJoCo mju_quatIntegrate)."""
    angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    axis = omega / jnp.where(angle > 1e-12, angle, 1.0)
    dq = axis_angle_to_quat(axis, (angle * dt)[..., 0])
    out = quat_mul(q, dq)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Velocity-space difference: 3D rotation vector v s.t. qb * exp(v/2-ish) = qa.

    Matches mju_subQuat: returns axis*angle of qb^{-1} * qa (local frame).
    """
    qd = quat_mul(quat_conj(qb), qa)
    qd = qd * jnp.sign(jnp.where(qd[..., :1] == 0, 1.0, qd[..., :1]))
    sin_a_2 = jnp.linalg.norm(qd[..., 1:], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_a_2[..., 0], qd[..., 0])[..., None]
    axis = qd[..., 1:] / jnp.where(sin_a_2 > 1e-12, sin_a_2, 1.0)
    return axis * angle


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps), n[..., 0]


# ---------------------------------------------------------------------------
# Spatial 6D algebra: motion vectors m = (ang, lin), force vectors f = (trq, frc)
# All measured in a common ("c") frame: world orientation, fixed origin.
# ---------------------------------------------------------------------------

def motion_cross(v: jax.Array, u: jax.Array) -> jax.Array:
    """Spatial cross product of motion vectors: v x u (mjx-style mul order)."""
    ang = jnp.cross(v[..., :3], u[..., :3])
    lin = jnp.cross(v[..., :3], u[..., 3:]) + jnp.cross(v[..., 3:], u[..., :3])
    return jnp.concatenate([ang, lin], axis=-1)


def motion_cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial cross product v x* f acting on a force vector."""
    trq = jnp.cross(v[..., :3], f[..., :3]) + jnp.cross(v[..., 3:], f[..., 3:])
    frc = jnp.cross(v[..., :3], f[..., 3:])
    return jnp.concatenate([trq, frc], axis=-1)


def inert_mul(ci: jax.Array, v: jax.Array) -> jax.Array:
    """Multiply 10D spatial inertia by a motion vector -> force vector.

    ci layout (MuJoCo cinert): [Ixx Iyy Izz Ixy Ixz Iyz hx hy hz m] where
    I is the inertia about the c-frame origin minus the h-term correction,
    specifically: I_origin = I_stored + ... We store directly:
      torque = I @ w + h x v_lin
      force  = m * v_lin - h x w          (h = m * (com - origin))
    with I_stored = inertia about origin (already including parallel-axis term).
    """
    ixx, iyy, izz, ixy, ixz, iyz = (
        ci[..., 0], ci[..., 1], ci[..., 2], ci[..., 3], ci[..., 4], ci[..., 5],
    )
    h = ci[..., 6:9]
    m = ci[..., 9:10]
    w = v[..., :3]
    lin = v[..., 3:]
    iw = jnp.stack(
        [
            ixx * w[..., 0] + ixy * w[..., 1] + ixz * w[..., 2],
            ixy * w[..., 0] + iyy * w[..., 1] + iyz * w[..., 2],
            ixz * w[..., 0] + iyz * w[..., 1] + izz * w[..., 2],
        ],
        axis=-1,
    )
    trq = iw + jnp.cross(h, lin)
    frc = m * lin - jnp.cross(h, w)
    return jnp.concatenate([trq, frc], axis=-1)


def inertia_about_point(mass, inertia_diag, ipos, iquat, point):
    """Build the 10D c-frame spatial inertia of a body.

    mass: (...,), inertia_diag: (...,3) principal inertia, ipos: (...,3) world com,
    iquat: (...,4) world orientation of principal axes, point: (...,3) c-frame origin.
    """
    R = quat_to_mat(iquat)
    I_com = R @ (inertia_diag[..., :, None] * jnp.swapaxes(R, -1, -2))
    d = ipos - point  # com relative to origin
    # parallel axis: I_origin = I_com + m (d.d E - d d^T)
    dd = jnp.sum(d * d, axis=-1)[..., None, None]
    outer = d[..., :, None] * d[..., None, :]
    eye = jnp.eye(3, dtype=I_com.dtype)
    I_o = I_com + mass[..., None, None] * (dd * eye - outer)
    h = mass[..., None] * d
    return jnp.concatenate(
        [
            I_o[..., 0, 0, None], I_o[..., 1, 1, None], I_o[..., 2, 2, None],
            I_o[..., 0, 1, None], I_o[..., 0, 2, None], I_o[..., 1, 2, None],
            h, mass[..., None],
        ],
        axis=-1,
    )


def transform_motion(v: jax.Array, offset: jax.Array) -> jax.Array:
    """Re-express a motion vector at a new origin: new_origin = old_origin + offset.

    v_lin(new) = v_lin(old) + w x offset ... wait: v(p) = v(o) + w x (p - o), so for
    measuring at point p = o + offset: lin' = lin + cross(ang, offset)? No:
    v(p) = v(o) + w x (p - o) -> lin' = lin + cross(ang, offset).
    """
    return jnp.concatenate(
        [v[..., :3], v[..., 3:] + jnp.cross(v[..., :3], offset)], axis=-1
    )
