"""Batch-last (SoA) substep pipeline: the TPU-native layout for the WHOLE
physics step.

Round-2 measurements (tools/tpu_probe_results.jsonl) showed the smooth stack
is layout-bound exactly like the round-1 narrowphase was: under env-level
vmap every (B, entity, 3) array puts the 3-vector on the TPU's 128-lane axis
(42x padding waste), so each of the ~12 pipeline stages costs a flat ~5 ms at
B=256 regardless of math. Here the env batch rides the LANE (trailing) axis
everywhere — qpos (nq, B), vectors (entity, 3, B), quats (entity, 4, B),
matrices (entity, 3, 3, B), qM (nv, nv, B), J (nrows, nv, B) — so the minor
two dims tile as (entity|comp, B) with ~1x padding, and the constraint-row
matvecs become batch-parallel contractions.

The env batch enters through ONE custom_vmap boundary around the n_substeps
loop (step_n): per env-step the state transposes in, n substeps run fully
SoA, and the final Data transposes back to the B-leading layout the env
layer uses. Single-env calls fall back to the reference pipeline
(pipeline.step_n_loop), so semantics are pinned by the same cross-engine
tests that calibrated it (tests/test_physics_parity.py).

Replaces the physics the reference reaches through mj_step
(gymnasium_robotics/envs/robot_env.py:340-341).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu.physics import collision as COL
from gymnasium_robotics_tpu.physics import collision_vec as CV
from gymnasium_robotics_tpu.physics import constraint as CST
from gymnasium_robotics_tpu.physics import smooth as SM
from gymnasium_robotics_tpu.physics import smooth_vec as SV
from gymnasium_robotics_tpu.physics import solver_pallas as SP
from gymnasium_robotics_tpu.physics import types as T

_BIG = 1e10


# ---------------------------------------------------------------------------
# SoA math: component axis at -2, batch axis at -1.
# Vectors (..., 3, B), quats (..., 4, B), matrices (..., 3, 3, B) (rows, cols),
# spatial 6-vectors (..., 6, B), cinert (..., 10, B). Model constants carry a
# trailing broadcast axis Bm in {1, B}.
# ---------------------------------------------------------------------------


def _bB(x, B):
    """Broadcast a trailing-Bm array to a full batch (for einsum operands,
    scatter updates and concatenations that require equal batch sizes)."""
    return jnp.broadcast_to(x, x.shape[:-1] + (B,))


def cross3(a, b):
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=-2
    )


def dot3(a, b):
    return jnp.sum(a * b, axis=-2)


def quat_mul(u, v):
    w1, x1, y1, z1 = u[..., 0, :], u[..., 1, :], u[..., 2, :], u[..., 3, :]
    w2, x2, y2, z2 = v[..., 0, :], v[..., 1, :], v[..., 2, :], v[..., 3, :]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-2,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)[:, None]


def quat_rot(q, v):
    qv = q[..., 1:, :]
    w = q[..., 0:1, :]
    t = 2.0 * cross3(qv, v)
    return v + w * t + cross3(qv, t)


def quat_to_mat(q):
    w, x, y, z = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-2)
    r1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-2)
    r2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-2)
    return jnp.stack([r0, r1, r2], axis=-3)


def normalize(v, eps=1e-12):
    n = jnp.sqrt(jnp.sum(v * v, axis=-2, keepdims=True))
    return v / jnp.maximum(n, eps), n[..., 0, :]


def axis_angle_to_quat(axis, angle):
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None, :], axis * jnp.sin(half)[..., None, :]],
        axis=-2,
    )


def quat_integrate(q, omega, dt):
    angle = jnp.sqrt(jnp.sum(omega * omega, axis=-2, keepdims=True))
    axis = omega / jnp.where(angle > 1e-12, angle, 1.0)
    dq = axis_angle_to_quat(axis, (angle * dt)[..., 0, :])
    out = quat_mul(q, dq)
    return out / jnp.sqrt(jnp.sum(out * out, axis=-2, keepdims=True))


def motion_cross(v, u):
    ang = cross3(v[..., :3, :], u[..., :3, :])
    lin = cross3(v[..., :3, :], u[..., 3:, :]) + cross3(
        v[..., 3:, :], u[..., :3, :]
    )
    return jnp.concatenate([ang, lin], axis=-2)


def motion_cross_force(v, f):
    trq = cross3(v[..., :3, :], f[..., :3, :]) + cross3(
        v[..., 3:, :], f[..., 3:, :]
    )
    frc = cross3(v[..., :3, :], f[..., 3:, :])
    return jnp.concatenate([trq, frc], axis=-2)


def inert_mul(ci, v):
    ixx, iyy, izz = ci[..., 0, :], ci[..., 1, :], ci[..., 2, :]
    ixy, ixz, iyz = ci[..., 3, :], ci[..., 4, :], ci[..., 5, :]
    h = ci[..., 6:9, :]
    m_ = ci[..., 9:10, :]
    w = v[..., :3, :]
    lin = v[..., 3:, :]
    iw = jnp.stack(
        [
            ixx * w[..., 0, :] + ixy * w[..., 1, :] + ixz * w[..., 2, :],
            ixy * w[..., 0, :] + iyy * w[..., 1, :] + iyz * w[..., 2, :],
            ixz * w[..., 0, :] + iyz * w[..., 1, :] + izz * w[..., 2, :],
        ],
        axis=-2,
    )
    trq = iw + cross3(h, lin)
    frc = m_ * lin - cross3(h, w)
    return jnp.concatenate([trq, frc], axis=-2)


def inertia_about_point(mass, inertia_diag, ipos, iquat, point):
    """10D c-frame spatial inertia; mass (..., Bm), inertia_diag (..., 3, Bm),
    ipos/point (..., 3, B), iquat (..., 4, B) -> (..., 10, B)."""
    B = iquat.shape[-1]
    R = quat_to_mat(iquat)
    I_com = jnp.einsum(
        "...ikb,...kb,...jkb->...ijb", R, _bB(inertia_diag, B), R
    )
    d = ipos - point
    dd = jnp.sum(d * d, axis=-2)
    outer = d[..., :, None, :] * d[..., None, :, :]
    eye = jnp.eye(3, dtype=I_com.dtype)[:, :, None]
    I_o = I_com + mass[..., None, None, :] * (
        dd[..., None, None, :] * eye - outer
    )
    h = mass[..., None, :] * d
    six = jnp.stack(
        [
            I_o[..., 0, 0, :], I_o[..., 1, 1, :], I_o[..., 2, 2, :],
            I_o[..., 0, 1, :], I_o[..., 0, 2, :], I_o[..., 1, 2, :],
        ],
        axis=-2,
    )
    return jnp.concatenate(
        [six, h, _bB(mass[..., None, :], B)], axis=-2
    )


def matvec(R, v):
    return jnp.einsum("...ijb,...jb->...ib", R, v)


def matTvec(R, v):
    return jnp.einsum("...jib,...jb->...ib", R, v)


# ---------------------------------------------------------------------------
# Smooth stack (translations of smooth_vec.py / smooth.py — same formulas,
# batch-last layout; numerics identical up to f32 reduction order)
# ---------------------------------------------------------------------------


class _JumpPlan:
    """Static tables for the pointer-jumping FK tree contraction: joint
    rounds over ALL bodies at once + 2^k-ancestor tables. Built once per
    Meta; ``ok=False`` falls back to the sequential level pass (exotic
    topologies: non-world-attached free/mocap bodies, unknown joint
    types)."""

    def __init__(self, mt: T.Meta):
        nb = mt.nbody
        parent = np.array(mt.body_parentid)
        self.ok = nb > 1
        for b in range(nb):
            adr, num = mt.body_jntadr[b], mt.body_jntnum[b]
            for j in range(adr, adr + num):
                if mt.jnt_type[j] not in (T.FREE, T.BALL, T.SLIDE, T.HINGE):
                    self.ok = False
                if mt.jnt_type[j] == T.FREE and parent[b] != 0:
                    self.ok = False  # free joint sets the WORLD pose
            if mt.body_mocapid[b] >= 0 and parent[b] != 0:
                self.ok = False  # mocap override is a world pose
        if not self.ok:
            return
        # 2^k-ancestor tables (0 = world is absorbing; L[0] = identity)
        self.ancs = []
        anc = parent.copy()
        while anc.any():
            self.ancs.append(anc.copy())
            anc = anc[anc]
        # joint rounds: round r applies every body's r-th joint, by type
        maxr = max((mt.body_jntnum[b] for b in range(nb)), default=0)
        self.rounds = []
        for r in range(maxr):
            groups: dict = {}
            for b in range(nb):
                if mt.body_jntnum[b] <= r:
                    continue
                j = mt.body_jntadr[b] + r
                jt = mt.jnt_type[j]
                g = groups.setdefault(
                    jt, {"li": [], "jids": [], "qadr": [], "qidx": []}
                )
                g["li"].append(b)
                g["jids"].append(j)
                qa = mt.jnt_qposadr[j]
                g["qadr"].append(qa)
                width = 7 if jt == T.FREE else 4
                g["qidx"].append([qa + i for i in range(width)])
            self.rounds.append({
                jt: {k: np.array(v) for k, v in g.items()}
                for jt, g in groups.items()
            })
        self.parent = parent
        mids = [(b, mt.body_mocapid[b]) for b in range(nb)
                if mt.body_mocapid[b] >= 0]
        self.mocap_bodies = np.array([b for b, _ in mids])
        self.mocap_ids = np.array([i for _, i in mids])
        self.jnt_parent = parent[np.array(mt.jnt_bodyid)] if mt.njnt else \
            np.zeros(0, np.int64)


_JUMP_PLAN_CACHE: dict = {}


def _jump_plan(mt: T.Meta) -> _JumpPlan:
    key = hash(mt)
    p = _JUMP_PLAN_CACHE.get(key)
    if p is None:
        p = _JumpPlan(mt)
        _JUMP_PLAN_CACHE[key] = p
    return p


def _kinematics_jump(m: T.Model, d: T.Data, plan: _JumpPlan) -> T.Data:
    """Pointer-jumping FK: every body's LOCAL transform (parent-relative,
    joints folded in) is built in ONE vectorized pass, then world poses come
    from ceil(log2(depth)) ancestor-doubling compositions instead of a
    sequential per-level walk (kitchen: 10 levels -> 4 steps; the traced
    program shrinks ~10x, which is what the per-fusion-overhead-bound TPU
    runtime pays for). Same math as the level pass modulo f32 reordering
    (joint application is parent-composable: rot(mul(a,b),v) ==
    rot(a, rot(b,v)))."""
    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    nb = mt.nbody

    # phase 1: local transforms + joint anchors/axes in the parent frame
    pos = _bB(m.body_pos.astype(dtype), B)
    quat = _bB(m.body_quat.astype(dtype), B)
    anchor_l = jnp.zeros((mt.njnt, 3, B), dtype)
    axis_l = jnp.zeros((mt.njnt, 3, B), dtype)
    for groups in plan.rounds:
        for jt, g in groups.items():
            li = jnp.asarray(g["li"])
            jids = jnp.asarray(g["jids"])
            if jt == T.FREE:
                q7 = d.qpos[jnp.asarray(g["qidx"])]        # (k, 7, B)
                fquat, _ = normalize(q7[:, 3:7])
                pos = pos.at[li].set(q7[:, :3])
                quat = quat.at[li].set(fquat)
                anchor_l = anchor_l.at[jids].set(q7[:, :3])
                axis_l = axis_l.at[jids].set(
                    quat_rot(fquat, _bB(m.jnt_axis[jids].astype(dtype), B))
                )
            elif jt == T.BALL:
                q4 = d.qpos[jnp.asarray(g["qidx"])]        # (k, 4, B)
                q4, _ = normalize(q4)
                jp = _bB(m.jnt_pos[jids].astype(dtype), B)
                anc = pos[li] + quat_rot(quat[li], jp)
                nquat = quat_mul(quat[li], q4)
                quat = quat.at[li].set(nquat)
                pos = pos.at[li].set(anc - quat_rot(nquat, jp))
                anchor_l = anchor_l.at[jids].set(anc)
                axis_l = axis_l.at[jids].set(
                    quat_rot(nquat, _bB(m.jnt_axis[jids].astype(dtype), B))
                )
            elif jt == T.SLIDE:
                qa = jnp.asarray(g["qadr"])
                qv = d.qpos[qa] - m.qpos0[qa]              # (k, B)
                ax = quat_rot(quat[li], _bB(m.jnt_axis[jids].astype(dtype), B))
                npos = pos[li] + ax * qv[:, None, :]
                pos = pos.at[li].set(npos)
                anchor_l = anchor_l.at[jids].set(
                    npos + quat_rot(
                        quat[li], _bB(m.jnt_pos[jids].astype(dtype), B)
                    )
                )
                axis_l = axis_l.at[jids].set(ax)
            elif jt == T.HINGE:
                qa = jnp.asarray(g["qadr"])
                qv = d.qpos[qa] - m.qpos0[qa]
                jp = _bB(m.jnt_pos[jids].astype(dtype), B)
                jax_ = _bB(m.jnt_axis[jids].astype(dtype), B)
                ax_w = quat_rot(quat[li], jax_)
                anc = pos[li] + quat_rot(quat[li], jp)
                dq = axis_angle_to_quat(jax_, qv)
                nquat = quat_mul(quat[li], dq)
                quat = quat.at[li].set(nquat)
                pos = pos.at[li].set(anc - quat_rot(nquat, jp))
                anchor_l = anchor_l.at[jids].set(anc)
                axis_l = axis_l.at[jids].set(ax_w)
    if len(plan.mocap_bodies):
        mb = jnp.asarray(plan.mocap_bodies)
        mid = jnp.asarray(plan.mocap_ids)
        mq, _ = normalize(d.mocap_quat[mid])
        pos = pos.at[mb].set(d.mocap_pos[mid])
        quat = quat.at[mb].set(mq)

    # phase 2: ancestor doubling (L[0] is identity; anc saturates at 0 so
    # extra compositions are no-ops)
    for anc_np in plan.ancs:
        ai = jnp.asarray(anc_np)
        pos = pos[ai] + quat_rot(quat[ai], pos)
        quat = quat_mul(quat[ai], quat)
    xpos, xquat = pos, quat

    # phase 3: joint world anchors/axes from the PARENT world frame
    if mt.njnt:
        pj = jnp.asarray(plan.jnt_parent)
        xanchor = xpos[pj] + quat_rot(xquat[pj], anchor_l)
        xaxis = quat_rot(xquat[pj], axis_l)
    else:
        xanchor = jnp.zeros((0, 3, B), dtype)
        xaxis = jnp.zeros((0, 3, B), dtype)

    xmat = quat_to_mat(xquat)
    xipos = xpos + quat_rot(xquat, m.body_ipos)
    ximat = quat_to_mat(quat_mul(xquat, m.body_iquat))
    gb = jnp.asarray(np.array(mt.geom_bodyid))
    geom_xpos = xpos[gb] + quat_rot(xquat[gb], m.geom_pos)
    geom_xmat = quat_to_mat(quat_mul(xquat[gb], m.geom_quat))
    if mt.nsite:
        sb = jnp.asarray(np.array(mt.site_bodyid))
        site_xpos = xpos[sb] + quat_rot(xquat[sb], m.site_pos)
        site_xmat = quat_to_mat(quat_mul(xquat[sb], m.site_quat))
    else:
        site_xpos = jnp.zeros((0, 3, B), dtype)
        site_xmat = jnp.zeros((0, 3, 3, B), dtype)
    return dataclasses.replace(
        d, xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
        xanchor=xanchor, xaxis=xaxis,
        geom_xpos=geom_xpos, geom_xmat=geom_xmat,
        site_xpos=site_xpos, site_xmat=site_xmat,
    )


def kinematics(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    fk = getattr(mt.opt, "fk_kernel", False)
    use_kernel = fk is True or fk == "force" or (
        fk == "auto" and jax.default_backend() == "tpu"
    )
    if use_kernel:
        from gymnasium_robotics_tpu.physics import kinematics_pallas as KP

        if KP.supported(m, d):
            return KP.kinematics(
                m, d, interpret=jax.default_backend() != "tpu"
            )
    fj = getattr(mt.opt, "fk_jump", "auto")
    if fj is True or fj == "force" or fj == "auto":
        jplan = _jump_plan(mt)
        if jplan.ok:
            return _kinematics_jump(m, d, jplan)
    plan = SV._plan(mt)

    xpos = jnp.zeros((mt.nbody, 3, B), dtype)
    xquat = jnp.zeros((mt.nbody, 4, B), dtype).at[:, 0].set(1.0)
    xanchor = jnp.zeros((mt.njnt, 3, B), dtype)
    xaxis = jnp.zeros((mt.njnt, 3, B), dtype)

    for lv in plan.levels:
        bidx = jnp.asarray(lv["bodies"])
        pidx = jnp.asarray(lv["parents"])
        pos = xpos[pidx] + quat_rot(xquat[pidx], m.body_pos[bidx])
        quat = quat_mul(xquat[pidx], m.body_quat[bidx])
        for groups in lv["rounds"]:
            for jt, g in groups.items():
                li = jnp.asarray(g["li"])
                jids = jnp.asarray(g["jids"])
                if jt == T.FREE:
                    q7 = d.qpos[jnp.asarray(g["qidx"])]  # (k, 7, B)
                    fquat, _ = normalize(q7[:, 3:7])
                    pos = pos.at[li].set(q7[:, :3])
                    quat = quat.at[li].set(fquat)
                    xanchor = xanchor.at[jids].set(q7[:, :3])
                    xaxis = xaxis.at[jids].set(
                        quat_rot(fquat, m.jnt_axis[jids])
                    )
                elif jt == T.BALL:
                    q4 = d.qpos[jnp.asarray(g["qidx"])]  # (k, 4, B)
                    q4, _ = normalize(q4)
                    jp = m.jnt_pos[jids]
                    anchor = pos[li] + quat_rot(quat[li], jp)
                    nquat = quat_mul(quat[li], q4)
                    quat = quat.at[li].set(nquat)
                    pos = pos.at[li].set(anchor - quat_rot(nquat, jp))
                    xanchor = xanchor.at[jids].set(anchor)
                    xaxis = xaxis.at[jids].set(
                        quat_rot(nquat, m.jnt_axis[jids])
                    )
                elif jt == T.SLIDE:
                    qa = jnp.asarray(g["qadr"])
                    qv = d.qpos[qa] - m.qpos0[qa]  # (k, B)
                    ax = quat_rot(quat[li], m.jnt_axis[jids])
                    npos = pos[li] + ax * qv[:, None, :]
                    pos = pos.at[li].set(npos)
                    xanchor = xanchor.at[jids].set(
                        npos + quat_rot(quat[li], m.jnt_pos[jids])
                    )
                    xaxis = xaxis.at[jids].set(ax)
                elif jt == T.HINGE:
                    qa = jnp.asarray(g["qadr"])
                    qv = d.qpos[qa] - m.qpos0[qa]
                    jp = m.jnt_pos[jids]
                    ax_world = quat_rot(quat[li], m.jnt_axis[jids])
                    anchor = pos[li] + quat_rot(quat[li], jp)
                    dq = axis_angle_to_quat(m.jnt_axis[jids], qv)
                    nquat = quat_mul(quat[li], dq)
                    quat = quat.at[li].set(nquat)
                    pos = pos.at[li].set(anchor - quat_rot(nquat, jp))
                    xanchor = xanchor.at[jids].set(anchor)
                    xaxis = xaxis.at[jids].set(ax_world)
        if lv["any_mocap"]:
            mm = jnp.asarray(lv["mocap_mask"])[:, None, None]
            mid = jnp.asarray(lv["mocap_ids"])
            mq, _ = normalize(d.mocap_quat[mid])
            pos = jnp.where(mm, d.mocap_pos[mid], pos)
            quat = jnp.where(mm, mq, quat)
        xpos = xpos.at[bidx].set(pos)
        xquat = xquat.at[bidx].set(quat)

    xmat = quat_to_mat(xquat)
    xipos = xpos + quat_rot(xquat, m.body_ipos)
    ximat = quat_to_mat(quat_mul(xquat, m.body_iquat))

    gb = jnp.asarray(np.array(mt.geom_bodyid))
    geom_xpos = xpos[gb] + quat_rot(xquat[gb], m.geom_pos)
    geom_xmat = quat_to_mat(quat_mul(xquat[gb], m.geom_quat))
    if mt.nsite:
        sb = jnp.asarray(np.array(mt.site_bodyid))
        site_xpos = xpos[sb] + quat_rot(xquat[sb], m.site_pos)
        site_xmat = quat_to_mat(quat_mul(xquat[sb], m.site_quat))
    else:
        site_xpos = jnp.zeros((0, 3, B), dtype)
        site_xmat = jnp.zeros((0, 3, 3, B), dtype)

    return dataclasses.replace(
        d, xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
        xanchor=xanchor, xaxis=xaxis,
        geom_xpos=geom_xpos, geom_xmat=geom_xmat,
        site_xpos=site_xpos, site_xmat=site_xmat,
    )


@functools.lru_cache(maxsize=None)
def _tree_mats(mt: T.Meta):
    """Static tree-accumulation matrices: every sequential parent/child pass
    of the smooth stack is a linear accumulation over a FIXED tree, so it
    collapses to one matmul with a 0/1 ancestor/subtree matrix (MXU work
    instead of one gather/scatter chain per tree level — the op-count killer
    on the tunneled TPU runtime).

    Returns dict of numpy float32 matrices:
      sub   (nbody, nbody): sub[a, b] = 1 iff b is in subtree(a) (incl a)
      danc  (nbody, nv):    danc[b, e] = 1 iff dof e lies on the root->b path
                            (including b's own dofs) — cvel / cacc operator
      subd  (nv, nbody):    subd[e, b] = 1 iff b in subtree(dof_body[e]) —
                            CRB / RNE-backward gathered at the dof level
      prefix (nv, nv):      prefix[d, e] = 1 iff dof e contributes to the
                            PRE-dof-d accumulated velocity in mj_comVel
                            order (strict body ancestors; earlier joints of
                            the same body; a free joint's translation before
                            its own rotation — rotational dofs of one
                            free/ball joint share the pre-rotation velocity)
      cdofdot_mask (nv,):   0 on free-joint translational rows (their
                            cdof_dot is identically zero), 1 elsewhere
    """
    nbody, nv = mt.nbody, mt.nv
    par = np.array(mt.body_parentid)
    anc = np.zeros((nbody, nbody), np.float32)  # anc[b, a]: a anc-or-self
    for b in range(nbody):
        a = b
        while True:
            anc[b, a] = 1.0
            if a == 0:
                break
            a = int(par[a])
    dof_body = np.array(mt.dof_bodyid)
    # per-dof (joint id, sub-order within joint)
    jnt_of_dof = np.zeros(nv, np.int64)
    sub_of_dof = np.zeros(nv, np.int64)
    free_trans = np.zeros(nv, bool)
    for j in range(mt.njnt):
        adr = mt.jnt_dofadr[j]
        jt = mt.jnt_type[j]
        w = T.JNT_DOF_WIDTH[jt]
        for k in range(w):
            jnt_of_dof[adr + k] = j
            if jt == T.FREE:
                sub_of_dof[adr + k] = 0 if k < 3 else 1
                free_trans[adr + k] = k < 3
    danc = anc[:, dof_body].astype(np.float32)  # (nbody, nv)
    sub = anc.T.copy()
    subd = sub[dof_body].astype(np.float32)     # (nv, nbody)
    prefix = np.zeros((nv, nv), np.float32)
    for dd in range(nv):
        bd = dof_body[dd]
        for e in range(nv):
            be = dof_body[e]
            if be == bd:
                if jnt_of_dof[e] < jnt_of_dof[dd] or (
                    jnt_of_dof[e] == jnt_of_dof[dd]
                    and sub_of_dof[e] < sub_of_dof[dd]
                ):
                    prefix[dd, e] = 1.0
            elif anc[bd, be] and be != bd:
                prefix[dd, e] = 1.0
    return dict(
        sub=sub, danc=danc, subd=subd, prefix=prefix,
        cdofdot_mask=(~free_trans).astype(np.float32),
    )


def com_pos(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    B = d.qpos.shape[-1]
    plan = SV._plan(mt)
    tm = _tree_mats(mt)
    dtype = d.qpos.dtype

    mom = d.xipos * m.body_mass[:, None, :]
    sub_j = jnp.asarray(tm["sub"], dtype)
    sub_mom = jnp.einsum("ij,jcb->icb", sub_j, mom)
    sub_mass = sub_j @ _bB(m.body_mass, B).astype(dtype)
    subtree_com = jnp.where(
        (sub_mass > 1e-10)[:, None, :],
        sub_mom / jnp.maximum(sub_mass, 1e-12)[:, None, :],
        d.xipos,
    )

    rootid = jnp.asarray(plan.root_of_body)
    c_origin = subtree_com[rootid]
    iquat = quat_mul(d.xquat, m.body_iquat)
    cinert = inertia_about_point(
        m.body_mass, m.body_inertia, d.xipos, iquat, c_origin
    )

    dtype = d.qpos.dtype
    cdof = jnp.zeros((mt.nv, 6, B), dtype)
    for jt, g in plan.jnt_groups.items():
        jids = jnp.asarray(g["jids"])
        bodies = jnp.asarray(g["bodies"])
        dadr = jnp.asarray(g["dadr"])
        o = c_origin[bodies]
        a = d.xanchor[jids]
        if jt == T.FREE:
            k = len(g["jids"])
            eye_b = jnp.broadcast_to(
                jnp.eye(3, dtype=dtype)[None, :, :, None], (k, 3, 3, B)
            )
            lin = jnp.concatenate(
                [jnp.zeros((k, 3, 3, B), dtype), eye_b], axis=-2
            )  # (k, 3 dof-rows, 6 comps, B)
            ax = jnp.swapaxes(d.xmat[bodies], 1, 2)  # (k, 3 axes, 3, B)
            rot = jnp.concatenate(
                [ax, cross3(ax, (o - a)[:, None])], axis=-2
            )
            block = jnp.concatenate([lin, rot], axis=1)  # (k, 6, 6, B)
            idx = (np.asarray(g["dadr"])[:, None] + np.arange(6)).reshape(-1)
            cdof = cdof.at[jnp.asarray(idx)].set(block.reshape(-1, 6, B))
        elif jt == T.BALL:
            ax = jnp.swapaxes(d.xmat[bodies], 1, 2)
            rot = jnp.concatenate(
                [ax, cross3(ax, (o - a)[:, None])], axis=-2
            )  # (k, 3, 6, B)
            idx = (np.asarray(g["dadr"])[:, None] + np.arange(3)).reshape(-1)
            cdof = cdof.at[jnp.asarray(idx)].set(rot.reshape(-1, 6, B))
        elif jt == T.SLIDE:
            ax = _bB(jnp.broadcast_to(m.jnt_axis[jids], d.xaxis[jids].shape), B)
            block = jnp.concatenate(
                [jnp.zeros_like(d.xaxis[jids]), d.xaxis[jids]], axis=-2
            )
            cdof = cdof.at[dadr].set(block)
        elif jt == T.HINGE:
            ax = d.xaxis[jids]
            block = jnp.concatenate([ax, cross3(ax, o - a)], axis=-2)
            cdof = cdof.at[dadr].set(block)

    return dataclasses.replace(
        d, subtree_com=subtree_com, cinert=cinert, cdof=cdof
    )


def com_vel(m: T.Model, d: T.Data) -> T.Data:
    """cvel / cdof_dot as two static-matrix contractions: every dof's
    contribution is linear, so the per-level accumulation loop is
    danc @ (cdof*qvel), and each dof's mj_comVel-order pre-velocity is
    prefix @ (cdof*qvel) (free/ball rotational dofs share the PRE-rotation
    accumulated velocity — encoded in the prefix matrix)."""
    mt = m.meta
    dtype = d.qpos.dtype
    tm = _tree_mats(mt)

    cq = d.cdof * d.qvel[:, None, :]                        # (nv, 6, B)
    cvel = jnp.einsum("ij,jcb->icb", jnp.asarray(tm["danc"], dtype), cq)
    vpre = jnp.einsum("ij,jcb->icb", jnp.asarray(tm["prefix"], dtype), cq)
    cdof_dot = motion_cross(vpre, d.cdof) * jnp.asarray(
        tm["cdofdot_mask"], dtype
    )[:, None, None]
    return dataclasses.replace(d, cvel=cvel, cdof_dot=cdof_dot)


def crb(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    B = d.qpos.shape[-1]
    tm = _tree_mats(mt)
    # composite rigid-body inertia gathered directly at the dof level:
    # crb[dof_body[e]] = sum of cinert over subtree(dof_body[e])
    crb_dof = jnp.einsum(
        "ij,jcb->icb", jnp.asarray(tm["subd"], d.qpos.dtype), d.cinert
    )
    F = inert_mul(crb_dof, d.cdof)  # (nv, 6, B)
    G = jnp.einsum("icb,jcb->ijb", F, d.cdof)
    mask = jnp.asarray(SM._ancestor_mask(mt))
    Ml = jnp.where(mask[:, :, None], G, 0.0)
    ar = jnp.arange(mt.nv)
    dg = Ml[ar, ar]  # (nv, B)
    qM = Ml + jnp.swapaxes(Ml, 0, 1)
    qM = qM.at[ar, ar].add(_bB(m.dof_armature, B) - dg)
    return dataclasses.replace(d, qM=qM)


def rne(m: T.Model, d: T.Data) -> T.Data:
    """RNE as three static-matrix contractions: the forward cacc pass is
    danc @ (cdof_dot*qvel) (+ gravity base), the backward force pass is a
    subtree sum gathered at the dof level (subd), and qfrc_bias is the
    per-dof spatial dot."""
    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    tm = _tree_mats(mt)
    grav = np.asarray(mt.opt.gravity, np.float64)
    if mt.opt.disable_gravity:
        grav = np.zeros(3)
    cacc0 = jnp.asarray(
        np.concatenate([np.zeros(3), -grav]), dtype
    )[None, :, None]

    contrib = d.cdof_dot * d.qvel[:, None, :]               # (nv, 6, B)
    cacc = cacc0 + jnp.einsum(
        "ij,jcb->icb", jnp.asarray(tm["danc"], dtype), contrib
    )

    hb = inert_mul(d.cinert, d.cvel)
    cfrc = inert_mul(d.cinert, cacc) + motion_cross_force(d.cvel, hb)
    # subtree force sum per dof body (world never contributes: dof bodies'
    # subtrees exclude it, matching the parent>0 masking of the level pass)
    cfrc_dof = jnp.einsum(
        "ij,jcb->icb", jnp.asarray(tm["subd"], dtype), cfrc
    )
    qfrc_bias = jnp.sum(d.cdof * cfrc_dof, axis=-2)
    return dataclasses.replace(d, qfrc_bias=qfrc_bias)


def tendon(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    if not mt.ntendon:
        return dataclasses.replace(
            d,
            ten_length=jnp.zeros((0, B), dtype),
            ten_velocity=jnp.zeros((0, B), dtype),
            ten_J=jnp.zeros((0, mt.nv, B), dtype),
        )
    kinds = mt.tendon_kind or ("fixed",) * mt.ntendon
    w_idx, w_qadr, w_dadr, w_ten = [], [], [], []
    for t in range(mt.ntendon):
        if kinds[t] == "spatial2":
            continue
        adr, num = mt.tendon_adr[t], mt.tendon_num[t]
        for w in range(adr, adr + num):
            j = mt.wrap_objid[w]
            w_idx.append(w)
            w_qadr.append(mt.jnt_qposadr[j])
            w_dadr.append(mt.jnt_dofadr[j])
            w_ten.append(t)
    ten_length = jnp.zeros((mt.ntendon, B), dtype)
    ten_J = jnp.zeros((mt.ntendon, mt.nv, B), dtype)
    if w_idx:
        wi = jnp.asarray(np.array(w_idx))
        coefs = m.wrap_prm[wi].astype(dtype)  # (nw, Bm)
        wt = jnp.asarray(np.array(w_ten))
        ten_length = ten_length.at[wt].add(
            coefs * d.qpos[jnp.asarray(np.array(w_qadr))]
        )
        ten_J = ten_J.at[(wt, jnp.asarray(np.array(w_dadr)))].add(
            _bB(coefs, B)
        )
    masks = None
    for t in range(mt.ntendon):
        if kinds[t] != "spatial2":
            continue
        adr = mt.tendon_adr[t]
        s0, s1 = mt.wrap_objid[adr], mt.wrap_objid[adr + 1]
        p0, p1 = d.site_xpos[s0], d.site_xpos[s1]
        dvec = p1 - p0  # (3, B)
        L = jnp.sqrt(jnp.sum(dvec * dvec, axis=0))
        direction = dvec / jnp.maximum(L, 1e-10)[None]
        if masks is None:
            masks = CST._body_dof_masks(mt)

        def jacp(site, body):
            mk = jnp.asarray(masks[body], dtype)
            o = d.subtree_com[mt.body_rootid[body]]
            off = d.site_xpos[site] - o
            return (
                d.cdof[:, 3:] + cross3(d.cdof[:, :3], off[None])
            ) * mk[:, None, None]

        b0, b1 = mt.site_bodyid[s0], mt.site_bodyid[s1]
        ten_J = ten_J.at[t].set(
            jnp.einsum("vcb,cb->vb", jacp(s1, b1) - jacp(s0, b0), direction)
        )
        ten_length = ten_length.at[t].set(L)
    return dataclasses.replace(
        d,
        ten_length=ten_length,
        ten_velocity=jnp.einsum("tvb,vb->tb", ten_J, d.qvel),
        ten_J=ten_J,
    )


# ---------------------------------------------------------------------------
# Actuation / passive (translations of smooth.py:377-606)
# ---------------------------------------------------------------------------


def transmission(m: T.Model, d: T.Data):
    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    if not mt.nu:
        return jnp.zeros((0, B), dtype), jnp.zeros((0, mt.nv, B), dtype)
    length = jnp.zeros((mt.nu, B), dtype)
    moment = jnp.zeros((mt.nu, mt.nv, B), dtype)

    u_1d, q_1d, d_1d = [], [], []
    u_fb, d_fb, k_fb = [], [], []
    u_t, tid_t = [], []
    for u in range(mt.nu):
        trn = mt.actuator_trntype[u]
        tid = mt.actuator_trnid[u]
        if trn in (SM.TRN_JOINT, SM.TRN_JOINTINPARENT):
            jt = mt.jnt_type[tid]
            if jt in (T.SLIDE, T.HINGE):
                u_1d.append(u)
                q_1d.append(mt.jnt_qposadr[tid])
                d_1d.append(mt.jnt_dofadr[tid])
            else:
                for k in range(T.JNT_DOF_WIDTH[jt]):
                    u_fb.append(u)
                    d_fb.append(mt.jnt_dofadr[tid] + k)
                    k_fb.append(k)
        elif trn == SM.TRN_TENDON:
            u_t.append(u)
            tid_t.append(tid)
    if u_1d:
        ui = jnp.asarray(np.array(u_1d))
        qi = jnp.asarray(np.array(q_1d))
        g0 = m.actuator_gear[ui, 0].astype(dtype)  # (k, Bm)
        length = length.at[ui].set((d.qpos[qi] - m.qpos0[qi]) * g0)
        moment = moment.at[(ui, jnp.asarray(np.array(d_1d)))].set(_bB(g0, B))
    if u_fb:
        ui = jnp.asarray(np.array(u_fb))
        vals = m.actuator_gear[
            (ui, jnp.asarray(np.array(k_fb)))
        ].astype(dtype)
        moment = moment.at[(ui, jnp.asarray(np.array(d_fb)))].set(_bB(vals, B))
    if u_t:
        ui = jnp.asarray(np.array(u_t))
        ti = jnp.asarray(np.array(tid_t))
        g0 = m.actuator_gear[ui, 0].astype(dtype)
        length = length.at[ui].set(d.ten_length[ti] * g0)
        moment = moment.at[ui].set(d.ten_J[ti] * g0[:, None, :])
    return length, moment


def fwd_actuation(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    if not mt.nu:
        return dataclasses.replace(
            d,
            actuator_length=jnp.zeros((0, B), dtype),
            actuator_velocity=jnp.zeros((0, B), dtype),
            actuator_force=jnp.zeros((0, B), dtype),
            qfrc_actuator=jnp.zeros((mt.nv, B), dtype),
        )
    length, moment = transmission(m, d)
    velocity = jnp.einsum("uvb,vb->ub", moment, d.qvel)

    ctrl = d.ctrl
    if not mt.opt.disable_clampctrl:
        limited = jnp.asarray(mt.actuator_ctrllimited, bool)[:, None]
        ctrl = jnp.where(
            limited,
            jnp.clip(
                ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
            ),
            ctrl,
        )

    dyn_none = jnp.asarray(np.array(mt.actuator_dyntype) == SM.DYN_NONE)
    actadr = jnp.asarray(np.maximum(np.array(mt.actuator_actadr), 0))
    inp = jnp.where(
        dyn_none[:, None],
        ctrl,
        d.act[actadr] if mt.na else jnp.zeros((mt.nu, B), dtype),
    )

    gp, bp = m.actuator_gainprm, m.actuator_biasprm
    gain_fixed = jnp.asarray(np.array(mt.actuator_gaintype) == SM.GAIN_FIXED)
    bias_none = jnp.asarray(np.array(mt.actuator_biastype) == SM.BIAS_NONE)
    gain = jnp.where(
        gain_fixed[:, None],
        gp[:, 0],
        gp[:, 0] + gp[:, 1] * length + gp[:, 2] * velocity,
    ).astype(dtype)
    bias = jnp.where(
        bias_none[:, None],
        0.0,
        bp[:, 0] + bp[:, 1] * length + bp[:, 2] * velocity,
    ).astype(dtype)

    force = gain * inp + bias
    flimited = jnp.asarray(mt.actuator_forcelimited, bool)[:, None]
    force = jnp.where(
        flimited,
        jnp.clip(
            force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1]
        ),
        force,
    )
    qfrc = jnp.einsum("uvb,ub->vb", moment, force)
    return dataclasses.replace(
        d,
        actuator_length=length,
        actuator_velocity=velocity,
        actuator_force=force,
        qfrc_actuator=qfrc,
    )


def act_dot(m: T.Model, d: T.Data):
    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    if not mt.na:
        return jnp.zeros((0, B), dtype)
    sel = [u for u in range(mt.nu) if mt.actuator_dyntype[u] != SM.DYN_NONE]
    ui = jnp.asarray(np.array(sel))
    aadr = jnp.asarray(np.array([mt.actuator_actadr[u] for u in sel]))
    is_integ = jnp.asarray(
        np.array([mt.actuator_dyntype[u] == SM.DYN_INTEGRATOR for u in sel])
    )
    tau = jnp.maximum(m.actuator_dynprm[ui, 0], 1e-8)  # (k, Bm)
    vals = jnp.where(
        is_integ[:, None], d.ctrl[ui], (d.ctrl[ui] - d.act[aadr]) / tau
    ).astype(dtype)
    return jnp.zeros((mt.na, B), dtype).at[aadr].set(vals)


def fwd_passive(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    dtype = d.qpos.dtype
    qfrc = -m.dof_damping * d.qvel

    sel = [j for j in range(mt.njnt) if mt.jnt_type[j] in (T.HINGE, T.SLIDE)]
    if sel:
        ji = jnp.asarray(np.array(sel))
        qi = jnp.asarray(np.array([mt.jnt_qposadr[j] for j in sel]))
        di = jnp.asarray(np.array([mt.jnt_dofadr[j] for j in sel]))
        qfrc = qfrc.at[di].add(
            -m.jnt_stiffness[ji] * (d.qpos[qi] - m.qpos_spring[qi])
        )

    if mt.ntendon:
        lo = m.tendon_lengthspring[:, 0]
        hi = m.tendon_lengthspring[:, 1]
        dsp = jnp.where(
            d.ten_length < lo, d.ten_length - lo,
            jnp.where(d.ten_length > hi, d.ten_length - hi, 0.0),
        )
        frc = -m.tendon_stiffness * dsp - m.tendon_damping * d.ten_velocity
        qfrc = qfrc + jnp.einsum("tvb,tb->vb", d.ten_J, frc)

    if mt.opt.density > 0 or mt.opt.viscosity > 0:
        qfrc = qfrc + _inertia_box_fluid(m, d)

    return dataclasses.replace(d, qfrc_passive=qfrc)


def _inertia_box_fluid(m: T.Model, d: T.Data):
    """Translation of smooth._inertia_box_fluid (Swimmer density/viscosity)."""
    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    rho, beta = mt.opt.density, mt.opt.viscosity
    qfrc = jnp.zeros((mt.nv, B), dtype)
    masks = jnp.asarray(CST._body_dof_masks(mt), dtype)
    for b in range(1, mt.nbody):
        mass = m.body_mass[b]  # (Bm,)
        inert = m.body_inertia[b]  # (3, Bm)
        box = jnp.sqrt(
            jnp.maximum(
                1e-12,
                jnp.stack(
                    [
                        inert[1] + inert[2] - inert[0],
                        inert[0] + inert[2] - inert[1],
                        inert[0] + inert[1] - inert[2],
                    ]
                )
                / jnp.maximum(mass, 1e-12)
                * 6.0,
            )
        ) / 2.0  # (3, Bm)
        o = d.subtree_com[mt.body_rootid[b]]  # (3, B)
        w_world = d.cvel[b, :3]
        v_world = d.cvel[b, 3:] + cross3(w_world, d.xipos[b] - o)
        Rm = d.ximat[b]  # (3, 3, B)
        w = jnp.einsum("ijb,ib->jb", Rm, w_world)
        v = jnp.einsum("ijb,ib->jb", Rm, v_world)
        lfrc_t = jnp.zeros((3, B), dtype)
        lfrc_f = jnp.zeros((3, B), dtype)
        if beta > 0:
            diam = jnp.mean(box, axis=0) * 2.0  # (Bm,)
            lfrc_f = lfrc_f - 3.0 * jnp.pi * diam * beta * v
            lfrc_t = lfrc_t - jnp.pi * diam ** 3 * beta * w
        if rho > 0:
            b0, b1, b2 = box[0], box[1], box[2]
            area = jnp.stack([b1 * b2, b0 * b2, b0 * b1]) * 4.0
            lfrc_f = lfrc_f - 0.5 * rho * area * jnp.abs(v) * v
            scl = jnp.stack(
                [
                    b0 * (b1 ** 4 + b2 ** 4),
                    b1 * (b0 ** 4 + b2 ** 4),
                    b2 * (b0 ** 4 + b1 ** 4),
                ]
            )
            lfrc_t = lfrc_t - rho * scl * jnp.abs(w) * w / 64.0 * 32.0
        f_world = jnp.einsum("ijb,jb->ib", Rm, lfrc_f)
        t_world = jnp.einsum("ijb,jb->ib", Rm, lfrc_t)
        off = d.xipos[b] - o
        mk = masks[b][:, None, None]
        jacp = (d.cdof[:, 3:] + cross3(d.cdof[:, :3], off[None])) * mk
        jacr = d.cdof[:, :3] * mk
        qfrc = qfrc + jnp.einsum("vcb,cb->vb", jacp, f_world) \
            + jnp.einsum("vcb,cb->vb", jacr, t_world)
    return qfrc


# ---------------------------------------------------------------------------
# Collision (SoA-native narrowphase core from collision_vec)
# ---------------------------------------------------------------------------


def collision(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    n_total = COL.ncon(m)
    pruned = COL.prune_plan(mt).active

    # Without pair-topk pruning geom ids are static per model: kept UNBATCHED
    # (ncon,) inside the SoA pipeline and marked out_batched=False at the
    # custom_vmap boundary — avoids an (ncon, B) int broadcast (357 MB at
    # kitchen's 10.9k slots, B=8192) that the AoS scan carry used to
    # materialize. With pruning the table is compact and per-lane: geom ids
    # ride (ncon_c, B) through Contact.src.
    g1s_np, g2s_np = CV.slot_geoms_static(mt)
    geom1 = jnp.asarray(g1s_np)
    geom2 = jnp.asarray(g2s_np)

    if not mt.pairs or mt.opt.disable_contact:
        if pruned:
            # The custom_vmap boundary marks geom1/geom2 batched whenever
            # src is present, so emit them (n_total, B) here too (gathered
            # through src like the live branch; values are inert — every
            # dist is _BIG).
            src = jnp.zeros((n_total, B), jnp.int32)
            geom1 = jnp.take(geom1, src)
            geom2 = jnp.take(geom2, src)
        else:
            src = None
            geom1 = geom1[:n_total]
            geom2 = geom2[:n_total]
        contact = T.Contact(
            dist=jnp.full((n_total, B), _BIG, dtype),
            pos=jnp.zeros((n_total, 3, B), dtype),
            frame=jnp.broadcast_to(
                jnp.eye(3, dtype=dtype)[None, :, :, None], (n_total, 3, 3, B)
            ),
            geom1=geom1,
            geom2=geom2,
            src=src,
        )
        return dataclasses.replace(d, contact=contact)

    core = CV._make_narrowphase_core(mt)
    hv = m.hull_vert
    hf = m.hull_face
    if hv is None:
        hv = jnp.zeros((1, 1, 3), dtype)
        hf = jnp.zeros((1, 1, 4), dtype)
    gmarg = m.geom_margin
    dist, pos, frame, src = core(
        d.geom_xpos, d.geom_xmat, m.geom_size, hv, hf, geom_margin=gmarg
    )
    if pruned:
        geom1 = jnp.take(jnp.asarray(g1s_np), src)    # (ncon_c, B)
        geom2 = jnp.take(jnp.asarray(g2s_np), src)
    contact = T.Contact(
        dist=dist.astype(dtype),
        pos=pos.astype(dtype),
        frame=frame.astype(dtype),
        geom1=geom1,
        geom2=geom2,
        src=src,
    )
    return dataclasses.replace(d, contact=contact)


# ---------------------------------------------------------------------------
# Constraint rows (translation of constraint.build_rows, batch-last: J blocks
# (rows, nv, B), scalars-per-row (rows, B)). Row ORDER matches the AoS
# builder so the decode layout below stays self-consistent.
# ---------------------------------------------------------------------------


def _impedance(solimp, pos):
    """solimp (rows, 5, Bm), pos (rows, B) -> (rows, B)."""
    dmin = jnp.clip(solimp[:, 0], 0.0001, 0.9999)
    dmax = jnp.clip(solimp[:, 1], 0.0001, 0.9999)
    width, mid = solimp[:, 2], solimp[:, 3]
    power = jnp.maximum(solimp[:, 4], 1.0)
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-10), 0.0, 1.0)
    y1 = (mid ** (1.0 - power)) * (x ** power)
    y2 = 1.0 - ((1.0 - mid) ** (1.0 - power)) * ((1.0 - x) ** power)
    y = jnp.where(x < mid, y1, y2)
    return dmin + (dmax - dmin) * y


def _kbi(solref, solimp, pos, dt):
    d_ = _impedance(solimp, pos)
    dmax = jnp.clip(solimp[:, 1], 0.0001, 0.9999)
    timeconst, dampratio = solref[:, 0], solref[:, 1]
    direct = timeconst <= 0
    tc = jnp.maximum(timeconst, 2.0 * dt)
    b = jnp.where(direct, -solref[:, 1], 2.0 / (dmax * tc))
    k = jnp.where(
        direct,
        -solref[:, 0],
        1.0 / (dmax * dmax * tc * tc * jnp.maximum(dampratio, 1e-8) ** 2),
    )
    return d_, b, k


def _jacp_static(m, d, masks_np, point, bodies_np):
    """Point jacobian rows for a STATIC body list: point (k, 3, B),
    bodies (k,) numpy -> jacp (k, nv, 3, B)."""
    roots = np.array(m.meta.body_rootid)
    o = d.subtree_com[jnp.asarray(roots[bodies_np])]          # (k, 3, B)
    off = point - o
    jacp = d.cdof[None, :, 3:] + cross3(
        jnp.broadcast_to(d.cdof[None, :, :3], (len(bodies_np),) + d.cdof[:, :3].shape),
        off[:, None],
    )
    mk = jnp.asarray(masks_np[bodies_np])[:, :, None, None]   # (k, nv, 1, 1)
    return jacp * mk


def _jacs_traced(m, d, masks_np, point, bodies):
    """(jacp, jacr) for TRACED per-lane body ids: point (k, 3, B),
    bodies (k, B) int -> each (k, nv, 3, B)."""
    roots = jnp.asarray(np.array(m.meta.body_rootid))
    o = jnp.take_along_axis(d.subtree_com, roots[bodies][:, None, :], axis=0)
    off = point - o                                           # (k, 3, B)
    k = bodies.shape[0]
    cdof_r = jnp.broadcast_to(
        d.cdof[None, :, :3], (k,) + d.cdof[:, :3].shape
    )
    jacp = d.cdof[None, :, 3:] + cross3(cdof_r, off[:, None])
    mk = jnp.moveaxis(jnp.take(jnp.asarray(masks_np), bodies, axis=0), 1, -1)
    mk = mk[:, :, None, :]                                    # (k, nv, 1, B)
    return jacp * mk, cdof_r * mk


def _concrete(x):
    """numpy view of a model field when it is compile-time concrete (not a
    tracer from per-env aux-rebinding, e.g. Adroit body_pos), else None."""
    if isinstance(x, jax.core.Tracer):
        return None
    return np.asarray(x)


class _SlotPack:
    """All per-static-slot lookups of the traced contact path packed into
    ONE int32 per slot + tiny unique-value tables.

    The traced path (pair-topk / contact_cap) must gather body ids and
    solref/solimp/friction/includemargin by per-lane slot id. On TPU each
    per-lane gather over the static table serializes; but every one of these
    tables has only a handful of distinct rows (<= 5 across all families),
    so each slot reduces to (b1, b2, 4 small codes) packed in one word: one
    int gather replaces ~7, and the values come back via one-hot einsums
    over the tiny unique tables (MXU, exact 0/1 weights)."""

    def __init__(self, m: T.Model, mt: T.Meta):
        self.ok = False
        self._nbody = mt.nbody
        import os

        if os.environ.get("GRT_NO_SLOTPACK"):  # perf A/B switch (tools/)
            return
        flds = [_concrete(m.con_solref), _concrete(m.con_solimp),
                _concrete(m.con_friction), _concrete(m.con_includemargin)]
        if any(f is None for f in flds):
            return
        sr, si, mu, mg = flds
        # trailing aux batch lane: compile-time constant -> lane 0
        if sr.ndim == 3:
            sr = sr[..., 0]
        if si.ndim == 3:
            si = si[..., 0]
        if mu.ndim == 3:
            mu = mu[..., 0]
        if mg.ndim == 2:
            mg = mg[..., 0]
        gb = mt.geom_bodyid
        slot_geoms = CST._slot_geoms(mt)
        b1s = np.array([gb[g1] for g1, _ in slot_geoms])
        b2s = np.array([gb[g2] for _, g2 in slot_geoms])

        def codes(a):
            uniq, inv = np.unique(a, axis=0, return_inverse=True)
            return uniq, inv.astype(np.int64)

        self.sr_u, c_sr = codes(sr)
        self.si_u, c_si = codes(si)
        self.mu_u, c_mu = codes(mu)
        self.mg_u, c_mg = codes(mg[:, None])
        self.mg_u = self.mg_u[:, 0]

        def width(n):
            return max(int(n - 1).bit_length(), 1)

        fields = [(b1s, width(mt.nbody)), (b2s, width(mt.nbody)),
                  (c_sr, width(len(self.sr_u))),
                  (c_si, width(len(self.si_u))),
                  (c_mu, width(len(self.mu_u))),
                  (c_mg, width(len(self.mg_u)))]
        if sum(w for _, w in fields) > 31:
            return  # exotic model: fall back to plain gathers
        pack = np.zeros(len(b1s), np.int64)
        self.offs, self.widths = [], []
        off = 0
        for vals, w in fields:
            pack |= vals.astype(np.int64) << off
            self.offs.append(off)
            self.widths.append(w)
            off += w
        self.pack = pack.astype(np.int32)
        self.ok = True

    def field(self, pk, i):
        return (pk >> self.offs[i]) & ((1 << self.widths[i]) - 1)

    def unpack(self, pk, dtype):
        """pk (k, B) packed words -> (ohb1, ohb2 (k, B, nbody), sr (k, 2, B),
        si (k, 5, B), mu (k, 5, B), iw (k, B))."""
        hi = jax.lax.Precision.HIGHEST
        ohb1 = jax.nn.one_hot(self.field(pk, 0), self._nbody, dtype=dtype)
        ohb2 = jax.nn.one_hot(self.field(pk, 1), self._nbody, dtype=dtype)
        sr = jnp.einsum(
            "kbu,uc->kcb",
            jax.nn.one_hot(self.field(pk, 2), len(self.sr_u), dtype=dtype),
            jnp.asarray(self.sr_u, dtype), precision=hi)
        si = jnp.einsum(
            "kbu,uc->kcb",
            jax.nn.one_hot(self.field(pk, 3), len(self.si_u), dtype=dtype),
            jnp.asarray(self.si_u, dtype), precision=hi)
        mu = jnp.einsum(
            "kbu,uc->kcb",
            jax.nn.one_hot(self.field(pk, 4), len(self.mu_u), dtype=dtype),
            jnp.asarray(self.mu_u, dtype), precision=hi)
        return ohb1, ohb2, sr, si, mu

    def margin(self, pk, dtype):
        hi = jax.lax.Precision.HIGHEST
        oh = jax.nn.one_hot(self.field(pk, 5), len(self.mg_u), dtype=dtype)
        return jnp.einsum("rbu,u->rb", oh, jnp.asarray(self.mg_u, dtype),
                          precision=hi)


def _jacs_onehot(m, d, masks_np, point, ohb):
    """(jacp, jacr) like _jacs_traced, but body selection via one-hot
    einsums (ohb (k, B, nbody)) instead of per-lane gathers — exact."""
    mt = m.meta
    hi = jax.lax.Precision.HIGHEST
    dtype = point.dtype
    rc = d.subtree_com[jnp.asarray(np.array(mt.body_rootid))]  # (nbody,3,B)
    o = jnp.einsum("kbn,ncb->kcb", ohb, rc, precision=hi)
    off = point - o
    k = ohb.shape[0]
    cdof_r = jnp.broadcast_to(
        d.cdof[None, :, :3], (k,) + d.cdof[:, :3].shape
    )
    jacp = d.cdof[None, :, 3:] + cross3(cdof_r, off[:, None])
    mkv = jnp.einsum("kbn,nv->kvb", ohb, jnp.asarray(masks_np, dtype),
                     precision=hi)
    mk = mkv[:, :, None, :]                                   # (k, nv, 1, B)
    return jacp * mk, cdof_r * mk


def build_rows(m: T.Model, d: T.Data):
    """Assemble (J, aref, D, R, active, is_eq, layout) — all batch-last."""
    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    masks_np = CST._body_dof_masks(mt)

    Js, poss, pimps, srs, sis, iws, acts = [], [], [], [], [], [], []
    is_eq_list = []

    def add_block(J, pos, sr, si, iw, act, eq, p_imp=None, rows=None):
        r = J.shape[0] if rows is None else rows
        Js.append(J)
        poss.append(pos)
        pimps.append(pos if p_imp is None else p_imp)
        srs.append(_bB(sr, B))
        sis.append(_bB(si, B))
        iws.append(_bB(iw, B) if iw.ndim else jnp.full((r, B), iw, dtype))
        acts.append(jnp.broadcast_to(act, (r, B)))
        is_eq_list.extend([eq] * r)

    eq_groups: dict = {}
    for e in range(mt.neq):
        eq_groups.setdefault(mt.eq_type[e], []).append(e)

    if T.EQ_CONNECT in eq_groups:
        es = np.array(eq_groups[T.EQ_CONNECT])
        b1 = np.array([mt.eq_obj1id[e] for e in es])
        b2 = np.array([mt.eq_obj2id[e] for e in es])
        a1 = _bB(m.eq_data[es, 0:3], B)
        a2 = _bB(m.eq_data[es, 3:6], B)
        p1 = d.xpos[b1] + matvec(d.xmat[b1], a1)
        p2 = d.xpos[b2] + matvec(d.xmat[b2], a2)
        jp1 = _jacp_static(m, d, masks_np, p1, b1)
        jp2 = _jacp_static(m, d, masks_np, p2, b2)
        Jr = jnp.swapaxes(jp1 - jp2, 1, 2)                    # (k, 3, nv, B)
        err = p1 - p2                                         # (k, 3, B)
        iw = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
        nrm = jnp.sqrt(jnp.sum(err * err, axis=1))            # (k, B)
        k = len(es)
        add_block(
            Jr.reshape(k * 3, mt.nv, B), err.reshape(k * 3, B),
            jnp.repeat(m.eq_solref[es], 3, axis=0),
            jnp.repeat(m.eq_solimp[es], 3, axis=0),
            jnp.repeat(iw, 3, axis=0),
            jnp.repeat(d.eq_active[es], 3, axis=0), True,
            p_imp=jnp.repeat(nrm, 3, axis=0),
        )
    if T.EQ_WELD in eq_groups:
        es = np.array(eq_groups[T.EQ_WELD])
        b1 = np.array([mt.eq_obj1id[e] for e in es])
        b2 = np.array([mt.eq_obj2id[e] for e in es])
        k = len(es)
        eqd = m.eq_data[es]                                   # (k, 11, Bm)
        anchor1, anchor2 = _bB(eqd[:, 0:3], B), _bB(eqd[:, 3:6], B)
        relpose_q = _bB(eqd[:, 6:10], B)
        torquescale = eqd[:, 10]                              # (k, Bm)
        p1 = d.xpos[b1] + matvec(d.xmat[b1], anchor1)
        p2 = d.xpos[b2] + matvec(d.xmat[b2], anchor2)
        jp1 = _jacp_static(m, d, masks_np, p1, b1)
        jp2 = _jacp_static(m, d, masks_np, p2, b2)
        mk1 = jnp.asarray(masks_np[b1])[:, :, None, None]
        mk2 = jnp.asarray(masks_np[b2])[:, :, None, None]
        jr1 = jnp.broadcast_to(
            d.cdof[None, :, :3], (k,) + d.cdof[:, :3].shape
        ) * mk1
        jr2 = jnp.broadcast_to(
            d.cdof[None, :, :3], (k,) + d.cdof[:, :3].shape
        ) * mk2
        Jp = jnp.swapaxes(jp1 - jp2, 1, 2)                    # (k, 3, nv, B)
        err_p = p1 - p2
        q1, q2 = d.xquat[b1], d.xquat[b2]
        q2t = quat_mul(q2, relpose_q)
        qerr = quat_mul(quat_conj(q2t), q1)
        err_q = qerr[:, 1:4] * torquescale[:, None]           # (k, 3, B)
        # A[:, :, j] = vec(conj(q2t) e_j q1): Jacobian of the quaternion error
        cols = []
        for j in range(3):
            ej = jnp.zeros((k, 4, B), dtype).at[:, 1 + j].set(1.0)
            cols.append(quat_mul(quat_mul(quat_conj(q2t), ej), q1)[:, 1:4])
        A = jnp.stack(cols, axis=2)                           # (k, 3, 3, B)
        jr_diff = jnp.swapaxes(jr1 - jr2, 1, 2)               # (k, 3, nv, B)
        Jr = 0.5 * torquescale[:, None, None] * jnp.einsum(
            "kijb,kjvb->kivb", A, jr_diff
        )
        nrm = jnp.sqrt(
            jnp.sum(err_p * err_p, axis=1) + jnp.sum(err_q * err_q, axis=1)
        )
        J6 = jnp.concatenate([Jp, Jr], axis=1).reshape(k * 6, mt.nv, B)
        pos6 = jnp.concatenate([err_p, err_q], axis=1).reshape(k * 6, B)
        iw_t = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
        iw_r = m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
        iw6 = jnp.stack([iw_t] * 3 + [iw_r] * 3, axis=1).reshape(k * 6, -1)
        add_block(
            J6, pos6,
            jnp.repeat(m.eq_solref[es], 6, axis=0),
            jnp.repeat(m.eq_solimp[es], 6, axis=0),
            iw6,
            jnp.repeat(d.eq_active[es], 6, axis=0), True,
            p_imp=jnp.repeat(nrm, 6, axis=0),
        )
    if T.EQ_JOINT in eq_groups:
        for e in eq_groups[T.EQ_JOINT]:
            j1, j2 = mt.eq_obj1id[e], mt.eq_obj2id[e]
            data = m.eq_data[e]                               # (11, Bm)
            q1 = d.qpos[mt.jnt_qposadr[j1]] - m.qpos0[mt.jnt_qposadr[j1]]
            da1 = mt.jnt_dofadr[j1]
            row = jnp.zeros((mt.nv, B), dtype).at[da1].set(1.0)
            if j2 >= 0:
                q2 = d.qpos[mt.jnt_qposadr[j2]] - m.qpos0[mt.jnt_qposadr[j2]]
                poly = (
                    data[0] + data[1] * q2 + data[2] * q2 ** 2
                    + data[3] * q2 ** 3 + data[4] * q2 ** 4
                )
                dpoly = (
                    data[1] + 2 * data[2] * q2 + 3 * data[3] * q2 ** 2
                    + 4 * data[4] * q2 ** 3
                )
                row = row.at[mt.jnt_dofadr[j2]].set(-_bB(dpoly, B))
                err = q1 - poly
            else:
                err = q1 - data[0]
            add_block(
                row[None], _bB(err, B)[None], m.eq_solref[e][None],
                m.eq_solimp[e][None], m.dof_invweight0[da1][None],
                d.eq_active[e][None], True,
            )
    if T.EQ_TENDON in eq_groups:
        for e in eq_groups[T.EQ_TENDON]:
            t1 = mt.eq_obj1id[e]
            err = d.ten_length[t1] - m.eq_data[e, 0]
            add_block(
                d.ten_J[t1][None], _bB(err, B)[None], m.eq_solref[e][None],
                m.eq_solimp[e][None], m.tendon_invweight0[t1][None],
                d.eq_active[e][None], True,
            )

    lim = [
        j for j in range(mt.njnt)
        if mt.jnt_limited[j] and not mt.opt.disable_limit
        and mt.jnt_type[j] in (T.HINGE, T.SLIDE)
    ]
    if lim:
        n_jlim = len(lim)
        ji = np.array(lim)
        qi = np.array([mt.jnt_qposadr[j] for j in lim])
        di = np.array([mt.jnt_dofadr[j] for j in lim])
        q = d.qpos[jnp.asarray(qi)]                           # (k, B)
        dist_lo = q - m.jnt_range[ji, 0]
        dist_hi = m.jnt_range[ji, 1] - q
        lo_closer = dist_lo < dist_hi
        dist = jnp.where(lo_closer, dist_lo, dist_hi)
        sign = jnp.where(lo_closer, 1.0, -1.0).astype(dtype)
        margin = _bB(m.jnt_margin[ji], B)
        rows = jnp.zeros((n_jlim, mt.nv, B), dtype).at[
            (jnp.arange(n_jlim), jnp.asarray(di))
        ].set(sign)
        add_block(
            rows, dist - margin, m.jnt_solref[ji], m.jnt_solimp[ji],
            m.dof_invweight0[di], dist < margin, False,
        )

    tlim = [
        t for t in range(mt.ntendon)
        if mt.tendon_limited[t] and not mt.opt.disable_limit
    ]
    if tlim:
        ti = np.array(tlim)
        nt = len(tlim)
        margin = _bB(m.tendon_margin[ti], B)                  # (nt, B)
        length = d.ten_length[ti]
        dist_lo = length - m.tendon_range[ti, 0]
        dist_hi = m.tendon_range[ti, 1] - length
        tj = d.ten_J[ti]                                      # (nt, nv, B)
        J2 = jnp.stack([tj, -tj], axis=1).reshape(2 * nt, mt.nv, B)
        pos2 = jnp.stack([dist_lo, dist_hi], axis=1).reshape(2 * nt, B)
        act2 = jnp.stack(
            [dist_lo < margin, dist_hi < margin], axis=1
        ).reshape(2 * nt, B)
        add_block(
            J2, pos2 - jnp.repeat(margin, 2, axis=0),
            jnp.repeat(m.tendon_solref_lim[ti], 2, axis=0),
            jnp.repeat(m.tendon_solimp_lim[ti], 2, axis=0),
            jnp.repeat(m.tendon_invweight0[ti], 2, axis=0),
            act2, False,
        )

    # --- contacts (pyramidal), per condim group with optional top-K capping;
    # under the cap the K deepest slots are selected PER ENV (traced sel).
    # With pair-topk pruning (Contact.src) every slot takes the traced path:
    # per-slot params are gathered through src from the FULL static tables.
    # Per-slot model params (solref/solimp/friction/invweight) are read from
    # batch lane 0 in the traced path: they are compile-time model constants
    # for every supported family (Adroit randomizes body_pos only).
    c = d.contact
    pruned = c.src is not None
    cond_arr = (
        COL.compact_condim(mt) if pruned else np.array(mt.con_condim)
    )
    ncon = len(cond_arr)
    con_layout = []
    n_loop = len(is_eq_list)
    if ncon:
        gb = mt.geom_bodyid
        slot_geoms = CST._slot_geoms(mt)
        b1s_np = np.array([gb[g1] for g1, _ in slot_geoms])
        b2s_np = np.array([gb[g2] for _, g2 in slot_geoms])
        sp = getattr(mt.opt, "slot_pack", "auto")
        use_pack = sp is True or sp == "force" or (
            sp == "auto" and jax.default_backend() == "tpu"
        )
        pk_tbl = _SlotPack(m, mt) if use_pack else None
        if pk_tbl is not None and not pk_tbl.ok:
            pk_tbl = None
        packed_c = None
        if pruned and pk_tbl is not None:
            # ONE per-lane gather fetches every slot lookup at once
            packed_c = jnp.take(jnp.asarray(pk_tbl.pack), c.src)  # (ncon, B)
            pen_all = c.dist - pk_tbl.margin(packed_c, dtype)
        elif pruned:
            pen_all = c.dist - jnp.take(m.con_includemargin[..., 0], c.src)
        else:
            pen_all = c.dist - m.con_includemargin            # (ncon, B)
        cap = getattr(mt.opt, "contact_cap", 0)
        biw_t = m.body_invweight0[:, 0]                       # (nbody, Bm)

        # deepest-`cap` selection per condim group: ONE K-round-argmin pallas
        # call for ALL capped groups (narrowphase_pallas.topk_select — the
        # same selection, set AND first-index tie order, as the lane-axis
        # lax.top_k below, whose sort over (B, ~250) columns x3 groups was
        # ~6 ms of kitchen's build_rows). f32-only and kernel-gated; other
        # configs keep the XLA sort.
        from gymnasium_robotics_tpu.physics import narrowphase_pallas as NPK

        sel_orders = {}
        capped_cds = [
            cd for cd in sorted(set(cond_arr.tolist()))
            if cap and len(np.nonzero(cond_arr == cd)[0]) > cap
        ]
        if capped_cds and NPK.use_np_kernel(mt) and dtype == jnp.float32:
            idxs = [np.nonzero(cond_arr == cd)[0] for cd in capped_cds]
            maxg = max(len(ix) for ix in idxs)
            pen_b = _bB(pen_all, B)
            rows_np = np.stack([
                np.concatenate([ix, np.full(maxg - len(ix), ix[-1])])
                for ix in idxs
            ])
            mask_np = np.stack(
                [np.arange(maxg) < len(ix) for ix in idxs]
            )
            order_all = NPK.topk_select(
                pen_b[jnp.asarray(rows_np)], mask_np, cap,
                interpret=jax.default_backend() != "tpu",
            )                                                 # (G, cap, B)
            for gi, cd in enumerate(capped_cds):
                sel_orders[cd] = order_all[gi]                # (cap, B)

        for cd in sorted(set(cond_arr.tolist())):
            idx = np.nonzero(cond_arr == cd)[0]
            capped = bool(cap) and len(idx) > cap
            traced = capped or pruned
            if capped:
                pen_g = _bB(pen_all, B)[jnp.asarray(idx)]     # (g, B)
                if cd in sel_orders:
                    order = jnp.swapaxes(sel_orders[cd], 0, 1)  # (B, cap)
                else:
                    _, order = jax.lax.top_k(-pen_g.T, cap)   # (B, cap)
                sel_c = jnp.asarray(idx)[order].T             # (cap, B)
                k = cap
                pos_s = jnp.take_along_axis(c.pos, sel_c[:, None, :], axis=0)
                frame_s = jnp.take_along_axis(
                    c.frame, sel_c[:, None, None, :], axis=0
                )
                pen = jnp.take_along_axis(pen_g, order.T, axis=0)
                sel = (
                    jnp.take_along_axis(c.src, sel_c, axis=0) if pruned
                    else sel_c
                )                                             # static slot ids
            elif pruned:
                k = len(idx)
                sel_c = idx
                pos_s = c.pos[jnp.asarray(idx)]
                frame_s = c.frame[jnp.asarray(idx)]
                pen = pen_all[jnp.asarray(idx)]
                sel = c.src[jnp.asarray(idx)]                 # (k, B)
            else:
                sel_c = sel = idx
                k = len(idx)
                pos_s = c.pos[jnp.asarray(idx)]
                frame_s = c.frame[jnp.asarray(idx)]
                pen = pen_all[jnp.asarray(idx)]
                pen = jnp.broadcast_to(pen, (k, B))
            if traced and pk_tbl is not None:
                # packed-word decode + one-hot einsums: no per-lane gathers
                # beyond the single packed fetch (TPU; exact — see _SlotPack)
                if packed_c is not None:
                    pk = (jnp.take_along_axis(packed_c, sel_c, axis=0)
                          if capped else packed_c[jnp.asarray(idx)])
                else:
                    pk = jnp.take(jnp.asarray(pk_tbl.pack), sel)
                ohb1, ohb2, sr_s, si_s, mu_s = pk_tbl.unpack(pk, dtype)
                hi_p = jax.lax.Precision.HIGHEST
                bw = (biw_t[..., 0] if biw_t.ndim > 1 else biw_t).astype(dtype)
                iw_c = (
                    jnp.einsum("kbn,n->kb", ohb1, bw, precision=hi_p)
                    + jnp.einsum("kbn,n->kb", ohb2, bw, precision=hi_p)
                )
                jp1, jr1 = _jacs_onehot(m, d, masks_np, pos_s, ohb1)
                jp2, jr2 = _jacs_onehot(m, d, masks_np, pos_s, ohb2)
            elif traced:
                b1 = jnp.take(jnp.asarray(b1s_np), sel)       # (k, B)
                b2 = jnp.take(jnp.asarray(b2s_np), sel)
                iw_c = jnp.take(biw_t[..., 0], b1) + jnp.take(biw_t[..., 0], b2)
                sr_s = jnp.moveaxis(
                    jnp.take(m.con_solref[..., 0], sel, axis=0), 1, -1
                )                                             # (k, 2, B)
                si_s = jnp.moveaxis(
                    jnp.take(m.con_solimp[..., 0], sel, axis=0), 1, -1
                )
                mu_s = jnp.moveaxis(
                    jnp.take(m.con_friction[..., 0], sel, axis=0), 1, -1
                )
                jp1, jr1 = _jacs_traced(m, d, masks_np, pos_s, b1)
                jp2, jr2 = _jacs_traced(m, d, masks_np, pos_s, b2)
            else:
                iw_c = biw_t[b1s_np[idx]] + biw_t[b2s_np[idx]]  # (k, Bm)
                sr_s = m.con_solref[jnp.asarray(idx)]
                si_s = m.con_solimp[jnp.asarray(idx)]
                mu_s = _bB(m.con_friction[jnp.asarray(idx)], B)
                jp1 = _jacp_static(m, d, masks_np, pos_s, b1s_np[idx])
                jp2 = _jacp_static(m, d, masks_np, pos_s, b2s_np[idx])
                mk1 = jnp.asarray(masks_np[b1s_np[idx]])[:, :, None, None]
                mk2 = jnp.asarray(masks_np[b2s_np[idx]])[:, :, None, None]
                cdof_r = jnp.broadcast_to(
                    d.cdof[None, :, :3], (k,) + d.cdof[:, :3].shape
                )
                jr1, jr2 = cdof_r * mk1, cdof_r * mk2
            con_layout.append((cd, sel_c, traced, sel))

            Jp = jp2 - jp1                                    # (k, nv, 3, B)
            Jr = jr2 - jr1
            Jn = jnp.einsum("kvcb,kcb->kvb", Jp, frame_s[:, 0])
            act_c = pen < 0.0
            if cd == 1:
                add_block(Jn, pen, sr_s, si_s, iw_c, act_c, False)
            else:
                axes = [
                    jnp.einsum("kvcb,kcb->kvb", Jp, frame_s[:, 1]),
                    jnp.einsum("kvcb,kcb->kvb", Jp, frame_s[:, 2]),
                ]
                if cd > 3:
                    axes.append(
                        jnp.einsum("kvcb,kcb->kvb", Jr, frame_s[:, 0])
                    )
                if cd > 4:
                    axes.append(
                        jnp.einsum("kvcb,kcb->kvb", Jr, frame_s[:, 1])
                    )
                    axes.append(
                        jnp.einsum("kvcb,kcb->kvb", Jr, frame_s[:, 2])
                    )
                # one stacked expression for all 2*(cd-1) pyramid edges
                # (row order [i+, i-, ...] blocks of k preserved — the decode
                # layout and the AoS builder depend on it)
                nfr = cd - 1
                ax_st = jnp.stack(axes)                       # (nfr,k,nv,B)
                mu_st = jnp.moveaxis(
                    jnp.broadcast_to(mu_s[:, :nfr], (k, nfr, B)), 1, 0
                )                                             # (nfr,k,B)
                edge = mu_st[:, :, None] * ax_st
                Jpy = jnp.stack([Jn[None] + edge, Jn[None] - edge], axis=1)
                iwp = 2.0 * mu_st * mu_st * (1.0 + mu_st * mu_st) * iw_c
                iw_py = jnp.broadcast_to(iwp[:, None], (nfr, 2, k, B))
                R2k = 2 * nfr * k
                add_block(
                    Jpy.reshape(R2k, mt.nv, B),
                    jnp.broadcast_to(
                        jnp.broadcast_to(pen, (k, B))[None, None],
                        (nfr, 2, k, B),
                    ).reshape(R2k, B),
                    jnp.broadcast_to(
                        _bB(sr_s, B)[None, None], (nfr, 2, k, 2, B)
                    ).reshape(R2k, 2, B),
                    jnp.broadcast_to(
                        _bB(si_s, B)[None, None], (nfr, 2, k, 5, B)
                    ).reshape(R2k, 5, B),
                    iw_py.reshape(R2k, B),
                    jnp.broadcast_to(
                        act_c[None, None], (nfr, 2, k, B)
                    ).reshape(R2k, B),
                    False,
                )

    if not Js:
        z = jnp.zeros((0, B), dtype)
        return (
            jnp.zeros((0, mt.nv, B), dtype), z, z, z,
            jnp.zeros((0, B), bool), np.zeros(0, bool), (0, []),
        )

    J = jnp.concatenate(Js)
    pos = jnp.concatenate(poss)
    pos_imp = jnp.concatenate(pimps)
    solref = jnp.concatenate(srs)
    solimp = jnp.concatenate(sis)
    invw = jnp.concatenate(iws)
    active = jnp.concatenate(acts)
    is_eq_np = np.array(is_eq_list, bool)

    dt = mt.opt.timestep
    imp, b_, k_ = _kbi(solref, solimp, pos_imp, dt)
    vel = jnp.einsum("evb,vb->eb", J, d.qvel)
    aref = -b_ * vel - k_ * imp * pos
    R = jnp.maximum((1.0 - imp) / jnp.maximum(imp, 1e-8) * invw, 1e-10)
    D = jnp.where(active, 1.0 / R, 0.0)
    return J, aref, D, R, active, is_eq_np, (n_loop, con_layout)


# ---------------------------------------------------------------------------
# Constraint solver: fused pallas Newton on TPU (solve_small_soa — the data
# is already in the kernels' lane layout), dense batch-last einsum Newton
# otherwise. The einsum path is how Kitchen (668 rows x nv=29, over the
# fused kernel's VMEM budget) gets MXU-shaped matmuls instead of the
# AoS generic path's 42x-padded per-stage kernels.
# ---------------------------------------------------------------------------


def _spd_solve(m: T.Model, M, rhs):
    """SPD solve, batch-last: M (nv, nv, B), rhs (nv, B) -> (nv, B)."""
    mt = m.meta
    fused = mt.opt.fused_solver
    use_lanes = 0 < mt.nv <= 48 and (
        fused is True or fused == "force"
        or (fused == "auto" and jax.default_backend() == "tpu")
    )
    if use_lanes:
        return SP.solve_pos_soa(
            M, rhs, interpret=jax.default_backend() != "tpu"
        )
    Mt = jnp.moveaxis(M, -1, 0)
    rt = jnp.moveaxis(rhs, -1, 0)
    x = jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(Mt), True), rt[..., None]
    )[..., 0]
    return jnp.moveaxis(x, 0, -1)


def solve_constraints(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    J, aref, D, R, active, is_eq_np, layout = build_rows(m, d)
    n_rows = J.shape[0]
    if n_rows == 0:
        return dataclasses.replace(
            d,
            qacc=d.qacc_smooth,
            qfrc_constraint=jnp.zeros((mt.nv, B), dtype),
        )
    is_eq = jnp.broadcast_to(jnp.asarray(is_eq_np)[:, None], (n_rows, B))

    fused = mt.opt.fused_solver
    use_fused = mt.nv <= 36 and n_rows * mt.nv <= 36000 and (
        fused is True or fused == "force"
        or (fused == "auto" and jax.default_backend() == "tpu")
    )
    n_iter = min(mt.opt.iterations, 20)
    n_ls = min(mt.opt.ls_iterations, 8)
    if use_fused:
        qacc, f = SP.solve_small_soa(
            d.qM, d.qacc_smooth, d.qacc, J, aref, D, active, is_eq,
            n_iter=n_iter, n_ls=n_ls,
            interpret=jax.default_backend() != "tpu",
        )
        qfrc_constraint = jnp.einsum("evb,eb->vb", J, f)
        con_force, cfrc_ext = _decode_contact_forces(m, d, f, layout)
        return dataclasses.replace(
            d, qacc=qacc, qfrc_constraint=qfrc_constraint,
            con_force=con_force, cfrc_ext=cfrc_ext,
        )

    M = d.qM
    a_smooth = d.qacc_smooth

    def x_of(a):
        return jnp.einsum("evb,vb->eb", J, a) - aref

    def active_set(x):
        return is_eq | (x < 0.0)

    def iteration(_, a):
        x = x_of(a)
        aset = active_set(x) & active
        Dw = jnp.where(aset, D, 0.0)
        grad = jnp.einsum("uvb,vb->ub", M, a - a_smooth) + jnp.einsum(
            "evb,eb->vb", J, Dw * x
        )
        H = M + jnp.einsum("evb,eb,ewb->vwb", J, Dw, J)
        p = -_spd_solve(m, H, grad)
        # exact line search on the piecewise-quadratic 1D restriction
        Jp_ = jnp.einsum("evb,vb->eb", J, p)
        Mp = jnp.einsum("uvb,vb->ub", M, p)
        pMp = jnp.sum(p * Mp, axis=0)                          # (B,)
        pMa = jnp.sum(
            p * jnp.einsum("uvb,vb->ub", M, a - a_smooth), axis=0
        )

        def ls_body(_, alpha):
            xl = x_of(a) + alpha * Jp_
            asl = active_set(xl) & active
            Dl = jnp.where(asl, D, 0.0)
            dphi = alpha * pMp + pMa + jnp.sum(Dl * xl * Jp_, axis=0)
            ddphi = pMp + jnp.sum(Dl * Jp_ * Jp_, axis=0)
            return alpha - dphi / jnp.maximum(ddphi, 1e-12)

        alpha = jax.lax.fori_loop(
            0, n_ls, ls_body, jnp.ones((B,), dtype), unroll=True
        )
        return a + jnp.clip(alpha, 0.0, 4.0) * p

    a = jax.lax.fori_loop(0, n_iter, iteration, d.qacc, unroll=2)

    x = x_of(a)
    aset = active_set(x) & active
    f = jnp.where(aset, -D * x, 0.0)
    f = jnp.where(~is_eq, jnp.maximum(f, 0.0), f)
    qfrc_constraint = jnp.einsum("evb,eb->vb", J, f)
    qacc = a_smooth + _spd_solve(m, M, qfrc_constraint)
    con_force, cfrc_ext = _decode_contact_forces(m, d, f, layout)
    return dataclasses.replace(
        d, qacc=qacc, qfrc_constraint=qfrc_constraint,
        con_force=con_force, cfrc_ext=cfrc_ext,
    )


def _decode_contact_forces(m: T.Model, d: T.Data, f, layout):
    """Pyramid -> contact-frame force per slot, then per-body com wrenches
    (translation of constraint._decode_contact_forces, batch-last). Slot
    indices are COMPACT table positions; friction is gathered through the
    static slot ids (pair-topk pruning aware)."""
    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    c = d.contact
    pruned = c.src is not None
    ncon = c.dist.shape[0]
    con_force = jnp.zeros((ncon, 6, B), dtype)
    cfrc_ext = jnp.zeros((mt.nbody, 6, B), dtype)
    if not ncon:
        return con_force, cfrc_ext
    need_cf = getattr(mt.opt, "need_con_force", "auto")
    if need_cf == "auto":
        from gymnasium_robotics_tpu.physics import sensor as SEN

        # decode only when something consumes it: touch sensors (the sole
        # in-pipeline reader) or the cfrc_ext aggregation below. Families
        # without either (kitchen/fetch/adroit/maze) skip ~2 scatter chains
        # per substep.
        need_cf = getattr(mt.opt, "need_cfrc_ext", True) or any(
            t == SEN.SENS_TOUCH for t in mt.sensor_type
        )
    if not need_cf:
        return con_force, cfrc_ext
    n_loop, con_layout = layout
    base = n_loop
    lane = jnp.arange(B)[None, :]
    for cd, sel_c, traced, sel in con_layout:
        k = sel_c.shape[0] if not isinstance(sel_c, np.ndarray) else len(sel_c)
        dyn_pos = not isinstance(sel_c, np.ndarray)
        if cd == 1:
            lam = f[base:base + k]
            if dyn_pos:
                con_force = con_force.at[sel_c, 0, lane].set(lam)
            else:
                con_force = con_force.at[jnp.asarray(sel_c), 0].set(lam)
            base += k
        else:
            nf = cd - 1
            lam = f[base:base + 2 * nf * k].reshape(nf, 2, k, B)
            normal = jnp.sum(lam, axis=(0, 1))
            if traced:
                mu = jnp.moveaxis(
                    jnp.take(m.con_friction[..., 0], sel, axis=0), 1, -1
                )
            else:
                mu = m.con_friction[jnp.asarray(sel)]
            if dyn_pos:
                con_force = con_force.at[sel_c, 0, lane].set(normal)
                for i in range(nf):
                    comp = mu[:, i] * (lam[i, 0] - lam[i, 1])
                    con_force = con_force.at[sel_c, 1 + i, lane].set(comp)
            else:
                si = jnp.asarray(sel_c)
                con_force = con_force.at[si, 0].set(normal)
                for i in range(nf):
                    comp = mu[:, i] * (lam[i, 0] - lam[i, 1])
                    con_force = con_force.at[si, 1 + i].set(comp)
            base += 2 * nf * k

    if not getattr(mt.opt, "need_cfrc_ext", True):
        return con_force, cfrc_ext

    frame = d.contact.frame                                   # (ncon, 3, 3, B)
    F_w = jnp.einsum("ckb,ckjb->cjb", con_force[:, :3], frame)
    T_w = jnp.einsum("ckb,ckjb->cjb", con_force[:, 3:], frame)

    gb = mt.geom_bodyid
    slot_geoms = CST._slot_geoms(mt)
    b1s_np = np.array([gb[g1] for g1, _ in slot_geoms])
    b2s_np = np.array([gb[g2] for _, g2 in slot_geoms])
    roots = np.array(mt.body_rootid)
    if pruned:
        b1s = jnp.take(jnp.asarray(b1s_np), c.src)            # (ncon_c, B)
        b2s = jnp.take(jnp.asarray(b2s_np), c.src)
        r = jnp.asarray(roots)
        o1 = jnp.take_along_axis(
            d.subtree_com, r[b1s][:, None, :], axis=0
        )
        o2 = jnp.take_along_axis(
            d.subtree_com, r[b2s][:, None, :], axis=0
        )
    else:
        o1 = d.subtree_com[jnp.asarray(roots[b1s_np])]
        o2 = d.subtree_com[jnp.asarray(roots[b2s_np])]
    trq2 = T_w + cross3(d.contact.pos - o2, F_w)
    trq1 = T_w + cross3(d.contact.pos - o1, F_w)
    w2 = jnp.concatenate([trq2, F_w], axis=1)
    w1 = jnp.concatenate([trq1, F_w], axis=1)
    if pruned:
        cfrc_ext = cfrc_ext.at[b2s, :, lane].add(jnp.moveaxis(w2, 1, -1))
        cfrc_ext = cfrc_ext.at[b1s, :, lane].add(-jnp.moveaxis(w1, 1, -1))
    else:
        cfrc_ext = cfrc_ext.at[jnp.asarray(b2s_np)].add(w2)
        cfrc_ext = cfrc_ext.at[jnp.asarray(b1s_np)].add(-w1)
    cfrc_ext = cfrc_ext.at[0].set(0.0)
    return con_force, cfrc_ext


# ---------------------------------------------------------------------------
# Sensors (touch): translation of sensor.sensors with the per-sensor slot
# loop vectorized over the (static) slots on the sensor's body.
# ---------------------------------------------------------------------------


def _inside_zone(site_type, size, loc):
    """size (3, Bm), loc (k, 3, B) -> (k, B) bool."""
    from gymnasium_robotics_tpu.physics import sensor as SEN

    if site_type == SEN._SPHERE:
        return jnp.sqrt(jnp.sum(loc * loc, axis=1)) <= size[0]
    if site_type == SEN._CAPSULE:
        z = jnp.clip(loc[:, 2], -size[1], size[1])
        dz = loc.at[:, 2].add(-z)
        return jnp.sqrt(jnp.sum(dz * dz, axis=1)) <= size[0]
    if site_type == SEN._ELLIPSOID:
        return jnp.sum(jnp.square(loc / size[None]), axis=1) <= 1.0
    if site_type == SEN._CYLINDER:
        r = jnp.sqrt(jnp.sum(loc[:, :2] ** 2, axis=1))
        return (r <= size[0]) & (jnp.abs(loc[:, 2]) <= size[1])
    return jnp.all(jnp.abs(loc) <= size[None] + 1e-6, axis=1)


def sensors(m: T.Model, d: T.Data) -> T.Data:
    from gymnasium_robotics_tpu.physics import sensor as SEN

    mt = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    if not mt.nsensordata:
        return d
    out = jnp.zeros((mt.nsensordata, B), dtype)
    slot_geoms = CST._slot_geoms(mt)
    pruned = d.contact.src is not None
    if pruned:
        # compact table: slot->body membership is per lane (traced src)
        gb = np.array(mt.geom_bodyid)
        b1_all = jnp.take(jnp.asarray(gb[np.array(
            [g1 for g1, _ in slot_geoms])]), d.contact.src)   # (ncon_c, B)
        b2_all = jnp.take(jnp.asarray(gb[np.array(
            [g2 for _, g2 in slot_geoms])]), d.contact.src)
    for s in range(mt.nsensor):
        if mt.sensor_type[s] != SEN.SENS_TOUCH:
            continue
        site = mt.sensor_objid[s]
        body = mt.site_bodyid[site]
        adr = mt.sensor_adr[s]
        stype = mt.site_type[site] if mt.site_type else SEN._BOX
        if pruned:
            member = (b1_all == body) | (b2_all == body)      # (ncon_c, B)
            rel = d.contact.pos - d.site_xpos[site][None]
            loc = jnp.einsum("ijb,kib->kjb", d.site_xmat[site], rel)
            inside = _inside_zone(stype, m.site_size_arr[site], loc) & member
            fn = jnp.maximum(d.con_force[:, 0], 0.0)
        else:
            cis = np.array([
                ci for ci, (g1, g2) in enumerate(slot_geoms)
                if mt.geom_bodyid[g1] == body or mt.geom_bodyid[g2] == body
            ])
            if not len(cis):
                continue
            rel = d.contact.pos[jnp.asarray(cis)] - d.site_xpos[site][None]
            loc = jnp.einsum("ijb,kib->kjb", d.site_xmat[site], rel)
            inside = _inside_zone(stype, m.site_size_arr[site], loc)
            fn = jnp.maximum(d.con_force[jnp.asarray(cis), 0], 0.0)
        out = out.at[adr].set(jnp.sum(jnp.where(inside, fn, 0.0), axis=0))
    return dataclasses.replace(d, sensordata=out)


# ---------------------------------------------------------------------------
# Integration (translations of pipeline._euler/_rk4/_integrate_qpos)
# ---------------------------------------------------------------------------


def _integrate_qpos(m: T.Model, qpos, qvel, dt):
    from gymnasium_robotics_tpu.physics import pipeline as PL

    q1, d1, qf3, df3, quat4, quatw = PL._int_plan(m.meta)
    out = qpos
    if len(q1):
        out = out.at[jnp.asarray(q1)].set(
            qpos[jnp.asarray(q1)] + dt * qvel[jnp.asarray(d1)]
        )
    if len(qf3):
        out = out.at[jnp.asarray(qf3)].set(
            qpos[jnp.asarray(qf3)] + dt * qvel[jnp.asarray(df3)]
        )
    if len(quat4):
        q = qpos[jnp.asarray(quat4)]                          # (k, 4, B)
        w = qvel[jnp.asarray(quatw)]                          # (k, 3, B)
        out = out.at[jnp.asarray(quat4)].set(quat_integrate(q, w, dt))
    return out


def _clamp_act(m: T.Model, act):
    mt = m.meta
    if not mt.na:
        return act
    sel = [u for u in range(mt.nu) if mt.actuator_dyntype[u] != SM.DYN_NONE]
    ui = jnp.asarray(np.array(sel))
    aadr = jnp.asarray(np.array([mt.actuator_actadr[u] for u in sel]))
    return act.at[aadr].set(
        jnp.clip(
            act[aadr], m.actuator_actrange[ui, 0], m.actuator_actrange[ui, 1]
        )
    )


def _euler(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    B = d.qpos.shape[-1]
    h = mt.opt.timestep
    act = _clamp_act(m, d.act + h * act_dot(m, d)) if mt.na else d.act
    if mt.has_damping:
        ar = jnp.arange(mt.nv)
        MhB = d.qM.at[ar, ar].add(h * _bB(m.dof_damping, B))
        qfrc = d.qfrc_smooth + d.qfrc_constraint
        rhs = jnp.einsum("uvb,vb->ub", d.qM, d.qvel) + h * (
            qfrc + m.dof_damping * d.qvel
        )
        qvel = _spd_solve(m, MhB, rhs)
    else:
        qvel = d.qvel + h * d.qacc
    qpos = _integrate_qpos(m, d.qpos, qvel, h)
    return dataclasses.replace(
        d, qpos=qpos, qvel=qvel, act=act, time=d.time + h
    )


def _rk4(m: T.Model, d: T.Data) -> T.Data:
    h = m.meta.opt.timestep
    A = [0.5, 0.5, 1.0]
    Bc = [1.0 / 6, 1.0 / 3, 1.0 / 3, 1.0 / 6]
    qpos0, qvel0, act0 = d.qpos, d.qvel, d.act
    kq, kv, ka = [d.qvel], [d.qacc], [act_dot(m, d)]
    dd = d
    for i in range(3):
        qpos = _integrate_qpos(m, qpos0, kq[i], A[i] * h)
        qvel = qvel0 + A[i] * h * kv[i]
        act = act0 + A[i] * h * ka[i]
        dd = dataclasses.replace(dd, qpos=qpos, qvel=qvel, act=act)
        dd = forward(m, dd)
        kq.append(dd.qvel)
        kv.append(dd.qacc)
        ka.append(act_dot(m, dd))
    vavg = sum(b * k for b, k in zip(Bc, kq))
    aavg = sum(b * k for b, k in zip(Bc, kv))
    actavg = sum(b * k for b, k in zip(Bc, ka))
    qpos = _integrate_qpos(m, qpos0, vavg, h)
    qvel = qvel0 + h * aavg
    act = _clamp_act(m, act0 + h * actavg)
    # post-step Data carries the LAST RK stage's derived fields (MuJoCo
    # mj_RungeKutta snapshot semantics; see pipeline._rk4)
    return dataclasses.replace(
        dd, qpos=qpos, qvel=qvel, act=act, time=d.time + h
    )


# ---------------------------------------------------------------------------
# Full forward + step
# ---------------------------------------------------------------------------


def forward(m: T.Model, d: T.Data) -> T.Data:
    d = kinematics(m, d)
    d = com_pos(m, d)
    d = tendon(m, d)
    d = crb(m, d)
    d = collision(m, d)
    d = com_vel(m, d)
    d = rne(m, d)
    d = fwd_passive(m, d)
    d = fwd_actuation(m, d)
    qfrc_smooth = (
        d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator + d.qfrc_applied
    )
    qacc_smooth = _spd_solve(m, d.qM, qfrc_smooth)
    d = dataclasses.replace(
        d, qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth
    )
    d = solve_constraints(m, d)
    d = sensors(m, d)
    return d


def step(m: T.Model, d: T.Data) -> T.Data:
    d = forward(m, d)
    if m.meta.opt.integrator == T.RK4:
        return _rk4(m, d)
    return _euler(m, d)


# ---------------------------------------------------------------------------
# Layout boundary: AoS (B-leading, the env layer's layout) <-> SoA
# (batch-last), entered through ONE custom_vmap around the substep loop.
# ---------------------------------------------------------------------------

_HULL_FIELDS = ("hull_vert", "hull_face")


_FK_FIELDS = (
    "qpos0", "body_pos", "body_quat", "body_ipos", "body_iquat",
    "jnt_pos", "jnt_axis", "geom_pos", "geom_quat", "site_pos", "site_quat",
)


def _fk_np_of(m: T.Model):
    """Concrete host copies of the FK constants (for the pallas FK kernel's
    compile-time unroll). Requires un-traced leaves; returns None when the
    model reaches here as tracers (e.g. a vmapped/batched model)."""
    if m.fk_np is not None:
        return m.fk_np
    tables = {}
    for name in _FK_FIELDS:
        v = getattr(m, name)
        if v is None:
            return None
        try:
            tables[name] = np.asarray(v)  # raises on traced leaves
        except Exception:
            return None
    return T.FrozenNp(tables)


def _model_to_soa(m: T.Model, mb) -> T.Model:
    """Append the broadcast batch axis to model leaves (Bm=1), or move a
    vmapped leaf's batch axis last (Bm=B). Hull tables stay unbatched."""
    repl = {}
    for fld in dataclasses.fields(T.Model):
        if fld.name in T.Model._meta:
            continue
        v = getattr(m, fld.name)
        if v is None:
            continue
        batched = bool(getattr(mb, fld.name)) if mb is not None else False
        if fld.name in _HULL_FIELDS:
            repl[fld.name] = v[0] if batched else v
        else:
            repl[fld.name] = jnp.moveaxis(v, 0, -1) if batched else v[..., None]
    fk_batched = mb is not None and any(
        bool(getattr(mb, name)) for name in _FK_FIELDS
        if getattr(mb, name, None) is not None
    )
    return dataclasses.replace(
        m, fk_np=None if fk_batched else _fk_np_of(m), **repl
    )


def _data_to_soa(d: T.Data, db, B: int) -> T.Data:
    def tx(x, b):
        if not b:
            x = jnp.broadcast_to(x, (B,) + jnp.shape(x))
        return jnp.moveaxis(x, 0, -1)

    out = jax.tree_util.tree_map(tx, d, db)
    if d.contact.src is not None:
        return out  # pair-topk: slot ids are per lane, no special case
    c = out.contact
    # static slot ids: keep unbatched inside the SoA pipeline
    g1 = c.geom1[..., 0] if c.geom1.ndim > 1 else c.geom1
    g2 = c.geom2[..., 0] if c.geom2.ndim > 1 else c.geom2
    return dataclasses.replace(
        out, contact=dataclasses.replace(c, geom1=g1, geom2=g2)
    )


def _data_from_soa(d: T.Data) -> T.Data:
    out = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, -1, 0), d)
    if d.contact.src is not None:
        return out
    return dataclasses.replace(
        out,
        contact=dataclasses.replace(
            out.contact, geom1=d.contact.geom1, geom2=d.contact.geom2
        ),
    )


def use_soa(mt: T.Meta) -> bool:
    s = getattr(mt.opt, "soa", "auto")
    return s is True or s == "force" or (
        s == "auto" and jax.default_backend() == "tpu"
    )


@functools.lru_cache(maxsize=None)
def _make_step_n(n: int):
    @jax.custom_batching.custom_vmap
    def step_n_cv(m, d, ctrl):
        from gymnasium_robotics_tpu.physics import pipeline as PL

        return PL.step_n_loop(m, d, ctrl, n)

    @step_n_cv.def_vmap
    def _rule(axis_size, in_batched, m, d, ctrl):
        mb, db, cb = in_batched
        ms = _model_to_soa(m, mb)
        ds = _data_to_soa(d, db, axis_size)
        if cb:
            cs = jnp.moveaxis(ctrl, 0, -1)
        else:
            cs = jnp.broadcast_to(ctrl[..., None], ctrl.shape + (axis_size,))
        ds = dataclasses.replace(ds, ctrl=cs)

        def body(dd, _):
            return step(ms, dd), ()

        ds, _ = jax.lax.scan(body, ds, None, length=n)
        out = _data_from_soa(ds)
        ob = jax.tree_util.tree_map(lambda _: True, out)
        if out.contact.src is None:
            ob = dataclasses.replace(
                ob,
                contact=dataclasses.replace(
                    ob.contact, geom1=False, geom2=False
                ),
            )
        return out, ob

    return step_n_cv


def step_n(m: T.Model, d: T.Data, ctrl, n: int) -> T.Data:
    """SoA n-substep entry. Unbatched calls fall back to the reference
    pipeline; under vmap the whole loop runs batch-last."""
    return _make_step_n(int(n))(m, d, ctrl)


@functools.lru_cache(maxsize=None)
def _make_kin_refresh(with_com: bool):
    @jax.custom_batching.custom_vmap
    def kin(m, d):
        from gymnasium_robotics_tpu.physics import smooth

        d = smooth.kinematics(m, d)
        return smooth.com_pos(m, d) if with_com else d

    @kin.def_vmap
    def _rule(axis_size, in_batched, m, d):
        mb, db = in_batched
        ms = _model_to_soa(m, mb)
        ds = _data_to_soa(d, db, axis_size)
        ds = kinematics(ms, ds)
        if with_com:
            ds = com_pos(ms, ds)
        out = _data_from_soa(ds)
        ob = jax.tree_util.tree_map(lambda _: True, out)
        if out.contact.src is None:
            ob = dataclasses.replace(
                ob,
                contact=dataclasses.replace(
                    ob.contact, geom1=False, geom2=False
                ),
            )
        return out, ob

    return kin


def refresh_kin(m: T.Model, d: T.Data, com: bool = True) -> T.Data:
    """Kinematics (+com_pos) refresh that stays batch-last under vmap — the
    SoA entry for env-layer callbacks that re-derive positions outside the
    substep loop (fetch block_gripper's mj_forward analogue, reset-state
    construction). The AoS vmapped level loops put 3-vectors on the TPU lane
    axis (42x padding); this routes them through the SoA stages instead."""
    return _make_kin_refresh(bool(com))(m, d)
