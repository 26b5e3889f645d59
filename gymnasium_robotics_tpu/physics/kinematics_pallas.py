"""Fused forward-kinematics pallas kernel (batch-last lanes).

soa.kinematics is the op-count-heaviest stage of the substep: the tree pass
traces ~5.4k jaxpr eqns (per-level gathers/scatters + quat chains) and costs
~6.5 ms at B=2048 on the tunneled TPU runtime where every HLO op pays a fixed
overhead — while its actual arithmetic is microseconds. This kernel runs the
ENTIRE body-tree FK — joint transforms, mocap overrides, body/geom/site world
frames — as ONE pallas program per 128-env lane block. The model constants
(body_pos/quat, jnt_pos/axis, qpos0, geom/site frames) are embedded as
compile-time immediates from Model.fk_np (see soa._model_to_soa), so the
kernel touches only qpos/mocap inputs and the pose outputs.

Semantics mirror soa.kinematics exactly (same joint-type update order, the
pre-rotation anchor/axis convention, mocap override after the body's joints);
parity is pinned by tests/test_physics_parity.py which compares the full
pipeline against MuJoCo — the reference reaches this computation through
mj_step's mj_kinematics (gymnasium_robotics/envs/robot_env.py:340-341).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from gymnasium_robotics_tpu.physics import types as T

_LANES = 128


# ---- tuple-of-(1,L) vector/quat math (compile-time constants fold in) -----


def _vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def _vscale(a, s):
    return tuple(x * s for x in a)


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _qmul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return (
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    )


def _qrot(q, v):
    """Rotate v (3-tuple; entries may be python floats or (1,L) arrays) by
    quat q (4-tuple of (1,L))."""
    qv = (q[1], q[2], q[3])
    t = _vscale(_cross(qv, v), 2.0)
    return _vadd(_vadd(v, _vscale(t, q[0])), _cross(qv, t))


def _qmat(q):
    """Quat -> row-major 9-tuple rotation matrix entries."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return (
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    )


def _qnormalize(q, eps=1e-12):
    n2 = q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]
    inv = 1.0 / jnp.maximum(jnp.sqrt(n2), eps)
    return tuple(c * inv for c in q)


def _is_ident_quat(q):
    return np.allclose(q, [1.0, 0.0, 0.0, 0.0], atol=0.0)


def _is_zero(v):
    return not np.any(v)


def _build_kernel(meta: T.Meta, fk: T.FrozenNp, dtype):
    tb = fk.tables
    body_pos = tb["body_pos"].astype(np.float64)
    body_quat = tb["body_quat"].astype(np.float64)
    body_ipos = tb["body_ipos"].astype(np.float64)
    body_iquat = tb["body_iquat"].astype(np.float64)
    jnt_pos = tb["jnt_pos"].astype(np.float64)
    jnt_axis = tb["jnt_axis"].astype(np.float64)
    qpos0 = tb["qpos0"].astype(np.float64)
    geom_pos = tb["geom_pos"].astype(np.float64)
    geom_quat = tb["geom_quat"].astype(np.float64)
    site_pos = tb["site_pos"].astype(np.float64) if meta.nsite else None
    site_quat = tb["site_quat"].astype(np.float64) if meta.nsite else None

    def kernel(qpos_ref, mpos_ref, mquat_ref, xpos_ref, xquat_ref, xmat_ref,
               xipos_ref, ximat_ref, xanchor_ref, xaxis_ref,
               gxpos_ref, gxmat_ref, sxpos_ref, sxmat_ref):
        L = qpos_ref.shape[-1]
        one = jnp.ones((1, L), dtype)
        zero = jnp.zeros((1, L), dtype)

        def qrow(i):
            return qpos_ref[i:i + 1, :]

        pos = {0: (zero, zero, zero)}
        quat = {0: (one, zero, zero, zero)}

        def write3(ref, i, v):
            for c in range(3):
                ref[3 * i + c:3 * i + c + 1, :] = (
                    v[c] if hasattr(v[c], "shape") else v[c] * one
                )

        def write4(ref, i, q):
            for c in range(4):
                ref[4 * i + c:4 * i + c + 1, :] = (
                    q[c] if hasattr(q[c], "shape") else q[c] * one
                )

        def write9(ref, i, m9):
            for c in range(9):
                ref[9 * i + c:9 * i + c + 1, :] = (
                    m9[c] if hasattr(m9[c], "shape") else m9[c] * one
                )

        for b in range(1, meta.nbody):
            p = meta.body_parentid[b]
            bp = tuple(float(x) for x in body_pos[b])
            bq = tuple(float(x) for x in body_quat[b])
            if _is_zero(body_pos[b]):
                pos_b = pos[p]
            else:
                pos_b = _vadd(pos[p], _qrot(quat[p], bp))
            if _is_ident_quat(body_quat[b]):
                quat_b = quat[p]
            else:
                quat_b = _qmul(quat[p], bq)

            for j in range(
                meta.body_jntadr[b], meta.body_jntadr[b] + meta.body_jntnum[b]
            ):
                jt = meta.jnt_type[j]
                qadr = meta.jnt_qposadr[j]
                ax_l = tuple(float(x) for x in jnt_axis[j])
                jp = tuple(float(x) for x in jnt_pos[j])
                if jt == T.FREE:
                    pos_b = (qrow(qadr), qrow(qadr + 1), qrow(qadr + 2))
                    quat_b = _qnormalize(
                        (qrow(qadr + 3), qrow(qadr + 4),
                         qrow(qadr + 5), qrow(qadr + 6))
                    )
                    anchor = pos_b
                    ax_w = _qrot(quat_b, ax_l)
                elif jt == T.BALL:
                    q4 = _qnormalize(
                        (qrow(qadr), qrow(qadr + 1),
                         qrow(qadr + 2), qrow(qadr + 3))
                    )
                    anchor = _vadd(pos_b, _qrot(quat_b, jp))
                    quat_b = _qmul(quat_b, q4)
                    pos_b = _vsub(anchor, _qrot(quat_b, jp))
                    ax_w = _qrot(quat_b, ax_l)
                elif jt == T.SLIDE:
                    qv = qrow(qadr) - float(qpos0[qadr])
                    ax_w = _qrot(quat_b, ax_l)
                    pos_b = _vadd(pos_b, _vscale(ax_w, qv))
                    anchor = _vadd(pos_b, _qrot(quat_b, jp))
                else:  # HINGE
                    qv = qrow(qadr) - float(qpos0[qadr])
                    ax_w = _qrot(quat_b, ax_l)
                    anchor = _vadd(pos_b, _qrot(quat_b, jp))
                    half = 0.5 * qv
                    s = jnp.sin(half)
                    dq = (jnp.cos(half), ax_l[0] * s, ax_l[1] * s, ax_l[2] * s)
                    quat_b = _qmul(quat_b, dq)
                    pos_b = _vsub(anchor, _qrot(quat_b, jp))
                write3(xanchor_ref, j, anchor)
                write3(xaxis_ref, j, ax_w)

            mid = meta.body_mocapid[b]
            if mid >= 0:
                pos_b = tuple(
                    mpos_ref[mid, c:c + 1, :] for c in range(3)
                )
                quat_b = _qnormalize(
                    tuple(mquat_ref[mid, c:c + 1, :] for c in range(4))
                )

            pos[b] = pos_b
            quat[b] = quat_b

        for b in range(meta.nbody):
            write3(xpos_ref, b, pos[b])
            write4(xquat_ref, b, quat[b])
            write9(xmat_ref, b, _qmat(quat[b]))
            ip = tuple(float(x) for x in body_ipos[b])
            iq = tuple(float(x) for x in body_iquat[b])
            xip = pos[b] if _is_zero(body_ipos[b]) else _vadd(
                pos[b], _qrot(quat[b], ip)
            )
            xiq = quat[b] if _is_ident_quat(body_iquat[b]) else _qmul(
                quat[b], iq
            )
            write3(xipos_ref, b, xip)
            write9(ximat_ref, b, _qmat(xiq))

        for g in range(meta.ngeom):
            b = meta.geom_bodyid[g]
            gp = tuple(float(x) for x in geom_pos[g])
            gq = tuple(float(x) for x in geom_quat[g])
            gx = pos[b] if _is_zero(geom_pos[g]) else _vadd(
                pos[b], _qrot(quat[b], gp)
            )
            gquat = quat[b] if _is_ident_quat(geom_quat[g]) else _qmul(
                quat[b], gq
            )
            write3(gxpos_ref, g, gx)
            write9(gxmat_ref, g, _qmat(gquat))

        for s_i in range(meta.nsite):
            b = meta.site_bodyid[s_i]
            sp = tuple(float(x) for x in site_pos[s_i])
            sq = tuple(float(x) for x in site_quat[s_i])
            sx = pos[b] if _is_zero(site_pos[s_i]) else _vadd(
                pos[b], _qrot(quat[b], sp)
            )
            squat = quat[b] if _is_ident_quat(site_quat[s_i]) else _qmul(
                quat[b], sq
            )
            write3(sxpos_ref, s_i, sx)
            write9(sxmat_ref, s_i, _qmat(squat))

    return kernel


@functools.partial(
    jax.jit, static_argnames=("meta", "fk", "interpret", "dtype_name", "lanes")
)
def _fk_call(meta, fk, interpret, dtype_name, qpos, mpos, mquat, lanes=None):
    dtype = jnp.dtype(dtype_name)
    B = qpos.shape[-1]
    L = lanes or _LANES
    nb, nj, ng, ns = meta.nbody, meta.njnt, meta.ngeom, max(meta.nsite, 1)
    kernel = _build_kernel(meta, fk, dtype)

    def spec2(rows):
        return pl.BlockSpec((rows, L), lambda i: (0, i))

    def spec3(k, rows):
        return pl.BlockSpec((k, rows, L), lambda i: (0, 0, i))

    out_rows = (
        nb * 3, nb * 4, nb * 9, nb * 3, nb * 9, nj * 3, nj * 3,
        ng * 3, ng * 9, ns * 3, ns * 9,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B // L,),
        in_specs=[
            spec2(meta.nq),
            spec3(mpos.shape[0], 3),
            spec3(mquat.shape[0], 4),
        ],
        out_specs=tuple(spec2(r) for r in out_rows),
        out_shape=tuple(
            jax.ShapeDtypeStruct((r, B), dtype) for r in out_rows
        ),
        interpret=interpret,
    )(qpos.astype(dtype), mpos.astype(dtype), mquat.astype(dtype))
    return outs


def supported(m: T.Model, d) -> bool:
    """Kernel applicability: concrete FK constants available, lane-divisible
    batch, every joint a known type, and a tree small enough for the
    fully-unrolled kernel body — at nbody=44 (kitchen) the unrolled trace
    blows up both Mosaic (TPU compile hung >40 min, r5) and interpret-mode
    XLA (>9 min / C-stack overflow under pytest). Larger trees take the
    pointer-jumping XLA pass instead (soa._kinematics_jump)."""
    if m.fk_np is None:
        return False
    if m.meta.nbody > 36:
        return False
    B = d.qpos.shape[-1]
    if B % _LANES:
        return False
    return all(
        jt in (T.FREE, T.BALL, T.SLIDE, T.HINGE) for jt in m.meta.jnt_type
    )


def kinematics(m: T.Model, d, interpret: bool = False):
    """Drop-in body for soa.kinematics via the fused FK kernel."""
    meta = m.meta
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    if meta.nmocap:
        mpos, mquat = d.mocap_pos, d.mocap_quat
    else:
        mpos = jnp.zeros((1, 3, B), dtype)
        mquat = jnp.zeros((1, 4, B), dtype)
    (xpos, xquat, xmat, xipos, ximat, xanchor, xaxis,
     gxpos, gxmat, sxpos, sxmat) = _fk_call(
        meta, m.fk_np, interpret, str(dtype), d.qpos, mpos, mquat
    )
    nb, nj, ng, ns = meta.nbody, meta.njnt, meta.ngeom, meta.nsite
    if ns:
        site_xpos = sxpos.reshape(ns, 3, B)
        site_xmat = sxmat.reshape(ns, 3, 3, B)
    else:
        site_xpos = jnp.zeros((0, 3, B), dtype)
        site_xmat = jnp.zeros((0, 3, 3, B), dtype)
    return dataclasses.replace(
        d,
        xpos=xpos.reshape(nb, 3, B),
        xquat=xquat.reshape(nb, 4, B),
        xmat=xmat.reshape(nb, 3, 3, B),
        xipos=xipos.reshape(nb, 3, B),
        ximat=ximat.reshape(nb, 3, 3, B),
        xanchor=xanchor.reshape(nj, 3, B),
        xaxis=xaxis.reshape(nj, 3, B),
        geom_xpos=gxpos.reshape(ng, 3, B),
        geom_xmat=gxmat.reshape(ng, 3, 3, B),
        site_xpos=site_xpos,
        site_xmat=site_xmat,
    )
