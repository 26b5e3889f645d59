"""Soft-constraint assembly and solver (the TPU replacement for MuJoCo's
mj_makeConstraint + mj_solPGS/Newton reached via mj_step in the reference,
gymnasium_robotics/envs/robot_env.py:340-341).

Design: constraint rows have a FIXED layout per model (static at trace time):
equality rows, joint-limit rows, tendon-limit rows (these implement the Shadow
Hand joint couplings, reference envs/shadow_dexterous_hand/hand_env.py:47-57),
and pyramidal contact rows for every contact slot. Rows that are not currently
violated are masked (impedance weight D = 0), keeping shapes static under jit.

Solver: Newton iterations on MuJoCo's convex primal formulation
    C(a) = 0.5 (a - a_smooth)^T M (a - a_smooth) + 0.5 sum_i D_i x_i^2 [active]
with x = J a - aref, active_i = equality or x_i < 0, Hessian M + J^T D J,
and a safeguarded exact line search on the piecewise-quadratic 1D restriction.
Everything is dense (nv x nv / nefc x nv) — batched small GEMMs that map onto
the MXU under vmap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu.physics import collision as col
from gymnasium_robotics_tpu.physics import math as gm
from gymnasium_robotics_tpu.physics import types as T


# ---------------------------------------------------------------------------
# Static row layout helpers
# ---------------------------------------------------------------------------

def _body_dof_masks(mt: T.Meta) -> np.ndarray:
    """mask[b, i] = 1 if dof i belongs to body b or an ancestor of b."""
    mask = np.zeros((mt.nbody, mt.nv), dtype=np.float32)
    for b in range(mt.nbody):
        bb = b
        while bb > 0:
            adr, num = mt.body_dofadr[bb], mt.body_dofnum[bb]
            mask[b, adr:adr + num] = 1.0
            bb = mt.body_parentid[bb]
    return mask


def contact_rows_per_slot(condim: int) -> int:
    return 1 if condim == 1 else 2 * (condim - 1)


def nefc(m: T.Model) -> int:
    mt = m.meta
    n = 0
    for e in range(mt.neq):
        n += {T.EQ_CONNECT: 3, T.EQ_WELD: 6, T.EQ_JOINT: 1, T.EQ_TENDON: 1}[
            mt.eq_type[e]
        ]
    n += sum(1 for j in range(mt.njnt) if mt.jnt_limited[j])
    n += 2 * sum(1 for t in range(mt.ntendon) if mt.tendon_limited[t])
    n += sum(contact_rows_per_slot(c) for c in mt.con_condim)
    return n


# ---------------------------------------------------------------------------
# Impedance / reference acceleration (MuJoCo soft constraint model)
# ---------------------------------------------------------------------------

def _impedance(solimp, pos):
    """solimp = (dmin, dmax, width, midpoint, power); pos = violation."""
    dmin, dmax, width, mid, power = (
        solimp[..., 0], solimp[..., 1], solimp[..., 2], solimp[..., 3], solimp[..., 4],
    )
    dmin = jnp.clip(dmin, 0.0001, 0.9999)
    dmax = jnp.clip(dmax, 0.0001, 0.9999)
    x = jnp.abs(pos) / jnp.maximum(width, 1e-10)
    x = jnp.clip(x, 0.0, 1.0)
    power = jnp.maximum(power, 1.0)
    # polynomial spline through (0,0),(mid,mid),(1,1) with matching derivative
    y1 = (mid ** (1.0 - power)) * (x ** power)
    y2 = 1.0 - ((1.0 - mid) ** (1.0 - power)) * ((1.0 - x) ** power)
    y = jnp.where(x < mid, y1, y2)
    return dmin + (dmax - dmin) * y


def _kbi(solref, solimp, pos, dt):
    """Returns (d, b, k): impedance, damping, stiffness per row."""
    d = _impedance(solimp, pos)
    dmax = jnp.clip(solimp[..., 1], 0.0001, 0.9999)
    timeconst, dampratio = solref[..., 0], solref[..., 1]
    # MuJoCo enforces timeconst >= 2*dt
    direct = timeconst <= 0
    tc = jnp.maximum(timeconst, 2.0 * dt)
    b = jnp.where(direct, -solref[..., 1], 2.0 / (dmax * tc))
    k = jnp.where(
        direct,
        -solref[..., 0],
        1.0 / (dmax * dmax * tc * tc * jnp.maximum(dampratio, 1e-8) ** 2),
    )
    # direct mode scales by d/(dmax)? MuJoCo: direct solref is d-scaled already
    return d, b, k


# ---------------------------------------------------------------------------
# Row construction
# ---------------------------------------------------------------------------

def _jac(m, d, mask_b, point, body):
    """Point jacobian (jacp, jacr) each (3, nv), for a world point on body."""
    mt = m.meta
    o = d.subtree_com[mt.body_rootid[body]]
    offset = point - o
    jacp = d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], offset[None, :])
    jacp = jacp * mask_b[:, None]
    jacr = d.cdof[:, :3] * mask_b[:, None]
    return jacp.T, jacr.T  # (3, nv)


def _jac_idx(m, d, mask_b, point, body):
    """_jac with a traced body index (vmap-friendly: rootid via gather)."""
    rootid = jnp.asarray(np.array(m.meta.body_rootid))
    o = d.subtree_com[rootid[body]]
    offset = point - o
    jacp = d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], offset[None, :])
    jacp = jacp * mask_b[:, None]
    jacr = d.cdof[:, :3] * mask_b[:, None]
    return jacp.T, jacr.T  # (3, nv)


def build_rows(m: T.Model, d: T.Data):
    """Assemble J, pos, solref, solimp, invweight, active, is_equality arrays."""
    mt = m.meta
    dtype = d.qpos.dtype
    masks = jnp.asarray(_body_dof_masks(mt), dtype)

    J, pos, solref, solimp, invw, active, is_eq = [], [], [], [], [], [], []
    pos_imp = []  # violation magnitude driving the impedance (equality rows
    # share the residual NORM across their rows, mirroring mj_instantiateEquality)

    def add(Jr, p, sr, si, iw, act, eq, p_imp=None):
        J.append(Jr)
        pos.append(p)
        pos_imp.append(p if p_imp is None else p_imp)
        solref.append(sr)
        solimp.append(si)
        invw.append(iw)
        active.append(act)
        is_eq.append(eq)

    # --- equality constraints, vectorized per type group (static membership)
    eq_groups: dict = {}
    for e in range(mt.neq):
        eq_groups.setdefault(mt.eq_type[e], []).append(e)

    if T.EQ_CONNECT in eq_groups:
        es = np.array(eq_groups[T.EQ_CONNECT])
        b1 = np.array([mt.eq_obj1id[e] for e in es])
        b2 = np.array([mt.eq_obj2id[e] for e in es])
        a1 = m.eq_data[es, 0:3]
        a2 = m.eq_data[es, 3:6]
        p1 = d.xpos[b1] + jnp.einsum("kij,kj->ki", d.xmat[b1], a1)
        p2 = d.xpos[b2] + jnp.einsum("kij,kj->ki", d.xmat[b2], a2)
        jp1 = jax.vmap(lambda mk, p, b: _jac_idx(m, d, mk, p, b)[0])(
            masks[b1], p1, jnp.asarray(b1)
        )
        jp2 = jax.vmap(lambda mk, p, b: _jac_idx(m, d, mk, p, b)[0])(
            masks[b2], p2, jnp.asarray(b2)
        )
        Jr = jp1 - jp2                     # (k, 3, nv)
        err = p1 - p2                      # (k, 3)
        iw = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
        nrm = jnp.linalg.norm(err, axis=-1)
        for i, e in enumerate(es):
            for k in range(3):
                add(
                    Jr[i, k], err[i, k], m.eq_solref[e], m.eq_solimp[e],
                    iw[i], d.eq_active[e], True, p_imp=nrm[i],
                )
    if T.EQ_WELD in eq_groups:
        es = np.array(eq_groups[T.EQ_WELD])
        b1 = np.array([mt.eq_obj1id[e] for e in es])
        b2 = np.array([mt.eq_obj2id[e] for e in es])

        def _weld_rows(mk1, mk2, b1i, b2i, eqd, xp1, xp2, xm1, xm2, q1, q2):
            # residuals calibrated against mjData.efc_pos/efc_J:
            #   position: (x1 + R1 a1) - (x2 + R2 a2)
            #   rotation: torquescale * vec(conj(q2 relq) q1), Jacobian via
            #   d/dt vec(qerr) = 0.5 vec(conj(q2t) (0, w1-w2) q1)
            anchor1, anchor2 = eqd[0:3], eqd[3:6]
            relpose_q, torquescale = eqd[6:10], eqd[10]
            p1 = xp1 + xm1 @ anchor1
            p2 = xp2 + xm2 @ anchor2
            jp1, jr1 = _jac_idx(m, d, mk1, p1, b1i)
            jp2, jr2 = _jac_idx(m, d, mk2, p2, b2i)
            Jp = jp1 - jp2
            err_p = p1 - p2
            q2t = gm.quat_mul(q2, relpose_q)
            qerr = gm.quat_mul(gm.quat_conj(q2t), q1)
            err_q = qerr[1:4] * torquescale
            eye3 = jnp.eye(3, dtype=dtype)
            zero1 = jnp.zeros(1, dtype)

            def _Av(v):
                return gm.quat_mul(
                    gm.quat_mul(gm.quat_conj(q2t), jnp.concatenate([zero1, v])),
                    q1,
                )[1:4]

            A = jnp.stack([_Av(eye3[k]) for k in range(3)], axis=1)
            Jr = 0.5 * torquescale * (A @ (jr1 - jr2))
            nrm = jnp.linalg.norm(jnp.concatenate([err_p, err_q]))
            return Jp, err_p, Jr, err_q, nrm

        Jp, err_p, Jr, err_q, nrm = jax.vmap(_weld_rows)(
            masks[b1], masks[b2], jnp.asarray(b1), jnp.asarray(b2),
            m.eq_data[es], d.xpos[b1], d.xpos[b2], d.xmat[b1], d.xmat[b2],
            d.xquat[b1], d.xquat[b2],
        )
        iw_t = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
        iw_r = m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
        for i, e in enumerate(es):
            for k in range(3):
                add(Jp[i, k], err_p[i, k], m.eq_solref[e], m.eq_solimp[e],
                    iw_t[i], d.eq_active[e], True, p_imp=nrm[i])
            for k in range(3):
                add(Jr[i, k], err_q[i, k], m.eq_solref[e], m.eq_solimp[e],
                    iw_r[i], d.eq_active[e], True, p_imp=nrm[i])
    if T.EQ_JOINT in eq_groups:
        for e in eq_groups[T.EQ_JOINT]:
            j1, j2 = mt.eq_obj1id[e], mt.eq_obj2id[e]
            data = m.eq_data[e]
            q1 = d.qpos[mt.jnt_qposadr[j1]] - m.qpos0[mt.jnt_qposadr[j1]]
            da1 = mt.jnt_dofadr[j1]
            row = jnp.zeros(mt.nv, dtype).at[da1].set(1.0)
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
                row = row.at[mt.jnt_dofadr[j2]].set(-dpoly)
                err = q1 - poly
            else:
                err = q1 - data[0]
            add(row, err, m.eq_solref[e], m.eq_solimp[e],
                m.dof_invweight0[da1], d.eq_active[e], True)
    if T.EQ_TENDON in eq_groups:
        for e in eq_groups[T.EQ_TENDON]:
            t1 = mt.eq_obj1id[e]
            err = d.ten_length[t1] - m.eq_data[e, 0]
            add(d.ten_J[t1], err, m.eq_solref[e], m.eq_solimp[e],
                m.tendon_invweight0[t1], d.eq_active[e], True)

    # --- joint limits (one row, nearest side), one vectorized block over the
    # static limited-joint set (hand: 22 limited joints -> 1 gather + 1 scatter)
    lim = [
        j for j in range(mt.njnt)
        if mt.jnt_limited[j] and not mt.opt.disable_limit
        and mt.jnt_type[j] in (T.HINGE, T.SLIDE)
    ]  # ball-joint limits unused by the target model families
    n_jlim = len(lim)
    if n_jlim:
        ji = jnp.asarray(np.array(lim))
        qi = jnp.asarray(np.array([mt.jnt_qposadr[j] for j in lim]))
        di = np.array([mt.jnt_dofadr[j] for j in lim])
        q = d.qpos[qi]
        dist_lo = q - m.jnt_range[ji, 0]
        dist_hi = m.jnt_range[ji, 1] - q
        lo_closer = dist_lo < dist_hi
        dist = jnp.where(lo_closer, dist_lo, dist_hi)
        sign = jnp.where(lo_closer, 1.0, -1.0).astype(dtype)
        margin = m.jnt_margin[ji]
        rows = jnp.zeros((n_jlim, mt.nv), dtype).at[
            (jnp.arange(n_jlim), jnp.asarray(di))
        ].set(sign)
        for i, j in enumerate(lim):
            add(
                rows[i], dist[i] - margin[i], m.jnt_solref[j], m.jnt_solimp[j],
                m.dof_invweight0[di[i]], dist[i] < margin[i], False,
            )

    # --- tendon limits (two rows: low, high), vectorized over the static
    # limited-tendon set
    tlim = [
        t for t in range(mt.ntendon)
        if mt.tendon_limited[t] and not mt.opt.disable_limit
    ]
    if tlim:
        ti = jnp.asarray(np.array(tlim))
        margin = m.tendon_margin[ti]
        length = d.ten_length[ti]
        dist_lo = length - m.tendon_range[ti, 0]
        dist_hi = m.tendon_range[ti, 1] - length
        for i, t in enumerate(tlim):
            add(d.ten_J[t], dist_lo[i] - margin[i], m.tendon_solref_lim[t],
                m.tendon_solimp_lim[t], m.tendon_invweight0[t],
                dist_lo[i] < margin[i], False)
            add(-d.ten_J[t], dist_hi[i] - margin[i], m.tendon_solref_lim[t],
                m.tendon_solimp_lim[t], m.tendon_invweight0[t],
                dist_hi[i] < margin[i], False)

    # --- contacts (pyramidal cone), vectorized over slots with optional
    # top-K capping per condim group: only the K deepest candidate slots get
    # constraint rows (the MJX-style max-contacts bound). The static slot
    # table may be large (every wall x every leg for mazes); the number of
    # simultaneously active contacts is small, so capping keeps nefc — and
    # the Newton system — compact without changing physics.
    c = d.contact
    pruned = c.src is not None
    cond_arr = (
        col.compact_condim(mt) if pruned else np.array(mt.con_condim)
    )
    ncon = len(cond_arr)
    if ncon:
        gb = mt.geom_bodyid
        slot_geoms = _slot_geoms(mt)
        b1s_np = np.array([gb[g1] for g1, _ in slot_geoms])
        b2s_np = np.array([gb[g2] for _, g2 in slot_geoms])
        roots_np = np.array(mt.body_rootid)
        if pruned:
            # pair-topk compact table: per-slot params live in the FULL
            # static tables, gathered through the traced src slot ids
            pen_all = c.dist - m.con_includemargin[c.src]
        else:
            pen_all = c.dist - m.con_includemargin
        cap = getattr(mt.opt, "contact_cap", 0)

        blocks = {"J": [], "pos": [], "sr": [], "si": [], "iw": [], "act": []}
        con_layout = []  # (condim, compact slot positions, static slot ids)

        def add_block(Jb, pb, srb, sib, iwb, actb):
            blocks["J"].append(Jb)
            blocks["pos"].append(pb)
            blocks["sr"].append(srb)
            blocks["si"].append(sib)
            blocks["iw"].append(iwb)
            blocks["act"].append(actb)

        for cd in sorted(set(cond_arr.tolist())):
            idx = np.nonzero(cond_arr == cd)[0]
            if cap and len(idx) > cap:
                # deepest-first selection within the group
                _, order = jax.lax.top_k(-pen_all[jnp.asarray(idx)], cap)
                sel_c = jnp.asarray(idx)[order]
            else:
                sel_c = jnp.asarray(idx)
            sel = c.src[sel_c] if pruned else sel_c  # static slot ids
            con_layout.append((cd, sel_c, sel))
            k = int(sel_c.shape[0])

            pos_s = c.pos[sel_c]
            frame_s = c.frame[sel_c]
            pen = pen_all[sel_c]
            b1 = jnp.asarray(b1s_np)[sel]
            b2 = jnp.asarray(b2s_np)[sel]
            roots = jnp.asarray(roots_np)

            def _jacs(bodies):
                oo = d.subtree_com[roots[bodies]]
                off = pos_s - oo
                jacp = d.cdof[None, :, 3:] + jnp.cross(
                    d.cdof[None, :, :3], off[:, None, :]
                )
                mk = masks[bodies][:, :, None]
                return jacp * mk, d.cdof[None, :, :3] * mk

            jp1, jr1 = _jacs(b1)
            jp2, jr2 = _jacs(b2)
            Jp = jp2 - jp1  # (k, nv, 3)
            Jr = jr2 - jr1
            Jn = jnp.einsum("cvk,ck->cv", Jp, frame_s[:, 0])
            act_c = pen < 0.0
            iw_c = (
                m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
            )
            sr_s = m.con_solref[sel]
            si_s = m.con_solimp[sel]
            if cd == 1:
                add_block(Jn, pen, sr_s, si_s, iw_c, act_c)
            else:
                axes = [
                    jnp.einsum("cvk,ck->cv", Jp, frame_s[:, 1]),
                    jnp.einsum("cvk,ck->cv", Jp, frame_s[:, 2]),
                ]
                if cd > 3:
                    axes.append(jnp.einsum("cvk,ck->cv", Jr, frame_s[:, 0]))
                if cd > 4:
                    axes.append(jnp.einsum("cvk,ck->cv", Jr, frame_s[:, 1]))
                    axes.append(jnp.einsum("cvk,ck->cv", Jr, frame_s[:, 2]))
                mu_s = m.con_friction[sel]
                for i in range(cd - 1):
                    mui = mu_s[:, i]
                    iwp = 2.0 * mui * mui * (1.0 + mui * mui) * iw_c
                    for s in (1.0, -1.0):
                        add_block(
                            Jn + s * mui[:, None] * axes[i],
                            pen, sr_s, si_s, iwp, act_c,
                        )

        con_J = jnp.concatenate(blocks["J"])
        con_pos = jnp.concatenate(blocks["pos"])
        con_sr = jnp.concatenate(blocks["sr"])
        con_si = jnp.concatenate(blocks["si"])
        con_iw = jnp.concatenate(blocks["iw"])
        con_act = jnp.concatenate(blocks["act"])
    else:
        con_J = jnp.zeros((0, mt.nv), dtype)
        con_pos = con_sr = con_si = con_iw = None
        con_layout = []

    if not J and not ncon:
        z = jnp.zeros((0,), dtype)
        return (
            jnp.zeros((0, mt.nv), dtype), z, z, z,
            jnp.zeros(0, bool), jnp.zeros(0, bool), (0, []),
        )

    if J:
        J = jnp.stack(J)
        pos = jnp.stack(pos)
        pos_imp_arr = jnp.stack(pos_imp)
        solref = jnp.stack(solref)
        solimp = jnp.stack(solimp)
        invw = jnp.stack(invw)
        active = jnp.stack(active)
        is_eq_arr = jnp.asarray(is_eq, bool)
    else:
        J = jnp.zeros((0, mt.nv), dtype)
        pos = jnp.zeros((0,), dtype)
        pos_imp_arr = jnp.zeros((0,), dtype)
        solref = jnp.zeros((0, 2), dtype)
        solimp = jnp.zeros((0, 5), dtype)
        invw = jnp.zeros((0,), dtype)
        active = jnp.zeros((0,), bool)
        is_eq_arr = jnp.zeros((0,), bool)

    if ncon:
        n_loop = J.shape[0]
        J = jnp.concatenate([J, con_J])
        pos = jnp.concatenate([pos, con_pos])
        pos_imp_arr = jnp.concatenate([pos_imp_arr, con_pos])
        solref = jnp.concatenate([solref, con_sr])
        solimp = jnp.concatenate([solimp, con_si])
        invw = jnp.concatenate([invw, con_iw])
        active = jnp.concatenate([active, con_act])
        is_eq = jnp.concatenate(
            [is_eq_arr, jnp.zeros(con_J.shape[0], bool)]
        )
    else:
        is_eq = is_eq_arr

    dt = mt.opt.timestep
    imp, b, k = _kbi(solref, solimp, pos_imp_arr, dt)
    vel = J @ d.qvel
    aref = -b * vel - k * imp * pos
    R = jnp.maximum((1.0 - imp) / jnp.maximum(imp, 1e-8) * invw, 1e-10)
    D = jnp.where(active, 1.0 / R, 0.0)
    n_loop = int(J.shape[0]) - (int(con_J.shape[0]) if ncon else 0)
    return J, aref, D, R, active, is_eq, (n_loop, con_layout)


def _slot_geoms(mt: T.Meta):
    out = []
    for g1, g2 in mt.pairs:
        k = col.pair_slots(mt.geom_type[g1], mt.geom_type[g2])
        out += [(g1, g2)] * k
    return out


# ---------------------------------------------------------------------------
# Solver
# ---------------------------------------------------------------------------

def solve_constraints(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    dtype = d.qpos.dtype
    if mt.nv == 0:
        return d
    J, aref, D, R, active, is_eq, layout = build_rows(m, d)
    n_rows = J.shape[0]
    if n_rows == 0:
        return dataclasses.replace(
            d,
            qacc=d.qacc_smooth,
            qfrc_constraint=jnp.zeros(mt.nv, dtype),
        )

    fused = mt.opt.fused_solver
    # nv gate raised 24 -> 36 in round 2 (warmstart halved iterations). The
    # row gate tracks the kernel's VMEM envelope: the J block
    # (nv x ne x 128 lanes, double-buffered) plus the looped Newton body's
    # stack must fit the raised Mosaic scoped-VMEM limit
    # (solver_pallas._tpu_params, 96 MB): n_rows*nv <= 36k covers hand
    # (272x36 = 9.8k), adroit (~8.2k) and kitchen even at contact_cap=32
    # (668x29 = 19.4k).
    use_fused = mt.nv <= 36 and n_rows * mt.nv <= 36000 and (
        fused is True or fused == "force"
        or (fused == "auto" and jax.default_backend() == "tpu")
    )
    if use_fused:
        from gymnasium_robotics_tpu.physics import solver_pallas

        fn = (solver_pallas.solve_small_nv2 if mt.nv == 2
              else solver_pallas.solve_small)
        qacc, f = fn(
            d.qM, d.qacc_smooth, d.qacc, J, aref, D, active, is_eq,
            n_iter=min(mt.opt.iterations, 20),
            n_ls=min(mt.opt.ls_iterations, 8),
            interpret=jax.default_backend() != "tpu",
        )
        qfrc_constraint = J.T @ f
        con_force, cfrc_ext = _decode_contact_forces(m, d, f, layout)
        return dataclasses.replace(
            d, qacc=qacc, qfrc_constraint=qfrc_constraint,
            con_force=con_force, cfrc_ext=cfrc_ext,
        )

    M = d.qM
    a_smooth = d.qacc_smooth
    # SPD solves: fused lane-layout Cholesky kernel on TPU (one pallas call
    # instead of XLA's blocked-Cholesky custom calls per Newton iteration)
    use_lane_chol = mt.nv <= 48 and (
        fused is True or fused == "force"
        or (fused == "auto" and jax.default_backend() == "tpu")
    )
    if use_lane_chol:
        from gymnasium_robotics_tpu.physics import solver_pallas as _sp

        def spd_solve(A, b):
            return _sp.solve_pos_lanes(
                A, b, interpret=jax.default_backend() != "tpu"
            )
    else:
        def spd_solve(A, b):
            return jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(A), b
            )

    def x_of(a):
        return J @ a - aref

    def active_set(x):
        return is_eq | (x < 0.0)

    def grad_hess_dir(a):
        x = x_of(a)
        aset = active_set(x) & active
        Dw = jnp.where(aset, D, 0.0)
        grad = M @ (a - a_smooth) + J.T @ (Dw * x)
        H = M + (J.T * Dw) @ J
        p = -spd_solve(H, grad)
        return p, grad

    def linesearch(a, p):
        # phi(alpha) piecewise quadratic; Newton on phi' with active set updates
        Jp = J @ p
        x0 = x_of(a)
        pMp = p @ (M @ p)
        pMa = p @ (M @ (a - a_smooth))

        def body(_, alpha):
            x = x0 + alpha * Jp
            aset = active_set(x) & active
            Dw = jnp.where(aset, D, 0.0)
            dphi = alpha * pMp + pMa + jnp.sum(Dw * x * Jp)
            ddphi = pMp + jnp.sum(Dw * Jp * Jp)
            return alpha - dphi / jnp.maximum(ddphi, 1e-12)

        n_ls = min(mt.opt.ls_iterations, 8)
        alpha = jax.lax.fori_loop(
            0, n_ls, body, jnp.ones((), dtype), unroll=True
        )
        return jnp.clip(alpha, 0.0, 4.0)

    def iteration(_, a):
        p, grad = grad_hess_dir(a)
        alpha = linesearch(a, p)
        return a + alpha * p

    n_iter = min(mt.opt.iterations, 20)
    # warmstart from the previous substep's qacc (mj_warmstart semantics;
    # zeros on fresh Data, exactly like mj_resetData). unroll=2: halves
    # loop-iteration launch overhead (the solver is launch-latency bound)
    a = jax.lax.fori_loop(0, n_iter, iteration, d.qacc, unroll=2)

    x = x_of(a)
    aset = active_set(x) & active
    f = jnp.where(aset, -D * x, 0.0)
    # unilateral rows cannot pull
    f = jnp.where(~is_eq, jnp.maximum(f, 0.0), f)
    qfrc_constraint = J.T @ f
    qacc = a_smooth + spd_solve(M, qfrc_constraint)
    con_force, cfrc_ext = _decode_contact_forces(m, d, f, layout)
    return dataclasses.replace(
        d, qacc=qacc, qfrc_constraint=qfrc_constraint,
        con_force=con_force, cfrc_ext=cfrc_ext,
    )


def _decode_contact_forces(m: T.Model, d: T.Data, f, layout):
    """Pyramid -> contact-frame force per slot (mju_decodePyramid semantics:
    normal = sum of facet forces; tangent_i = mu_i (lam_i+ - lam_i-)), then
    accumulated into com-based per-body wrenches (mjData.cfrc_ext analogue)."""
    mt = m.meta
    dtype = d.qpos.dtype
    c = d.contact
    pruned = c.src is not None
    ncon = c.dist.shape[0]
    con_force = jnp.zeros((ncon, 6), dtype)
    cfrc_ext = jnp.zeros((mt.nbody, 6), dtype)
    if not ncon:
        return con_force, cfrc_ext
    need_cf = getattr(mt.opt, "need_con_force", "auto")
    if need_cf == "auto":
        from gymnasium_robotics_tpu.physics import sensor as SEN

        # decode only for its consumers (touch sensors / cfrc_ext); same
        # gate as soa._decode_contact_forces so CPU == TPU semantics
        need_cf = getattr(mt.opt, "need_cfrc_ext", True) or any(
            t == SEN.SENS_TOUCH for t in mt.sensor_type
        )
    if not need_cf:
        return con_force, cfrc_ext
    n_loop, con_layout = layout
    base = n_loop
    for cd, sel_c, sel in con_layout:
        k = int(sel_c.shape[0])
        if cd == 1:
            lam = f[base:base + k]
            con_force = con_force.at[sel_c, 0].set(lam)
            base += k
        else:
            nf = cd - 1
            lam = f[base:base + 2 * nf * k].reshape(nf, 2, k)
            con_force = con_force.at[sel_c, 0].set(jnp.sum(lam, axis=(0, 1)))
            mu = m.con_friction[sel]
            for i in range(nf):
                comp = mu[:, i] * (lam[i, 0] - lam[i, 1])
                con_force = con_force.at[sel_c, 1 + i].set(comp)
            base += 2 * nf * k

    if not getattr(mt.opt, "need_cfrc_ext", True):
        return con_force, cfrc_ext

    # world-frame force/torque per slot
    frame = d.contact.frame  # (ncon, 3, 3) rows n,t1,t2
    F_w = jnp.einsum("ck,ckj->cj", con_force[:, :3], frame)
    T_w = jnp.einsum("ck,ckj->cj", con_force[:, 3:], frame)

    gb = mt.geom_bodyid
    slot_geoms = _slot_geoms(mt)
    b1s = jnp.asarray(np.array([gb[g1] for g1, _ in slot_geoms]))
    b2s = jnp.asarray(np.array([gb[g2] for _, g2 in slot_geoms]))
    if pruned:
        b1s = b1s[c.src]
        b2s = b2s[c.src]
    roots = jnp.asarray(np.array(mt.body_rootid))
    o1 = d.subtree_com[roots[b1s]]
    o2 = d.subtree_com[roots[b2s]]
    trq2 = T_w + jnp.cross(d.contact.pos - o2, F_w)
    trq1 = T_w + jnp.cross(d.contact.pos - o1, F_w)
    w2 = jnp.concatenate([trq2, F_w], axis=-1)
    w1 = jnp.concatenate([trq1, F_w], axis=-1)
    cfrc_ext = cfrc_ext.at[b2s].add(w2).at[b1s].add(-w1)
    cfrc_ext = cfrc_ext.at[0].set(0.0)  # world row stays zero (mjc convention)
    return con_force, cfrc_ext
