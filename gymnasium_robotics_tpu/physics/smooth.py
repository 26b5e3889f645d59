"""Smooth (unconstrained) dynamics stages of the batched pipeline.

These are the TPU-native replacements for the parts of ``mj_step``/``mj_forward``
the reference reaches through FFI (gymnasium_robotics/envs/robot_env.py:340-341):
forward kinematics, COM-frame quantities, composite-rigid-body mass matrix,
recursive Newton-Euler bias forces, fixed tendons, actuation and passive forces.

All functions take a single (unbatched) ``Data``; batching is applied by ``vmap``
in the pipeline. Tree loops are unrolled at trace time over the static topology
(nbody <= ~160 for every model family), which XLA fuses into large elementwise
kernels over the env batch — the MXU-relevant dense work is the (nv, nv) mass
matrix assembly and solves.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu.physics import math as gm
from gymnasium_robotics_tpu.physics import types as T


def _replace(d, **kw):
    return dataclasses.replace(d, **kw)


# ---------------------------------------------------------------------------
# Kinematics
# ---------------------------------------------------------------------------

def kinematics(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    dtype = d.qpos.dtype
    zero3 = jnp.zeros(3, dtype)
    qident = jnp.array([1.0, 0, 0, 0], dtype)

    xpos = [zero3] * mt.nbody
    xquat = [qident] * mt.nbody
    xanchor = [zero3] * mt.njnt
    xaxis = [jnp.zeros(3, dtype)] * mt.njnt

    for b in range(1, mt.nbody):
        p = mt.body_parentid[b]
        if mt.body_mocapid[b] >= 0:
            mid = mt.body_mocapid[b]
            xpos[b] = d.mocap_pos[mid]
            xquat[b] = d.mocap_quat[mid] / jnp.linalg.norm(d.mocap_quat[mid])
            continue
        pos = xpos[p] + gm.quat_rot(xquat[p], m.body_pos[b])
        quat = gm.quat_mul(xquat[p], m.body_quat[b])
        jadr, jnum = mt.body_jntadr[b], mt.body_jntnum[b]
        for ji in range(jadr, jadr + jnum):
            jt = mt.jnt_type[ji]
            qadr = mt.jnt_qposadr[ji]
            if jt == T.FREE:
                pos = d.qpos[qadr:qadr + 3]
                quat = d.qpos[qadr + 3:qadr + 7]
                quat = quat / jnp.linalg.norm(quat)
                xanchor[ji] = pos
                xaxis[ji] = gm.quat_rot(quat, m.jnt_axis[ji])
                continue
            anchor = pos + gm.quat_rot(quat, m.jnt_pos[ji])
            if jt == T.BALL:
                qj = d.qpos[qadr:qadr + 4]
                qj = qj / jnp.linalg.norm(qj)
                quat = gm.quat_mul(quat, qj)
                pos = anchor - gm.quat_rot(quat, m.jnt_pos[ji])
                xanchor[ji] = anchor
                xaxis[ji] = gm.quat_rot(quat, m.jnt_axis[ji])
            elif jt == T.SLIDE:
                ax = gm.quat_rot(quat, m.jnt_axis[ji])
                pos = pos + ax * (d.qpos[qadr] - m.qpos0[qadr])
                xanchor[ji] = pos + gm.quat_rot(quat, m.jnt_pos[ji])
                xaxis[ji] = ax
            elif jt == T.HINGE:
                ax = gm.quat_rot(quat, m.jnt_axis[ji])
                angle = d.qpos[qadr] - m.qpos0[qadr]
                quat = gm.quat_mul(
                    quat, gm.axis_angle_to_quat(m.jnt_axis[ji], angle)
                )
                pos = anchor - gm.quat_rot(quat, m.jnt_pos[ji])
                xanchor[ji] = anchor
                xaxis[ji] = ax
        xpos[b] = pos
        xquat[b] = quat

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = gm.quat_to_mat(xquat)
    xipos = xpos + jax.vmap(gm.quat_rot)(xquat, m.body_ipos)
    ximat = gm.quat_to_mat(jax.vmap(gm.quat_mul)(xquat, m.body_iquat))

    gb = jnp.asarray(mt.geom_bodyid)
    geom_xpos = xpos[gb] + jax.vmap(gm.quat_rot)(xquat[gb], m.geom_pos)
    geom_xmat = gm.quat_to_mat(jax.vmap(gm.quat_mul)(xquat[gb], m.geom_quat))
    if mt.nsite:
        sb = jnp.asarray(mt.site_bodyid)
        site_xpos = xpos[sb] + jax.vmap(gm.quat_rot)(xquat[sb], m.site_pos)
        site_xmat = gm.quat_to_mat(jax.vmap(gm.quat_mul)(xquat[sb], m.site_quat))
    else:
        site_xpos = jnp.zeros((0, 3), dtype)
        site_xmat = jnp.zeros((0, 3, 3), dtype)

    return _replace(
        d,
        xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
        xanchor=jnp.stack(xanchor) if mt.njnt else jnp.zeros((0, 3), dtype),
        xaxis=jnp.stack(xaxis) if mt.njnt else jnp.zeros((0, 3), dtype),
        geom_xpos=geom_xpos, geom_xmat=geom_xmat,
        site_xpos=site_xpos, site_xmat=site_xmat,
    )


# ---------------------------------------------------------------------------
# COM-frame quantities
# ---------------------------------------------------------------------------

def com_pos(m: T.Model, d: T.Data) -> T.Data:
    """subtree_com, cinert (10D spatial inertia), cdof (per-dof motion axes)."""
    mt = m.meta
    # subtree com: backward accumulation over levels
    mass = m.body_mass
    mom = d.xipos * mass[:, None]
    subtree_mom = [mom[b] for b in range(mt.nbody)]
    subtree_mass = [mass[b] for b in range(mt.nbody)]
    for level in reversed(mt.levels[1:]):
        for b in level:
            p = mt.body_parentid[b]
            subtree_mom[p] = subtree_mom[p] + subtree_mom[b]
            subtree_mass[p] = subtree_mass[p] + subtree_mass[b]
    subtree_com = jnp.stack(
        [
            jnp.where(
                subtree_mass[b] > 1e-10,
                subtree_mom[b] / jnp.maximum(subtree_mass[b], 1e-12),
                d.xipos[b],  # massless subtree: MuJoCo keeps the body frame com
            )
            for b in range(mt.nbody)
        ]
    )

    # c-frame origin per body: subtree com of the body's kinematic root
    rootid = jnp.asarray(mt.body_rootid)
    c_origin = subtree_com[rootid]  # (nbody, 3)

    iquat = jax.vmap(gm.quat_mul)(d.xquat, m.body_iquat)
    cinert = gm.inertia_about_point(m.body_mass, m.body_inertia, d.xipos, iquat, c_origin)

    # cdof
    cdofs = []
    for ji in range(mt.njnt):
        jt = mt.jnt_type[ji]
        b = mt.jnt_bodyid[ji]
        o = c_origin[b]
        a = d.xanchor[ji]
        R = d.xmat[b]
        if jt == T.FREE:
            eye = jnp.eye(3, dtype=d.qpos.dtype)
            for i in range(3):
                cdofs.append(jnp.concatenate([jnp.zeros(3, d.qpos.dtype), eye[i]]))
            for i in range(3):
                ax = R[:, i]
                cdofs.append(jnp.concatenate([ax, jnp.cross(ax, o - a)]))
        elif jt == T.BALL:
            for i in range(3):
                ax = R[:, i]
                cdofs.append(jnp.concatenate([ax, jnp.cross(ax, o - a)]))
        elif jt == T.SLIDE:
            cdofs.append(jnp.concatenate([jnp.zeros(3, d.qpos.dtype), d.xaxis[ji]]))
        elif jt == T.HINGE:
            ax = d.xaxis[ji]
            cdofs.append(jnp.concatenate([ax, jnp.cross(ax, o - a)]))
    cdof = (
        jnp.stack(cdofs) if cdofs else jnp.zeros((0, 6), d.qpos.dtype)
    )
    return _replace(d, subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: T.Model, d: T.Data) -> T.Data:
    """cvel per body and cdof_dot per dof (forward pass, mirrors mj_comVel)."""
    mt = m.meta
    dtype = d.qpos.dtype
    cvel = [jnp.zeros(6, dtype)] * mt.nbody
    cdof_dot = [jnp.zeros(6, dtype)] * max(mt.nv, 1)

    for b in range(1, mt.nbody):
        p = mt.body_parentid[b]
        v = cvel[p]
        jadr, jnum = mt.body_jntadr[b], mt.body_jntnum[b]
        for ji in range(jadr, jadr + jnum):
            jt = mt.jnt_type[ji]
            dadr = mt.jnt_dofadr[ji]
            if jt == T.FREE:
                # translation dofs: cdof constant -> cdof_dot = 0
                v = v + d.cdof[dadr] * d.qvel[dadr] \
                      + d.cdof[dadr + 1] * d.qvel[dadr + 1] \
                      + d.cdof[dadr + 2] * d.qvel[dadr + 2]
                for k in range(3, 6):
                    cdof_dot[dadr + k] = gm.motion_cross(v, d.cdof[dadr + k])
                for k in range(3, 6):
                    v = v + d.cdof[dadr + k] * d.qvel[dadr + k]
            elif jt == T.BALL:
                for k in range(3):
                    cdof_dot[dadr + k] = gm.motion_cross(v, d.cdof[dadr + k])
                for k in range(3):
                    v = v + d.cdof[dadr + k] * d.qvel[dadr + k]
            else:
                cdof_dot[dadr] = gm.motion_cross(v, d.cdof[dadr])
                v = v + d.cdof[dadr] * d.qvel[dadr]
        cvel[b] = v

    return _replace(
        d,
        cvel=jnp.stack(cvel),
        cdof_dot=jnp.stack(cdof_dot) if mt.nv else jnp.zeros((0, 6), dtype),
    )


# ---------------------------------------------------------------------------
# Mass matrix (CRB) and bias force (RNE)
# ---------------------------------------------------------------------------

def _ancestor_mask(mt: T.Meta) -> np.ndarray:
    """mask[i, j] = True iff dof j is an ancestor of (or equal to) dof i."""
    mask = np.zeros((mt.nv, mt.nv), dtype=bool)
    for i in range(mt.nv):
        j = i
        while j >= 0:
            mask[i, j] = True
            j = mt.dof_parentid[j]
    return mask


def crb(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    # backward accumulate composite inertia
    crb_i = [d.cinert[b] for b in range(mt.nbody)]
    for level in reversed(mt.levels[1:]):
        for b in level:
            p = mt.body_parentid[b]
            if p > 0:
                crb_i[p] = crb_i[p] + crb_i[b]
    crb_arr = jnp.stack(crb_i)  # (nbody, 10)

    dof_body = jnp.asarray(mt.dof_bodyid)
    F = jax.vmap(gm.inert_mul)(crb_arr[dof_body], d.cdof)  # (nv, 6)
    G = F @ d.cdof.T  # G[i, j] = F_i . cdof_j
    mask = jnp.asarray(_ancestor_mask(mt))
    Ml = jnp.where(mask, G, 0.0)
    qM = Ml + Ml.T - jnp.diag(jnp.diag(Ml))
    qM = qM + jnp.diag(m.dof_armature)
    return _replace(d, qM=qM)


def rne(m: T.Model, d: T.Data) -> T.Data:
    """qfrc_bias = C(q, v) v + g  (RNEA with qacc = 0)."""
    mt = m.meta
    dtype = d.qpos.dtype
    grav = jnp.asarray(mt.opt.gravity, dtype)
    if mt.opt.disable_gravity:
        grav = jnp.zeros(3, dtype)
    cacc0 = jnp.concatenate([jnp.zeros(3, dtype), -grav])

    cacc = [cacc0] * mt.nbody
    for b in range(1, mt.nbody):
        p = mt.body_parentid[b]
        a = cacc[p]
        dadr, dnum = mt.body_dofadr[b], mt.body_dofnum[b]
        for k in range(dadr, dadr + dnum):
            a = a + d.cdof_dot[k] * d.qvel[k]
        cacc[b] = a

    cfrc = [jnp.zeros(6, dtype)] * mt.nbody
    for b in range(1, mt.nbody):
        hb = gm.inert_mul(d.cinert[b], d.cvel[b])
        cfrc[b] = gm.inert_mul(d.cinert[b], cacc[b]) + gm.motion_cross_force(
            d.cvel[b], hb
        )
    for level in reversed(mt.levels[1:]):
        for b in level:
            p = mt.body_parentid[b]
            if p > 0:
                cfrc[p] = cfrc[p] + cfrc[b]

    if mt.nv:
        cfrc_arr = jnp.stack(cfrc)
        dof_body = jnp.asarray(mt.dof_bodyid)
        qfrc_bias = jnp.sum(d.cdof * cfrc_arr[dof_body], axis=-1)
    else:
        qfrc_bias = jnp.zeros(0, dtype)
    return _replace(d, qfrc_bias=qfrc_bias)


# ---------------------------------------------------------------------------
# Tendons (fixed/joint tendons only)
# ---------------------------------------------------------------------------

def tendon(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    dtype = d.qpos.dtype
    if not mt.ntendon:
        return _replace(
            d,
            ten_length=jnp.zeros(0, dtype),
            ten_velocity=jnp.zeros(0, dtype),
            ten_J=jnp.zeros((0, mt.nv), dtype),
        )
    kinds = mt.tendon_kind or ("fixed",) * mt.ntendon
    # fixed tendons: one scatter-add over all wrap entries (static indices),
    # replacing the per-tendon loop (hand: 44 tendons -> 2 kernels)
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
    ten_length = jnp.zeros(mt.ntendon, dtype)
    ten_J = jnp.zeros((mt.ntendon, mt.nv), dtype)
    if w_idx:
        wi = jnp.asarray(np.array(w_idx))
        coefs = m.wrap_prm[wi].astype(dtype)
        wt = jnp.asarray(np.array(w_ten))
        ten_length = ten_length.at[wt].add(
            coefs * d.qpos[jnp.asarray(np.array(w_qadr))]
        )
        ten_J = ten_J.at[(wt, jnp.asarray(np.array(w_dadr)))].add(coefs)
    for t in range(mt.ntendon):
        if kinds[t] != "spatial2":
            continue
        adr = mt.tendon_adr[t]
        # straight site-to-site spatial tendon (CoupledHalfCheetah's
        # elastic coupling, reference assets/coupled_half_cheetah.xml:143)
        from gymnasium_robotics_tpu.physics.constraint import _body_dof_masks

        s0, s1 = mt.wrap_objid[adr], mt.wrap_objid[adr + 1]
        p0, p1 = d.site_xpos[s0], d.site_xpos[s1]
        dvec = p1 - p0
        L = jnp.linalg.norm(dvec)
        direction = dvec / jnp.maximum(L, 1e-10)
        masks = _body_dof_masks(mt)

        def jacp(site, body):
            mk = jnp.asarray(masks[body], dtype)
            o = d.subtree_com[mt.body_rootid[body]]
            off = d.site_xpos[site] - o
            return (
                d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], off[None, :])
            ) * mk[:, None]

        b0, b1 = mt.site_bodyid[s0], mt.site_bodyid[s1]
        ten_J = ten_J.at[t].set((jacp(s1, b1) - jacp(s0, b0)) @ direction)
        ten_length = ten_length.at[t].set(L)
    return _replace(
        d, ten_length=ten_length, ten_velocity=ten_J @ d.qvel, ten_J=ten_J
    )


# ---------------------------------------------------------------------------
# Actuation
# ---------------------------------------------------------------------------

TRN_JOINT, TRN_JOINTINPARENT, TRN_SLIDERCRANK, TRN_TENDON, TRN_SITE = range(5)
GAIN_FIXED, GAIN_AFFINE, GAIN_MUSCLE = 0, 1, 2
BIAS_NONE, BIAS_AFFINE, BIAS_MUSCLE = 0, 1, 2
DYN_NONE, DYN_INTEGRATOR, DYN_FILTER, DYN_FILTEREXACT = 0, 1, 2, 3


def transmission(m: T.Model, d: T.Data) -> tuple:
    """Returns (actuator_length (nu,), moment (nu, nv)).

    Vectorized over actuator groups with static index tables (replacing the
    per-actuator loop: hand nu=20, adroit nu=28 -> a handful of scatters)."""
    mt = m.meta
    dtype = d.qpos.dtype
    if not mt.nu:
        return jnp.zeros(0, dtype), jnp.zeros((0, mt.nv), dtype)
    length = jnp.zeros(mt.nu, dtype)
    moment = jnp.zeros((mt.nu, mt.nv), dtype)

    # 1-dof joint transmissions
    u_1d, q_1d, d_1d = [], [], []
    # free/ball joint transmissions: flattened (u, dof, gear-column) triples
    u_fb, d_fb, k_fb = [], [], []
    u_t, tid_t = [], []
    for u in range(mt.nu):
        trn = mt.actuator_trntype[u]
        tid = mt.actuator_trnid[u]
        if trn in (TRN_JOINT, TRN_JOINTINPARENT):
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
        elif trn == TRN_TENDON:
            u_t.append(u)
            tid_t.append(tid)
    if u_1d:
        ui = jnp.asarray(np.array(u_1d))
        qi = jnp.asarray(np.array(q_1d))
        g0 = m.actuator_gear[ui, 0].astype(dtype)
        length = length.at[ui].set((d.qpos[qi] - m.qpos0[qi]) * g0)
        moment = moment.at[(ui, jnp.asarray(np.array(d_1d)))].set(g0)
    if u_fb:
        ui = jnp.asarray(np.array(u_fb))
        moment = moment.at[(ui, jnp.asarray(np.array(d_fb)))].set(
            m.actuator_gear[(ui, jnp.asarray(np.array(k_fb)))].astype(dtype)
        )
    if u_t:
        ui = jnp.asarray(np.array(u_t))
        ti = jnp.asarray(np.array(tid_t))
        g0 = m.actuator_gear[ui, 0].astype(dtype)
        length = length.at[ui].set(d.ten_length[ti] * g0)
        moment = moment.at[ui].set(d.ten_J[ti] * g0[:, None])
    return length, moment


def fwd_actuation(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    dtype = d.qpos.dtype
    if not mt.nu:
        return _replace(
            d,
            actuator_length=jnp.zeros(0, dtype),
            actuator_velocity=jnp.zeros(0, dtype),
            actuator_force=jnp.zeros(0, dtype),
            qfrc_actuator=jnp.zeros(mt.nv, dtype),
        )
    length, moment = transmission(m, d)
    velocity = moment @ d.qvel

    ctrl = d.ctrl
    if not mt.opt.disable_clampctrl:
        limited = jnp.asarray(mt.actuator_ctrllimited, bool)
        ctrl = jnp.where(
            limited,
            jnp.clip(ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]),
            ctrl,
        )

    # actuator dynamics input / gain / bias — all elementwise over nu with
    # static type masks (replacing three per-actuator loops)
    dyn_none = jnp.asarray(
        np.array(mt.actuator_dyntype) == DYN_NONE
    )
    actadr = jnp.asarray(np.maximum(np.array(mt.actuator_actadr), 0))
    inp = jnp.where(
        dyn_none, ctrl, d.act[actadr] if mt.na else jnp.zeros(mt.nu, dtype)
    )

    gp, bp = m.actuator_gainprm, m.actuator_biasprm
    gain_fixed = jnp.asarray(np.array(mt.actuator_gaintype) == GAIN_FIXED)
    bias_none = jnp.asarray(np.array(mt.actuator_biastype) == BIAS_NONE)
    gain = jnp.where(
        gain_fixed, gp[:, 0], gp[:, 0] + gp[:, 1] * length + gp[:, 2] * velocity
    ).astype(dtype)
    bias = jnp.where(
        bias_none, 0.0, bp[:, 0] + bp[:, 1] * length + bp[:, 2] * velocity
    ).astype(dtype)

    force = gain * inp + bias
    flimited = jnp.asarray(mt.actuator_forcelimited, bool)
    force = jnp.where(
        flimited,
        jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1]),
        force,
    )
    qfrc = moment.T @ force
    return _replace(
        d,
        actuator_length=length,
        actuator_velocity=velocity,
        actuator_force=force,
        qfrc_actuator=qfrc,
    )


def act_dot(m: T.Model, d: T.Data) -> jax.Array:
    """Time derivative of actuator activation states."""
    mt = m.meta
    dtype = d.qpos.dtype
    if not mt.na:
        return jnp.zeros(0, dtype)
    sel = [u for u in range(mt.nu) if mt.actuator_dyntype[u] != DYN_NONE]
    ui = jnp.asarray(np.array(sel))
    aadr = jnp.asarray(np.array([mt.actuator_actadr[u] for u in sel]))
    is_integ = jnp.asarray(
        np.array([mt.actuator_dyntype[u] == DYN_INTEGRATOR for u in sel])
    )
    tau = jnp.maximum(m.actuator_dynprm[ui, 0], 1e-8)
    vals = jnp.where(
        is_integ, d.ctrl[ui], (d.ctrl[ui] - d.act[aadr]) / tau
    ).astype(dtype)
    return jnp.zeros(mt.na, dtype).at[aadr].set(vals)


# ---------------------------------------------------------------------------
# Passive forces
# ---------------------------------------------------------------------------

def fwd_passive(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    dtype = d.qpos.dtype
    qfrc = -m.dof_damping * d.qvel

    # joint springs (hinge/slide only; ball/free springs unused by target
    # models) — one scatter over the static 1-dof joint set
    sel = [j for j in range(mt.njnt) if mt.jnt_type[j] in (T.HINGE, T.SLIDE)]
    if sel:
        ji = jnp.asarray(np.array(sel))
        qi = jnp.asarray(np.array([mt.jnt_qposadr[j] for j in sel]))
        di = jnp.asarray(np.array([mt.jnt_dofadr[j] for j in sel]))
        qfrc = qfrc.at[di].add(
            -m.jnt_stiffness[ji] * (d.qpos[qi] - m.qpos_spring[qi])
        )

    if mt.ntendon:
        # tendon spring-dampers
        lo = m.tendon_lengthspring[:, 0]
        hi = m.tendon_lengthspring[:, 1]
        dsp = jnp.where(
            d.ten_length < lo, d.ten_length - lo,
            jnp.where(d.ten_length > hi, d.ten_length - hi, 0.0),
        )
        frc = -m.tendon_stiffness * dsp - m.tendon_damping * d.ten_velocity
        qfrc = qfrc + d.ten_J.T @ frc

    if mt.opt.density > 0 or mt.opt.viscosity > 0:
        qfrc = qfrc + _inertia_box_fluid(m, d)

    return _replace(d, qfrc_passive=qfrc)


def _inertia_box_fluid(m: T.Model, d: T.Data):
    """Legacy inertia-box fluid model (mj_passive's density/viscosity drag),
    needed by the Swimmer family (density=4000, viscosity=0.1 in its MJCF).
    Calibrated against mjData.qfrc_passive."""
    mt = m.meta
    dtype = d.qpos.dtype
    rho, beta = mt.opt.density, mt.opt.viscosity
    qfrc = jnp.zeros(mt.nv, dtype)
    from gymnasium_robotics_tpu.physics.constraint import _body_dof_masks

    masks = jnp.asarray(_body_dof_masks(mt), dtype)
    for b in range(1, mt.nbody):
        mass = m.body_mass[b]
        inert = m.body_inertia[b]
        # equivalent box half-sizes from principal inertia
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
        ) / 2.0
        # 6D velocity of body at its com, in the principal (ximat) frame
        o = d.subtree_com[mt.body_rootid[b]]
        w_world = d.cvel[b, :3]
        v_world = d.cvel[b, 3:] + jnp.cross(w_world, d.xipos[b] - o)
        Rm = d.ximat[b]
        w = Rm.T @ w_world
        v = Rm.T @ v_world
        lfrc_t = jnp.zeros(3, dtype)
        lfrc_f = jnp.zeros(3, dtype)
        if beta > 0:
            diam = jnp.mean(box) * 2.0
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
        # back to world, apply at xipos
        f_world = Rm @ lfrc_f
        t_world = Rm @ lfrc_t
        jacp, jacr = _point_jac(m, d, masks[b], d.xipos[b], b)
        qfrc = qfrc + jacp @ f_world + jacr @ t_world
    return qfrc


def _point_jac(m, d, mask, point, body):
    mt = m.meta
    o = d.subtree_com[mt.body_rootid[body]]
    offset = point - o
    jacp = (d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], offset[None, :])) * mask[:, None]
    jacr = d.cdof[:, :3] * mask[:, None]
    return jacp, jacr


# ---------------------------------------------------------------------------
# Level-vectorized implementations (smooth_vec) supersede the unrolled
# reference implementations above: ~10x fewer XLA ops (op count scales with
# tree depth, not body count). The originals are kept (suffix _ref) for
# debugging; numerics are identical (tests/test_physics_parity.py).
# ---------------------------------------------------------------------------
kinematics_ref = kinematics
com_pos_ref = com_pos
com_vel_ref = com_vel
crb_ref = crb
rne_ref = rne

from gymnasium_robotics_tpu.physics import smooth_vec as _sv  # noqa: E402

kinematics = _sv.kinematics
com_pos = _sv.com_pos
com_vel = _sv.com_vel
crb = _sv.crb
rne = _sv.rne
