"""Forward-dynamics pipeline: the fused TPU-native analogue of mj_forward/mj_step.

The reference crosses Python->C once per substep (gymnasium_robotics/envs/
robot_env.py:340-341: ``mj_step(nstep=n_substeps)``). Here the whole pipeline —
kinematics, dynamics, collision, constraint solve, integration, n_substeps loop —
is one jittable pure function of (Model, Data, ctrl), vmappable over env batches.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gymnasium_robotics_tpu.physics import collision as col
from gymnasium_robotics_tpu.physics import constraint as cst
from gymnasium_robotics_tpu.physics import math as gm
from gymnasium_robotics_tpu.physics import smooth
from gymnasium_robotics_tpu.physics import types as T


def make_data(m: T.Model, dtype=jnp.float32) -> T.Data:
    """Fresh Data at qpos0 (the analogue of mujoco.MjData(model) + mj_resetData)."""
    mt = m.meta
    z = lambda *s: jnp.zeros(s, dtype)
    ncon = col.ncon(m)
    pruned = col.prune_plan(mt).active
    contact = T.Contact(
        dist=jnp.full((ncon,), 1e10, dtype),
        pos=z(ncon, 3),
        frame=jnp.tile(jnp.eye(3, dtype=dtype), (ncon, 1, 1)),
        geom1=jnp.zeros(ncon, jnp.int32),
        geom2=jnp.zeros(ncon, jnp.int32),
        src=jnp.zeros(ncon, jnp.int32) if pruned else None,
    )
    # mocap bodies initialize at their model (fixed-body) pose
    mocap_pos = z(mt.nmocap, 3)
    mocap_quat = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (mt.nmocap, 1))
    if mt.nmocap:
        import numpy as np

        mp, mq = [], []
        for b in range(mt.nbody):
            if mt.body_mocapid[b] >= 0:
                mp.append((mt.body_mocapid[b], b))
        for mid, b in sorted(mp):
            mocap_pos = mocap_pos.at[mid].set(m.body_pos[b])
            mocap_quat = mocap_quat.at[mid].set(m.body_quat[b])

    return T.Data(
        time=jnp.zeros((), dtype),
        qpos=m.qpos0.astype(dtype),
        qvel=z(mt.nv),
        act=z(mt.na),
        ctrl=z(mt.nu),
        qfrc_applied=z(mt.nv),
        mocap_pos=mocap_pos,
        mocap_quat=mocap_quat,
        eq_active=jnp.asarray(mt.eq_active0, bool) if mt.neq else jnp.zeros(0, bool),
        xpos=z(mt.nbody, 3), xquat=z(mt.nbody, 4), xmat=z(mt.nbody, 3, 3),
        xipos=z(mt.nbody, 3), ximat=z(mt.nbody, 3, 3),
        xanchor=z(mt.njnt, 3), xaxis=z(mt.njnt, 3),
        geom_xpos=z(mt.ngeom, 3), geom_xmat=z(mt.ngeom, 3, 3),
        site_xpos=z(mt.nsite, 3), site_xmat=z(mt.nsite, 3, 3),
        subtree_com=z(mt.nbody, 3),
        cinert=z(mt.nbody, 10), cdof=z(mt.nv, 6), cvel=z(mt.nbody, 6),
        cdof_dot=z(mt.nv, 6),
        ten_length=z(mt.ntendon), ten_velocity=z(mt.ntendon),
        ten_J=z(mt.ntendon, mt.nv),
        qM=z(mt.nv, mt.nv),
        qfrc_bias=z(mt.nv), qfrc_passive=z(mt.nv), qfrc_actuator=z(mt.nv),
        actuator_length=z(mt.nu), actuator_velocity=z(mt.nu),
        actuator_force=z(mt.nu),
        qfrc_smooth=z(mt.nv), qacc_smooth=z(mt.nv),
        qfrc_constraint=z(mt.nv), qacc=z(mt.nv),
        contact=contact,
        con_force=z(ncon, 6),
        cfrc_ext=z(mt.nbody, 6),
        sensordata=z(mt.nsensordata),
    )


def _use_lanes(mt: T.Meta) -> bool:
    """Gate for the lane-layout fused pallas kernels (same policy as the
    fused Newton solver: on for TPU under 'auto')."""
    fused = mt.opt.fused_solver
    return 0 < mt.nv <= 48 and (
        fused is True or fused == "force"
        or (fused == "auto" and jax.default_backend() == "tpu")
    )


def _solve_pos(m: T.Model, M, rhs):
    """SPD solve M x = rhs: one fused pallas kernel on TPU (lane-layout
    Cholesky), XLA's batched Cholesky elsewhere."""
    if _use_lanes(m.meta):
        from gymnasium_robotics_tpu.physics import solver_pallas

        return solver_pallas.solve_pos_lanes(
            M, rhs, interpret=jax.default_backend() != "tpu"
        )
    return jax.scipy.linalg.solve(M, rhs, assume_a="pos")


def fwd_position(m: T.Model, d: T.Data) -> T.Data:
    d = smooth.kinematics(m, d)
    d = smooth.com_pos(m, d)
    d = smooth.tendon(m, d)
    d = smooth.crb(m, d)
    d = col.collision(m, d)
    return d


def fwd_velocity(m: T.Model, d: T.Data) -> T.Data:
    d = smooth.com_vel(m, d)
    d = smooth.rne(m, d)
    d = smooth.fwd_passive(m, d)
    return d


def forward(m: T.Model, d: T.Data) -> T.Data:
    d = fwd_position(m, d)
    d = fwd_velocity(m, d)
    d = smooth.fwd_actuation(m, d)
    qfrc_smooth = (
        d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator + d.qfrc_applied
    )
    d = dataclasses.replace(d, qfrc_smooth=qfrc_smooth)
    qacc_smooth = _solve_pos(
        m, d.qM, qfrc_smooth
    ) if m.meta.nv else jnp.zeros(0, d.qpos.dtype)
    d = dataclasses.replace(d, qacc_smooth=qacc_smooth)
    d = cst.solve_constraints(m, d)
    from gymnasium_robotics_tpu.physics import sensor

    d = sensor.sensors(m, d)
    return d


def _int_plan(mt: T.Meta):
    """Static index tables for vectorized qpos integration (cached per Meta)."""
    import numpy as np

    plan = _INT_PLAN_CACHE.get(mt)
    if plan is not None:
        return plan
    q1, d1 = [], []          # 1-dof joints
    qf3, df3 = [], []        # free joints: translation triplets
    quat4, quatw = [], []    # free+ball joints: quat block / omega block
    for j in range(mt.njnt):
        jt = mt.jnt_type[j]
        qadr, dadr = mt.jnt_qposadr[j], mt.jnt_dofadr[j]
        if jt == T.FREE:
            qf3.append([qadr, qadr + 1, qadr + 2])
            df3.append([dadr, dadr + 1, dadr + 2])
            quat4.append([qadr + 3 + k for k in range(4)])
            quatw.append([dadr + 3 + k for k in range(3)])
        elif jt == T.BALL:
            quat4.append([qadr + k for k in range(4)])
            quatw.append([dadr + k for k in range(3)])
        else:
            q1.append(qadr)
            d1.append(dadr)
    plan = tuple(
        np.array(x, dtype=np.int64) for x in (q1, d1, qf3, df3, quat4, quatw)
    )
    _INT_PLAN_CACHE[mt] = plan
    return plan


_INT_PLAN_CACHE: dict = {}


def _integrate_qpos(m: T.Model, qpos, qvel, dt):
    """Vectorized per-joint-type integration (one scatter per group instead of
    a per-joint unrolled loop — FetchPush njnt=16, hand 26, x4 for RK4)."""
    q1, d1, qf3, df3, quat4, quatw = _int_plan(m.meta)
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
        q = qpos[jnp.asarray(quat4)]        # (k, 4)
        w = qvel[jnp.asarray(quatw)]        # (k, 3)
        out = out.at[jnp.asarray(quat4)].set(gm.quat_integrate(q, w, dt))
    return out


def _euler(m: T.Model, d: T.Data) -> T.Data:
    """Semi-implicit Euler with implicit joint damping (mirrors mj_Euler)."""
    mt = m.meta
    h = mt.opt.timestep
    if mt.na:
        act = d.act + h * smooth.act_dot(m, d)
        act = _clamp_act(m, act)
    else:
        act = d.act
    # implicit damping: (M + h*diag(B)) v' = M v + h * (qfrc_smooth + qfrc_constraint + B v)
    has_damping = m.meta.has_damping
    qfrc = d.qfrc_smooth + d.qfrc_constraint
    if has_damping:
        MhB = d.qM + h * jnp.diag(m.dof_damping)
        rhs = d.qM @ d.qvel + h * (qfrc + m.dof_damping * d.qvel)
        qvel = _solve_pos(m, MhB, rhs)
    else:
        qvel = d.qvel + h * d.qacc
    qpos = _integrate_qpos(m, d.qpos, qvel, h)
    return dataclasses.replace(
        d, qpos=qpos, qvel=qvel, act=act, time=d.time + h
    )


def _clamp_act(m: T.Model, act):
    mt = m.meta
    if not mt.na:
        return act
    import numpy as np

    sel = [u for u in range(mt.nu) if mt.actuator_dyntype[u] != smooth.DYN_NONE]
    ui = jnp.asarray(np.array(sel))
    aadr = jnp.asarray(np.array([mt.actuator_actadr[u] for u in sel]))
    return act.at[aadr].set(
        jnp.clip(
            act[aadr], m.actuator_actrange[ui, 0], m.actuator_actrange[ui, 1]
        )
    )


def _rk4(m: T.Model, d: T.Data) -> T.Data:
    """4th-order Runge-Kutta (mirrors mj_RungeKutta with RK4 tableau)."""
    h = m.meta.opt.timestep
    A = [0.5, 0.5, 1.0]
    Bc = [1.0 / 6, 1.0 / 3, 1.0 / 3, 1.0 / 6]

    def deriv(dd):
        return dd.qvel, dd.qacc, smooth.act_dot(m, dd)

    qpos0, qvel0, act0 = d.qpos, d.qvel, d.act
    kq, kv, ka = [d.qvel], [d.qacc], [smooth.act_dot(m, d)]
    dd = d
    for i in range(3):
        qpos = _integrate_qpos(m, qpos0, kq[i], A[i] * h)
        qvel = qvel0 + A[i] * h * kv[i]
        act = act0 + A[i] * h * ka[i]
        dd = dataclasses.replace(dd, qpos=qpos, qvel=qvel, act=act)
        dd = forward(m, dd)
        kq.append(dd.qvel)
        kv.append(dd.qacc)
        ka.append(smooth.act_dot(m, dd))

    vavg = sum(b * k for b, k in zip(Bc, kq))
    aavg = sum(b * k for b, k in zip(Bc, kv))
    actavg = sum(b * k for b, k in zip(Bc, ka))
    qpos = _integrate_qpos(m, qpos0, vavg, h)
    qvel = qvel0 + h * aavg
    act = _clamp_act(m, act0 + h * actavg)
    # derived fields (contacts, cfrc_ext, ...) are reported from the LAST RK
    # stage — matching MuJoCo's mj_RungeKutta, whose post-step mjData carries
    # the final intermediate stage's forward results
    return dataclasses.replace(
        dd, qpos=qpos, qvel=qvel, act=act, time=d.time + h
    )


def step(m: T.Model, d: T.Data) -> T.Data:
    """One physics step: forward dynamics + integration."""
    d = forward(m, d)
    if m.meta.opt.integrator == T.RK4:
        return _rk4(m, d)
    return _euler(m, d)


def step_n(m: T.Model, d: T.Data, ctrl, n: int) -> T.Data:
    """n_substeps stepping with fixed ctrl (the reference's mj_step(nstep=n)).

    On TPU (Option.soa gate) the env batch enters the batch-last SoA pipeline
    through one custom_vmap boundary; elsewhere this is the plain scan."""
    from gymnasium_robotics_tpu.physics import soa

    if soa.use_soa(m.meta):
        return soa.step_n(m, d, ctrl, n)
    return step_n_loop(m, d, ctrl, n)


def refresh_kin(m: T.Model, d: T.Data, com: bool = True) -> T.Data:
    """Kinematics (+com_pos) refresh for env-layer callbacks (the
    mj_forward-after-qpos-write analogue, reference fetch_env.py:295-303 and
    reset-state construction). Routed batch-last on TPU like step_n."""
    from gymnasium_robotics_tpu.physics import soa

    if soa.use_soa(m.meta):
        return soa.refresh_kin(m, d, com)
    d = smooth.kinematics(m, d)
    return smooth.com_pos(m, d) if com else d


def step_n_loop(m: T.Model, d: T.Data, ctrl, n: int) -> T.Data:
    """The reference (per-env AoS) substep loop; also the SoA entry's
    single-env fallback — must not re-dispatch to soa.step_n."""
    d = dataclasses.replace(d, ctrl=ctrl)

    def body(dd, _):
        return step(m, dd), ()

    d, _ = jax.lax.scan(body, d, None, length=n)
    return d
