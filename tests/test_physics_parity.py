"""Physics-core parity vs the MuJoCo C engine (distilled from tools/calibrate.py;
mirrors the reference's determinism-rollout strategy, tests/test_envs.py:62-117,
applied at the physics level: same state in both engines => same derivatives)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")

from gymnasium_robotics_tpu.mjcf.import_mjcf import import_model
from gymnasium_robotics_tpu.physics import pipeline

PENDULUM = """
<mujoco>
  <option timestep="0.01" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint type="hinge" axis="0 1 0" damping="0.1" limited="true" range="-1.2 1.2"/>
      <geom type="capsule" fromto="0 0 0 0.5 0 0" size="0.05"/>
      <body pos="0.5 0 0">
        <joint type="hinge" axis="1 0 0" damping="0.05"/>
        <geom type="capsule" fromto="0 0 0 0 0.4 0" size="0.04"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

BOX_DROP = """
<mujoco><option timestep="0.002"/>
 <worldbody>
  <geom type="plane" size="5 5 0.1"/>
  <body pos="0.02 0.01 0.4"><freejoint/><geom type="box" size="0.1 0.08 0.06"/></body>
 </worldbody></mujoco>
"""

GYM_ASSETS = "/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets"


def _setup(xml_or_path, seed=0):
    if xml_or_path.endswith(".xml"):
        mjm = mujoco.MjModel.from_xml_path(xml_or_path)
    else:
        mjm = mujoco.MjModel.from_xml_string(xml_or_path)
    mjd = mujoco.MjData(mjm)
    rng = np.random.default_rng(seed)
    qpos = mjm.qpos0 + rng.uniform(-0.05, 0.05, mjm.nq)
    for j in range(mjm.njnt):
        t, adr = mjm.jnt_type[j], mjm.jnt_qposadr[j]
        if t == 0:
            qpos[adr + 3:adr + 7] /= np.linalg.norm(qpos[adr + 3:adr + 7])
        elif t == 1:
            qpos[adr:adr + 4] /= np.linalg.norm(qpos[adr:adr + 4])
    qvel = rng.uniform(-0.3, 0.3, mjm.nv)
    ctrl = rng.uniform(-1, 1, mjm.nu) if mjm.nu else np.zeros(0)
    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    if mjm.nu:
        mjd.ctrl[:] = ctrl
    m = import_model(mjm, dtype=np.float64)
    d = pipeline.make_data(m, dtype=jnp.float64)
    d = dataclasses.replace(
        d, qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
        ctrl=jnp.asarray(ctrl, jnp.float64),
    )
    return mjm, mjd, m, d


@pytest.mark.parametrize(
    "xml", [PENDULUM, BOX_DROP, f"{GYM_ASSETS}/ant.xml", f"{GYM_ASSETS}/half_cheetah.xml"],
    ids=["pendulum", "box_drop", "ant", "half_cheetah"],
)
def test_forward_matches_mujoco(xml):
    mjm, mjd, m, d = _setup(xml)
    mujoco.mj_forward(mjm, mjd)
    d = jax.jit(pipeline.forward)(m, d)
    np.testing.assert_allclose(np.asarray(d.xpos), mjd.xpos, atol=1e-10)
    qM = np.zeros((mjm.nv, mjm.nv))
    mujoco.mj_fullM(mjm, mjd, qM)
    np.testing.assert_allclose(np.asarray(d.qM), qM, atol=1e-10)
    np.testing.assert_allclose(np.asarray(d.qfrc_bias), mjd.qfrc_bias, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("xml", [PENDULUM, BOX_DROP], ids=["pendulum", "box_drop"])
def test_trajectory_matches_mujoco(xml):
    mjm, mjd, m, d = _setup(xml)
    step = jax.jit(pipeline.step)
    for _ in range(200):
        mujoco.mj_step(mjm, mjd)
        d = step(m, d)
    np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
    np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-7)


def test_batched_step_vmaps():
    mjm, mjd, m, d = _setup(BOX_DROP)
    B = 32
    batch = jax.tree_util.tree_map(lambda x: jnp.tile(x, (B,) + (1,) * x.ndim), d)
    stepped = jax.jit(jax.vmap(pipeline.step, in_axes=(None, 0)))(m, batch)
    assert stepped.qpos.shape == (B, mjm.nq)
    # all instances identical inputs -> identical outputs
    assert np.allclose(np.asarray(stepped.qpos[0]), np.asarray(stepped.qpos[-1]))


def test_sphere_cylinder_narrowphase_exact():
    """Sphere vs true-cylinder contact matches MuJoCo analytically (flat caps,
    lateral wall, rim; engine_collision_primitive sphere-cylinder)."""
    from gymnasium_robotics_tpu.physics import collision as C

    rng = np.random.default_rng(7)
    checked = 0
    for _ in range(120):
        q1 = rng.normal(size=4); q1 /= np.linalg.norm(q1)
        q2 = rng.normal(size=4); q2 /= np.linalg.norm(q2)
        p1 = rng.uniform(-0.05, 0.05, 3)
        p2 = rng.uniform(-0.05, 0.05, 3)
        xml = f"""<mujoco><worldbody>
          <body pos="{p1[0]} {p1[1]} {p1[2]}" quat="{q1[0]} {q1[1]} {q1[2]} {q1[3]}">
            <geom type="sphere" size="0.05"/><freejoint/></body>
          <body pos="{p2[0]} {p2[1]} {p2[2]}" quat="{q2[0]} {q2[1]} {q2[2]} {q2[3]}">
            <geom type="cylinder" size="0.035 0.005"/><freejoint/></body>
        </worldbody></mujoco>"""
        mjm = mujoco.MjModel.from_xml_string(xml)
        mjd = mujoco.MjData(mjm)
        mujoco.mj_forward(mjm, mjd)
        if mjd.ncon != 1:
            continue
        R1 = np.zeros(9); mujoco.mju_quat2Mat(R1, q1)
        R2 = np.zeros(9); mujoco.mju_quat2Mat(R2, q2)
        dist, pos, n = C._sphere_cylinder(
            jnp.asarray(p1), jnp.asarray(R1.reshape(3, 3)),
            jnp.asarray([0.05, 0.0, 0.0]),
            jnp.asarray(p2), jnp.asarray(R2.reshape(3, 3)),
            jnp.asarray([0.035, 0.005, 0.0]),
        )
        np.testing.assert_allclose(float(dist[0]), mjd.contact[0].dist, atol=1e-9)
        np.testing.assert_allclose(np.asarray(pos[0]), mjd.contact[0].pos, atol=1e-9)
        checked += 1
    assert checked > 30


def test_touch_sensor_zone_matches_mujoco():
    """Touch sensordata parity on a sphere resting on a cylinder-site body
    (the Adroit hammer S_nail configuration, adroit_hammer.py:344-346)."""
    xml = """<mujoco>
      <worldbody>
        <body name="pad" pos="0 0 0">
          <geom type="cylinder" size="0.05 0.01"/>
          <site name="zone" type="cylinder" size="0.03 0.012" pos="0 0 0"/>
        </body>
        <body pos="0.0 0.0 0.05"><geom type="sphere" size="0.03"/><freejoint/></body>
        <body pos="0.045 0.0 0.05"><geom type="sphere" size="0.03"/><freejoint/></body>
      </worldbody>
      <sensor><touch site="zone" name="t"/></sensor>
    </mujoco>"""
    mjm = mujoco.MjModel.from_xml_string(xml)
    mjd = mujoco.MjData(mjm)
    for _ in range(100):
        mujoco.mj_step(mjm, mjd)
    m = import_model(mjm, dtype=np.float64)
    d = pipeline.make_data(m, dtype=jnp.float64)
    d = dataclasses.replace(
        d, qpos=jnp.asarray(mjd.qpos), qvel=jnp.asarray(mjd.qvel)
    )
    d = jax.jit(pipeline.forward)(m, d)
    # first sphere settles inside the zone (counted), second on the rim
    # outside it (not counted): value tracks the C touch sensor
    assert mjd.sensordata[0] > 0
    np.testing.assert_allclose(
        float(d.sensordata[0]), mjd.sensordata[0], rtol=0.05
    )


def test_fused_solver_matches_generic():
    """The pallas fused Newton solver (physics/solver_pallas.py) must agree
    with constraint.solve_constraints bitwise on the PointMaze system
    (interpret mode on CPU; the TPU path compiles the same kernel)."""
    from gymnasium_robotics_tpu.envs.maze.point_maze import PointMazeEnv

    env = PointMazeEnv(dtype=jnp.float64)
    m = env.model
    rng = np.random.default_rng(3)
    for _ in range(3):
        d = pipeline.make_data(m, dtype=jnp.float64)
        d = dataclasses.replace(
            d,
            qpos=jnp.asarray(rng.uniform(-1, 1, m.nq)),
            qvel=jnp.asarray(rng.normal(0, 2, m.nv)),
            ctrl=jnp.asarray(rng.uniform(-1, 1, m.nu)),
        )
        gen = pipeline.forward(m.with_options(fused_solver="off"), d)
        fus = pipeline.forward(m.with_options(fused_solver="force"), d)
        # f64 ULP-level tolerance: the warmstarted kernel's op order differs
        # from the XLA path by one rounding
        np.testing.assert_allclose(
            np.asarray(gen.qacc), np.asarray(fus.qacc), rtol=0, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(gen.qfrc_constraint), np.asarray(fus.qfrc_constraint),
            rtol=0, atol=1e-8,
        )


def test_fused_solver_generic_nv_matches():
    """Generic-nv fused kernel (solver_pallas.solve_small) vs the generic
    solver on hopper (nv=6): same Newton trajectory, Cholesky-ordering fp
    noise only."""
    from gymnasium_robotics_tpu.envs.locomotion.locomotion import make_hopper

    env = make_hopper(dtype=jnp.float64)
    m = env.model
    rng = np.random.default_rng(5)
    d = pipeline.make_data(m, dtype=jnp.float64)
    d = dataclasses.replace(
        d,
        qpos=jnp.asarray(np.asarray(m.qpos0) + rng.uniform(-0.1, 0.1, m.nq)),
        qvel=jnp.asarray(rng.normal(0, 1, m.nv)),
        ctrl=jnp.asarray(rng.uniform(-1, 1, m.nu)),
    )
    gen = pipeline.forward(m.with_options(fused_solver="off"), d)
    fus = pipeline.forward(m.with_options(fused_solver="force"), d)
    np.testing.assert_allclose(
        np.asarray(gen.qacc), np.asarray(fus.qacc), atol=1e-9
    )


def test_fused_solver_trajectory_stays_on_generic_path():
    """50-step PointMaze trajectory: fused and generic solvers produce the
    same states (bitwise at f64) — guards active-set chatter divergence."""
    from gymnasium_robotics_tpu.envs.maze.point_maze import PointMazeEnv

    env = PointMazeEnv(dtype=jnp.float64)
    m_gen = env.model.with_options(fused_solver="off")
    m_fus = env.model.with_options(fused_solver="force")
    d_gen = pipeline.make_data(m_gen, dtype=jnp.float64)
    rng = np.random.default_rng(11)
    d_gen = dataclasses.replace(
        d_gen,
        qpos=jnp.asarray(rng.uniform(-0.5, 0.5, m_gen.nq)),
        qvel=jnp.asarray(rng.normal(0, 1, m_gen.nv)),
        ctrl=jnp.asarray(rng.uniform(-1, 1, m_gen.nu)),
    )
    d_fus = d_gen
    step_gen = jax.jit(lambda d: pipeline.step(m_gen, d))
    step_fus = jax.jit(lambda d: pipeline.step(m_fus, d))
    for _ in range(50):
        d_gen = step_gen(d_gen)
        d_fus = step_fus(d_fus)
    np.testing.assert_allclose(
        np.asarray(d_gen.qpos), np.asarray(d_fus.qpos), rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(d_gen.qvel), np.asarray(d_fus.qvel), rtol=0, atol=1e-8
    )


def test_solve_pos_lanes_matches_xla():
    """Fused lane-layout SPD solve (pallas, interpret mode on CPU) agrees
    with XLA's Cholesky solve for the nv sizes the families use."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gymnasium_robotics_tpu.physics import solver_pallas as sp

    rng = np.random.default_rng(0)
    for nv in (2, 14, 21, 29, 36):
        A = rng.normal(size=(8, nv, nv)).astype(np.float32)
        M = A @ np.swapaxes(A, 1, 2) + nv * np.eye(nv, dtype=np.float32)
        b = rng.normal(size=(8, nv)).astype(np.float32)
        got = jax.vmap(
            lambda Mi, bi: sp.solve_pos_lanes(Mi, bi, interpret=True)
        )(jnp.asarray(M), jnp.asarray(b))
        want = jax.vmap(
            lambda Mi, bi: jax.scipy.linalg.solve(Mi, bi, assume_a="pos")
        )(jnp.asarray(M), jnp.asarray(b))
        err = np.max(np.abs(np.asarray(got) - np.asarray(want)))
        rel = err / max(1e-6, float(np.max(np.abs(np.asarray(want)))))
        assert rel < 5e-5, f"nv={nv}: rel err {rel}"


def test_box_box_edge_edge_contact():
    """SAT edge-edge manifold (collision_vec._box_box_edge): two crossing
    box edges produce a contact the vertex-face cases miss, with the exact
    penetration depth and midpoint position."""
    import numpy as np

    from gymnasium_robotics_tpu.physics import collision_vec as cv

    def pose(p, Rm, s):
        return (
            jnp.asarray(p, jnp.float32).reshape(3, 1, 1),
            jnp.asarray(Rm, jnp.float32).reshape(3, 3, 1, 1),
            jnp.asarray(s, jnp.float32).reshape(3, 1, 1),
        )

    a = np.pi / 4
    R2 = np.array(
        [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]]
    )
    z2 = 0.45 + np.sqrt(2) * 0.5  # crossing edges overlap by 0.05
    p1, R1m, s1 = pose([0, 0, 0], np.eye(3), [0.5] * 3)
    p2, R2m, s2 = pose([0, 0, z2], R2, [0.5] * 3)
    d, pos, n = cv._box_box_edge(p1, R1m, s1, p2, R2m, s2)
    assert abs(float(d[0, 0, 0]) + 0.05) < 1e-5
    np.testing.assert_allclose(
        np.asarray(pos)[0, :, 0, 0], [0, 0, 0.475], atol=1e-5
    )
    # separated by 0.15 along the same axis
    p2b = jnp.asarray([0, 0, z2 + 0.2], jnp.float32).reshape(3, 1, 1)
    d2, _, _ = cv._box_box_edge(p1, R1m, s1, p2b, R2m, s2)
    assert abs(float(d2[0, 0, 0]) - 0.15) < 1e-5


def test_hull_sat_matches_box_analytic():
    """A convex hull built from a box's corners must reproduce the analytic
    sphere-box distances through the hull-SAT path (collision_vec
    _sphere_hull_probe) for face-region queries."""
    import numpy as np

    from gymnasium_robotics_tpu.mjcf.import_mjcf import _convex_hull
    from gymnasium_robotics_tpu.physics import collision_vec as cv

    half = np.array([0.2, 0.3, 0.4])
    corners = np.array(
        [[i, j, k] for i in (-1, 1) for j in (-1, 1) for k in (-1, 1)],
        dtype=np.float64,
    ) * half
    hv, hf = _convex_hull(corners)
    fn = jnp.asarray(hf[:, :3], jnp.float32).reshape(-1, 3, 1, 1)
    fd = jnp.asarray(hf[:, 3], jnp.float32).reshape(-1, 1, 1)

    def probe(center, r):
        c = jnp.asarray(center, jnp.float32).reshape(3, 1, 1)
        p2 = jnp.zeros((3, 1, 1), jnp.float32)
        R2 = jnp.asarray(np.eye(3), jnp.float32).reshape(3, 3, 1, 1)
        d, pos, n = cv._sphere_hull_probe(
            c, jnp.full((1, 1), r, jnp.float32), p2, R2, fn, fd
        )
        return float(d[0, 0, 0]), np.asarray(n)[0, :, 0, 0]

    # face-region queries: exact distance and face normal
    d, n = probe([0.0, 0.0, 0.9], 0.1)   # above +z face
    assert abs(d - (0.9 - 0.4 - 0.1)) < 1e-5
    np.testing.assert_allclose(n, [0, 0, -1], atol=1e-5)
    d, n = probe([0.5, 0.0, 0.0], 0.1)   # outside +x face
    assert abs(d - (0.5 - 0.2 - 0.1)) < 1e-5
    # center inside the hull near the -y face: depth = -(0.05 + r)
    d, n = probe([0.0, -0.25, 0.0], 0.1)
    assert abs(d - (-0.15)) < 1e-5
    np.testing.assert_allclose(n, [0, 1, 0], atol=1e-5)  # -outward, as _sphere_box inside case


def test_hull_contact_matches_mujoco_mesh():
    """Cross-engine: the hull face-SAT contact agrees with MuJoCo's mesh
    (MPR) collision for face-region queries on a convex mesh."""
    import numpy as np

    verts = np.array(
        [[i, j, k] for i in (-0.1, 0.1) for j in (-0.12, 0.12)
         for k in (-0.06, 0.06)]
    )
    vtxt = " ".join(str(x) for x in verts.ravel())
    xml = f"""<mujoco>
      <asset><mesh name="bx" vertex="{vtxt}"/></asset>
      <worldbody>
        <body pos="0 0 0"><freejoint/><geom type="mesh" mesh="bx"/></body>
        <body pos="0 0 0.2"><freejoint/><geom type="sphere" size="0.05"/></body>
      </worldbody></mujoco>"""
    mjm = mujoco.MjModel.from_xml_string(xml)
    mjd = mujoco.MjData(mjm)
    m = import_model(mjm, dtype=np.float64)
    fwd = jax.jit(pipeline.forward)
    rng = np.random.default_rng(0)
    checked = 0
    for _ in range(30):
        mjd.qpos[:] = mjm.qpos0
        mjd.qpos[7:10] = [
            rng.uniform(-0.05, 0.05), rng.uniform(-0.06, 0.06),
            rng.uniform(0.095, 0.115),  # near the top face, face region
        ]
        mujoco.mj_forward(mjm, mjd)
        if mjd.ncon != 1:
            continue
        d = pipeline.make_data(m, dtype=jnp.float64)
        d = dataclasses.replace(d, qpos=jnp.asarray(mjd.qpos.copy()))
        d = fwd(m, d)
        ours = float(np.asarray(d.contact.dist).min())
        assert abs(ours - mjd.contact[0].dist) < 2e-3, (
            ours, mjd.contact[0].dist
        )
        checked += 1
    assert checked > 10


def test_hull_edge_edge_matches_mujoco_mesh():
    """Cross-engine: MPR (physics/mpr.py) recovers the exact penetration
    depth/axis for EDGE-EDGE witness configurations two crossed mesh boxes
    produce — features the face-SAT vertex/face probes approximate. The
    reference reaches the same physics through MuJoCo's convex collider
    inside mj_step (gymnasium_robotics/envs/robot_env.py:340-341)."""
    import numpy as np

    verts = np.array(
        [[i, j, k] for i in (-0.5, 0.5) for j in (-0.5, 0.5)
         for k in (-0.5, 0.5)]
    )
    vtxt = " ".join(str(x) for x in verts.ravel())
    xml = f"""<mujoco>
      <asset><mesh name="bx" vertex="{vtxt}"/></asset>
      <worldbody>
        <body pos="0 0 0"><freejoint/><geom type="mesh" mesh="bx" mass="1"/></body>
        <body pos="0 0 2"><freejoint/><geom type="mesh" mesh="bx" mass="1"/></body>
      </worldbody></mujoco>"""
    mjm = mujoco.MjModel.from_xml_string(xml)
    mjd = mujoco.MjData(mjm)
    m = import_model(mjm, dtype=np.float64)
    fwd = jax.jit(pipeline.forward)

    def mj_pen(p2, q2):
        mjd.qpos[:] = mjm.qpos0
        mjd.qpos[7:10] = p2
        mjd.qpos[10:14] = q2
        mujoco.mj_forward(mjm, mjd)
        pens = [
            (mjd.contact[i].dist, mjd.contact[i].frame[:3].copy())
            for i in range(mjd.ncon) if mjd.contact[i].dist < -1e-9
        ]
        return min(pens, key=lambda t: t[0]) if pens else None

    rng = np.random.default_rng(3)
    checked = 0
    for _ in range(40):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(0.3, 1.2)
        q2 = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
        dirn = rng.normal(size=3)
        dirn /= np.linalg.norm(dirn)
        lo, hi = 0.0, 3.0
        for _ in range(36):  # binary search the touching separation
            mid = 0.5 * (lo + hi)
            if mj_pen(mid * dirn, q2) is not None:
                lo = mid
            else:
                hi = mid
        p2 = (lo - rng.uniform(0.005, 0.04)) * dirn  # shallow penetration
        truth = mj_pen(p2, q2)
        if truth is None:
            continue
        td, tn = truth
        d = pipeline.make_data(m, dtype=jnp.float64)
        qpos = np.array(mjd.qpos)
        d = dataclasses.replace(d, qpos=jnp.asarray(qpos))
        d = fwd(m, d)
        dist = np.asarray(d.contact.dist)
        i = int(np.argmin(dist))
        ours = float(dist[i])
        n_ours = np.asarray(d.contact.frame)[i, 0]
        # depth within 2 mm of MuJoCo on a unit-scale box; normals aligned
        assert abs(ours - td) < 2e-3, (ours, td)
        assert abs(float(np.dot(n_ours, tn))) > 0.95, (n_ours, tn)
        checked += 1
    assert checked > 15


def test_mpr_off_drift_bound():
    """Bound the CPU<->TPU contact-physics divergence: the TPU production
    path keeps Option.mpr off (face-SAT only — collision_vec.use_mpr_xla),
    while CPU parity tests run with MPR on. Re-run a contact-rich in-hand
    rollout both ways from the same state and require the face-SAT
    trajectory to stay finite and within a documented bound of the MPR one,
    so the approximation can't silently blow past what the drift guards
    (tests/test_families.py::test_long_horizon_drift_guard) certify."""
    from gymnasium_robotics_tpu import registry

    env = registry.make("HandManipulateBlockRotateZ-v1")
    m_on = env.model.with_options(mpr="force")
    m_off = env.model.with_options(mpr=False)
    s = env.initial(jax.random.key(0))
    d0 = s.data
    step_on = jax.jit(lambda d, c: pipeline.step_n_loop(m_on, d, c, 5))
    step_off = jax.jit(lambda d, c: pipeline.step_n_loop(m_off, d, c, 5))
    rng = np.random.default_rng(7)
    d_on, d_off = d0, d0
    for _ in range(10):
        ctrl = jnp.asarray(
            rng.uniform(-0.3, 0.3, env.model.meta.nu), jnp.float32
        )
        d_on = step_on(d_on, ctrl)
        d_off = step_off(d_off, ctrl)
    q_on = np.asarray(d_on.qpos)
    q_off = np.asarray(d_off.qpos)
    assert np.isfinite(q_off).all()
    # hand joints (first 24 dofs) — the block free joint may diverge more
    err = float(np.max(np.abs(q_on[:24] - q_off[:24])))
    assert err < 0.1, f"face-SAT vs MPR hand-joint divergence {err}"
