"""Dev harness: stage-by-stage numerical comparison vs the MuJoCo C engine.

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python tools/calibrate.py [model]
Iterated during development until every stage matches; the distilled checks
live in tests/test_physics_parity.py.
"""

import sys

import numpy as np

np.set_printoptions(precision=5, suppress=True, linewidth=200)

import jax
import mujoco

from gymnasium_robotics_tpu.mjcf.import_mjcf import import_model
from gymnasium_robotics_tpu.physics import pipeline

TOY_PENDULUM = """
<mujoco>
  <option timestep="0.01" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.5 0 0" size="0.05" density="1000"/>
      <body pos="0.5 0 0">
        <joint name="hinge2" type="hinge" axis="1 0 0" damping="0.05"/>
        <geom type="capsule" fromto="0 0 0 0 0.4 0" size="0.04"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

TOY_FREE = """
<mujoco>
  <option timestep="0.01"/>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <body pos="0 0 1">
      <freejoint/>
      <geom type="box" size="0.1 0.15 0.2" density="500"/>
    </body>
  </worldbody>
</mujoco>
"""

TOY_BALL = """
<mujoco>
  <option timestep="0.01"/>
  <worldbody>
    <body pos="0 0 1">
      <joint type="ball" damping="0.02"/>
      <geom type="capsule" fromto="0 0 0 0.3 0.1 -0.2" size="0.04"/>
      <body pos="0.3 0.1 -0.2">
        <joint type="slide" axis="0 0 1" stiffness="10" damping="0.1"/>
        <geom type="sphere" size="0.06"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

TOY_SLIDE2 = """
<mujoco>
  <option timestep="0.01" gravity="0 0 0"/>
  <worldbody>
    <geom type="plane" size="5 5 0.1" contype="1" conaffinity="0"/>
    <body pos="0 0 0">
      <geom type="sphere" size="0.1" contype="1" conaffinity="1"/>
      <joint name="x" type="slide" axis="1 0 0"/>
      <joint name="y" type="slide" axis="0 1 0"/>
    </body>
  </worldbody>
  <actuator>
    <motor joint="x" gear="100" ctrlrange="-1 1" ctrllimited="true"/>
    <motor joint="y" gear="100" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>
</mujoco>
"""


def compare(name, mine, ref, tol=1e-4):
    mine = np.asarray(mine, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64).reshape(mine.shape)
    err = np.max(np.abs(mine - ref)) if mine.size else 0.0
    ok = "OK " if err < tol else "FAIL"
    print(f"  {ok} {name:16s} maxerr={err:.3e}")
    if err >= tol:
        print("    mine:", mine.ravel()[:12])
        print("    ref :", ref.ravel()[:12])
    return err < tol


def run(xml_or_path, qpos=None, qvel=None, ctrl=None, seed=0):
    if xml_or_path.endswith(".xml"):
        mjm = mujoco.MjModel.from_xml_path(xml_or_path)
    else:
        mjm = mujoco.MjModel.from_xml_string(xml_or_path)
    mjd = mujoco.MjData(mjm)
    rng = np.random.default_rng(seed)
    if qpos is None:
        qpos = mjm.qpos0 + rng.uniform(-0.1, 0.1, mjm.nq)
        # renormalize quats
        for j in range(mjm.njnt):
            t = mjm.jnt_type[j]
            adr = mjm.jnt_qposadr[j]
            if t == 0:
                qpos[adr + 3:adr + 7] /= np.linalg.norm(qpos[adr + 3:adr + 7])
            elif t == 1:
                qpos[adr:adr + 4] /= np.linalg.norm(qpos[adr:adr + 4])
    if qvel is None:
        qvel = rng.uniform(-0.5, 0.5, mjm.nv)
    if ctrl is None and mjm.nu:
        ctrl = rng.uniform(-1, 1, mjm.nu)

    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    if mjm.nu:
        mjd.ctrl[:] = ctrl
    mujoco.mj_forward(mjm, mjd)

    m = import_model(mjm, dtype=np.float64)
    d = pipeline.make_data(m, dtype=jax.numpy.float64)
    import dataclasses

    d = dataclasses.replace(
        d,
        qpos=jax.numpy.asarray(qpos),
        qvel=jax.numpy.asarray(qvel),
        ctrl=jax.numpy.asarray(ctrl if ctrl is not None else np.zeros(mjm.nu)),
    )
    d = jax.jit(pipeline.forward)(m, d)

    print(f"model nq={mjm.nq} nv={mjm.nv} nbody={mjm.nbody} ncon_ref={mjd.ncon}")
    compare("xpos", d.xpos, mjd.xpos)
    compare("xquat", np.abs(np.asarray(d.xquat)), np.abs(mjd.xquat.reshape(-1, 4)))
    compare("xipos", d.xipos, mjd.xipos)
    compare("subtree_com", d.subtree_com, mjd.subtree_com)
    compare("cinert", d.cinert, mjd.cinert)
    compare("cdof", d.cdof, mjd.cdof)
    compare("cvel", d.cvel, mjd.cvel)
    compare("cdof_dot", d.cdof_dot, mjd.cdof_dot)
    qM_ref = np.zeros((mjm.nv, mjm.nv))
    mujoco.mj_fullM(mjm, mjd, qM_ref)
    compare("qM", d.qM, qM_ref)
    compare("qfrc_bias", d.qfrc_bias, mjd.qfrc_bias)
    compare("qfrc_passive", d.qfrc_passive, mjd.qfrc_passive)
    if mjm.nu:
        compare("act_length", d.actuator_length, mjd.actuator_length)
        compare("act_force", d.actuator_force, mjd.actuator_force)
        compare("qfrc_actuator", d.qfrc_actuator, mjd.qfrc_actuator)
    if mjm.ntendon:
        compare("ten_length", d.ten_length, mjd.ten_length)
    compare("qacc_smooth", d.qacc_smooth, mjd.qacc_smooth, tol=1e-3)
    compare("qacc", d.qacc, mjd.qacc, tol=1e-3)
    nefc = mjd.nefc
    if nefc:
        print(f"  ref nefc={nefc} efc_pos={mjd.efc_pos[:8]}")
        print(f"  ref efc_aref={mjd.efc_aref[:8]} efc_R={mjd.efc_R[:8]}")
    return m, d, mjm, mjd


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cases = {
        "pendulum": TOY_PENDULUM,
        "free": TOY_FREE,
        "ball": TOY_BALL,
        "point": TOY_SLIDE2,
    }
    if which == "all":
        for k, v in cases.items():
            print(f"=== {k} ===")
            run(v)
    else:
        run(cases.get(which, which))
