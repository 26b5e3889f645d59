"""Parity tests for utils/mujoco_utils.py against the MuJoCo C engine
(reference utils/mujoco_utils.py behaviors)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")

from gymnasium_robotics_tpu.mjcf.import_mjcf import import_model
from gymnasium_robotics_tpu.physics import pipeline
from gymnasium_robotics_tpu.utils import mujoco_utils as MU

XML = """
<mujoco>
  <worldbody>
    <body name="free_body" pos="0 0 1">
      <freejoint name="free"/>
      <geom type="sphere" size="0.1"/>
      <site name="tip" pos="0.1 0 0"/>
    </body>
    <body name="arm" pos="1 0 0">
      <joint name="hinge" type="hinge" axis="0 0 1"/>
      <geom type="capsule" fromto="0 0 0 0.5 0 0" size="0.05"/>
      <site name="end" pos="0.5 0 0"/>
      <body name="wrist" pos="0.5 0 0">
        <joint name="ball" type="ball"/>
        <geom type="sphere" size="0.05"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="hinge" ctrlrange="-1 1"/>
    <position joint="ball" ctrlrange="-1 1" kp="10"/>
  </actuator>
</mujoco>
"""


def _setup():
    mjm = mujoco.MjModel.from_xml_string(XML)
    mjd = mujoco.MjData(mjm)
    rng = np.random.default_rng(0)
    mjd.qpos[:] = rng.normal(0, 0.2, mjm.nq)
    # normalize quats
    mjd.qpos[3:7] /= np.linalg.norm(mjd.qpos[3:7])
    mjd.qpos[8:12] /= np.linalg.norm(mjd.qpos[8:12])
    mjd.qvel[:] = rng.normal(0, 0.5, mjm.nv)
    mujoco.mj_forward(mjm, mjd)
    m = import_model(mjm, dtype=np.float64)
    d = pipeline.make_data(m, dtype=jnp.float64)
    d = dataclasses.replace(
        d, qpos=jnp.asarray(mjd.qpos), qvel=jnp.asarray(mjd.qvel)
    )
    d = jax.jit(pipeline.forward)(m, d)
    return mjm, mjd, m, d


def test_joint_qpos_qvel_widths():
    mjm, mjd, m, d = _setup()
    for name in ("free", "hinge", "ball"):
        j = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_JOINT, name)
        widths = {0: (7, 6), 1: (4, 3), 2: (1, 1), 3: (1, 1)}
        wq, wv = widths[mjm.jnt_type[j]]
        adr, vadr = mjm.jnt_qposadr[j], mjm.jnt_dofadr[j]
        np.testing.assert_allclose(
            np.asarray(MU.get_joint_qpos(m, d, name)),
            mjd.qpos[adr:adr + wq],
        )
        np.testing.assert_allclose(
            np.asarray(MU.get_joint_qvel(m, d, name)),
            mjd.qvel[vadr:vadr + wv],
        )
    d2 = MU.set_joint_qpos(m, d, "hinge", 0.5)
    assert float(MU.get_joint_qpos(m, d2, "hinge")[0]) == 0.5


def test_site_velocities_match_mujoco():
    mjm, mjd, m, d = _setup()
    for name in ("tip", "end"):
        sid = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_SITE, name)
        jacp = np.zeros((3, mjm.nv))
        jacr = np.zeros((3, mjm.nv))
        mujoco.mj_jacSite(mjm, mjd, jacp, jacr, sid)
        np.testing.assert_allclose(
            np.asarray(MU.get_site_xvelp(m, d, name)), jacp @ mjd.qvel,
            atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(MU.get_site_xvelr(m, d, name)), jacr @ mjd.qvel,
            atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(MU.get_site_xpos(m, d, name)), mjd.site_xpos[sid],
            atol=1e-12,
        )


def test_ctrl_set_action_position_offset():
    mjm, mjd, m, d = _setup()
    action = np.array([0.3, -0.2])
    d2 = MU.ctrl_set_action(m, d, action)
    ctrl = np.asarray(d2.ctrl)
    # motor (biastype 0): direct; position actuator: qpos offset added
    assert np.isclose(ctrl[0], 0.3)
    qadr = mjm.jnt_qposadr[mjm.actuator_trnid[1, 0]]
    assert np.isclose(ctrl[1], mjd.qpos[qadr] - 0.2)


def test_robot_get_obs_and_names():
    mjm, mjd, m, d = _setup()
    names = MU.ModelNames(m)
    assert names.joint_name2id["hinge"] == mujoco.mj_name2id(
        mjm, mujoco.mjtObj.mjOBJ_JOINT, "hinge"
    )
    qp, qv = MU.robot_get_obs(m, d, ["hinge", "ball"])  # non-robot joints
    assert qp.shape == (0,) and qv.shape == (0,)


def test_mocap_helpers_on_fetch():
    """Fetch ships the real mocap weld; reset_mocap2body + delta matches the
    env's own mocap path (fetch_env.py mocap_set_action semantics)."""
    from gymnasium_robotics_tpu.mjcf import serialize

    m, extra = serialize.load_asset("fetch/push", dtype=np.float64)
    d = pipeline.make_data(m, dtype=jnp.float64)
    d = jax.jit(pipeline.forward)(m, d)
    pairs = MU._mocap_weld_pairs(m.meta)
    assert len(pairs) == 1
    action = np.zeros(m.meta.nmocap * 7 + m.nu)
    action[:3] = [0.01, 0.02, 0.03]
    d2 = MU.mocap_set_action(m, d, action)
    mi, body = pairs[0]
    np.testing.assert_allclose(
        np.asarray(d2.mocap_pos[mi]),
        np.asarray(d.xpos[body]) + np.array([0.01, 0.02, 0.03]),
        atol=1e-12,
    )
