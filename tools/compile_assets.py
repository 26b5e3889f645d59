"""Asset build: compile source MJCF (reference-compatible robot scenes) into
packaged .npz Model artifacts, including warm-started initial states.

Mirrors the reference's per-env construction work (robot_env.py:292-303 model
load + fetch_env.py:404-428 _env_setup warm-up) ONCE at build time, using the
MuJoCo C compiler/engine as the host-side frontend; the shipped artifact is a
frozen device-array Model + initial-state arrays, so runtime needs no MJCF.

Usage: PYTHONPATH=. python tools/compile_assets.py [family ...]
Source MJCF location: $GRT_SRC_ASSETS (defaults to the reference checkout's
gymnasium_robotics/envs/assets when mounted).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mujoco

from gymnasium_robotics_tpu.mjcf import serialize
from gymnasium_robotics_tpu.mjcf.import_mjcf import import_model

SRC = os.environ.get(
    "GRT_SRC_ASSETS", "/root/reference/gymnasium_robotics/envs/assets"
)

FETCH_TASKS = {
    "reach": dict(
        xml="fetch/reach.xml", gripper_extra_height=0.2, has_object=False,
        initial_qpos={"robot0:slide0": 0.4049, "robot0:slide1": 0.48, "robot0:slide2": 0.0},
    ),
    "push": dict(
        xml="fetch/push.xml", gripper_extra_height=0.0, has_object=True,
        initial_qpos={
            "robot0:slide0": 0.405, "robot0:slide1": 0.48, "robot0:slide2": 0.0,
            "object0:joint": [1.25, 0.53, 0.4, 1.0, 0.0, 0.0, 0.0],
        },
    ),
    "slide": dict(
        xml="fetch/slide.xml", gripper_extra_height=-0.02, has_object=True,
        initial_qpos={
            "robot0:slide0": 0.05, "robot0:slide1": 0.48, "robot0:slide2": 0.0,
            "object0:joint": [1.7, 1.1, 0.41, 1.0, 0.0, 0.0, 0.0],
        },
    ),
    "pick_and_place": dict(
        xml="fetch/pick_and_place.xml", gripper_extra_height=0.2, has_object=True,
        initial_qpos={
            "robot0:slide0": 0.405, "robot0:slide1": 0.48, "robot0:slide2": 0.0,
            "object0:joint": [1.25, 0.53, 0.4, 1.0, 0.0, 0.0, 0.0],
        },
    ),
}


def set_joint_qpos(m, d, name, value):
    jid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, name)
    adr = m.jnt_qposadr[jid]
    value = np.atleast_1d(value)
    d.qpos[adr:adr + len(value)] = value


def build_fetch(task: str):
    cfg = FETCH_TASKS[task]
    m = mujoco.MjModel.from_xml_path(os.path.join(SRC, cfg["xml"]))
    d = mujoco.MjData(m)
    # _env_setup (fetch_env.py:404-428)
    for name, val in cfg["initial_qpos"].items():
        set_joint_qpos(m, d, name, val)
    # reset_mocap_welds (mujoco_utils.py:74-80)
    for i in range(m.neq):
        if m.eq_type[i] == mujoco.mjtEq.mjEQ_WELD:
            m.eq_data[i, :7] = np.array([0.0, 0, 0, 0, 0, 0, 1.0])
    mujoco.mj_forward(m, d)
    site = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "robot0:grip")
    gripper_target = (
        np.array([-0.498, 0.005, -0.431 + cfg["gripper_extra_height"]])
        + d.site_xpos[site]
    )
    mocap = 0
    d.mocap_pos[mocap] = gripper_target
    d.mocap_quat[mocap] = [1.0, 0.0, 1.0, 0.0]
    for _ in range(10):
        mujoco.mj_step(m, d, nstep=20)
    initial_gripper_xpos = d.site_xpos[site].copy()
    extra = {
        "initial_qpos": d.qpos.copy(),
        "initial_qvel": d.qvel.copy(),
        "initial_mocap_pos": d.mocap_pos.copy(),
        "initial_mocap_quat": d.mocap_quat.copy(),
        "initial_gripper_xpos": initial_gripper_xpos,
    }
    if cfg["has_object"]:
        osite = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "object0")
        extra["height_offset"] = np.array(d.site_xpos[osite][2])
    # exclude mesh-box artifact pairs judged at the warmed-up pose
    model = import_model(m, dtype=np.float64, filter_qpos=d.qpos.copy())
    serialize.save_model(model, serialize.asset_path(f"fetch/{task}"), extra=extra)
    print(f"fetch/{task}: nq={m.nq} ncon_slots={len(model.meta.con_condim)} saved")


def main(families):
    if not families or "fetch" in families:
        for task in FETCH_TASKS:
            build_fetch(task)


if __name__ == "__main__":
    main(sys.argv[1:])
