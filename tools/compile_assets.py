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


HAND_DEFAULT_QPOS = {
    # reference reach.py:18-45 DEFAULT_INITIAL_QPOS
    "robot0:WRJ1": -0.16514339750464327, "robot0:WRJ0": -0.31973286565062153,
    "robot0:FFJ3": 0.14340512546557435, "robot0:FFJ2": 0.32028208333591573,
    "robot0:FFJ1": 0.7126053607727917, "robot0:FFJ0": 0.6705281001412586,
    "robot0:MFJ3": 0.000246444303701037, "robot0:MFJ2": 0.3152655251085491,
    "robot0:MFJ1": 0.7659800313729842, "robot0:MFJ0": 0.7323156897425923,
    "robot0:RFJ3": 0.00038520700007378114, "robot0:RFJ2": 0.36743546201985233,
    "robot0:RFJ1": 0.7119514095008576, "robot0:RFJ0": 0.6699446327514138,
    "robot0:LFJ4": 0.0525442258033891, "robot0:LFJ3": -0.13615534724474673,
    "robot0:LFJ2": 0.39872030433433003, "robot0:LFJ1": 0.7415570009679252,
    "robot0:LFJ0": 0.704096378652974, "robot0:THJ4": 0.003673823825070126,
    "robot0:THJ3": 0.5506291436028695, "robot0:THJ2": -0.014515151997119306,
    "robot0:THJ1": -0.0015229223564485414, "robot0:THJ0": -0.7894883021600622,
}

FINGERTIP_SITES = [
    "robot0:S_fftip", "robot0:S_mftip", "robot0:S_rftip",
    "robot0:S_lftip", "robot0:S_thtip",
]

HAND_MODELS = {
    "reach": "hand/reach.xml",
    "manipulate_block": "hand/manipulate_block.xml",
    "manipulate_egg": "hand/manipulate_egg.xml",
    "manipulate_pen": "hand/manipulate_pen.xml",
    "manipulate_block_touch": "hand/manipulate_block_touch_sensors.xml",
    "manipulate_egg_touch": "hand/manipulate_egg_touch_sensors.xml",
    "manipulate_pen_touch": "hand/manipulate_pen_touch_sensors.xml",
}


def build_hand(task: str):
    m = mujoco.MjModel.from_xml_path(os.path.join(SRC, HAND_MODELS[task]))
    d = mujoco.MjData(m)
    extra = {}
    if task == "reach":
        for name, val in HAND_DEFAULT_QPOS.items():
            set_joint_qpos(m, d, name, val)
        mujoco.mj_forward(m, d)
        tips = []
        for s in FINGERTIP_SITES:
            sid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, s)
            tips.append(d.site_xpos[sid].copy())
        extra["initial_goal"] = np.array(tips).flatten()
        palm = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, "robot0:palm")
        extra["palm_xpos"] = d.xpos[palm].copy()
    else:
        mujoco.mj_forward(m, d)
    extra["initial_qpos"] = d.qpos.copy()
    extra["initial_qvel"] = d.qvel.copy()
    model = import_model(m, dtype=np.float64, filter_qpos=d.qpos.copy())
    serialize.save_model(model, serialize.asset_path(f"hand/{task}"), extra=extra)
    print(
        f"hand/{task}: nq={m.nq} ntendon={m.ntendon} "
        f"ncon_slots={len(model.meta.con_condim)} nsensordata={m.nsensordata} saved"
    )


ADROIT_MODELS = {
    "door": "adroit_hand/adroit_door.xml",
    "hammer": "adroit_hand/adroit_hammer.xml",
    "pen": "adroit_hand/adroit_pen.xml",
    "relocate": "adroit_hand/adroit_relocate.xml",
}


def build_adroit(task: str):
    m = mujoco.MjModel.from_xml_path(os.path.join(SRC, ADROIT_MODELS[task]))
    d = mujoco.MjData(m)
    mujoco.mj_forward(m, d)
    extra = {"initial_qpos": d.qpos.copy(), "initial_qvel": d.qvel.copy()}
    model = import_model(m, dtype=np.float64, filter_qpos=d.qpos.copy())
    serialize.save_model(model, serialize.asset_path(f"adroit/{task}"), extra=extra)
    print(
        f"adroit/{task}: nq={m.nq} nu={m.nu} ntendon={m.ntendon} "
        f"ncon_slots={len(model.meta.con_condim)} saved"
    )


KITCHEN_MODEL = "kitchen_franka/kitchen_assets/kitchen_env_model.xml"


def build_kitchen():
    # the reference checkout lacks wood1.png (visual-only texture); compile
    # from a temp copy with a stand-in so the model loads
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    shutil.copytree(
        os.path.join(SRC, "kitchen_franka"), os.path.join(tmp, "kitchen_franka")
    )
    tex = os.path.join(tmp, "kitchen_franka/kitchen_assets/textures")
    wood = os.path.join(tex, "wood1.png")
    if not os.path.exists(wood):
        shutil.copy(os.path.join(tex, "marble1.png"), wood)

    m = mujoco.MjModel.from_xml_path(
        os.path.join(tmp, "kitchen_franka/kitchen_assets/kitchen_env_model.xml")
    )
    d = mujoco.MjData(m)
    mujoco.mj_forward(m, d)
    # KitchenEnv overrides init_qpos (kitchen_env.py:246-277)
    init_qpos = np.array([
        1.48388023e-01, -1.76848573e00, 1.84390296e00, -2.47685760e00,
        2.60252026e-01, 7.12533105e-01, 1.59515394e00, 4.79267505e-02,
        3.71350919e-02, -2.66279850e-04, -5.18043486e-05, 3.12877220e-05,
        -4.51199853e-05, -3.90842156e-06, -4.22629655e-05, 6.28065475e-05,
        4.04984708e-05, 4.62730939e-04, -2.26906415e-04, -4.65501369e-04,
        -6.44129196e-03, -1.77048263e-03, 1.08009684e-03, -2.69397440e-01,
        3.50383255e-01, 1.61944683e00, 1.00618764e00, 4.06395120e-03,
        -6.62095997e-03, -2.68278933e-04,
    ])
    # franka_config.xml joint bounds/noise amps (franka_env.py:175-205)
    import xml.etree.ElementTree as ET
    cfg_root = ET.parse(
        os.path.join(tmp, "kitchen_franka/franka_assets/franka_config.xml")
    ).getroot()
    nv = m.nv
    pos_bound = np.zeros((nv, 2)); vel_bound = np.zeros((nv, 2))
    pos_amp = np.zeros(nv); vel_amp = np.zeros(nv)
    for i in range(nv):
        node = cfg_root.find(f"qpos{i}")
        pos_bound[i] = [float(x) for x in node.get("pos_bound").split()]
        vel_bound[i] = [float(x) for x in node.get("vel_bound").split()]
        pos_amp[i] = float(node.get("pos_noise_amp"))
        vel_amp[i] = float(node.get("vel_noise_amp"))
    extra = {
        "initial_qpos": init_qpos, "initial_qvel": d.qvel.copy(),
        "pos_bound": pos_bound, "vel_bound": vel_bound,
        "pos_noise_amp": pos_amp, "vel_noise_amp": vel_amp,
    }
    model = import_model(m, dtype=np.float64, filter_qpos=init_qpos)
    serialize.save_model(model, serialize.asset_path("kitchen/kitchen"), extra=extra)
    print(
        f"kitchen: nq={m.nq} nu={m.nu} ncon_slots={len(model.meta.con_condim)} saved"
    )


def main(families):
    if not families or "fetch" in families:
        for task in FETCH_TASKS:
            build_fetch(task)
    if not families or "hand" in families:
        for task in HAND_MODELS:
            build_hand(task)
    if not families or "adroit" in families:
        for task in ADROIT_MODELS:
            build_adroit(task)
    if not families or "kitchen" in families:
        build_kitchen()


if __name__ == "__main__":
    main(sys.argv[1:])
