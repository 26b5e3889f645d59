"""CoupledHalfCheetah: two half-cheetahs joined by an elastic spatial tendon
(re-design of gymnasium_robotics/envs/multiagent_mujoco/coupled_half_cheetah.py:
reward = average of both cheetahs' HalfCheetah-style rewards, never terminates;
obs includes tendon Jacobian columns, length and velocity :222-234).

The scene is built by cloning the gymnasium half_cheetah MJCF twice (suffix
0/1, y = -1/+1) and adding the site-to-site tendon (range 1.5-3.5, stiffness
0.1 per the reference asset, coupled_half_cheetah.xml:80-85); settotalmass=14
carries over from the base MJCF so both cheetahs together weigh 14 like the
reference scene.
"""

from __future__ import annotations

import copy
import dataclasses
import os
import tempfile
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu import core
from gymnasium_robotics_tpu.envs.locomotion.locomotion import (
    LocoConfig, LocomotionEnv, gym_asset,
)
from gymnasium_robotics_tpu.physics import pipeline


def _suffix_tree(elem, suffix):
    for e in elem.iter():
        for attr in ("name", "joint", "site"):
            v = e.get(attr)
            if v is not None:
                e.set(attr, v + suffix)


def coupled_cheetah_xml() -> str:
    tree = ET.parse(gym_asset("half_cheetah.xml"))
    root = tree.getroot()
    worldbody = root.find("worldbody")
    torso = worldbody.find("body")  # the cheetah
    actuators = root.find("actuator")

    torso2 = copy.deepcopy(torso)
    act_children = list(actuators)
    _suffix_tree(torso, "0")
    for a in act_children:
        a.set("joint", a.get("joint") + "0")
        if a.get("name"):
            a.set("name", a.get("name") + "0")
    _suffix_tree(torso2, "1")
    torso.set("pos", "0 -1 0.7")
    torso2.set("pos", "0 1 0.7")
    worldbody.append(torso2)
    for a in act_children:
        a2 = copy.deepcopy(a)
        a2.set("joint", a.get("joint")[:-1] + "1")
        if a.get("name"):
            a2.set("name", a.get("name")[:-1] + "1")
        actuators.append(a2)
    # tendon sites at the torso origins
    for t, name in ((torso, "t0"), (torso2, "t1")):
        s = ET.SubElement(t, "site")
        s.set("name", name)
        s.set("pos", "0 0 0")
        s.set("size", "0.05")
    tendon = ET.SubElement(root, "tendon")
    spatial = ET.SubElement(tendon, "spatial")
    spatial.set("name", "tendon0")
    spatial.set("limited", "true")
    spatial.set("range", "1.5 3.5")
    spatial.set("stiffness", "0.1")
    ET.SubElement(spatial, "site").set("site", "t0")
    ET.SubElement(spatial, "site").set("site", "t1")
    return ET.tostring(root, encoding="unicode")


class CoupledHalfCheetahEnv(LocomotionEnv):
    def __init__(self, max_episode_steps=None, dtype=jnp.float32):
        xml = coupled_cheetah_xml()
        with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
            f.write(xml)
            path = f.name
        cfg = LocoConfig(
            xml=path, frame_skip=5, ctrl_cost_weight=0.1,
            reset_noise_scale=0.1, reset_qvel_mode="normal",
            exclude_xy=1, terminate_when_unhealthy=False, vel_from="qpos_x",
        )
        super().__init__(cfg, max_episode_steps=max_episode_steps, dtype=dtype)
        os.unlink(path)
        self._half_nq = self.model.nq // 2

    def _obs_dim(self):
        mt = self.model.meta
        # qpos[1:9] ++ qpos[10:18] ++ qvel ++ ten_J 4 cols ++ len ++ vel
        return (mt.nq - 2) + mt.nv + 4 + 1 + 1

    def _get_obs(self, data):
        h = self._half_nq
        tj = data.ten_J[0]
        return jnp.concatenate(
            [
                data.qpos[1:h], data.qpos[h + 1:],
                data.qvel,
                tj[:2], tj[9:11],
                data.ten_length, data.ten_velocity,
            ]
        )

    def _reward(self, data_before, data_after, action, obs):
        h = self._half_nq
        dt = self.dt
        xv1 = (data_after.qpos[0] - data_before.qpos[0]) / dt
        xv2 = (data_after.qpos[h] - data_before.qpos[h]) / dt
        na = self.model.nu // 2
        ctrl1 = 0.1 * jnp.sum(jnp.square(action[:na]))
        ctrl2 = 0.1 * jnp.sum(jnp.square(action[na:]))
        forward = (xv1 + xv2) / 2.0
        reward = forward - (ctrl1 + ctrl2) / 2.0
        info = {
            "x_position1": data_after.qpos[0],
            "x_position2": data_after.qpos[h],
            "x_velocity1": xv1, "x_velocity2": xv2,
            "reward_run": forward,
            "reward_ctrl1": ctrl1, "reward_ctrl2": ctrl2,
        }
        return reward, jnp.zeros((), bool), info

    def _zero_info(self, data):
        z = jnp.zeros((), self.dtype)
        return {
            "x_position1": data.qpos[0],
            "x_position2": data.qpos[self._half_nq],
            "x_velocity1": z, "x_velocity2": z,
            "reward_run": z, "reward_ctrl1": z, "reward_ctrl2": z,
        }


def make_coupled_half_cheetah(**kw):
    return CoupledHalfCheetahEnv(**kw)
