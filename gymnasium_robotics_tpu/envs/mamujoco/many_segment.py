"""Generated many-segment Swimmer/Ant scenarios.

The reference renders jinja2 MJCF templates to temp files per env construction
(many_segment_swimmer.py:16-67, many_segment_ant.py, assets/*.xml.template);
here equivalent scenes are emitted by plain generators and compiled through
the standard import pipeline. Geometry/dynamics constants match the templates.
"""

from __future__ import annotations

import os
import tempfile

import jax.numpy as jnp
import numpy as np


def swimmer_xml(n_segs: int) -> str:
    body = ""
    for i in range(1, n_segs - 1):
        body += (
            f'<body name="mid{i}" pos="-1 0 0">'
            f'<geom density="1000" fromto="0 0 0 -1 0 0" size="0.1" type="capsule"/>'
            f'<joint axis="0 0 {(-1) ** (i + 1)}" limited="true" name="rot{i}" '
            f'pos="0 0 0" range="-100 100" type="hinge"/>'
        )
    body += (
        f'<body name="back" pos="-1 0 0">'
        f'<geom density="1000" fromto="0 0 0 -1 0 0" size="0.1" type="capsule"/>'
        f'<joint axis="0 0 1" limited="true" name="rot{n_segs - 1}" pos="0 0 0" '
        f'range="-100 100" type="hinge"/></body>'
    )
    body += "</body>" * (n_segs - 2)
    actuators = "".join(
        f'<motor ctrllimited="true" ctrlrange="-1 1" gear="150.0" joint="rot{i}"/>'
        for i in range(n_segs)
    )
    return f"""
<mujoco model="swimmer">
  <compiler angle="degree" coordinate="local" inertiafromgeom="true"/>
  <option density="4000" integrator="RK4" timestep="0.01" viscosity="0.1"/>
  <default>
    <geom conaffinity="0" condim="1" contype="0" rgba="0.8 0.6 .4 1"/>
    <joint armature="0.1"/>
  </default>
  <worldbody>
    <geom condim="3" name="floor" pos="0 0 -0.1" size="40 40 0.1" type="plane"/>
    <body name="torso" pos="0 0 0">
      <geom density="1000" fromto="1.5 0 0 0.5 0 0" size="0.1" type="capsule"/>
      <joint axis="1 0 0" name="slider1" pos="0 0 0" type="slide"/>
      <joint axis="0 1 0" name="slider2" pos="0 0 0" type="slide"/>
      <joint axis="0 0 1" name="rot" pos="0 0 0" type="hinge"/>
      <body name="mid0" pos="0.5 0 0">
        <geom density="1000" fromto="0 0 0 -1 0 0" size="0.1" type="capsule"/>
        <joint axis="0 0 1" limited="true" name="rot0" pos="0 0 0" range="-100 100" type="hinge"/>
        {body}
      </body>
    </body>
  </worldbody>
  <actuator>{actuators}</actuator>
</mujoco>
"""


def _ant_segment(seg: int) -> str:
    """One torso segment with two legs (matches many_segment_ant.py:38-64)."""
    return f"""
    <body name="torso_{seg}" pos="-1 0 0">
      <geom density="100" fromto="1 0 0 0 0 0" size="0.1" type="capsule"/>
      <body name="front_right_leg_{seg}" pos="0 0 0">
        <geom fromto="0.0 0.0 0.0 0.0 0.2 0.0" name="aux1_geom_{seg}" size="0.08" type="capsule"/>
        <body name="aux_2_{seg}" pos="0.0 0.2 0">
          <joint axis="0 0 1" name="hip1_{seg}" pos="0.0 0.0 0.0" range="-30 30" type="hinge"/>
          <geom fromto="0.0 0.0 0.0 -0.2 0.2 0.0" name="right_leg_geom_{seg}" size="0.08" type="capsule"/>
          <body pos="-0.2 0.2 0">
            <joint axis="1 1 0" name="ankle1_{seg}" pos="0.0 0.0 0.0" range="-70 -30" type="hinge"/>
            <geom fromto="0.0 0.0 0.0 -0.4 0.4 0.0" name="right_ankle_geom_{seg}" size="0.08" type="capsule"/>
          </body>
        </body>
      </body>
      <body name="back_leg_{seg}" pos="0 0 0">
        <geom fromto="0.0 0.0 0.0 0.0 -0.2 0.0" name="aux2_geom_{seg}" size="0.08" type="capsule"/>
        <body name="aux2_{seg}" pos="0.0 -0.2 0">
          <joint axis="0 0 1" name="hip2_{seg}" pos="0.0 0.0 0.0" range="-30 30" type="hinge"/>
          <geom fromto="0.0 0.0 0.0 -0.2 -0.2 0.0" name="back_leg_geom_{seg}" size="0.08" type="capsule"/>
          <body pos="-0.2 -0.2 0">
            <joint axis="-1 1 0" name="ankle2_{seg}" pos="0.0 0.0 0.0" range="-70 -30" type="hinge"/>
            <geom fromto="0.0 0.0 0.0 -0.4 -0.4 0.0" name="third_ankle_geom_{seg}" size="0.08" type="capsule"/>
          </body>
        </body>
      </body>
    """


def ant_xml(n_segs: int) -> str:
    segs = "".join(_ant_segment(s) for s in range(1, n_segs))
    closing = "</body>" * (n_segs - 1)
    actuators = "".join(
        f'<motor ctrllimited="true" ctrlrange="-1 1" gear="150" joint="{j}_{s}"/>'
        for s in range(n_segs)
        for j in ("hip1", "ankle1", "hip2", "ankle2")
    )
    return f"""
<mujoco model="ant">
  <compiler angle="degree" coordinate="local" inertiafromgeom="true"/>
  <option integrator="RK4" timestep="0.02"/>
  <custom><numeric data="0.0 0.0 0.55 1.0 0.0 0.0 0.0 0.0 1.0 0.0 -1.0 0.0 -1.0 0.0 1.0" name="init_qpos"/></custom>
  <default>
    <joint armature="1" damping="1" limited="true"/>
    <geom conaffinity="0" condim="3" density="5.0" friction="1.5 0.1 0.1" margin="0.01" rgba="0.8 0.6 0.4 1"/>
  </default>
  <worldbody>
    <geom conaffinity="1" condim="3" name="floor" pos="0 0 0" rgba="0.8 0.9 0.8 1" size="40 40 40" type="plane"/>
    <body name="torso_0" pos="0 0 0.75">
      <joint armature="0" damping="0" limited="false" margin="0.01" name="root" pos="0 0 0" type="free"/>
      <body name="front_left_leg_0" pos="0 0 0">
        <geom fromto="0.0 0.0 0.0 0.2 0.2 0.0" name="aux1_geom_0" size="0.08" type="capsule"/>
        <body name="aux1_0" pos="0.2 0.2 0">
          <joint axis="0 0 1" name="hip1_0" pos="0.0 0.0 0.0" range="-30 30" type="hinge"/>
          <geom fromto="0.0 0.0 0.0 0.2 0.2 0.0" name="left_leg_geom_0" size="0.08" type="capsule"/>
          <body pos="0.2 0.2 0">
            <joint axis="-1 1 0" name="ankle1_0" pos="0.0 0.0 0.0" range="30 70" type="hinge"/>
            <geom fromto="0.0 0.0 0.0 0.4 0.4 0.0" name="left_ankle_geom_0" size="0.08" type="capsule"/>
          </body>
        </body>
      </body>
      <body name="right_back_leg_0" pos="0 0 0">
        <geom fromto="0.0 0.0 0.0 0.2 -0.2 0.0" name="aux2_geom_0" size="0.08" type="capsule"/>
        <body name="aux2_0" pos="0.2 -0.2 0">
          <joint axis="0 0 1" name="hip2_0" pos="0.0 0.0 0.0" range="-30 30" type="hinge"/>
          <geom fromto="0.0 0.0 0.0 0.2 -0.2 0.0" name="rightback_leg_geom_0" size="0.08" type="capsule"/>
          <body pos="0.2 -0.2 0">
            <joint axis="1 1 0" name="ankle2_0" pos="0.0 0.0 0.0" range="30 70" type="hinge"/>
            <geom fromto="0.0 0.0 0.0 0.4 -0.4 0.0" name="second_ankle_geom_0" size="0.08" type="capsule"/>
          </body>
        </body>
      </body>
      {segs}
      {closing}
    </body>
  </worldbody>
  <actuator>{actuators}</actuator>
</mujoco>
"""


def make_many_segment(kind: str, n_segs: int, dtype=jnp.float32):
    """LocomotionEnv over the generated scene, with the base scenario's v5
    reward semantics (the reference wraps Swimmer-v5 / Ant-v5 around the
    generated files, mujoco_multi.py:203-232)."""
    from gymnasium_robotics_tpu.envs.locomotion.locomotion import (
        LocoConfig, LocomotionEnv,
    )

    xml = swimmer_xml(n_segs) if kind == "swimmer" else ant_xml(n_segs)
    with tempfile.NamedTemporaryFile(
        "w", suffix=".xml", delete=False
    ) as f:
        f.write(xml)
        path = f.name
    if kind == "swimmer":
        cfg = LocoConfig(
            xml=path, frame_skip=4, ctrl_cost_weight=1e-4,
            reset_noise_scale=0.1, reset_qvel_mode="uniform", exclude_xy=2,
            terminate_when_unhealthy=False,
        )
    else:
        cfg = LocoConfig(
            xml=path, frame_skip=5, ctrl_cost_weight=0.5,
            contact_cost_weight=5e-4, healthy_reward=1.0,
            healthy_z_range=(0.2, 1.0), reset_noise_scale=0.1,
            reset_qvel_mode="normal", exclude_xy=2, include_cfrc=True,
            vel_from="body",
        )
    env = LocomotionEnv(cfg, dtype=dtype)
    os.unlink(path)
    return env
