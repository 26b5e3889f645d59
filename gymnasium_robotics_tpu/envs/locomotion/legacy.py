"""Frozen legacy v2/v3 locomotion semantics on the batched core.

The reference re-registers 17 mujoco_py-era env IDs with their own frozen
reward/observation conventions (gymnasium_robotics/__init__.py:1123-1261,
env classes under gymnasium_robotics/envs/mujoco/). These differ from the
v5 semantics the rest of the repo implements:

- Ant v2/v3 observe CLIPPED contact forces for ALL bodies including the
  world row (111-dim obs; ant_v2.py:62-68, ant_v3.py:153-163).
- Humanoid(+Standup) v2/v3 observe cinert/cvel/qfrc_actuator/cfrc_ext for
  ALL bodies / dofs (376-dim; humanoid_v2.py:33-46).
- Humanoid v2 measures the X velocity of the mass center only
  (humanoid_v2.py:47-55); v3 measures xy (humanoid_v3.py).
- Reacher/Pusher v2 compute the reward from the PRE-step state
  (reacher_v2.py:25-33, pusher_v2.py:25-33).
- InvertedDoublePendulum v2 observes full clipped qvel and all three
  constraint forces (11-dim; inverted_double_pendulum_v2.py:47-58).
- v3 envs expose the documented option kwargs (half_cheetah_v3.py:24-90:
  forward_reward_weight / ctrl_cost_weight / reset_noise_scale /
  exclude_current_positions_from_observation, plus the healthy_* family);
  v2 envs are fixed-parameter.
- Per-version info dict keys (reward_run / reward_fwd / reward_linvel ...).

mujoco_py-BITWISE parity is out of scope (SURVEY.md §7 step 7); this module
implements the structural semantics (obs layout/dims, reward terms, option
surface, termination rules) on the same compiled models.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu.envs.locomotion import classic as C
from gymnasium_robotics_tpu.envs.locomotion.locomotion import (
    LocoConfig, LocomotionEnv, gym_asset,
)

_F32 = jnp.float32


def _merge_cfg(cfg: LocoConfig, kwargs: dict, exclude_default: int):
    """Map the reference v3 kwarg surface onto LocoConfig fields. Returns
    (cfg, leftover_kwargs)."""
    kw = dict(kwargs)
    repl = {}
    direct = (
        "forward_reward_weight", "ctrl_cost_weight", "contact_cost_weight",
        "healthy_reward", "terminate_when_unhealthy", "healthy_z_range",
        "healthy_angle_range", "healthy_state_range", "reset_noise_scale",
        "contact_force_range",
    )
    for k in direct:
        if k in kw:
            repl[k] = kw.pop(k)
    if "exclude_current_positions_from_observation" in kw:
        repl["exclude_xy"] = (
            exclude_default
            if kw.pop("exclude_current_positions_from_observation")
            else 0
        )
    kw.pop("contact_cost_range", None)  # humanoid v3: cost cap fixed at 10
    kw.pop("xml_file", None)
    return dataclasses.replace(cfg, **repl), kw


class LegacyRunnerEnv(LocomotionEnv):
    """HalfCheetah / Hopper / Walker2d / Swimmer / Ant, v2+v3 conventions."""

    def __init__(self, cfg, family, version, **kw):
        self.family = family
        self.version = version
        super().__init__(cfg, **kw)

    def _obs_dim(self):
        mt = self.model.meta
        n = (mt.nq - self.cfg.exclude_xy) + mt.nv
        if self.cfg.include_cfrc:
            n += mt.nbody * 6  # legacy ant: ALL bodies incl world
        return n

    @property
    def observation_structure(self):
        mt = self.model.meta
        return {
            "skipped_qpos": self.cfg.exclude_xy,
            "qpos": mt.nq - self.cfg.exclude_xy,
            "qvel": mt.nv,
            "cfrc_ext": mt.nbody * 6 if self.cfg.include_cfrc else 0,
        }

    def _get_obs(self, data):
        qvel = data.qvel
        if self.cfg.clip_qvel_obs is not None:
            c = self.cfg.clip_qvel_obs
            qvel = jnp.clip(qvel, -c, c)
        parts = [data.qpos[self.cfg.exclude_xy:], qvel]
        if self.cfg.include_cfrc:
            lo, hi = self.cfg.contact_force_range
            parts.append(jnp.clip(data.cfrc_ext, lo, hi).reshape(-1))
        return jnp.concatenate(parts)

    def _info_keys(self):
        fam, ver = self.family, self.version
        if fam == "HalfCheetah":
            if ver == "v2":  # half_cheetah_v2.py:44
                return ("reward_run", "reward_ctrl")
            return ("x_position", "x_velocity", "reward_run", "reward_ctrl")
        if fam == "Swimmer":
            if ver == "v2":
                return ("reward_fwd", "reward_ctrl")
            return (
                "reward_fwd", "reward_ctrl", "x_position", "y_position",
                "distance_from_origin", "x_velocity", "y_velocity",
                "forward_reward",
            )
        if fam == "Ant":
            if ver == "v2":
                return (
                    "reward_forward", "reward_ctrl", "reward_contact",
                    "reward_survive",
                )
            return (
                "reward_forward", "reward_ctrl", "reward_contact",
                "reward_survive", "x_position", "y_position",
                "distance_from_origin", "x_velocity", "y_velocity",
                "forward_reward",
            )
        if ver == "v2":  # hopper_v2.py:46 / walker2d_v2.py: info == {}
            return ()
        return ("x_position", "x_velocity")  # hopper/walker2d v3

    def _reward(self, data_before, data_after, action, obs):
        cfg = self.cfg
        if cfg.vel_from == "qpos_x":
            x_b, x_a = data_before.qpos[0], data_after.qpos[0]
            vel = jnp.stack([(x_a - x_b) / self.dt,
                             jnp.zeros((), self.dtype)])
            pos_after = jnp.stack([x_a, jnp.zeros((), self.dtype)])
        else:  # ant: torso body com
            xy_b = data_before.xpos[cfg.main_body][:2]
            xy_a = data_after.xpos[cfg.main_body][:2]
            vel = (xy_a - xy_b) / self.dt
            pos_after = xy_a
        forward = cfg.forward_reward_weight * vel[0]
        healthy = self._is_healthy(data_after, obs)
        # v2/v3 alive bonus is paid unconditionally while the episode runs
        # (terminate_when_unhealthy ends it instead); mirrors
        # hopper_v3.py:87-91 `is_healthy or terminate_when_unhealthy`
        alive = cfg.healthy_reward * jnp.where(
            healthy | cfg.terminate_when_unhealthy, 1.0, 0.0
        )
        ctrl_cost = cfg.ctrl_cost_weight * jnp.sum(jnp.square(action))
        contact_cost = jnp.zeros((), self.dtype)
        if cfg.contact_cost_weight:
            lo, hi = cfg.contact_force_range
            cf = jnp.clip(data_after.cfrc_ext, lo, hi)
            contact_cost = cfg.contact_cost_weight * jnp.sum(jnp.square(cf))
        reward = forward + alive - ctrl_cost - contact_cost
        terminated = (~healthy) & cfg.terminate_when_unhealthy

        full = {
            "x_position": pos_after[0],
            "y_position": pos_after[1],
            "distance_from_origin": jnp.linalg.norm(pos_after),
            "x_velocity": vel[0],
            "y_velocity": vel[1],
            "forward_reward": forward,
            "reward_forward": forward,
            "reward_run": forward,
            "reward_fwd": forward,
            "reward_ctrl": -ctrl_cost,
            "reward_contact": -contact_cost,
            "reward_survive": alive,
        }
        info = {k: full[k] for k in self._info_keys()}
        return reward, terminated, info

    def _zero_info(self, data):
        z = jnp.zeros((), self.dtype)
        return {k: z for k in self._info_keys()}


class LegacyHumanoidEnv(C.HumanoidEnv):
    """Humanoid v2/v3 + HumanoidStandup v2: 376-dim all-body observation
    (humanoid_v2.py:33-46); v2 rewards the mass center X velocity
    (humanoid_v2.py:47-55), v3 the xy pair (humanoid_v3.py)."""

    def __init__(self, version="v3", standup=False, **kw):
        self.version = version
        xml = gym_asset("humanoidstandup.xml" if standup else "humanoid.xml")
        cfg = LocoConfig(
            xml=xml, frame_skip=5,
            forward_reward_weight=1.25, ctrl_cost_weight=0.1,
            contact_cost_weight=5e-7, healthy_reward=5.0,
            healthy_z_range=(1.0, 2.0), reset_noise_scale=1e-2,
            reset_qvel_mode="uniform", exclude_xy=2, include_cfrc=True,
            terminate_when_unhealthy=not standup,
        )
        if version == "v3":
            cfg, kw = _merge_cfg(cfg, kw, exclude_default=2)
        self.standup = standup
        LocomotionEnv.__init__(self, cfg, **kw)

    def _obs_dim(self):
        mt = self.model.meta
        return (
            (mt.nq - self.cfg.exclude_xy) + mt.nv
            + mt.nbody * 10 + mt.nbody * 6 + mt.nv + mt.nbody * 6
        )

    @property
    def observation_structure(self):
        mt = self.model.meta
        return {
            "skipped_qpos": self.cfg.exclude_xy,
            "qpos": mt.nq - self.cfg.exclude_xy, "qvel": mt.nv,
            "cinert": mt.nbody * 10, "cvel": mt.nbody * 6,
            "qfrc_actuator": mt.nv, "cfrc_ext": mt.nbody * 6,
        }

    def _get_obs(self, data):
        return jnp.concatenate(
            [
                data.qpos[self.cfg.exclude_xy:], data.qvel,
                data.cinert.reshape(-1),
                data.cvel.reshape(-1),
                data.qfrc_actuator,
                data.cfrc_ext.reshape(-1),
            ]
        )

    def _reward(self, data_before, data_after, action, obs):
        cfg = self.cfg
        if self.standup:
            uph = data_after.qpos[2] / self.model.opt.timestep
            quad_ctrl = 0.1 * jnp.sum(jnp.square(action))
            quad_impact = jnp.minimum(
                0.5e-6 * jnp.sum(jnp.square(data_after.cfrc_ext)), 10.0
            )
            reward = uph - quad_ctrl - quad_impact + 1.0
            info = {
                "reward_linup": uph,
                "reward_quadctrl": -quad_ctrl,
                "reward_impact": -quad_impact,
            }
            return reward, jnp.zeros((), bool), info
        xy_b = C._mass_center_xy(self.model, data_before)
        xy_a = C._mass_center_xy(self.model, data_after)
        vel = (xy_a - xy_b) / self.dt
        # v2 rewards the X velocity of the mass center (humanoid_v2.py:47);
        # v3 keeps x as forward but reports both (humanoid_v3.py)
        forward = cfg.forward_reward_weight * vel[0]
        healthy = self._is_healthy(data_after, obs)
        alive = cfg.healthy_reward * jnp.where(
            healthy | cfg.terminate_when_unhealthy, 1.0, 0.0
        )
        quad_ctrl = cfg.ctrl_cost_weight * jnp.sum(jnp.square(action))
        quad_impact = jnp.minimum(
            cfg.contact_cost_weight * jnp.sum(jnp.square(data_after.cfrc_ext)),
            10.0,
        )
        reward = forward - quad_ctrl - quad_impact + alive
        terminated = (~healthy) & cfg.terminate_when_unhealthy
        info = {
            "reward_linvel": forward,
            "reward_quadctrl": -quad_ctrl,
            "reward_alive": alive,
            "reward_impact": -quad_impact,
        }
        if self.version == "v3":
            info.update(
                {
                    "x_position": xy_a[0], "y_position": xy_a[1],
                    "distance_from_origin": jnp.linalg.norm(xy_a),
                    "x_velocity": vel[0], "y_velocity": vel[1],
                    "forward_reward": forward,
                }
            )
        return reward, terminated, info

    def _is_healthy(self, data, obs):
        # humanoid_v2.py:57: z bounds only, no finiteness test
        z = data.qpos[2]
        lo, hi = self.cfg.healthy_z_range
        ok = (z >= lo) & (z <= hi)
        if self.version == "v3":
            ok &= jnp.isfinite(data.qpos).all() & jnp.isfinite(data.qvel).all()
        return ok

    def _zero_info(self, data):
        z = jnp.zeros((), self.dtype)
        if self.standup:
            return {
                "reward_linup": z, "reward_quadctrl": z, "reward_impact": z,
            }
        keys = ["reward_linvel", "reward_quadctrl", "reward_alive",
                "reward_impact"]
        if self.version == "v3":
            keys += ["x_position", "y_position", "distance_from_origin",
                     "x_velocity", "y_velocity", "forward_reward"]
        return {k: z for k in keys}


class LegacyReacherEnv(C.ReacherEnv):
    """Reacher v2: reward computed from the PRE-step state
    (reacher_v2.py:25-33) and the full 3D fingertip-target vector in obs
    (11-dim, reacher_v2.py:66-77)."""

    def _obs_dim(self):
        return 11

    def _get_obs(self, data):
        theta = data.qpos[:2]
        return jnp.concatenate(
            [
                jnp.cos(theta), jnp.sin(theta),
                data.qpos[2:], data.qvel[:2],
                data.xpos[self._fingertip] - data.xpos[self._target],
            ]
        )

    def _reward(self, data_before, data_after, action, obs):
        vec = data_before.xpos[self._fingertip] - data_before.xpos[self._target]
        reward_dist = -jnp.linalg.norm(vec)
        reward_ctrl = -jnp.sum(jnp.square(action))
        info = {"reward_dist": reward_dist, "reward_ctrl": reward_ctrl}
        return reward_dist + reward_ctrl, jnp.zeros((), bool), info


class LegacyPusherEnv(C.PusherEnv):
    """Pusher v2: reward from the PRE-step state (pusher_v2.py:25-33)."""

    def _reward(self, data_before, data_after, action, obs):
        vec1 = data_before.xpos[self._object] - data_before.xpos[self._tips]
        vec2 = data_before.xpos[self._object] - data_before.xpos[self._goal]
        reward_near = -jnp.linalg.norm(vec1)
        reward_dist = -jnp.linalg.norm(vec2)
        reward_ctrl = -jnp.sum(jnp.square(action))
        reward = reward_dist + 0.1 * reward_ctrl + 0.5 * reward_near
        info = {"reward_dist": reward_dist, "reward_ctrl": reward_ctrl}
        return reward, jnp.zeros((), bool), info

    def _zero_info(self, data):
        z = jnp.zeros((), self.dtype)
        return {"reward_dist": z, "reward_ctrl": z}


class LegacyIDPEnv(C.InvertedDoublePendulumEnv):
    """InvertedDoublePendulum v2: 11-dim obs with full clipped qvel and all
    constraint forces (inverted_double_pendulum_v2.py:47-58); info == {}."""

    def _obs_dim(self):
        return 11

    def _get_obs(self, data):
        return jnp.concatenate(
            [
                data.qpos[:1],
                jnp.sin(data.qpos[1:]), jnp.cos(data.qpos[1:]),
                jnp.clip(data.qvel, -10, 10),
                jnp.clip(data.qfrc_constraint, -10, 10),
            ]
        )

    def _reward(self, data_before, data_after, action, obs):
        r, term, _ = super()._reward(data_before, data_after, action, obs)
        return r, term, {}

    def _zero_info(self, data):
        return {}


class LegacyIPEnv(C.InvertedPendulumEnv):
    """InvertedPendulum v2: same 4-dim obs; info == {}
    (inverted_pendulum_v2.py)."""

    def _reward(self, data_before, data_after, action, obs):
        r, term, _ = super()._reward(data_before, data_after, action, obs)
        return r, term, {}

    def _zero_info(self, data):
        return {}


# --- per-family version configs (reference envs/mujoco/*_v{2,3}.py) ---

def make_legacy_half_cheetah(version="v3", **kw):
    cfg = LocoConfig(
        xml=gym_asset("half_cheetah.xml"), frame_skip=5,
        ctrl_cost_weight=0.1, reset_noise_scale=0.1,
        reset_qvel_mode="normal", exclude_xy=1, vel_from="qpos_x",
        terminate_when_unhealthy=False,
    )
    if version == "v3":
        cfg, kw = _merge_cfg(cfg, kw, exclude_default=1)
    return LegacyRunnerEnv(cfg, "HalfCheetah", version, **kw)


def make_legacy_hopper(version="v3", **kw):
    cfg = LocoConfig(
        xml=gym_asset("hopper.xml"), frame_skip=4,
        ctrl_cost_weight=1e-3, healthy_reward=1.0,
        healthy_z_range=(0.7, float(np.inf)),
        healthy_angle_range=(-0.2, 0.2),
        healthy_state_range=(-100.0, 100.0),
        reset_noise_scale=5e-3, reset_qvel_mode="uniform",
        exclude_xy=1, vel_from="qpos_x", clip_qvel_obs=10.0,
    )
    if version == "v3":
        cfg, kw = _merge_cfg(cfg, kw, exclude_default=1)
    return LegacyRunnerEnv(cfg, "Hopper", version, **kw)


def make_legacy_walker2d(version="v3", **kw):
    cfg = LocoConfig(
        # legacy walker2d keeps the original model (not the v5 variant)
        xml=gym_asset("walker2d.xml"), frame_skip=4,
        ctrl_cost_weight=1e-3, healthy_reward=1.0,
        healthy_z_range=(0.8, 2.0), healthy_angle_range=(-1.0, 1.0),
        reset_noise_scale=5e-3, reset_qvel_mode="uniform",
        exclude_xy=1, vel_from="qpos_x", clip_qvel_obs=10.0,
    )
    if version == "v3":
        cfg, kw = _merge_cfg(cfg, kw, exclude_default=1)
    return LegacyRunnerEnv(cfg, "Walker2d", version, **kw)


def make_legacy_swimmer(version="v3", **kw):
    cfg = LocoConfig(
        xml=gym_asset("swimmer.xml"), frame_skip=4,
        ctrl_cost_weight=1e-4, reset_noise_scale=0.1,
        reset_qvel_mode="uniform", exclude_xy=2, vel_from="qpos_x",
        terminate_when_unhealthy=False,
    )
    if version == "v3":
        cfg, kw = _merge_cfg(cfg, kw, exclude_default=2)
    return LegacyRunnerEnv(cfg, "Swimmer", version, **kw)


def make_legacy_ant(version="v3", **kw):
    cfg = LocoConfig(
        xml=gym_asset("ant.xml"), frame_skip=5,
        ctrl_cost_weight=0.5, contact_cost_weight=5e-4,
        healthy_reward=1.0, healthy_z_range=(0.2, 1.0),
        reset_noise_scale=0.1, reset_qvel_mode="normal",
        exclude_xy=2, include_cfrc=True, vel_from="body",
    )
    if version == "v3":
        cfg, kw = _merge_cfg(cfg, kw, exclude_default=2)
    return LegacyRunnerEnv(cfg, "Ant", version, **kw)


def make_legacy_humanoid(version="v3", **kw):
    return LegacyHumanoidEnv(version=version, standup=False, **kw)


def make_legacy_humanoid_standup(version="v2", **kw):
    return LegacyHumanoidEnv(version=version, standup=True, **kw)


def make_legacy_reacher(version="v2", **kw):
    return LegacyReacherEnv(**kw)


def make_legacy_pusher(version="v2", **kw):
    return LegacyPusherEnv(**kw)


def make_legacy_inverted_pendulum(version="v2", **kw):
    return LegacyIPEnv(**kw)


def make_legacy_inverted_double_pendulum(version="v2", **kw):
    return LegacyIDPEnv(**kw)


# family -> (maker, versions, max_episode_steps) — the reference's 17 legacy
# IDs (gymnasium_robotics/__init__.py:1123-1261)
LEGACY_REGISTRY = {
    "Reacher": (make_legacy_reacher, ("v2",), 50),
    "Pusher": (make_legacy_pusher, ("v2",), 100),
    "InvertedPendulum": (make_legacy_inverted_pendulum, ("v2",), 1000),
    "InvertedDoublePendulum": (
        make_legacy_inverted_double_pendulum, ("v2",), 1000),
    "HalfCheetah": (make_legacy_half_cheetah, ("v2", "v3"), 1000),
    "Hopper": (make_legacy_hopper, ("v2", "v3"), 1000),
    "Swimmer": (make_legacy_swimmer, ("v2", "v3"), 1000),
    "Walker2d": (make_legacy_walker2d, ("v2", "v3"), 1000),
    "Ant": (make_legacy_ant, ("v2", "v3"), 1000),
    "Humanoid": (make_legacy_humanoid, ("v2", "v3"), 1000),
    "HumanoidStandup": (make_legacy_humanoid_standup, ("v2",), 1000),
}
