"""Humanoid(+Standup), pendulum, Reacher, Pusher envs (Gymnasium v5 semantics)
on the batched core — completing the 11-scenario set used by MaMuJoCo
(reference envs/multiagent_mujoco/mujoco_multi.py:42-54) and the legacy
re-registrations (reference gymnasium_robotics/__init__.py:1123-1261).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu import core
from gymnasium_robotics_tpu.envs.locomotion.locomotion import (
    LocoConfig, LocomotionEnv, gym_asset,
)
from gymnasium_robotics_tpu.physics import pipeline, smooth


def _mass_center_xy(model, data):
    m = model.body_mass[:, None]
    return (jnp.sum(m * data.xipos, axis=0) / jnp.sum(m))[:2]


class HumanoidEnv(LocomotionEnv):
    """gymnasium humanoid_v5: obs = qpos[2:] ++ qvel ++ cinert[1:] ++ cvel[1:]
    ++ qfrc_actuator[6:] ++ cfrc_ext[1:]; forward velocity of the mass center."""

    def __init__(self, standup=False, max_episode_steps=None, dtype=jnp.float32):
        xml = gym_asset("humanoidstandup.xml" if standup else "humanoid.xml")
        cfg = LocoConfig(
            xml=xml, frame_skip=5,
            forward_reward_weight=1.25, ctrl_cost_weight=0.1,
            contact_cost_weight=5e-7, healthy_reward=5.0,
            healthy_z_range=(1.0, 2.0), reset_noise_scale=1e-2,
            reset_qvel_mode="uniform", exclude_xy=2, include_cfrc=True,
            terminate_when_unhealthy=not standup,
        )
        self.standup = standup
        super().__init__(cfg, max_episode_steps=max_episode_steps, dtype=dtype)

    def _obs_dim(self):
        mt = self.model.meta
        nb = mt.nbody - 1
        return (mt.nq - 2) + mt.nv + nb * 10 + nb * 6 + (mt.nv - 6) + nb * 6

    @property
    def observation_structure(self):
        mt = self.model.meta
        nb = mt.nbody - 1
        return {
            "skipped_qpos": 2, "qpos": mt.nq - 2, "qvel": mt.nv,
            "cinert": nb * 10, "cvel": nb * 6,
            "qfrc_actuator": mt.nv - 6, "cfrc_ext": nb * 6,
        }

    def _get_obs(self, data):
        return jnp.concatenate(
            [
                data.qpos[2:], data.qvel,
                data.cinert[1:].reshape(-1),
                data.cvel[1:].reshape(-1),
                data.qfrc_actuator[6:],
                data.cfrc_ext[1:].reshape(-1),
            ]
        )

    def _reward(self, data_before, data_after, action, obs):
        cfg = self.cfg
        if self.standup:
            # humanoidstandup_v5: uph_cost = qpos[2]/model timestep
            uph = data_after.qpos[2] / self.model.opt.timestep
            quad_ctrl = 0.1 * jnp.sum(jnp.square(action))
            quad_impact = jnp.minimum(
                0.5e-6 * jnp.sum(jnp.square(data_after.cfrc_ext)), 10.0
            )
            reward = uph - quad_ctrl - quad_impact + 1.0
            info = {
                "x_position": data_after.qpos[0],
                "y_position": data_after.qpos[1],
                "x_velocity": jnp.zeros((), self.dtype),
                "y_velocity": jnp.zeros((), self.dtype),
            }
            return reward, jnp.zeros((), bool), info
        xy_b = _mass_center_xy(self.model, data_before)
        xy_a = _mass_center_xy(self.model, data_after)
        vel = (xy_a - xy_b) / self.dt
        healthy = self._is_healthy(data_after, obs)
        reward = cfg.forward_reward_weight * vel[0] + cfg.healthy_reward * healthy
        reward -= cfg.ctrl_cost_weight * jnp.sum(jnp.square(action))
        # humanoid_v5 contact cost: raw cfrc_ext, cost clipped to <= 10
        contact_cost = jnp.minimum(
            cfg.contact_cost_weight * jnp.sum(jnp.square(data_after.cfrc_ext)), 10.0
        )
        reward -= contact_cost
        info = {
            "x_position": data_after.qpos[0],
            "y_position": data_after.qpos[1],
            "x_velocity": vel[0], "y_velocity": vel[1],
        }
        terminated = (~healthy) & cfg.terminate_when_unhealthy
        return reward, terminated, info


class InvertedPendulumEnv(LocomotionEnv):
    def __init__(self, max_episode_steps=None, dtype=jnp.float32):
        cfg = LocoConfig(
            xml=gym_asset("inverted_pendulum.xml"), frame_skip=2,
            reset_noise_scale=0.01, reset_qvel_mode="uniform", exclude_xy=0,
        )
        super().__init__(cfg, max_episode_steps=max_episode_steps, dtype=dtype)

    def _obs_dim(self):
        return self.model.meta.nq + self.model.meta.nv

    def _get_obs(self, data):
        return jnp.concatenate([data.qpos, data.qvel])

    def _reward(self, data_before, data_after, action, obs):
        terminated = (jnp.abs(data_after.qpos[1]) > 0.2) | ~jnp.isfinite(obs).all()
        reward = jnp.asarray(1.0, self.dtype)
        info = {"reward_survive": reward}
        return reward, terminated, info

    def _zero_info(self, data):
        return {"reward_survive": jnp.zeros((), self.dtype)}


class InvertedDoublePendulumEnv(LocomotionEnv):
    def __init__(self, max_episode_steps=None, dtype=jnp.float32):
        cfg = LocoConfig(
            xml=gym_asset("inverted_double_pendulum.xml"), frame_skip=5,
            healthy_reward=10.0, reset_noise_scale=0.1,
            reset_qvel_mode="normal", exclude_xy=0,
        )
        super().__init__(cfg, max_episode_steps=max_episode_steps, dtype=dtype)

    def _obs_dim(self):
        # 1 cart pos + sin/cos of 2 hinges + 3 qvel + 1 constraint force
        # (gymnasium v5's documented 9-dim obs)
        return 9

    def _get_obs(self, data):
        return jnp.concatenate(
            [
                data.qpos[:1],
                jnp.sin(data.qpos[1:]),
                jnp.cos(data.qpos[1:]),
                jnp.clip(data.qvel, -10, 10),
                jnp.clip(data.qfrc_constraint, -10, 10)[:1],
            ]
        )

    def _reward(self, data_before, data_after, action, obs):
        x, _, y = data_after.site_xpos[0]
        terminated = y <= 1.0
        v1, v2 = data_after.qvel[1], data_after.qvel[2]
        dist_penalty = 0.01 * x ** 2 + (y - 2) ** 2
        vel_penalty = 1e-3 * v1 ** 2 + 5e-3 * v2 ** 2
        alive = 10.0 * (~terminated)
        reward = alive - dist_penalty - vel_penalty
        info = {"reward_survive": alive}
        return reward, terminated, info

    def _zero_info(self, data):
        return {"reward_survive": jnp.zeros((), self.dtype)}


class ReacherEnv(LocomotionEnv):
    def __init__(self, max_episode_steps=None, dtype=jnp.float32):
        cfg = LocoConfig(
            xml=gym_asset("reacher.xml"), frame_skip=2,
            reset_noise_scale=0.1, exclude_xy=0,
        )
        super().__init__(cfg, max_episode_steps=max_episode_steps, dtype=dtype)
        self._fingertip = self.model.name2id("body", "fingertip")
        self._target = self.model.name2id("body", "target")

    def _obs_dim(self):
        return 10

    def _get_obs(self, data):
        theta = data.qpos[:2]
        return jnp.concatenate(
            [
                jnp.cos(theta), jnp.sin(theta),
                data.qpos[2:], data.qvel[:2],
                (data.xpos[self._fingertip] - data.xpos[self._target])[:2],
            ]
        )

    def _reward(self, data_before, data_after, action, obs):
        vec = data_after.xpos[self._fingertip] - data_after.xpos[self._target]
        reward_dist = -jnp.linalg.norm(vec)
        reward_ctrl = -jnp.sum(jnp.square(action))
        info = {"reward_dist": reward_dist, "reward_ctrl": reward_ctrl}
        return reward_dist + reward_ctrl, jnp.zeros((), bool), info

    def reset(self, state, rng):
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        mt = self.model.meta
        qpos = self.model.qpos0 + jax.random.uniform(r1, (mt.nq,), self.dtype, -0.1, 0.1)
        # goal sampled in the disk of radius 0.2 (reacher_v5 rejection loop ->
        # masked fixed-K resampling)
        K = 8
        cands = jax.random.uniform(r2, (K, 2), self.dtype, -0.2, 0.2)
        ok = jnp.linalg.norm(cands, axis=-1) < 0.2
        pick = jnp.argmax(ok)
        goal = cands[pick] * jnp.where(jnp.any(ok), 1.0, 0.5)
        qpos = qpos.at[-2:].set(goal)
        qvel = jax.random.uniform(r3, (mt.nv,), self.dtype, -0.005, 0.005)
        qvel = qvel.at[-2:].set(0.0)
        data = pipeline.make_data(self.model, dtype=self.dtype)
        data = dataclasses.replace(data, qpos=qpos, qvel=qvel)
        data = pipeline.refresh_kin(self.model, data, com=False)
        obs = self._get_obs(data)
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"reward_dist": jnp.zeros((), self.dtype),
                  "reward_ctrl": jnp.zeros((), self.dtype)},
            rng=rng, steps=jnp.zeros((), jnp.int32),
        )


class PusherEnv(LocomotionEnv):
    def __init__(self, max_episode_steps=None, dtype=jnp.float32):
        cfg = LocoConfig(
            xml=gym_asset("pusher_v5.xml"), frame_skip=5,
            reset_noise_scale=0.005, exclude_xy=0,
        )
        super().__init__(cfg, max_episode_steps=max_episode_steps, dtype=dtype)
        self._tips = self.model.name2id("body", "tips_arm")
        self._object = self.model.name2id("body", "object")
        self._goal = self.model.name2id("body", "goal")

    def _obs_dim(self):
        return 23

    def _get_obs(self, data):
        return jnp.concatenate(
            [
                data.qpos[:7], data.qvel[:7],
                data.xpos[self._tips], data.xpos[self._object],
                data.xpos[self._goal],
            ]
        )

    def _reward(self, data_before, data_after, action, obs):
        vec1 = data_after.xpos[self._object] - data_after.xpos[self._tips]
        vec2 = data_after.xpos[self._object] - data_after.xpos[self._goal]
        reward_near = -jnp.linalg.norm(vec1) * 0.5
        reward_dist = -jnp.linalg.norm(vec2)
        reward_ctrl = -jnp.sum(jnp.square(action)) * 0.1
        info = {
            "reward_dist": reward_dist, "reward_ctrl": reward_ctrl,
            "reward_near": reward_near,
        }
        return reward_dist + reward_ctrl + reward_near, jnp.zeros((), bool), info

    def reset(self, state, rng):
        rng, r1, r2 = jax.random.split(rng, 3)
        mt = self.model.meta
        qpos = self.model.qpos0
        # cylinder position >= 0.17 from the (0,0) goal: masked fixed-K retry
        K = 8
        cx = jax.random.uniform(r1, (K, 1), self.dtype, -0.3, 0.0)
        cy = jax.random.uniform(jax.random.fold_in(r1, 1), (K, 1), self.dtype, -0.2, 0.2)
        cands = jnp.concatenate([cx, cy], axis=-1)
        ok = jnp.linalg.norm(cands, axis=-1) > 0.17
        pick = jnp.argmax(ok)
        cyl = cands[pick]
        qpos = qpos.at[-4:-2].set(cyl).at[-2:].set(jnp.zeros(2, self.dtype))
        qvel = jax.random.uniform(r2, (mt.nv,), self.dtype, -0.005, 0.005)
        qvel = qvel.at[-4:].set(0.0)
        data = pipeline.make_data(self.model, dtype=self.dtype)
        data = dataclasses.replace(data, qpos=qpos, qvel=qvel)
        data = pipeline.refresh_kin(self.model, data, com=False)
        obs = self._get_obs(data)
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"reward_dist": jnp.zeros((), self.dtype),
                  "reward_ctrl": jnp.zeros((), self.dtype),
                  "reward_near": jnp.zeros((), self.dtype)},
            rng=rng, steps=jnp.zeros((), jnp.int32),
        )


def make_humanoid(**kw):
    return HumanoidEnv(standup=False, **kw)


def make_humanoid_standup(**kw):
    return HumanoidEnv(standup=True, **kw)


def make_inverted_pendulum(**kw):
    return InvertedPendulumEnv(**kw)


def make_inverted_double_pendulum(**kw):
    return InvertedDoublePendulumEnv(**kw)


def make_reacher(**kw):
    return ReacherEnv(**kw)


def make_pusher(**kw):
    return PusherEnv(**kw)
