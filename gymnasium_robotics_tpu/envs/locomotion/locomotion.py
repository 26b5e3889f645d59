"""Classic locomotion envs (Gymnasium-MuJoCo v5 semantics) on the batched
physics core.

These serve three reference capabilities at once (SURVEY.md §2.3):
- inner envs for the AntMaze wrapper family (reference envs/maze/ant_maze_v5.py),
- single-agent scenarios factorized by MaMuJoCo (reference
  envs/multiagent_mujoco/mujoco_multi.py:42-54, made as Gymnasium "-v5"),
- the legacy locomotion re-registrations (reference envs/mujoco/, v2/v3 IDs —
  implemented here with v5-semantics rewards on the same compiled models).

Each env is config-driven; obs/reward/termination mirror the corresponding
gymnasium/envs/mujoco/*_v5.py definitions and are validated numerically against
them in tests (same qpos/qvel => same obs & reward).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu import core
from gymnasium_robotics_tpu.physics import pipeline

GYM_ASSETS = None


def gym_asset(name: str) -> str:
    global GYM_ASSETS
    if GYM_ASSETS is None:
        import gymnasium.envs.mujoco as gm

        GYM_ASSETS = os.path.join(os.path.dirname(gm.__file__), "assets")
    return os.path.join(GYM_ASSETS, name)


@dataclasses.dataclass
class LocoConfig:
    xml: str
    frame_skip: int
    forward_reward_weight: float = 1.0
    ctrl_cost_weight: float = 0.0
    contact_cost_weight: float = 0.0
    contact_force_range: tuple = (-1.0, 1.0)
    healthy_reward: float = 0.0
    terminate_when_unhealthy: bool = True
    healthy_z_range: Optional[tuple] = None
    healthy_angle_range: Optional[tuple] = None
    healthy_state_range: Optional[tuple] = None
    reset_noise_scale: float = 0.1
    reset_qvel_mode: str = "normal"     # "normal" | "uniform" | "none"
    exclude_xy: int = 2                 # leading qpos entries dropped from obs
    include_cfrc: bool = False
    clip_qvel_obs: Optional[float] = None
    main_body: int = 1
    vel_from: str = "qpos_xy"  # "qpos_xy" (free root) | "qpos_x" (planar root)


class LocomotionEnv(core.FunctionalEnv):
    """Generic forward-locomotion env: obs = qpos[skip:] ++ qvel (++ cfrc),
    reward = fwd_vel + healthy - ctrl_cost - contact_cost."""

    def __init__(self, cfg: LocoConfig, max_episode_steps=None, dtype=jnp.float32):
        from gymnasium_robotics_tpu.mjcf.import_mjcf import import_xml_path

        self.cfg = cfg
        self.model = import_xml_path(
            cfg.xml, dtype=np.float64 if dtype == jnp.float64 else np.float32
        )
        self.dtype = dtype
        self.max_episode_steps = max_episode_steps
        self.dt = self.model.opt.timestep * cfg.frame_skip

        import gymnasium.spaces as spaces

        nu = self.model.nu
        ctrlrange = np.asarray(jax.device_get(self.model.actuator_ctrlrange))
        self.action_space = spaces.Box(
            ctrlrange[:, 0].astype(np.float32), ctrlrange[:, 1].astype(np.float32)
        )
        obs_dim = self._obs_dim()
        self.observation_space = spaces.Box(
            -np.inf, np.inf, shape=(obs_dim,), dtype=np.float64
        )
        self.metadata = {
            "render_modes": ["human", "rgb_array", "depth_array"],
            "render_fps": int(round(1.0 / self.dt)),
        }

    def _obs_dim(self):
        mt = self.model.meta
        n = (mt.nq - self.cfg.exclude_xy) + mt.nv
        if self.cfg.include_cfrc:
            n += (mt.nbody - 1) * 6
        return n

    @property
    def observation_structure(self):
        """Obs layout segments (gymnasium *_v5 `observation_structure`): used
        by MaMuJoCo's CTDE state<->local-obs mapping
        (mujoco_multi.py:407-502)."""
        mt = self.model.meta
        return {
            "skipped_qpos": self.cfg.exclude_xy,
            "qpos": mt.nq - self.cfg.exclude_xy,
            "qvel": mt.nv,
            "cfrc_ext": (mt.nbody - 1) * 6 if self.cfg.include_cfrc else 0,
        }

    # --- obs / reward hooks (overridable per env) ---
    def _get_obs(self, data):
        qvel = data.qvel
        if self.cfg.clip_qvel_obs is not None:
            c = self.cfg.clip_qvel_obs
            qvel = jnp.clip(qvel, -c, c)
        parts = [data.qpos[self.cfg.exclude_xy:], qvel]
        if self.cfg.include_cfrc:
            lo, hi = self.cfg.contact_force_range
            parts.append(jnp.clip(data.cfrc_ext[1:], lo, hi).reshape(-1))
        return jnp.concatenate(parts)

    def _is_healthy(self, data, obs):
        cfg = self.cfg
        healthy = jnp.isfinite(obs).all() & jnp.isfinite(data.qpos).all() \
            & jnp.isfinite(data.qvel).all()
        if cfg.healthy_z_range is not None:
            z = data.qpos[self._z_index()]
            healthy &= (z >= cfg.healthy_z_range[0]) & (z <= cfg.healthy_z_range[1])
        if cfg.healthy_angle_range is not None:
            ang = data.qpos[self._angle_index()]
            healthy &= (ang >= cfg.healthy_angle_range[0]) & (
                ang <= cfg.healthy_angle_range[1]
            )
        if cfg.healthy_state_range is not None:
            # gymnasium hopper_v5: state_vector()[2:] with strict inequalities
            lo, hi = cfg.healthy_state_range
            state = jnp.concatenate([data.qpos[2:], data.qvel])
            healthy &= ((state > lo) & (state < hi)).all()
        return healthy

    def _z_index(self):
        return 2 if self.cfg.exclude_xy == 2 else 1

    def _angle_index(self):
        return 2

    def _reward(self, data_before, data_after, action, obs):
        cfg = self.cfg
        # displacement measured on fresh qpos (the v5 envs read post-step
        # positions; for free/planar roots body xpos == root qpos)
        if cfg.vel_from == "qpos_x":
            xy_b = jnp.stack([data_before.qpos[0], jnp.zeros((), data_before.qpos.dtype)])
            xy_a = jnp.stack([data_after.qpos[0], jnp.zeros((), data_after.qpos.dtype)])
        elif cfg.vel_from == "body":
            # v5 ant/humanoid read body xpos, whose post-step snapshot under
            # RK4 is the last RK stage (matched by pipeline._rk4)
            xy_b = data_before.xpos[cfg.main_body][:2]
            xy_a = data_after.xpos[cfg.main_body][:2]
        else:
            xy_b = data_before.qpos[:2]
            xy_a = data_after.qpos[:2]
        vel = (xy_a - xy_b) / self.dt
        forward = cfg.forward_reward_weight * vel[0]
        healthy = self._is_healthy(data_after, obs)
        reward = forward + cfg.healthy_reward * healthy
        reward -= cfg.ctrl_cost_weight * jnp.sum(jnp.square(action))
        if cfg.contact_cost_weight:
            lo, hi = cfg.contact_force_range
            cf = jnp.clip(data_after.cfrc_ext, lo, hi)
            reward -= cfg.contact_cost_weight * jnp.sum(jnp.square(cf))
        info = {
            "x_position": data_after.qpos[0],
            "y_position": data_after.qpos[1] if self.model.meta.nq > 1 else 0.0,
            "x_velocity": vel[0],
            "y_velocity": vel[1],
        }
        terminated = (~healthy) & cfg.terminate_when_unhealthy
        return reward, terminated, info

    # --- env API ---
    def initial(self, rng) -> core.EnvState:
        data = pipeline.make_data(self.model, dtype=self.dtype)
        state = core.EnvState(
            data=data, obs=self._get_obs(data),
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={}, rng=rng, goal=jnp.zeros(0, self.dtype),
            steps=jnp.zeros((), jnp.int32), aux={},
        )
        return self.reset(state, rng)

    def reset(self, state: core.EnvState, rng) -> core.EnvState:
        cfg = self.cfg
        mt = self.model.meta
        rng, r1, r2 = jax.random.split(rng, 3)
        s = cfg.reset_noise_scale
        qpos = self.model.qpos0 + jax.random.uniform(
            r1, (mt.nq,), self.dtype, -s, s
        )
        if cfg.reset_qvel_mode == "normal":
            qvel = s * jax.random.normal(r2, (mt.nv,), self.dtype)
        elif cfg.reset_qvel_mode == "uniform":
            qvel = jax.random.uniform(r2, (mt.nv,), self.dtype, -s, s)
        else:
            qvel = jnp.zeros(mt.nv, self.dtype)
        data = pipeline.make_data(self.model, dtype=self.dtype)
        data = dataclasses.replace(data, qpos=qpos, qvel=qvel)
        from gymnasium_robotics_tpu.physics import smooth

        data = pipeline.refresh_kin(self.model, data, com=False)
        obs = self._get_obs(data)
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info=self._zero_info(data),
            rng=rng, steps=jnp.zeros((), jnp.int32),
        )

    def _zero_info(self, data):
        """Reset-time info with the same pytree structure as step info (required
        for masked auto-reset state selection)."""
        z = jnp.zeros((), self.dtype)
        return {
            "x_position": data.qpos[0],
            "y_position": data.qpos[1] if self.model.meta.nq > 1 else z,
            "x_velocity": z, "y_velocity": z,
        }

    def step(self, state: core.EnvState, action) -> core.EnvState:
        action = jnp.asarray(action, self.dtype)
        data_before = state.data
        data = pipeline.step_n(self.model, data_before, action, self.cfg.frame_skip)
        obs = self._get_obs(data)
        reward, terminated, info = self._reward(data_before, data, action, obs)
        rng, _ = jax.random.split(state.rng)
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.asarray(reward, self.dtype),
            terminated=terminated,
            truncated=jnp.zeros((), bool),
            info=info, rng=rng, steps=state.steps + 1,
        )


# --- per-env configs (gymnasium *_v5.py defaults) ---

def make_ant(**over):
    cfg = LocoConfig(
        xml=gym_asset("ant.xml"), frame_skip=5,
        ctrl_cost_weight=0.5, contact_cost_weight=5e-4,
        healthy_reward=1.0, healthy_z_range=(0.2, 1.0),
        reset_noise_scale=0.1, reset_qvel_mode="normal",
        exclude_xy=2, include_cfrc=True, vel_from="body",
    )
    cfg = dataclasses.replace(cfg, **over.pop("cfg_over", {}))
    return LocomotionEnv(cfg, **over)


def make_half_cheetah(**over):
    cfg = LocoConfig(
        xml=gym_asset("half_cheetah.xml"), frame_skip=5,
        ctrl_cost_weight=0.1, reset_noise_scale=0.1,
        reset_qvel_mode="normal", exclude_xy=1, vel_from="qpos_x",
        terminate_when_unhealthy=False,
    )
    return LocomotionEnv(cfg, **over)


def make_hopper(**over):
    cfg = LocoConfig(
        xml=gym_asset("hopper.xml"), frame_skip=4,
        ctrl_cost_weight=1e-3, healthy_reward=1.0,
        healthy_z_range=(0.7, float(np.inf)),
        healthy_angle_range=(-0.2, 0.2),
        healthy_state_range=(-100.0, 100.0),
        reset_noise_scale=5e-3, reset_qvel_mode="uniform",
        exclude_xy=1, vel_from="qpos_x", clip_qvel_obs=10.0,
    )
    return LocomotionEnv(cfg, **over)


def make_walker2d(**over):
    cfg = LocoConfig(
        xml=gym_asset("walker2d_v5.xml"), frame_skip=4,
        ctrl_cost_weight=1e-3, healthy_reward=1.0,
        healthy_z_range=(0.8, 2.0), healthy_angle_range=(-1.0, 1.0),
        reset_noise_scale=5e-3, reset_qvel_mode="uniform",
        exclude_xy=1, vel_from="qpos_x", clip_qvel_obs=10.0,
    )
    return LocomotionEnv(cfg, **over)


def make_swimmer(**over):
    cfg = LocoConfig(
        xml=gym_asset("swimmer.xml"), frame_skip=4,
        ctrl_cost_weight=1e-4, reset_noise_scale=0.1,
        reset_qvel_mode="uniform", exclude_xy=2,
        terminate_when_unhealthy=False,
    )
    return LocomotionEnv(cfg, **over)
