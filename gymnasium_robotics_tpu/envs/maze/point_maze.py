"""PointMaze family: 2-DoF force-actuated ball in a compiled maze.

Functional re-design of the reference composition PointMazeEnv(PointEnv)
(gymnasium_robotics/envs/maze/point_maze.py:316-419, point.py:22-77):
obs = [qpos(2), qvel(2)], achieved_goal = qpos[:2]; velocity clipped to ±5
before each step; dense reward exp(-d) / sparse (d<=0.45); continuing-task
in-episode goal respawn; reset-position rejection (>=0.5*scale from goal,
maze_v4.py:284-296) implemented as masked fixed-K resampling.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu import core
from gymnasium_robotics_tpu.envs.maze import maze_core
from gymnasium_robotics_tpu.physics import pipeline


class PointMazeEnv(core.GoalEnv):
    metadata = {"render_modes": ["human", "rgb_array", "depth_array"], "render_fps": 50}

    def __init__(
        self,
        maze_map=None,
        reward_type: str = "sparse",
        continuing_task: bool = True,
        reset_target: bool = False,
        position_noise_range: float = 0.25,
        max_episode_steps=None,
        dtype=jnp.float32,
    ):
        from gymnasium_robotics_tpu.envs.maze import maps

        maze_map = maze_map if maze_map is not None else maps.U_MAZE
        self.model, self.maze = maze_core.build_point_maze_model(
            maze_map, size_scaling=1.0, height=0.4,
            dtype=np.float64 if dtype == jnp.float64 else np.float32,
        )
        # 2-dof ball with at most a handful of wall contacts: the Newton
        # solve converges in a few iterations; fewer sequential tiny kernels
        # per substep is the dominant TPU win for this family
        self.model = self.model.with_options(
            iterations=6, ls_iterations=4, need_cfrc_ext=False
        )
        self.reward_type = reward_type
        self.continuing_task = continuing_task
        self.reset_target = reset_target
        self.position_noise_range = position_noise_range
        self.max_episode_steps = max_episode_steps
        self.dtype = dtype
        self._goal_locs = jnp.asarray(
            np.array(self.maze.goal_locations, dtype=np.float64), dtype
        )
        self._reset_locs = jnp.asarray(
            np.array(self.maze.reset_locations, dtype=np.float64), dtype
        )

        import gymnasium.spaces as spaces

        self.action_space = spaces.Box(-1.0, 1.0, shape=(2,), dtype=np.float32)
        self.observation_space = spaces.Dict(
            dict(
                observation=spaces.Box(-np.inf, np.inf, shape=(4,), dtype=np.float64),
                achieved_goal=spaces.Box(-np.inf, np.inf, shape=(2,), dtype=np.float64),
                desired_goal=spaces.Box(-np.inf, np.inf, shape=(2,), dtype=np.float64),
            )
        )

    # --- GoalEnv pure functions (reference maze_v4.py:381-398) ---
    def compute_reward(self, achieved_goal, desired_goal, info=None):
        d = jnp.linalg.norm(achieved_goal - desired_goal, axis=-1)
        if self.reward_type == "dense":
            return jnp.exp(-d)
        return (d <= 0.45).astype(self.dtype)

    def compute_terminated(self, achieved_goal, desired_goal, info=None):
        if self.continuing_task:
            return jnp.zeros(jnp.shape(achieved_goal)[:-1], bool)
        return jnp.linalg.norm(achieved_goal - desired_goal, axis=-1) <= 0.45

    # --- sampling helpers ---
    def _add_noise(self, rng, xy):
        noise = jax.random.uniform(
            rng, (2,), self.dtype,
            -self.position_noise_range, self.position_noise_range,
        ) * self.maze.size_scaling
        return xy + noise

    def _sample_goal(self, rng):
        r1, r2 = jax.random.split(rng)
        idx = jax.random.randint(r1, (), 0, len(self.maze.goal_locations))
        return self._add_noise(r2, self._goal_locs[idx])

    def _sample_reset(self, rng, goal):
        """Masked fixed-K retry of the reference rejection loop
        (maze_v4.py:284-296): candidate must be >= 0.5*scale from goal."""
        K = 16
        r1, r2 = jax.random.split(rng)
        idxs = jax.random.randint(r1, (K,), 0, len(self.maze.reset_locations))
        cands = self._reset_locs[idxs]
        dists = jnp.linalg.norm(cands - goal[None], axis=-1)
        valid = dists > 0.5 * self.maze.size_scaling
        # first valid candidate; fallback to the farthest
        first = jnp.argmax(valid)
        pick = jnp.where(jnp.any(valid), first, jnp.argmax(dists))
        return self._add_noise(r2, cands[pick])

    # --- env API ---
    def initial(self, rng) -> core.EnvState:
        data = pipeline.make_data(self.model, dtype=self.dtype)
        state = core.EnvState(
            data=data,
            obs=None, reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"success": jnp.zeros((), bool)},
            rng=rng,
            goal=jnp.zeros(2, self.dtype),
            steps=jnp.zeros((), jnp.int32),
            aux={},
        )
        return self.reset(state, rng)

    def initial_with_options(self, rng, options) -> core.EnvState:
        """Reset with explicit goal_cell / reset_cell (i, j) options
        (reference maze_v4.py:299-358)."""
        state = self.initial(rng)
        rng, r1, r2 = jax.random.split(state.rng, 3)
        goal = state.goal
        if options.get("goal_cell") is not None:
            cell = self.maze.cell_rowcol_to_xy(options["goal_cell"])
            goal = self._add_noise(r1, jnp.asarray(cell, self.dtype))
        data = state.data
        if options.get("reset_cell") is not None:
            cell = self.maze.cell_rowcol_to_xy(options["reset_cell"])
            pos = self._add_noise(r2, jnp.asarray(cell, self.dtype))
            qpos = data.qpos.at[:2].set(pos)
            data = dataclasses.replace(data, qpos=qpos)
        obs = self._get_obs(data, goal)
        return dataclasses.replace(state, data=data, goal=goal, obs=obs, rng=rng)

    def reset_with_values(self, state: core.EnvState, values) -> core.EnvState:
        """Parity-mode reset: goal/reset positions sampled on the host in the
        reference's NumPy draw order (utils/parity.py) are injected here."""
        goal = jnp.asarray(values["goal_xy"], self.dtype)
        reset_pos = jnp.asarray(values["reset_xy"], self.dtype)
        data = pipeline.make_data(self.model, dtype=self.dtype)
        qpos = data.qpos.at[:2].set(reset_pos)
        data = dataclasses.replace(data, qpos=qpos)
        obs = self._get_obs(data, goal)
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"success": jnp.zeros((), bool)},
            goal=goal, steps=jnp.zeros((), jnp.int32),
        )

    def reset(self, state: core.EnvState, rng) -> core.EnvState:
        rng, r_goal, r_reset = jax.random.split(rng, 3)
        goal = self._sample_goal(r_goal)
        reset_pos = self._sample_reset(r_reset, goal)
        data = pipeline.make_data(self.model, dtype=self.dtype)
        qpos = data.qpos.at[:2].set(reset_pos)
        data = dataclasses.replace(data, qpos=qpos)
        obs = self._get_obs(data, goal)
        return dataclasses.replace(
            state,
            data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool),
            truncated=jnp.zeros((), bool),
            info={"success": jnp.zeros((), bool)},
            rng=rng, goal=goal,
            steps=jnp.zeros((), jnp.int32),
        )

    def _get_obs(self, data, goal):
        obs = jnp.concatenate([data.qpos, data.qvel])
        return dict(
            observation=obs,
            achieved_goal=data.qpos[:2],
            desired_goal=goal,
        )

    def step(self, state: core.EnvState, action) -> core.EnvState:
        action = jnp.clip(jnp.asarray(action, self.dtype), -1.0, 1.0)
        data = state.data
        # inner PointEnv clips qvel to ±5 before stepping (point.py:55-77)
        data = dataclasses.replace(data, qvel=jnp.clip(data.qvel, -5.0, 5.0))
        data = pipeline.step_n(self.model, data, action, 1)

        achieved = data.qpos[:2]
        rng, r_goal = jax.random.split(state.rng)
        reward = self.compute_reward(achieved, state.goal)
        terminated = self.compute_terminated(achieved, state.goal)
        reached = jnp.linalg.norm(achieved - state.goal) <= 0.45
        info = {"success": reached}

        # continuing-task goal respawn (maze_v4.py:400-418)
        goal = state.goal
        if (
            self.continuing_task
            and self.reset_target
            and len(self.maze.goal_locations) > 1
        ):
            new_goal = self._resample_far_goal(r_goal, achieved)
            goal = jnp.where(reached, new_goal, goal)

        obs = self._get_obs(data, goal)
        return dataclasses.replace(
            state,
            data=data, obs=obs, reward=reward,
            terminated=terminated,
            truncated=jnp.zeros((), bool),
            info=info, rng=rng, goal=goal,
            steps=state.steps + 1,
        )

    def _resample_far_goal(self, rng, achieved):
        K = 16
        r1, r2 = jax.random.split(rng)
        idxs = jax.random.randint(r1, (K,), 0, len(self.maze.goal_locations))
        cands = jax.vmap(lambda i, r: self._add_noise(r, self._goal_locs[i]))(
            idxs, jax.random.split(r2, K)
        )
        dists = jnp.linalg.norm(cands - achieved[None], axis=-1)
        valid = dists > 0.45
        pick = jnp.where(jnp.any(valid), jnp.argmax(valid), jnp.argmax(dists))
        return cands[pick]
