"""AntMaze family: Ant locomotion inside a compiled maze (v5 semantics).

Functional re-design of the reference's composition wrapper
(gymnasium_robotics/envs/maze/ant_maze_v5.py:226-320): inner AntEnv made with
exclude_current_positions_from_observation=False and reset_noise_scale=0.0
(:251-253); achieved_goal = torso xy = ant_obs[:2], observation = ant_obs[2:];
the inner env's reward/termination are discarded; maze goal logic (dense
exp(-d) / sparse d<=0.45, continuing-task goal respawn) comes from the maze
core (maze_v4.py:381-418); maze_size_scaling=4, maze_height=0.5 (:241-242).
"""

from __future__ import annotations

import dataclasses
import os
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu import core
from gymnasium_robotics_tpu.envs.locomotion import locomotion as L
from gymnasium_robotics_tpu.envs.maze import maze_core
from gymnasium_robotics_tpu.physics import pipeline, smooth


def build_ant_maze_model(maze_map, size_scaling=4.0, height=0.5, dtype=np.float32):
    """Inject maze wall geoms + target site into the gymnasium ant MJCF
    (host-side model-build step; the reference writes a temp XML per env,
    maze_v4.py:149-244 — here it feeds the compiler once). Registry maps load
    from packaged precompiled artifacts."""
    from gymnasium_robotics_tpu.mjcf import serialize

    spec = maze_core.analyze_maze(maze_map, size_scaling, height)
    key = maze_core.maze_asset_key("ant_maze", maze_map, size_scaling, height)
    if os.path.exists(serialize.asset_path(key)):
        model, _ = serialize.load_model(serialize.asset_path(key), dtype=dtype)
        return model, spec
    tree = ET.parse(L.gym_asset("ant.xml"))
    worldbody = tree.find(".//worldbody")
    for i in range(spec.map_length):
        for j in range(spec.map_width):
            if maze_map[i][j] == 1:
                x = (j + 0.5) * size_scaling - spec.x_center
                y = spec.y_center - (i + 0.5) * size_scaling
                ET.SubElement(
                    worldbody, "geom",
                    name=f"block_{i}_{j}",
                    pos=f"{x} {y} {height / 2 * size_scaling}",
                    size=f"{0.5 * size_scaling} {0.5 * size_scaling} {height / 2 * size_scaling}",
                    type="box", material="", contype="1", conaffinity="1",
                    rgba="0.7 0.5 0.3 1.0",
                )
    ET.SubElement(
        worldbody, "site", name="target",
        pos=f"0 0 {height / 2 * size_scaling}",
        size=f"{0.2 * size_scaling}", rgba="1 0 0 0.7", type="sphere",
    )
    xml = ET.tostring(tree.getroot(), encoding="unicode")
    from gymnasium_robotics_tpu.mjcf.import_mjcf import import_xml_string

    model = import_xml_string(xml, dtype=dtype)
    serialize.save_model(model, serialize.asset_path(key))
    return model, spec


class AntMazeEnv(core.GoalEnv):
    metadata = {"render_modes": ["human", "rgb_array", "depth_array"], "render_fps": 50}

    def __init__(
        self,
        maze_map=None,
        reward_type: str = "sparse",
        continuing_task: bool = True,
        reset_target: bool = False,
        position_noise_range: float = 0.25,
        version: str = "v5",
        max_episode_steps=None,
        dtype=jnp.float32,
    ):
        from gymnasium_robotics_tpu.envs.maze import maps

        maze_map = maze_map if maze_map is not None else maps.U_MAZE
        npdtype = np.float64 if dtype == jnp.float64 else np.float32
        self.model, self.maze = build_ant_maze_model(
            maze_map, size_scaling=4.0, height=0.5, dtype=npdtype
        )
        # large static wall x leg pair table; at most ~16 simultaneous
        # contacts. pair_topk=8: the 216-pair wall-leg (box-capsule) group
        # never exceeds 2 near pairs in reference-env rollouts (4x headroom;
        # measured with the calibrate_topk near-count on AntMaze_UMaze-v5),
        # so top-K compacts the candidate table ~20x.
        self.model = self.model.with_options(
            contact_cap=16, iterations=5, ls_iterations=4, pair_topk=8,
            # only v5 observes contact forces (ant_maze_v5.py:244-253)
            need_cfrc_ext=version == "v5",
        )
        # inner ant: v5 semantics include contact forces (ant_maze_v5.py:
        # 244-253); v3/v4 wrap gymnasium's ant_v4 with default kwargs, i.e.
        # use_contact_forces=False -> 27-dim observation and no contact cost
        # (ant_maze_v3.py:47-53, ant_maze_v4.py:62-68)
        self.version = version
        include_cfrc = version == "v5"
        self.cfg = L.LocoConfig(
            xml="", frame_skip=5, ctrl_cost_weight=0.5,
            contact_cost_weight=5e-4 if include_cfrc else 0.0,
            healthy_reward=1.0,
            healthy_z_range=(0.2, 1.0), reset_noise_scale=0.0,
            exclude_xy=0, include_cfrc=include_cfrc, vel_from="body",
        )
        self.reward_type = reward_type
        self.continuing_task = continuing_task
        self.reset_target = reset_target
        self.position_noise_range = position_noise_range
        self.max_episode_steps = max_episode_steps
        self.dtype = dtype
        self._goal_locs = jnp.asarray(np.array(self.maze.goal_locations), dtype)
        self._reset_locs = jnp.asarray(np.array(self.maze.reset_locations), dtype)

        import gymnasium.spaces as spaces

        obs_dim = self.model.nq + self.model.nv - 2
        if include_cfrc:
            obs_dim += (self.model.meta.nbody - 1) * 6
        self.action_space = spaces.Box(-1.0, 1.0, shape=(8,), dtype=np.float32)
        self.observation_space = spaces.Dict(
            dict(
                observation=spaces.Box(-np.inf, np.inf, (obs_dim,), np.float64),
                achieved_goal=spaces.Box(-np.inf, np.inf, (2,), np.float64),
                desired_goal=spaces.Box(-np.inf, np.inf, (2,), np.float64),
            )
        )

    # GoalEnv contract (maze_v4.py:381-398)
    def compute_reward(self, achieved_goal, desired_goal, info=None):
        d = jnp.linalg.norm(achieved_goal - desired_goal, axis=-1)
        if self.reward_type == "dense":
            return jnp.exp(-d)
        return (d <= 0.45).astype(self.dtype)

    def compute_terminated(self, achieved_goal, desired_goal, info=None):
        if self.continuing_task:
            return jnp.zeros(jnp.shape(achieved_goal)[:-1], bool)
        return jnp.linalg.norm(achieved_goal - desired_goal, axis=-1) <= 0.45

    def _add_noise(self, rng, xy):
        noise = jax.random.uniform(
            rng, (2,), self.dtype, -self.position_noise_range,
            self.position_noise_range,
        ) * self.maze.size_scaling
        return xy + noise

    def _sample_goal(self, rng):
        r1, r2 = jax.random.split(rng)
        idx = jax.random.randint(r1, (), 0, len(self.maze.goal_locations))
        return self._add_noise(r2, self._goal_locs[idx])

    def _sample_reset(self, rng, goal):
        K = 16
        r1, r2 = jax.random.split(rng)
        idxs = jax.random.randint(r1, (K,), 0, len(self.maze.reset_locations))
        cands = self._reset_locs[idxs]
        dists = jnp.linalg.norm(cands - goal[None], axis=-1)
        valid = dists > 0.5 * self.maze.size_scaling
        pick = jnp.where(jnp.any(valid), jnp.argmax(valid), jnp.argmax(dists))
        return self._add_noise(r2, cands[pick])

    def _ant_obs(self, data):
        if not self.cfg.include_cfrc:
            return jnp.concatenate([data.qpos, data.qvel])
        cfrc = jnp.clip(data.cfrc_ext[1:], -1.0, 1.0).reshape(-1)
        return jnp.concatenate([data.qpos, data.qvel, cfrc])

    def _get_obs(self, data, goal):
        ant_obs = self._ant_obs(data)
        return dict(
            observation=ant_obs[2:],
            achieved_goal=ant_obs[:2],
            desired_goal=goal,
        )

    def initial(self, rng) -> core.EnvState:
        data = pipeline.make_data(self.model, dtype=self.dtype)
        state = core.EnvState(
            data=data, obs=None, reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"success": jnp.zeros((), bool)},
            rng=rng, goal=jnp.zeros(2, self.dtype),
            steps=jnp.zeros((), jnp.int32), aux={},
        )
        return self.reset(state, rng)

    def reset(self, state: core.EnvState, rng) -> core.EnvState:
        rng, r_goal, r_reset = jax.random.split(rng, 3)
        goal = self._sample_goal(r_goal)
        reset_pos = self._sample_reset(r_reset, goal)
        data = pipeline.make_data(self.model, dtype=self.dtype)
        qpos = data.qpos.at[:2].set(reset_pos)  # reset_noise_scale = 0
        data = dataclasses.replace(data, qpos=qpos)
        data = pipeline.refresh_kin(self.model, data, com=False)
        obs = self._get_obs(data, goal)
        success = jnp.linalg.norm(obs["achieved_goal"] - goal) <= 0.45
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"success": success}, rng=rng, goal=goal,
            steps=jnp.zeros((), jnp.int32),
        )

    def step(self, state: core.EnvState, action) -> core.EnvState:
        action = jnp.clip(jnp.asarray(action, self.dtype), -1.0, 1.0)
        data = pipeline.step_n(self.model, state.data, action, self.cfg.frame_skip)
        rng, r_goal = jax.random.split(state.rng)
        achieved = data.qpos[:2]
        reward = self.compute_reward(achieved, state.goal)
        terminated = self.compute_terminated(achieved, state.goal)
        reached = jnp.linalg.norm(achieved - state.goal) <= 0.45
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
            state, data=data, obs=obs, reward=reward,
            terminated=terminated, truncated=jnp.zeros((), bool),
            info={"success": reached}, rng=rng, goal=goal,
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
