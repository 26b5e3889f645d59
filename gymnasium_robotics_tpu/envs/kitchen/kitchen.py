"""Franka Kitchen: 9-DoF arm, multitask GoalEnv with Dict-of-Dict goal space.

Functional re-design of gymnasium_robotics/envs/franka_kitchen/: action =
joint velocities integrated to position targets against the last NOISY qpos
(franka_env.py:92-171 — the documented non-MDP quirk is preserved by carrying
``last_robot_qpos`` in EnvState.aux); 7 tasks with target joint configurations
(OBS_ELEMENT_INDICES/GOALS, kitchen_env.py:27-45); reward = number of tasks
newly entering the 0.3 threshold this step (:356-369); completed tasks removed
from a boolean ``tasks_to_complete`` mask; terminated when all complete.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu import core
from gymnasium_robotics_tpu.mjcf import serialize
from gymnasium_robotics_tpu.physics import pipeline, smooth

OBS_ELEMENT_INDICES = {
    "bottom burner": np.array([11, 12]),
    "top burner": np.array([15, 16]),
    "light switch": np.array([17, 18]),
    "slide cabinet": np.array([19]),
    "hinge cabinet": np.array([20, 21]),
    "microwave": np.array([22]),
    "kettle": np.array([23, 24, 25, 26, 27, 28, 29]),
}
OBS_ELEMENT_GOALS = {
    "bottom burner": np.array([-0.88, -0.01]),
    "top burner": np.array([-0.92, -0.01]),
    "light switch": np.array([-0.69, -0.05]),
    "slide cabinet": np.array([0.37]),
    "hinge cabinet": np.array([0.0, 1.45]),
    "microwave": np.array([-0.75]),
    "kettle": np.array([-0.23, 0.75, 1.62, 0.99, 0.0, 0.0, -0.06]),
}
BONUS_THRESH = 0.3


class KitchenEnv(core.GoalEnv):
    metadata = {"render_modes": ["human", "rgb_array", "depth_array"], "render_fps": 12}
    frame_skip = 40

    def __init__(
        self,
        tasks_to_complete=None,  # default: ALL 7 tasks (kitchen_env.py:235)
        terminate_on_tasks_completed=True,
        remove_task_when_completed=True,
        object_noise_ratio=0.0005,
        robot_noise_ratio=0.01,
        max_episode_steps=None,
        dtype=jnp.float32,
    ):
        if tasks_to_complete is None:
            tasks_to_complete = tuple(OBS_ELEMENT_GOALS)
        self.tasks = tuple(tasks_to_complete)
        for t in self.tasks:
            if t not in OBS_ELEMENT_GOALS:
                raise ValueError(f"Unknown task {t}")
        self.terminate_on_tasks_completed = terminate_on_tasks_completed
        self.remove_task_when_completed = remove_task_when_completed
        self.object_noise_ratio = object_noise_ratio
        self.robot_noise_ratio = robot_noise_ratio
        self.max_episode_steps = max_episode_steps
        self.dtype = dtype
        npdtype = np.float64 if dtype == jnp.float64 else np.float32
        self.model, extra = serialize.load_asset("kitchen/kitchen", dtype=npdtype)
        # pair_topk=8/contact_cap=8: the kitchen scene's 3,698-pair candidate
        # table (11,003 static slots) never has more than 5 near pairs per
        # (type,condim) group in C-engine rollouts (tools/calibrate_topk.py),
        # so the top-K broadphase compacts the table ~14x and the capped row
        # count (~200 x nv=29) fits the fused-Newton VMEM gate
        # (constraint.solve_constraints) instead of the generic many-kernel
        # path. Guarded by the kitchen reference-tracking test.
        # iterations=8: kitchen needs all 8 Newton iterations — at 5 the
        # reference-tracking drift exceeds its bound (warmstart does not buy
        # kitchen the halving it buys hand/adroit).
        self.model = self.model.with_options(
            contact_cap=8, pair_topk=8, iterations=8, ls_iterations=4,
            need_cfrc_ext=False
        )
        self._init_qpos = jnp.asarray(extra["initial_qpos"], dtype)
        self._init_qvel = jnp.asarray(extra["initial_qvel"], dtype)
        self._pos_bound = jnp.asarray(extra["pos_bound"], dtype)
        self._vel_bound = jnp.asarray(extra["vel_bound"], dtype)
        self._pos_amp = jnp.asarray(extra["pos_noise_amp"], dtype)
        self._vel_amp = jnp.asarray(extra["vel_noise_amp"], dtype)
        # action -> joint-velocity denormalization: the reference hardcodes
        # act_mid=0, act_rng=2 rad/s (franka_env.py:80-81) — it does NOT use
        # the actuator ctrlrange
        self._act_mid = jnp.zeros(9, dtype)
        self._act_rng = 2.0 * jnp.ones(9, dtype)
        self.dt = self.model.opt.timestep * self.frame_skip
        self._goal = {
            t: jnp.asarray(OBS_ELEMENT_GOALS[t], dtype) for t in self.tasks
        }

        import gymnasium.spaces as spaces

        self.action_space = spaces.Box(-1.0, 1.0, shape=(9,), dtype=np.float32)
        self.observation_space = spaces.Dict(
            dict(
                observation=spaces.Box(-np.inf, np.inf, (59,), np.float64),
                achieved_goal=spaces.Dict(
                    {t: spaces.Box(-np.inf, np.inf, OBS_ELEMENT_GOALS[t].shape,
                                   np.float64) for t in self.tasks}
                ),
                desired_goal=spaces.Dict(
                    {t: spaces.Box(-np.inf, np.inf, OBS_ELEMENT_GOALS[t].shape,
                                   np.float64) for t in self.tasks}
                ),
            )
        )

    # --- GoalEnv contract: Dict-of-Dict goals (kitchen_env.py:356-369) ---
    def compute_reward(self, achieved_goal, desired_goal, info=None):
        completions = self._completions(achieved_goal, desired_goal)
        mask = info["tasks_to_complete"] if info and "tasks_to_complete" in info \
            else jnp.ones(len(self.tasks), bool)
        return jnp.sum(completions & mask).astype(self.dtype)

    def _completions(self, achieved, desired):
        return jnp.stack(
            [
                jnp.linalg.norm(achieved[t] - desired[t], axis=-1) < BONUS_THRESH
                for t in self.tasks
            ],
            axis=-1,
        )

    def compute_terminated(self, achieved_goal, desired_goal, info=None):
        done = jnp.all(self._completions(achieved_goal, desired_goal), axis=-1)
        if self.terminate_on_tasks_completed:
            return done
        return jnp.zeros_like(done)

    # --- obs ---
    def _draw_noise(self, rng):
        """Raw U(-1,1) noise vectors in the reference's draw order
        (franka_env.py:118-127 robot, kitchen_env.py:376-385 objects)."""
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        return {
            "robot_pos": jax.random.uniform(r1, (9,), self.dtype, -1.0, 1.0),
            "robot_vel": jax.random.uniform(r2, (9,), self.dtype, -1.0, 1.0),
            "obj_pos": jax.random.uniform(
                r3, (self.model.nq - 9,), self.dtype, -1.0, 1.0
            ),
            "obj_vel": jax.random.uniform(
                r4, (self.model.meta.nv - 9,), self.dtype, -1.0, 1.0
            ),
        }

    def _get_obs(self, data, noise):
        robot_qpos = data.qpos[:9] + self.robot_noise_ratio * self._pos_amp[:9] * \
            jnp.asarray(noise["robot_pos"], self.dtype)
        robot_qvel = data.qvel[:9] + self.robot_noise_ratio * self._vel_amp[:9] * \
            jnp.asarray(noise["robot_vel"], self.dtype)
        obj_qpos = data.qpos[9:] + self.object_noise_ratio * self._pos_amp[8:29] * \
            jnp.asarray(noise["obj_pos"], self.dtype)
        obj_qvel = data.qvel[9:] + self.object_noise_ratio * self._vel_amp[9:30] * \
            jnp.asarray(noise["obj_vel"], self.dtype)
        achieved = {
            t: data.qpos[jnp.asarray(OBS_ELEMENT_INDICES[t])] for t in self.tasks
        }
        obs = jnp.concatenate([robot_qpos, robot_qvel, obj_qpos, obj_qvel])
        return (
            dict(observation=obs, achieved_goal=achieved, desired_goal=self._goal),
            robot_qpos,
        )

    # --- env API ---
    def initial(self, rng) -> core.EnvState:
        data = pipeline.make_data(self.model, dtype=self.dtype)
        state = core.EnvState(
            data=data, obs=None, reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={}, rng=rng, goal=jnp.zeros(0, self.dtype),
            steps=jnp.zeros((), jnp.int32), aux={},
        )
        return self.reset(state, rng)

    def reset(self, state, rng):
        rng, r_obs = jax.random.split(rng)
        return self._reset_with_noise(state, rng, self._draw_noise(r_obs))

    def reset_with_values(self, state, values):
        """Parity-mode reset: the four U(-1,1) noise vectors were drawn on the
        host in the reference's order (utils/parity.py)."""
        return self._reset_with_noise(state, state.rng, values)

    def _reset_with_noise(self, state, rng, noise):
        data = pipeline.make_data(self.model, dtype=self.dtype)
        data = dataclasses.replace(
            data, qpos=self._init_qpos, qvel=self._init_qvel
        )
        data = pipeline.refresh_kin(self.model, data, com=False)
        obs, last_qpos = self._get_obs(data, noise)
        n = len(self.tasks)
        info = {
            "tasks_to_complete": jnp.ones(n, bool),
            "step_task_completions": jnp.zeros(n, bool),
            "episode_task_completions": jnp.zeros(n, bool),
        }
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info=info, rng=rng, steps=jnp.zeros((), jnp.int32),
            aux={
                "last_robot_qpos": last_qpos,
                "tasks_to_complete": jnp.ones(n, bool),
                "episode_task_completions": jnp.zeros(n, bool),
            },
        )

    def step(self, state, action):
        rng, r_obs = jax.random.split(state.rng)
        return self._step_with_noise(state, action, self._draw_noise(r_obs), rng)

    def step_with_values(self, state, action, values):
        """Parity-mode step: reference draws obs noise EVERY step
        (franka_env.py:118-127); the host supplies the U(-1,1) vectors."""
        rng, _ = jax.random.split(state.rng)
        return self._step_with_noise(state, action, values, rng)

    def _step_with_noise(self, state, action, noise, rng):
        action = jnp.clip(jnp.asarray(action, self.dtype), -1.0, 1.0)
        # denormalize to velocity, clip, integrate against last NOISY qpos
        # (franka_env.py:141-171)
        vel = self._act_mid + action * self._act_rng
        vel = jnp.clip(vel, self._vel_bound[:9, 0], self._vel_bound[:9, 1])
        ctrl = state.aux["last_robot_qpos"] + vel * self.dt
        ctrl = jnp.clip(ctrl, self._pos_bound[:9, 0], self._pos_bound[:9, 1])
        data = pipeline.step_n(self.model, state.data, ctrl, self.frame_skip)
        obs, last_qpos = self._get_obs(data, noise)

        completions = self._completions(obs["achieved_goal"], self._goal)
        todo = state.aux["tasks_to_complete"]
        step_comp = completions & todo
        reward = jnp.sum(step_comp).astype(self.dtype)
        if self.remove_task_when_completed:
            todo = todo & ~step_comp
        episode_comp = state.aux["episode_task_completions"] | step_comp
        terminated = (
            jnp.all(episode_comp)
            if self.terminate_on_tasks_completed
            else jnp.zeros((), bool)
        )
        info = {
            "tasks_to_complete": todo,
            "step_task_completions": step_comp,
            "episode_task_completions": episode_comp,
        }
        return dataclasses.replace(
            state, data=data, obs=obs, reward=reward,
            terminated=terminated, truncated=jnp.zeros((), bool),
            info=info, rng=rng, steps=state.steps + 1,
            aux={
                "last_robot_qpos": last_qpos,
                "tasks_to_complete": todo,
                "episode_task_completions": episode_comp,
            },
        )


def register_kitchen_envs(register):
    register(
        id="FrankaKitchen-v1",
        entry_point=KitchenEnv,
        max_episode_steps=280,
        kwargs={},
    )
