"""Fetch family: 7-DoF arm, mocap-welded Cartesian end-effector control.

Functional re-design of the reference template+factory stack
(gymnasium_robotics/envs/fetch/fetch_env.py:21-428, envs/robot_env.py:114-186):
action (4,) = dxyz * 0.05 + gripper; mocap control = snap mocap to the welded
gripper pose then displace (utils/mujoco_utils.py:51-107); position actuators
get ctrl = qpos + action (mujoco_utils.py:34-48); 20 physics substeps per env
step; obs per fetch_env.py:312-360 (site positions, site velocities * dt);
sparse reward -(d > 0.05) / dense -d (fetch_env.py:74-80). The reference's
__init__-time warm-up (fetch_env.py:404-428) is baked into the shipped asset
(tools/compile_assets.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu import core
from gymnasium_robotics_tpu.mjcf import serialize
from gymnasium_robotics_tpu.physics import pipeline, smooth
from gymnasium_robotics_tpu.utils import rotations


def site_velp(m, d, site_id, body_id):
    """Site linear velocity = jacp(site) @ qvel with current qvel and the
    Data's (possibly stale, reference-matching) kinematics — mirrors
    mujoco_utils.get_site_xvelp (:228-241)."""
    from gymnasium_robotics_tpu.physics.constraint import _body_dof_masks

    mt = m.meta
    mask = jnp.asarray(_body_dof_masks(mt)[body_id], d.qpos.dtype)
    o = d.subtree_com[mt.body_rootid[body_id]]
    offset = d.site_xpos[site_id] - o
    jacp = (d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], offset[None, :])) * mask[:, None]
    return jacp.T @ d.qvel


def site_velr(m, d, site_id, body_id):
    from gymnasium_robotics_tpu.physics.constraint import _body_dof_masks

    mt = m.meta
    mask = jnp.asarray(_body_dof_masks(mt)[body_id], d.qpos.dtype)
    jacr = d.cdof[:, :3] * mask[:, None]
    return jacr.T @ d.qvel


class FetchEnv(core.GoalEnv):
    metadata = {"render_modes": ["human", "rgb_array", "depth_array"], "render_fps": 25}

    task: str = "reach"
    has_object: bool = False
    block_gripper: bool = True
    target_in_the_air: bool = True
    target_offset = np.zeros(3)
    obj_range: float = 0.15
    target_range: float = 0.15
    distance_threshold: float = 0.05
    n_substeps: int = 20

    def __init__(self, reward_type: str = "sparse", max_episode_steps=None,
                 dtype=jnp.float32):
        self.reward_type = reward_type
        self.max_episode_steps = max_episode_steps
        self.dtype = dtype
        npdtype = np.float64 if dtype == jnp.float64 else np.float32
        self.model, extra = serialize.load_asset(f"fetch/{self.task}", dtype=npdtype)
        # pair_topk=8: the fetch robot's 84-pair mesh-mesh self-collision
        # group never has more than 2 near pairs in C-engine rollouts
        # (tools/calibrate_topk.py; 4x headroom), so top-K compacts the
        # 905-slot candidate table and skips most hull-hull face-SAT work.
        # Guarded by the fetch reference-tracking tests.
        self.model = self.model.with_options(
            contact_cap=24, pair_topk=8, iterations=4, ls_iterations=4,
            need_cfrc_ext=False
        )
        self._init_qpos = jnp.asarray(extra["initial_qpos"], dtype)
        self._init_qvel = jnp.asarray(extra["initial_qvel"], dtype)
        self._init_mocap_pos = jnp.asarray(extra["initial_mocap_pos"], dtype)
        self._init_mocap_quat = jnp.asarray(extra["initial_mocap_quat"], dtype)
        self._init_grip = jnp.asarray(extra["initial_gripper_xpos"], dtype)
        self._height_offset = (
            float(extra["height_offset"]) if "height_offset" in extra else 0.0
        )
        mt = self.model.meta
        self._grip_site = self.model.name2id("site", "robot0:grip")
        self._grip_body = mt.site_bodyid[self._grip_site]
        self._gripper_link = self.model.name2id("body", "robot0:gripper_link")
        if self.has_object:
            self._obj_site = self.model.name2id("site", "object0")
            self._obj_body = mt.site_bodyid[self._obj_site]
            self._obj_joint = self.model.name2id("joint", "object0:joint")
            self._obj_qadr = mt.jnt_qposadr[self._obj_joint]
        # two position actuators on the gripper fingers
        self._act_qadr = tuple(
            mt.jnt_qposadr[mt.actuator_trnid[u]] for u in range(mt.nu)
        )
        self._finger_qadr = tuple(
            mt.jnt_qposadr[self.model.name2id("joint", n)]
            for n in ("robot0:l_gripper_finger_joint", "robot0:r_gripper_finger_joint")
        )
        self.dt = self.model.opt.timestep * self.n_substeps

        import gymnasium.spaces as spaces

        obs_dim = 25 if self.has_object else 10
        goal_dim = 3
        self.action_space = spaces.Box(-1.0, 1.0, shape=(4,), dtype=np.float32)
        self.observation_space = spaces.Dict(
            dict(
                observation=spaces.Box(-np.inf, np.inf, (obs_dim,), np.float64),
                achieved_goal=spaces.Box(-np.inf, np.inf, (goal_dim,), np.float64),
                desired_goal=spaces.Box(-np.inf, np.inf, (goal_dim,), np.float64),
            )
        )

    # --- GoalEnv contract (fetch_env.py:74-80) ---
    def compute_reward(self, achieved_goal, desired_goal, info=None):
        d = jnp.linalg.norm(achieved_goal - desired_goal, axis=-1)
        if self.reward_type == "sparse":
            return -(d > self.distance_threshold).astype(self.dtype)
        return -d

    def compute_terminated(self, achieved_goal, desired_goal, info=None):
        return jnp.zeros(jnp.shape(achieved_goal)[:-1], bool)

    # --- helpers ---
    def _sample_goal(self, rng, grip0):
        r1, r2, r3 = jax.random.split(rng, 3)
        goal = self._init_grip + jax.random.uniform(
            r1, (3,), self.dtype, -self.target_range, self.target_range
        )
        if self.has_object:
            goal = goal + jnp.asarray(self.target_offset, self.dtype)
            goal = goal.at[2].set(self._height_offset)
            if self.target_in_the_air:
                lift = jax.random.uniform(r2, (), self.dtype, 0.0, 0.45)
                use = jax.random.uniform(r3, (), self.dtype) < 0.5
                goal = goal.at[2].add(jnp.where(use, lift, 0.0))
        return goal

    def _sample_object_xy(self, rng):
        """Masked fixed-K retry of fetch_env.py:386-391: object xy must be
        >= 0.1 from the gripper."""
        K = 16
        cands = self._init_grip[:2] + jax.random.uniform(
            rng, (K, 2), self.dtype, -self.obj_range, self.obj_range
        )
        ok = jnp.linalg.norm(cands - self._init_grip[:2][None], axis=-1) >= 0.1
        pick = jnp.argmax(ok)
        return cands[pick]

    def _get_obs(self, data, goal):
        m = self.model
        grip_pos = data.site_xpos[self._grip_site]
        grip_velp = site_velp(m, data, self._grip_site, self._grip_body) * self.dt
        gripper_state = jnp.stack([data.qpos[q] for q in self._finger_qadr])
        gripper_vel = jnp.stack(
            [data.qvel[m.meta.jnt_dofadr[m.name2id("joint", n)]]
             for n in ("robot0:l_gripper_finger_joint", "robot0:r_gripper_finger_joint")]
        ) * self.dt
        if self.has_object:
            object_pos = data.site_xpos[self._obj_site]
            object_rot = rotations.mat2euler(data.site_xmat[self._obj_site])
            object_velp = site_velp(m, data, self._obj_site, self._obj_body) * self.dt
            object_velr = site_velr(m, data, self._obj_site, self._obj_body) * self.dt
            object_rel_pos = object_pos - grip_pos
            object_velp = object_velp - grip_velp
            achieved = object_pos
            obs = jnp.concatenate(
                [grip_pos, object_pos, object_rel_pos, gripper_state, object_rot,
                 object_velp, object_velr, grip_velp, gripper_vel]
            )
        else:
            achieved = grip_pos
            obs = jnp.concatenate([grip_pos, gripper_state, grip_velp, gripper_vel])
        return dict(observation=obs, achieved_goal=achieved, desired_goal=goal)

    # --- env API ---
    def initial(self, rng) -> core.EnvState:
        data = pipeline.make_data(self.model, dtype=self.dtype)
        state = core.EnvState(
            data=data, obs=None, reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"is_success": jnp.zeros((), self.dtype)},
            rng=rng, goal=jnp.zeros(3, self.dtype),
            steps=jnp.zeros((), jnp.int32), aux={},
        )
        return self.reset(state, rng)

    def reset(self, state: core.EnvState, rng) -> core.EnvState:
        rng, r_goal, r_obj = jax.random.split(rng, 3)
        data = pipeline.make_data(self.model, dtype=self.dtype)
        qpos = self._init_qpos
        if self.has_object:
            obj_xy = self._sample_object_xy(r_obj)
            qpos = qpos.at[self._obj_qadr:self._obj_qadr + 2].set(obj_xy)
        data = dataclasses.replace(
            data, qpos=qpos, qvel=self._init_qvel,
            mocap_pos=self._init_mocap_pos, mocap_quat=self._init_mocap_quat,
        )
        data = pipeline.refresh_kin(self.model, data)
        goal = self._sample_goal(r_goal, None)
        obs = self._get_obs(data, goal)
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"is_success": jnp.zeros((), self.dtype)},
            rng=rng, goal=goal, steps=jnp.zeros((), jnp.int32),
        )

    def reset_with_values(self, state: core.EnvState, values) -> core.EnvState:
        """Parity-mode reset: goal (and object xy) sampled on the host in the
        reference's NumPy draw order (utils/parity.py) are injected here."""
        data = pipeline.make_data(self.model, dtype=self.dtype)
        qpos = self._init_qpos
        if self.has_object and "object_xy" in values:
            obj_xy = jnp.asarray(values["object_xy"], self.dtype)
            qpos = qpos.at[self._obj_qadr:self._obj_qadr + 2].set(obj_xy)
        data = dataclasses.replace(
            data, qpos=qpos, qvel=self._init_qvel,
            mocap_pos=self._init_mocap_pos, mocap_quat=self._init_mocap_quat,
        )
        data = pipeline.refresh_kin(self.model, data)
        goal = jnp.asarray(values["goal"], self.dtype)
        obs = self._get_obs(data, goal)
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"is_success": jnp.zeros((), self.dtype)},
            goal=goal, steps=jnp.zeros((), jnp.int32),
        )

    def step(self, state: core.EnvState, action) -> core.EnvState:
        m = self.model
        action = jnp.clip(jnp.asarray(action, self.dtype), -1.0, 1.0)
        pos_ctrl = action[:3] * 0.05
        gripper_ctrl = jnp.where(self.block_gripper, 0.0, action[3])

        data = state.data
        # ctrl_set_action: position actuators, target = current qpos + action
        if self._act_qadr:
            ctrl = jnp.stack(
                [data.qpos[q] + gripper_ctrl for q in self._act_qadr]
            )
        else:  # reach model ships no actuators (reference fetch/reach.xml)
            ctrl = jnp.zeros(0, self.dtype)
        # mocap_set_action: snap mocap to welded body pose, then displace
        mocap_pos = data.xpos[self._gripper_link][None] + pos_ctrl[None]
        rot_ctrl = jnp.asarray([1.0, 0.0, 1.0, 0.0], self.dtype)
        mocap_quat = data.xquat[self._gripper_link][None] + rot_ctrl[None]
        data = dataclasses.replace(
            data, mocap_pos=mocap_pos, mocap_quat=mocap_quat
        )
        data = pipeline.step_n(m, data, ctrl, self.n_substeps)

        if self.block_gripper:
            # _step_callback (fetch_env.py:295-303): pin fingers + forward
            qpos = data.qpos
            for q in self._finger_qadr:
                qpos = qpos.at[q].set(0.0)
            data = dataclasses.replace(data, qpos=qpos)
            data = pipeline.refresh_kin(m, data)

        obs = self._get_obs(data, state.goal)
        achieved = obs["achieved_goal"]
        dist = jnp.linalg.norm(achieved - state.goal)
        success = (dist < self.distance_threshold).astype(self.dtype)
        reward = self.compute_reward(achieved, state.goal)
        rng, _ = jax.random.split(state.rng)
        return dataclasses.replace(
            state, data=data, obs=obs, reward=reward,
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"is_success": success}, rng=rng,
            steps=state.steps + 1,
        )


class FetchReachEnv(FetchEnv):
    task = "reach"
    has_object = False
    block_gripper = True
    target_in_the_air = True


class FetchPushEnv(FetchEnv):
    task = "push"
    has_object = True
    block_gripper = True
    target_in_the_air = False


class FetchSlideEnv(FetchEnv):
    task = "slide"
    has_object = True
    block_gripper = True
    target_in_the_air = False
    target_offset = np.array([0.4, 0.0, 0.0])
    obj_range = 0.1
    target_range = 0.3


class FetchPickAndPlaceEnv(FetchEnv):
    task = "pick_and_place"
    has_object = True
    block_gripper = False
    target_in_the_air = True
