"""Shadow Dexterous Hand family: HandReach + HandManipulate{Block,Egg,Pen}
(+touch-sensor variants).

Functional re-design of the reference stack (gymnasium_robotics/envs/
shadow_dexterous_hand/): 20 position actuators over 24 joints with 4 coupled
J1/J0 pairs (the couplings are tendon-limit constraints in the compiled model,
handled natively by the constraint module); absolute/relative ctrlrange action
mapping (hand_env.py:42-61); HandReach fingertip goals (reach.py:99-131);
HandManipulate 7D pos+quat goals with mode-dependent sampling and the settle-
based reset (manipulate.py:143-315).

Vectorization note: the reference's reset settle loop (10x20 substeps +
is_on_palm rejection, manipulate.py:209-224) is too expensive to run inside
the masked in-step auto-reset branch (it would add 200 substeps to EVERY
step). Instead ``initial()`` pre-settles a POOL of ``reset_pool_size``
independently randomized object poses (vmapped settle), and each in-episode
reset samples one pool entry — so new episodes start from diverse settled
poses, matching the reference's per-reset re-randomization distribution
(manipulate.py:154-224) without paying the settle per step.

Pool-size/throughput trade-off: the pool is settled ONCE in ``initial()``
(sequential ``lax.map`` over slots, ~200 substeps per slot per env instance),
so steady-state step throughput is independent of ``reset_pool_size``; only
initial-reset latency scales linearly with it (200 * pool_size substeps,
i.e. pool 16 ~= the cost of 160 extra env-steps, once per rollout). Default
16; raise it for long training runs where initial-pose diversity matters,
lower it for latency-sensitive eval.
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

FINGERTIP_SITES = [
    "robot0:S_fftip", "robot0:S_mftip", "robot0:S_rftip",
    "robot0:S_lftip", "robot0:S_thtip",
]


def quat_from_angle_and_axis(angle, axis):
    axis, _ = _normalize(axis)
    return jnp.concatenate(
        [jnp.cos(angle / 2.0)[None], jnp.sin(angle / 2.0) * axis]
    )


def _normalize(v):
    n = jnp.linalg.norm(v)
    return v / jnp.maximum(n, 1e-12), n


class HandBaseEnv(core.GoalEnv):
    metadata = {"render_modes": ["human", "rgb_array", "depth_array"], "render_fps": 25}
    n_substeps = 20
    relative_control = False

    def _load(self, asset):
        npdtype = np.float64 if self.dtype == jnp.float64 else np.float32
        self.model, extra = serialize.load_asset(asset, dtype=npdtype)
        self.model = self.model.with_options(
            contact_cap=16, iterations=5, ls_iterations=4,
            need_cfrc_ext=False,  # touch sensors read con_force, not cfrc_ext
        )
        self._extra = extra
        self._init_qpos = jnp.asarray(extra["initial_qpos"], self.dtype)
        self._init_qvel = jnp.asarray(extra["initial_qvel"], self.dtype)
        mt = self.model.meta
        # robot joints are the hinge joints named robot0:* (first 24)
        self._robot_nq = sum(1 for n in mt.joint_names if n.startswith("robot0:"))

    def _apply_action(self, data, action):
        """hand_env.py:42-61: map [-1,1] into actuator ctrlrange."""
        m = self.model
        ctrlrange = m.actuator_ctrlrange
        actuation_range = (ctrlrange[:, 1] - ctrlrange[:, 0]) / 2.0
        if self.relative_control:
            mt = m.meta
            centers = []
            for u in range(mt.nu):
                jname = mt.actuator_names[u].replace(":A_", ":")
                j = m.name2id("joint", jname)
                c = data.qpos[mt.jnt_qposadr[j]]
                if jname[-2:] == "J1":
                    j0 = m.name2id("joint", jname[:-2] + "J0")
                    c = c + data.qpos[mt.jnt_qposadr[j0]]
                centers.append(c)
            center = jnp.stack(centers)
        else:
            center = (ctrlrange[:, 1] + ctrlrange[:, 0]) / 2.0
        ctrl = center + action * actuation_range
        return jnp.clip(ctrl, ctrlrange[:, 0], ctrlrange[:, 1])

    def _make_spaces(self, obs_dim, goal_dim):
        import gymnasium.spaces as spaces

        self.action_space = spaces.Box(-1.0, 1.0, shape=(20,), dtype=np.float32)
        self.observation_space = spaces.Dict(
            dict(
                observation=spaces.Box(-np.inf, np.inf, (obs_dim,), np.float64),
                achieved_goal=spaces.Box(-np.inf, np.inf, (goal_dim,), np.float64),
                desired_goal=spaces.Box(-np.inf, np.inf, (goal_dim,), np.float64),
            )
        )


class HandReachEnv(HandBaseEnv):
    """reach.py:55-431: 5 fingertip sites reach a sampled meeting pattern."""

    distance_threshold = 0.01

    def __init__(self, reward_type="sparse", relative_control=False,
                 max_episode_steps=None, dtype=jnp.float32):
        self.reward_type = reward_type
        self.relative_control = relative_control
        self.max_episode_steps = max_episode_steps
        self.dtype = dtype
        self._load("hand/reach")
        self._initial_goal = jnp.asarray(self._extra["initial_goal"], dtype)
        self._palm_xpos = jnp.asarray(self._extra["palm_xpos"], dtype)
        self._tip_sites = tuple(
            self.model.name2id("site", s) for s in FINGERTIP_SITES
        )
        self._make_spaces(63, 15)

    def _achieved(self, data):
        return jnp.concatenate([data.site_xpos[s] for s in self._tip_sites])

    def compute_reward(self, achieved_goal, desired_goal, info=None):
        d = jnp.linalg.norm(achieved_goal - desired_goal, axis=-1)
        if self.reward_type == "sparse":
            return -(d > self.distance_threshold).astype(self.dtype)
        return -d

    def compute_terminated(self, achieved_goal, desired_goal, info=None):
        return jnp.zeros(jnp.shape(achieved_goal)[:-1], bool)

    def _sample_goal(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        thumb_idx = 4
        finger_idx = jax.random.randint(r1, (), 0, 4)  # non-thumb fingers
        meeting = self._palm_xpos + jnp.asarray([0.0, -0.09, 0.05], self.dtype)
        meeting = meeting + 0.005 * jax.random.normal(r2, (3,), self.dtype)
        goal = self._initial_goal.reshape(5, 3)
        for idx_arr in (jnp.asarray(thumb_idx), finger_idx):
            tip = goal[idx_arr]
            direction, _ = _normalize(meeting - tip)
            goal = goal.at[idx_arr].set(meeting - 0.005 * direction)
        revert = jax.random.uniform(r3, (), self.dtype) < 0.1
        goal = jnp.where(revert, self._initial_goal.reshape(5, 3), goal)
        return goal.reshape(-1)

    def _get_obs(self, data, goal):
        nq = self._robot_nq
        achieved = self._achieved(data)
        obs = jnp.concatenate([data.qpos[:nq], data.qvel[:nq], achieved])
        return dict(observation=obs, achieved_goal=achieved, desired_goal=goal)

    def initial(self, rng) -> core.EnvState:
        data = pipeline.make_data(self.model, dtype=self.dtype)
        state = core.EnvState(
            data=data, obs=None, reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"is_success": jnp.zeros((), self.dtype)},
            rng=rng, goal=jnp.zeros(15, self.dtype),
            steps=jnp.zeros((), jnp.int32), aux={},
        )
        return self.reset(state, rng)

    def reset(self, state, rng):
        rng, r_goal = jax.random.split(rng)
        data = pipeline.make_data(self.model, dtype=self.dtype)
        data = dataclasses.replace(
            data, qpos=self._init_qpos, qvel=self._init_qvel
        )
        data = pipeline.refresh_kin(self.model, data)
        goal = self._sample_goal(r_goal)
        obs = self._get_obs(data, goal)
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"is_success": jnp.zeros((), self.dtype)},
            rng=rng, goal=goal, steps=jnp.zeros((), jnp.int32),
        )

    def step(self, state, action):
        action = jnp.clip(jnp.asarray(action, self.dtype), -1.0, 1.0)
        ctrl = self._apply_action(state.data, action)
        data = pipeline.step_n(self.model, state.data, ctrl, self.n_substeps)
        obs = self._get_obs(data, state.goal)
        achieved = obs["achieved_goal"]
        d = jnp.linalg.norm(achieved - state.goal)
        success = (d < self.distance_threshold).astype(self.dtype)
        reward = self.compute_reward(achieved, state.goal)
        rng, _ = jax.random.split(state.rng)
        return dataclasses.replace(
            state, data=data, obs=obs, reward=reward,
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"is_success": success}, rng=rng, steps=state.steps + 1,
        )

    def reset_with_values(self, state, values):
        """Parity-mode reset: the goal pattern was computed on the host with
        the reference's exact NumPy draw order (reach.py:99-126 via
        utils/parity.py); physics state is the deterministic initial pose."""
        data = pipeline.make_data(self.model, dtype=self.dtype)
        data = dataclasses.replace(
            data, qpos=self._init_qpos, qvel=self._init_qvel
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


class HandManipulateEnv(HandBaseEnv):
    """manipulate.py:18-315 semantics; see module docstring for the reset
    settle note."""

    object_name = "block"
    distance_threshold = 0.01
    rotation_threshold = 0.1

    def __init__(
        self,
        target_position="random",
        target_rotation="xyz",
        reward_type="sparse",
        touch_obs=None,            # None | "sensordata" | "boolean" | "log"
        ignore_z_target_rotation=False,
        randomize_initial_rotation=True,
        randomize_initial_position=True,
        relative_control=False,
        max_episode_steps=None,
        reset_pool_size=16,
        dtype=jnp.float32,
    ):
        self.reset_pool_size = int(reset_pool_size)
        self.target_position = target_position
        self.target_rotation = target_rotation
        self.reward_type = reward_type
        self.touch_obs = touch_obs
        self.ignore_z_target_rotation = ignore_z_target_rotation
        self.randomize_initial_rotation = randomize_initial_rotation
        self.randomize_initial_position = randomize_initial_position
        self.relative_control = relative_control
        self.max_episode_steps = max_episode_steps
        self.dtype = dtype
        self.target_position_range = jnp.asarray(
            [(-0.04, 0.04), (-0.06, 0.02), (0.0, 0.06)], dtype
        )
        asset = f"hand/manipulate_{self.object_name}"
        if touch_obs is not None:
            asset += "_touch"
        self._load(asset)
        mt = self.model.meta
        self._obj_joint = self.model.name2id("joint", "object:joint")
        self._obj_qadr = mt.jnt_qposadr[self._obj_joint]
        self._obj_dadr = mt.jnt_dofadr[self._obj_joint]
        self._target_joint = self.model.name2id("joint", "target:joint")
        self._target_qadr = mt.jnt_qposadr[self._target_joint]
        self._obj_center_site = self.model.name2id("site", "object:center")
        self._parallel_quats = jnp.asarray(
            [rotations.euler2quat(np.array(r)) for r in
             rotations.get_parallel_rotations()], dtype
        )
        # touch sensor addresses (manipulate_touch_sensors.py:66-88)
        self._touch_adr = tuple(
            mt.sensor_adr[s] for s in range(mt.nsensor)
            if mt.sensor_type[s] == 0 and mt.sensor_names[s].startswith("robot0:TS_")
        )
        obs_dim = 61 + (len(self._touch_adr) if touch_obs else 0)
        self._make_spaces(obs_dim, 7)

    # --- goal distance (manipulate.py:87-115) ---
    def _goal_distance(self, goal_a, goal_b):
        d_pos = jnp.zeros(goal_a.shape[:-1], self.dtype)
        d_rot = jnp.zeros(goal_a.shape[:-1], self.dtype)
        if self.target_position != "ignore":
            d_pos = jnp.linalg.norm(goal_a[..., :3] - goal_b[..., :3], axis=-1)
        if self.target_rotation != "ignore":
            quat_a, quat_b = goal_a[..., 3:], goal_b[..., 3:]
            if self.ignore_z_target_rotation:
                euler_a = rotations.quat2euler(quat_a)
                euler_b = rotations.quat2euler(quat_b)
                euler_a = euler_a.at[..., 2].set(euler_b[..., 2])
                quat_a = rotations.euler2quat(euler_a)
            quat_diff = rotations.quat_mul(quat_a, rotations.quat_conjugate(quat_b))
            d_rot = 2.0 * jnp.arccos(jnp.clip(quat_diff[..., 0], -1.0, 1.0))
        return d_pos, d_rot

    def _is_success(self, achieved, desired):
        d_pos, d_rot = self._goal_distance(achieved, desired)
        return (
            (d_pos < self.distance_threshold) & (d_rot < self.rotation_threshold)
        ).astype(self.dtype)

    def compute_reward(self, achieved_goal, desired_goal, info=None):
        if self.reward_type == "sparse":
            return self._is_success(achieved_goal, desired_goal) - 1.0
        d_pos, d_rot = self._goal_distance(achieved_goal, desired_goal)
        return -(10.0 * d_pos + d_rot)

    def compute_terminated(self, achieved_goal, desired_goal, info=None):
        return jnp.zeros(jnp.shape(achieved_goal)[:-1], bool)

    # --- sampling ---
    def _random_quat_offset(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        angle = jax.random.uniform(r1, (), self.dtype, -jnp.pi, jnp.pi)
        if self.target_rotation == "z":
            return quat_from_angle_and_axis(angle, jnp.asarray([0.0, 0, 1], self.dtype))
        if self.target_rotation == "parallel":
            zq = quat_from_angle_and_axis(angle, jnp.asarray([0.0, 0, 1], self.dtype))
            pick = jax.random.randint(r2, (), 0, len(self._parallel_quats))
            return rotations.quat_mul(zq, self._parallel_quats[pick])
        # xyz / ignore
        axis = jax.random.uniform(r3, (3,), self.dtype, -1.0, 1.0)
        return quat_from_angle_and_axis(angle, axis)

    def _sample_goal(self, rng, obj_qpos7):
        r_pos, r_rot = jax.random.split(rng)
        if self.target_position == "random":
            offset = jax.random.uniform(
                r_pos, (3,), self.dtype,
                self.target_position_range[:, 0], self.target_position_range[:, 1],
            )
            pos = obj_qpos7[:3] + offset
        else:
            pos = obj_qpos7[:3]
        if self.target_rotation in ("ignore", "fixed"):
            quat = obj_qpos7[3:7]
        else:
            quat = self._random_quat_offset(r_rot)
        quat, _ = _normalize(quat)
        return jnp.concatenate([pos, quat])

    # --- obs ---
    def _get_obs(self, data, goal):
        nq = self._robot_nq
        achieved = jax.lax.dynamic_slice(data.qpos, (self._obj_qadr,), (7,))
        obj_qvel = jax.lax.dynamic_slice(data.qvel, (self._obj_dadr,), (6,))
        # touch values appended last (manipulate_touch_sensors.py:124-132)
        parts = [data.qpos[:nq], data.qvel[:nq], obj_qvel, achieved]
        if self.touch_obs == "sensordata":
            parts.append(data.sensordata[jnp.asarray(self._touch_adr)])
        elif self.touch_obs == "boolean":
            parts.append(
                (data.sensordata[jnp.asarray(self._touch_adr)] > 0.0)
                .astype(self.dtype)
            )
        elif self.touch_obs == "log":
            parts.append(
                jnp.log(data.sensordata[jnp.asarray(self._touch_adr)] + 1.0)
            )
        obs = jnp.concatenate(parts)
        return dict(observation=obs, achieved_goal=achieved, desired_goal=goal)

    # --- env API ---
    def _settle_one(self, rng):
        """Randomize the object pose then settle (manipulate.py:154-224:
        10 x n_substeps with zero action); returns (qpos, qvel) of the settled
        state, falling back to the unrandomized rest pose if the object fell
        off the palm (the reference's rejection loop, masked)."""
        r_rot, r_pos = jax.random.split(rng)
        data = pipeline.make_data(self.model, dtype=self.dtype)
        data = dataclasses.replace(
            data, qpos=self._init_qpos, qvel=self._init_qvel
        )
        qadr = self._obj_qadr
        pos0 = jax.lax.dynamic_slice(data.qpos, (qadr,), (3,))
        quat0 = jax.lax.dynamic_slice(data.qpos, (qadr + 3,), (4,))
        if self.randomize_initial_rotation:
            offset = self._random_quat_offset(r_rot)
            quat0 = rotations.quat_mul(quat0, offset)
        if self.randomize_initial_position and self.target_position != "fixed":
            pos0 = pos0 + 0.005 * jax.random.normal(r_pos, (3,), self.dtype)
        quat0, _ = _normalize(quat0)
        qpos = jax.lax.dynamic_update_slice(
            data.qpos, jnp.concatenate([pos0, quat0]), (qadr,)
        )
        data = dataclasses.replace(data, qpos=qpos)
        # settle with zero action
        zero_ctrl = self._apply_action(data, jnp.zeros(20, self.dtype))
        # one scan of 10*n_substeps (NOT 10 python-level step_n calls, which
        # would trace 10 copies of the substep program and overflow the TPU
        # program size at batch >= 1024)
        settled = pipeline.step_n(
            self.model, data, zero_ctrl, 10 * self.n_substeps
        )
        on_palm = settled.site_xpos[self._obj_center_site][2] > 0.04
        qpos = jnp.where(on_palm, settled.qpos, data.qpos)
        qvel = jnp.where(on_palm, settled.qvel, data.qvel)
        return qpos, qvel

    def initial(self, rng) -> core.EnvState:
        """Expensive initial reset: pre-settle a pool of independently
        randomized object poses; resets sample among them (reset diversity
        matching the reference's per-reset re-randomization)."""
        rng, r_pool = jax.random.split(rng)
        # sequential over pool slots (lax.map, not vmap): a vmapped settle
        # multiplies the 200-substep scan body by K and faults the TPU worker
        # at batch >= 1024 (the large-scan-body device fault, CLAUDE.md)
        pool_qpos, pool_qvel = jax.lax.map(
            self._settle_one, jax.random.split(r_pool, self.reset_pool_size)
        )
        data = pipeline.make_data(self.model, dtype=self.dtype)
        state = core.EnvState(
            data=data, obs=None, reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"is_success": jnp.zeros((), self.dtype)},
            rng=rng, goal=jnp.zeros(7, self.dtype),
            steps=jnp.zeros((), jnp.int32),
            aux={"pool_qpos": pool_qpos, "pool_qvel": pool_qvel},
        )
        return self.reset(state, rng)

    def reset(self, state, rng):
        """Cheap reset: restore a sampled settled pool state, resample the
        goal (new-episode object poses differ across resets)."""
        rng, r_goal, r_pool = jax.random.split(rng, 3)
        j = jax.random.randint(r_pool, (), 0, self.reset_pool_size)
        data = pipeline.make_data(self.model, dtype=self.dtype)
        data = dataclasses.replace(
            data,
            qpos=state.aux["pool_qpos"][j],
            qvel=state.aux["pool_qvel"][j],
        )
        obj = jax.lax.dynamic_slice(data.qpos, (self._obj_qadr,), (7,))
        goal = self._sample_goal(r_goal, obj)
        # park the visual target joint at the goal (render parity,
        # manipulate.py:281-296)
        qpos = jax.lax.dynamic_update_slice(data.qpos, goal, (self._target_qadr,))
        data = dataclasses.replace(data, qpos=qpos)
        data = pipeline.refresh_kin(self.model, data)
        obs = self._get_obs(data, goal)
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"is_success": jnp.zeros((), self.dtype)},
            rng=rng, goal=goal, steps=jnp.zeros((), jnp.int32),
        )

    def step(self, state, action):
        action = jnp.clip(jnp.asarray(action, self.dtype), -1.0, 1.0)
        ctrl = self._apply_action(state.data, action)
        data = pipeline.step_n(self.model, state.data, ctrl, self.n_substeps)
        obs = self._get_obs(data, state.goal)
        achieved = obs["achieved_goal"]
        success = self._is_success(achieved, state.goal)
        reward = self.compute_reward(achieved, state.goal)
        rng, _ = jax.random.split(state.rng)
        return dataclasses.replace(
            state, data=data, obs=obs, reward=reward,
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"is_success": success}, rng=rng, steps=state.steps + 1,
        )

    def reset_with_values(self, state, values):
        """Parity-mode reset: the randomized object pose and the goal draws
        were produced on the host with the reference's exact NumPy draw order
        (manipulate.py:154-279 via utils/parity.py). The settle (10 x
        n_substeps with zero action, manipulate.py:217-222) runs here on
        device; the goal position offset is applied to the SETTLED object
        position, exactly like the reference's _sample_goal after _reset_sim."""
        data = pipeline.make_data(self.model, dtype=self.dtype)
        data = dataclasses.replace(
            data, qpos=self._init_qpos, qvel=self._init_qvel
        )
        qpos = jax.lax.dynamic_update_slice(
            data.qpos, jnp.asarray(values["obj_qpos7"], self.dtype),
            (self._obj_qadr,),
        )
        data = dataclasses.replace(data, qpos=qpos)
        zero_ctrl = self._apply_action(data, jnp.zeros(20, self.dtype))
        data = pipeline.step_n(
            self.model, data, zero_ctrl, 10 * self.n_substeps
        )
        obj = jax.lax.dynamic_slice(data.qpos, (self._obj_qadr,), (7,))
        if self.target_position == "random":
            pos = obj[:3] + jnp.asarray(values["goal_offset"], self.dtype)
        else:  # ignore / fixed: settled object position
            pos = obj[:3]
        if self.target_rotation in ("ignore", "fixed"):
            quat = obj[3:7]
        else:
            quat = jnp.asarray(values["goal_quat"], self.dtype)
        quat, _ = _normalize(quat)
        goal = jnp.concatenate([pos, quat])
        qpos = jax.lax.dynamic_update_slice(
            data.qpos, goal, (self._target_qadr,)
        )
        data = dataclasses.replace(data, qpos=qpos)
        data = pipeline.refresh_kin(self.model, data)
        obs = self._get_obs(data, goal)
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"is_success": jnp.zeros((), self.dtype)},
            goal=goal, steps=jnp.zeros((), jnp.int32),
        )


class HandManipulateBlockEnv(HandManipulateEnv):
    object_name = "block"


class HandManipulateEggEnv(HandManipulateEnv):
    object_name = "egg"


class HandManipulatePenEnv(HandManipulateEnv):
    object_name = "pen"

    def __init__(self, **kw):
        kw.setdefault("ignore_z_target_rotation", True)
        kw.setdefault("randomize_initial_rotation", False)
        super().__init__(**kw)
        self.rotation_threshold = 0.1
        self.distance_threshold = 0.05


def register_hand_envs(register):
    # HandReach
    for ver in ("v0", "v3"):
        for suffix, rt in (("", "sparse"), ("Dense", "dense")):
            register(
                id=f"HandReach{suffix}-{ver}",
                entry_point=HandReachEnv,
                max_episode_steps=50,
                kwargs={"reward_type": rt},
            )
    # HandManipulate
    objs = {
        "Block": (HandManipulateBlockEnv,
                  ["RotateZ", "RotateParallel", "RotateXYZ", "Full", ""]),
        "Egg": (HandManipulateEggEnv, ["Rotate", "Full", ""]),
        "Pen": (HandManipulatePenEnv, ["Rotate", "Full", ""]),
    }
    mode_map = {
        "RotateZ": dict(target_position="ignore", target_rotation="z"),
        "RotateParallel": dict(target_position="ignore", target_rotation="parallel"),
        "RotateXYZ": dict(target_position="ignore", target_rotation="xyz"),
        "Rotate": dict(target_position="ignore", target_rotation="xyz"),
        "Full": dict(target_position="random", target_rotation="xyz"),
        "": dict(target_position="random", target_rotation="xyz"),
    }
    touch_variants = {
        "": None,
        "_BooleanTouchSensors": "boolean",
        "_ContinuousTouchSensors": "sensordata",
    }
    for obj, (cls, modes) in objs.items():
        for mode in modes:
            # Full and "" share kwargs but both IDs exist; touch variants only
            # for the non-Full names (mirrors the reference registry)
            tv = touch_variants if mode != "Full" else {"": None}
            for tsuffix, touch in tv.items():
                for ver in ("v0", "v1"):
                    for suffix, rt in (("", "sparse"), ("Dense", "dense")):
                        register(
                            id=f"HandManipulate{obj}{mode}{tsuffix}{suffix}-{ver}",
                            entry_point=cls,
                            max_episode_steps=100,
                            kwargs={
                                "reward_type": rt, "touch_obs": touch,
                                **mode_map[mode],
                            },
                        )
