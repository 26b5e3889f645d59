"""Adroit Hand family: Door, Hammer, Pen, Relocate (28-30 DoF hand+arm).

Functional re-design of gymnasium_robotics/envs/adroit_hand/: flat Box obs
(door 39 / hammer 46 / pen 45 / relocate 39), frame_skip=5, mean-centered
ctrlrange action scaling (adroit_door.py:281-283), actuator gain/bias re-tuned
at construction (adroit_door.py:225-252, applied host-side to the compiled
model), staged dense rewards or sparse 10/-0.1 (per-task step functions),
never terminates (adroit_door.py:318).

Reference resets mutate the MODEL (scene body/site positions,
adroit_door.py:359-371 etc.); here those fields are promoted to per-env state:
the env carries the randomized values in ``EnvState.aux`` and rebinds them into
the (traced) Model inside step/reset — per-instance scene randomization under
one shared compiled model.
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


class AdroitEnv(core.FunctionalEnv):
    metadata = {"render_modes": ["human", "rgb_array", "depth_array"], "render_fps": 100}
    task = "door"
    frame_skip = 5
    obs_dim = 39

    def __init__(self, reward_type="dense", max_episode_steps=None,
                 dtype=jnp.float32):
        self.sparse_reward = reward_type.lower() == "sparse"
        self.max_episode_steps = max_episode_steps
        self.dtype = dtype
        npdtype = np.float64 if dtype == jnp.float64 else np.float32
        self.model, extra = serialize.load_asset(f"adroit/{self.task}", dtype=npdtype)
        # pair_topk: C-engine rollouts (tools/calibrate_topk.py) show at most
        # 7 near pairs per group for door/hammer/relocate (K=16 is >2x
        # headroom; door's largest group is 60 pairs) and 15 for pen's
        # 33-pair finger-pen group (K=24 keeps headroom there). Guarded by
        # the adroit reference-tracking + long-horizon drift tests.
        self.model = self.model.with_options(
            contact_cap=16, iterations=5, ls_iterations=4,
            pair_topk=24 if self.task == "pen" else 16,
            need_cfrc_ext=False,
        )
        # per-task reference viewpoint (adroit_door.py:23-26 and siblings)
        from gymnasium_robotics_tpu.render import renderer as _R

        self.camera_config = _R.ADROIT_CAMERAS.get(self.task)
        self._init_qpos = jnp.asarray(extra["initial_qpos"], dtype)
        self._init_qvel = jnp.asarray(extra["initial_qvel"], dtype)
        mt = self.model.meta

        # actuator sensitivity overrides (adroit_door.py:225-252): host-side
        # static model edit, identical for every instance
        names = mt.actuator_names
        gain = np.asarray(jax.device_get(self.model.actuator_gainprm)).copy()
        bias = np.asarray(jax.device_get(self.model.actuator_biasprm)).copy()
        iw1, iw0 = names.index("A_WRJ1"), names.index("A_WRJ0")
        if3, it0 = names.index("A_FFJ3"), names.index("A_THJ0")
        gain[iw1:iw0 + 1, :3] = [10, 0, 0]
        gain[if3:it0 + 1, :3] = [1, 0, 0]
        bias[iw1:iw0 + 1, :3] = [0, -10, 0]
        bias[if3:it0 + 1, :3] = [0, -1, 0]
        self.model = dataclasses.replace(
            self.model,
            actuator_gainprm=jnp.asarray(gain, npdtype),
            actuator_biasprm=jnp.asarray(bias, npdtype),
        )
        ctrlrange = np.asarray(jax.device_get(self.model.actuator_ctrlrange))
        self._act_mean = jnp.asarray(ctrlrange.mean(axis=1), dtype)
        self._act_rng = jnp.asarray(
            0.5 * (ctrlrange[:, 1] - ctrlrange[:, 0]), dtype
        )
        self._setup_ids()

        import gymnasium.spaces as spaces

        self.action_space = spaces.Box(
            -1.0, 1.0, shape=(mt.nu,), dtype=np.float32
        )
        self.observation_space = spaces.Box(
            -np.inf, np.inf, shape=(self.obs_dim,), dtype=np.float64
        )

    # --- per-task hooks ---
    def _setup_ids(self):
        raise NotImplementedError

    def _model_for(self, aux):
        return self.model

    def _sample_aux(self, rng):
        return {}

    def _task_obs_reward(self, m, data, action):
        raise NotImplementedError

    # --- env API ---
    def initial(self, rng) -> core.EnvState:
        data = pipeline.make_data(self.model, dtype=self.dtype)
        state = core.EnvState(
            data=data, obs=None, reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"success": jnp.zeros((), bool)},
            rng=rng, goal=jnp.zeros(0, self.dtype),
            steps=jnp.zeros((), jnp.int32),
            aux=self._sample_aux(rng),
        )
        return self.reset(state, rng)

    def reset(self, state, rng):
        rng, r_aux = jax.random.split(rng)
        aux = self._sample_aux(r_aux)
        return self._reset_with_aux(state, rng, aux)

    def reset_with_values(self, state, values):
        """Parity-mode reset: scene randomization values drawn on the host in
        the reference's exact NumPy order (reset_model draws, e.g.
        adroit_door.py:359-371; utils/parity.py)."""
        aux = {k: jnp.asarray(v, self.dtype) for k, v in values.items()}
        return self._reset_with_aux(state, state.rng, aux)

    def _reset_with_aux(self, state, rng, aux):
        m = self._model_for(aux)
        data = pipeline.make_data(self.model, dtype=self.dtype)
        data = dataclasses.replace(
            data, qpos=self._init_qpos, qvel=self._init_qvel
        )
        data = pipeline.refresh_kin(m, data)
        obs, _, _ = self._task_obs_reward(m, data, jnp.zeros(self.model.nu, self.dtype))
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.zeros((), self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"success": jnp.zeros((), bool)},
            rng=rng, steps=jnp.zeros((), jnp.int32), aux=aux,
        )

    def step(self, state, action):
        action = jnp.clip(jnp.asarray(action, self.dtype), -1.0, 1.0)
        ctrl = self._act_mean + action * self._act_rng
        m = self._model_for(state.aux)
        data = pipeline.step_n(m, state.data, ctrl, self.frame_skip)
        obs, reward, success = self._task_obs_reward(m, data, action)
        rng, _ = jax.random.split(state.rng)
        return dataclasses.replace(
            state, data=data, obs=obs,
            reward=jnp.asarray(reward, self.dtype),
            terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
            info={"success": success}, rng=rng, steps=state.steps + 1,
        )

    # --- full-scene state checkpoint dicts (reference get_env_state/
    # set_env_state, adroit_door.py:373-392; per-task keys below) ---
    def _aux_to_state_dict(self, state):
        raise NotImplementedError

    def _state_dict_to_aux(self, state_dict, aux):
        raise NotImplementedError

    def get_env_state(self, state):
        """State dict with the reference's keys (qpos/qvel + scene fields)."""
        d = {"qpos": state.data.qpos, "qvel": state.data.qvel}
        d.update(self._aux_to_state_dict(state))
        return d

    def set_env_state(self, state, state_dict):
        """Pure analogue of the reference's set_env_state: write qpos/qvel,
        restore the randomized scene fields, recompute kinematics + obs."""
        aux = self._state_dict_to_aux(state_dict, dict(state.aux))
        m = self._model_for(aux)
        data = dataclasses.replace(
            state.data,
            qpos=jnp.asarray(state_dict["qpos"], self.dtype),
            qvel=jnp.asarray(state_dict["qvel"], self.dtype),
        )
        data = pipeline.refresh_kin(m, data)
        obs, _, _ = self._task_obs_reward(
            m, data, jnp.zeros(self.model.nu, self.dtype)
        )
        return dataclasses.replace(state, data=data, obs=obs, aux=aux)


class AdroitHandDoorEnv(AdroitEnv):
    task = "door"
    obs_dim = 39

    def _setup_ids(self):
        m = self.model
        self._door_hinge_dadr = m.meta.jnt_dofadr[m.name2id("joint", "door_hinge")]
        self._door_hinge_qadr = m.meta.jnt_qposadr[m.name2id("joint", "door_hinge")]
        self._grasp_site = m.name2id("site", "S_grasp")
        self._handle_site = m.name2id("site", "S_handle")
        self._door_body = m.name2id("body", "frame")

    def _sample_aux(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        pos = jnp.stack(
            [
                jax.random.uniform(r1, (), self.dtype, -0.3, -0.2),
                jax.random.uniform(r2, (), self.dtype, 0.25, 0.35),
                jax.random.uniform(r3, (), self.dtype, 0.252, 0.35),
            ]
        )
        return {"door_body_pos": pos}

    def _model_for(self, aux):
        bp = self.model.body_pos.at[self._door_body].set(
            aux["door_body_pos"].astype(self.model.body_pos.dtype)
        )
        return dataclasses.replace(self.model, body_pos=bp)

    def _aux_to_state_dict(self, state):
        return {"door_body_pos": state.aux["door_body_pos"]}

    def _state_dict_to_aux(self, state_dict, aux):
        aux["door_body_pos"] = jnp.asarray(
            state_dict["door_body_pos"], self.dtype
        )
        return aux

    def _task_obs_reward(self, m, data, action):
        qpos = data.qpos
        door_pos = qpos[self._door_hinge_qadr]
        handle_pos = data.site_xpos[self._handle_site]
        palm_pos = data.site_xpos[self._grasp_site]
        latch_pos = qpos[-1]
        door_open = jnp.where(door_pos > 1.0, 1.0, -1.0).astype(self.dtype)
        obs = jnp.concatenate(
            [
                qpos[1:-2], latch_pos[None], door_pos[None],
                palm_pos, handle_pos, palm_pos - handle_pos, door_open[None],
            ]
        )
        goal_achieved = door_pos >= 1.35
        if self.sparse_reward:
            reward = jnp.where(goal_achieved, 10.0, -0.1)
        else:
            reward = -0.1 * jnp.linalg.norm(palm_pos - handle_pos)
            reward += -0.1 * (door_pos - 1.57) ** 2
            reward += -1e-5 * jnp.sum(data.qvel ** 2)
            reward += jnp.where(door_pos > 0.2, 2.0, 0.0)
            reward += jnp.where(door_pos > 1.0, 8.0, 0.0)
            reward += jnp.where(door_pos > 1.35, 10.0, 0.0)
        return obs, reward, goal_achieved


class AdroitHandHammerEnv(AdroitEnv):
    task = "hammer"
    obs_dim = 46

    def _setup_ids(self):
        m = self.model
        self._obj_body = m.name2id("body", "Object")
        self._grasp_site = m.name2id("site", "S_grasp")
        self._tool_site = m.name2id("site", "tool")
        self._nail_site = m.name2id("site", "S_target")
        self._goal_site = m.name2id("site", "nail_goal")
        self._board_body = m.name2id("body", "nail_board")
        self._nail_sensor_adr = m.meta.sensor_adr[
            m.meta.sensor_names.index("S_nail")
        ]

    def _sample_aux(self, rng):
        z = jax.random.uniform(rng, (), self.dtype, 0.1, 0.25)
        return {"board_z": z}

    def _model_for(self, aux):
        bp = self.model.body_pos.at[self._board_body, 2].set(
            aux["board_z"].astype(self.model.body_pos.dtype)
        )
        return dataclasses.replace(self.model, body_pos=bp)

    def _aux_to_state_dict(self, state):
        board_pos = self.model.body_pos[self._board_body].astype(self.dtype)
        board_pos = board_pos.at[2].set(state.aux["board_z"])
        return {
            "board_pos": board_pos,
            "target_pos": state.data.site_xpos[self._nail_site],
        }

    def _state_dict_to_aux(self, state_dict, aux):
        aux["board_z"] = jnp.asarray(state_dict["board_pos"], self.dtype)[2]
        return aux

    def _task_obs_reward(self, m, data, action):
        qp = data.qpos
        qv = jnp.clip(data.qvel, -1.0, 1.0)
        obj_pos = data.xpos[self._obj_body]
        obj_rot = rotations.quat2euler(data.xquat[self._obj_body])
        palm_pos = data.site_xpos[self._grasp_site]
        nail_pos = data.site_xpos[self._nail_site]
        goal_pos = data.site_xpos[self._goal_site]
        head_pos = data.site_xpos[self._tool_site]
        # touch sensor at the nail head (adroit_hammer.py:344-346)
        nail_impact = jnp.clip(
            data.sensordata[self._nail_sensor_adr], -1.0, 1.0
        ).astype(self.dtype)
        obs = jnp.concatenate(
            [qp[:-6], qv[-6:], palm_pos, obj_pos, obj_rot, nail_pos,
             nail_impact[None]]
        )
        goal_distance = jnp.linalg.norm(nail_pos - goal_pos)
        goal_achieved = goal_distance < 0.01
        if self.sparse_reward:
            reward = jnp.where(goal_achieved, 10.0, -0.1)
        else:
            reward = -0.1 * jnp.linalg.norm(palm_pos - obj_pos)
            reward -= jnp.linalg.norm(head_pos - nail_pos)
            reward -= 10.0 * goal_distance
            reward -= 1e-2 * jnp.linalg.norm(data.qvel)
            reward += jnp.where((obj_pos[2] > 0.04) & (head_pos[2] > 0.04), 2.0, 0.0)
            reward += jnp.where(goal_distance < 0.020, 25.0, 0.0)
            reward += jnp.where(goal_distance < 0.010, 75.0, 0.0)
        return obs, reward, goal_achieved


class AdroitHandPenEnv(AdroitEnv):
    task = "pen"
    obs_dim = 45

    def _setup_ids(self):
        m = self.model
        self._obj_body = m.name2id("body", "Object")
        self._target_body = m.name2id("body", "target")
        self._eps_ball = m.name2id("site", "eps_ball")
        self._obj_t = m.name2id("site", "object_top")
        self._obj_b = m.name2id("site", "object_bottom")
        self._tar_t = m.name2id("site", "target_top")
        self._tar_b = m.name2id("site", "target_bottom")
        sp = np.asarray(jax.device_get(self.model.site_pos))
        self._pen_length = float(np.linalg.norm(sp[self._obj_t] - sp[self._obj_b]))
        self._tar_length = float(np.linalg.norm(sp[self._tar_t] - sp[self._tar_b]))

    def _sample_aux(self, rng):
        r1, r2 = jax.random.split(rng)
        euler = jnp.stack(
            [
                jax.random.uniform(r1, (), self.dtype, -1.0, 1.0),
                jax.random.uniform(r2, (), self.dtype, -1.0, 1.0),
                jnp.zeros((), self.dtype),
            ]
        )
        return {"target_quat": rotations.euler2quat(euler)}

    def _model_for(self, aux):
        bq = self.model.body_quat.at[self._target_body].set(
            aux["target_quat"].astype(self.model.body_quat.dtype)
        )
        return dataclasses.replace(self.model, body_quat=bq)

    def _aux_to_state_dict(self, state):
        return {"desired_orien": state.aux["target_quat"]}

    def _state_dict_to_aux(self, state_dict, aux):
        aux["target_quat"] = jnp.asarray(
            state_dict["desired_orien"], self.dtype
        )
        return aux

    def _task_obs_reward(self, m, data, action):
        qpos = data.qpos
        obj_vel = data.qvel[-6:]
        obj_pos = data.xpos[self._obj_body]
        desired_pos = data.site_xpos[self._eps_ball]
        obj_orien = (
            data.site_xpos[self._obj_t] - data.site_xpos[self._obj_b]
        ) / self._pen_length
        desired_orien = (
            data.site_xpos[self._tar_t] - data.site_xpos[self._tar_b]
        ) / self._tar_length
        obs = jnp.concatenate(
            [qpos[:-6], obj_pos, obj_vel, obj_orien, desired_orien,
             obj_pos - desired_pos, obj_orien - desired_orien]
        )
        goal_distance = jnp.linalg.norm(obj_pos - desired_pos)
        orien_similarity = jnp.dot(obj_orien, desired_orien)
        goal_achieved = (goal_distance < 0.075) & (orien_similarity > 0.95)
        if self.sparse_reward:
            reward = jnp.where(goal_achieved, 10.0, -0.1)
        else:
            reward = -goal_distance + orien_similarity
            near = goal_distance < 0.075
            reward += jnp.where(near & (orien_similarity > 0.9), 10.0, 0.0)
            reward += jnp.where(near & (orien_similarity > 0.95), 50.0, 0.0)
            reward -= jnp.where(obj_pos[2] < 0.075, 5.0, 0.0)
        return obs, reward, goal_achieved


class AdroitHandRelocateEnv(AdroitEnv):
    task = "relocate"
    obs_dim = 39

    def _setup_ids(self):
        m = self.model
        self._obj_body = m.name2id("body", "Object")
        self._grasp_site = m.name2id("site", "S_grasp")
        self._target_site = m.name2id("site", "target")

    def _sample_aux(self, rng):
        r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
        return {
            "obj_xy": jnp.stack(
                [
                    jax.random.uniform(r1, (), self.dtype, -0.15, 0.15),
                    jax.random.uniform(r2, (), self.dtype, -0.15, 0.3),
                ]
            ),
            "target_pos": jnp.stack(
                [
                    jax.random.uniform(r3, (), self.dtype, -0.2, 0.2),
                    jax.random.uniform(r4, (), self.dtype, -0.2, 0.2),
                    jax.random.uniform(r5, (), self.dtype, 0.15, 0.35),
                ]
            ),
        }

    def _model_for(self, aux):
        bp = self.model.body_pos.at[self._obj_body, :2].set(
            aux["obj_xy"].astype(self.model.body_pos.dtype)
        )
        sp = self.model.site_pos.at[self._target_site].set(
            aux["target_pos"].astype(self.model.site_pos.dtype)
        )
        return dataclasses.replace(self.model, body_pos=bp, site_pos=sp)

    def _aux_to_state_dict(self, state):
        obj_pos = self.model.body_pos[self._obj_body].astype(self.dtype)
        obj_pos = obj_pos.at[:2].set(state.aux["obj_xy"])
        return {
            "hand_qpos": state.data.qpos[:30],
            "obj_pos": obj_pos,
            "palm_pos": state.data.site_xpos[self._grasp_site],
            "target_pos": state.aux["target_pos"],
        }

    def _state_dict_to_aux(self, state_dict, aux):
        aux["obj_xy"] = jnp.asarray(state_dict["obj_pos"], self.dtype)[:2]
        aux["target_pos"] = jnp.asarray(state_dict["target_pos"], self.dtype)
        return aux

    def _task_obs_reward(self, m, data, action):
        qpos = data.qpos
        obj_pos = data.xpos[self._obj_body]
        palm_pos = data.site_xpos[self._grasp_site]
        target_pos = data.site_xpos[self._target_site]
        obs = jnp.concatenate(
            [qpos[:-6], palm_pos - obj_pos, palm_pos - target_pos,
             obj_pos - target_pos]
        )
        goal_distance = jnp.linalg.norm(obj_pos - target_pos)
        goal_achieved = goal_distance < 0.1
        if self.sparse_reward:
            reward = jnp.where(goal_achieved, 10.0, -0.1)
        else:
            reward = -0.1 * jnp.linalg.norm(palm_pos - obj_pos)
            lifted = obj_pos[2] > 0.04
            reward += jnp.where(
                lifted,
                1.0
                - 0.5 * jnp.linalg.norm(palm_pos - target_pos)
                - 0.5 * jnp.linalg.norm(obj_pos - target_pos),
                0.0,
            )
            reward += jnp.where(goal_distance < 0.1, 10.0, 0.0)
            reward += jnp.where(goal_distance < 0.05, 20.0, 0.0)
        return obs, reward, goal_achieved


def register_adroit_envs(register):
    classes = {
        "AdroitHandDoor": AdroitHandDoorEnv,
        "AdroitHandHammer": AdroitHandHammerEnv,
        "AdroitHandPen": AdroitHandPenEnv,
        "AdroitHandRelocate": AdroitHandRelocateEnv,
    }
    for name, cls in classes.items():
        for suffix, rt in (("", "dense"), ("Sparse", "sparse")):
            # v2 is the reference's registered version
            # (gymnasium_robotics/__init__.py:1083-1117); v1 kept as an alias.
            for version in ("v1", "v2"):
                register(
                    id=f"{name}{suffix}-{version}",
                    entry_point=cls,
                    max_episode_steps=200,
                    kwargs={"reward_type": rt},
                )
