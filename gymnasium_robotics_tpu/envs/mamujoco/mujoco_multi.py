"""Multi-agent MuJoCo: factorizes a single-agent locomotion env into K
cooperating agents (re-design of gymnasium_robotics/envs/multiagent_mujoco/
mujoco_multi.py:57-621 as a pure index-mapping layer over the batched core).

Step semantics mirror the reference (:242-310): per-agent actions scatter into
the global action vector via static act-id tables; the inner env steps once;
the shared reward/termination/truncation are replicated to every agent; obs are
per-agent k-hop gathers (obsk) executed as jnp programs.
"""

from __future__ import annotations

import dataclasses
import functools
import types
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu import core
from gymnasium_robotics_tpu.envs.locomotion import classic as C
from gymnasium_robotics_tpu.envs.locomotion import locomotion as L
from gymnasium_robotics_tpu.envs.mamujoco import obsk

_SCENARIO_MAKERS = {
    "HalfCheetah": L.make_half_cheetah,
    "Ant": L.make_ant,
    "Hopper": L.make_hopper,
    "Walker2d": L.make_walker2d,
    "Swimmer": L.make_swimmer,
    "Reacher": C.make_reacher,
    "Humanoid": C.make_humanoid,
    "HumanoidStandup": C.make_humanoid_standup,
    "Pusher": C.make_pusher,
    "InvertedPendulum": C.make_inverted_pendulum,
    "InvertedDoublePendulum": C.make_inverted_double_pendulum,
}

_EPISODE_STEPS = {
    "HalfCheetah": 1000, "Ant": 1000, "Hopper": 1000, "Walker2d": 1000,
    "Swimmer": 1000, "Reacher": 50, "Humanoid": 1000,
    "CoupledHalfCheetah": 1000,
    "HumanoidStandup": 1000, "Pusher": 100, "InvertedPendulum": 1000,
    "InvertedDoublePendulum": 1000,
}


class MultiAgentMujocoEnv(core.FunctionalEnv):
    """Functional multi-agent env: actions/obs are dicts keyed 'agent_0'...;
    also exposed through a PettingZoo ParallelEnv adapter (see parallel_env)."""

    def __init__(
        self,
        scenario: str,
        agent_conf: Optional[str],
        agent_obsk: Optional[int] = 1,
        agent_factorization: Optional[dict] = None,
        local_categories=None,
        global_categories=None,
        max_episode_steps=None,
        dtype=jnp.float32,
    ):
        self.scenario = scenario
        self.agent_conf = agent_conf
        self.agent_obsk = agent_obsk
        if scenario == "CoupledHalfCheetah":
            from gymnasium_robotics_tpu.envs.mamujoco.coupled_half_cheetah import (
                make_coupled_half_cheetah,
            )

            self.env = make_coupled_half_cheetah(dtype=dtype)
        elif scenario in ("ManySegmentSwimmer", "ManySegmentAnt"):
            from gymnasium_robotics_tpu.envs.mamujoco import many_segment

            n_agents, n_per = (int(x) for x in agent_conf.split("x"))
            kind = "swimmer" if scenario == "ManySegmentSwimmer" else "ant"
            self.env = many_segment.make_many_segment(
                kind, n_agents * n_per, dtype=dtype
            )
        elif scenario in _SCENARIO_MAKERS:
            self.env = _SCENARIO_MAKERS[scenario](dtype=dtype)
        else:
            raise NotImplementedError(f"Scenario {scenario} not available")
        self.dtype = dtype
        self.max_episode_steps = (
            max_episode_steps or _EPISODE_STEPS.get(scenario, 1000)
        )

        if agent_obsk is not None:
            if agent_factorization is None:
                parts, edges, globals_, nodes = obsk.get_parts_and_edges(
                    scenario, agent_conf
                )
            else:
                # User-defined factorization (reference mujoco_multi.py:136-139
                # agent_factorization={'partition','edges','globals'}): node
                # table rebuilt from the user's partition + globals.
                parts = [tuple(p) for p in agent_factorization["partition"]]
                edges = list(agent_factorization["edges"])
                globals_ = list(agent_factorization["globals"])
                nodes = {n.label: n for p in parts for n in p}
                for g in globals_:
                    nodes.setdefault(g.label, g)
            self.agent_partitions = parts
            self.k_dicts = [
                obsk.get_joints_at_kdist(p, edges, agent_obsk, nodes)
                for p in parts
            ]
            self.global_nodes = globals_
            if local_categories is None:
                self.local_categories = obsk.local_categories_for(
                    scenario, agent_obsk
                )
            else:
                # Per-depth category lists (reference mujoco_multi.py:155-158);
                # pad with the deepest entry so any k is covered.
                self.local_categories = [
                    local_categories[k if k < len(local_categories) else -1]
                    for k in range(agent_obsk + 1)
                ]
            self.global_categories = (
                global_categories
                if global_categories is not None
                else ("qpos", "qvel")
            )
            self.possible_agents = [f"agent_{i}" for i in range(len(parts))]
        else:
            self.agent_partitions = None
            self.possible_agents = ["agent_0"]

        import gymnasium.spaces as spaces

        nu = self.env.model.nu
        self._nu = nu
        if self.agent_partitions is None:
            self.action_spaces = {"agent_0": self.env.action_space}
            self.observation_spaces = {"agent_0": self.env.observation_space}
        else:
            self.action_spaces = {}
            self.observation_spaces = {}
            probe = self._probe_obs()
            for i, (agent, part) in enumerate(
                zip(self.possible_agents, self.agent_partitions)
            ):
                na = len(part)
                self.action_spaces[agent] = spaces.Box(
                    -1.0, 1.0, shape=(na,), dtype=np.float32
                )
                self.observation_spaces[agent] = spaces.Box(
                    -np.inf, np.inf, shape=probe[agent].shape, dtype=np.float64
                )
        self.action_space = self.action_spaces[self.possible_agents[0]]
        self.observation_space = self.observation_spaces[self.possible_agents[0]]

    def _probe_obs(self):
        import jax

        s = self.env.initial(jax.random.key(0))
        return self._agent_obs(s.data)

    def _agent_obs(self, data) -> Dict[str, jnp.ndarray]:
        if self.agent_partitions is None:
            return {"agent_0": self.env._get_obs(data)}
        mt = self.env.model.meta
        out = {}
        for agent, k_dict in zip(self.possible_agents, self.k_dicts):
            out[agent] = obsk.build_obs(
                data, k_dict, self.local_categories, self.global_nodes,
                self.global_categories, mt.nq, mt.nv, self.dtype,
            )
        return out

    def map_local_actions_to_global_action(self, actions: Dict[str, jnp.ndarray]):
        """Scatter per-agent actions into the global vector
        (mujoco_multi.py:276-310; the double/missing-definition check is a
        build-time assertion here since the tables are static)."""
        if self.agent_partitions is None:
            return actions[self.possible_agents[0]]
        global_action = jnp.zeros(self._nu, self.dtype)
        for agent, part in zip(self.possible_agents, self.agent_partitions):
            ids = jnp.asarray([n.act_ids for n in part])
            global_action = global_action.at[ids].set(
                jnp.asarray(actions[agent], self.dtype)
            )
        return global_action

    def map_global_action_to_local_actions(self, action):
        """Inverse mapping (mujoco_multi.py:312-341)."""
        if self.agent_partitions is None:
            return {self.possible_agents[0]: action}
        return {
            agent: jnp.asarray(action)[jnp.asarray([n.act_ids for n in part])]
            for agent, part in zip(self.possible_agents, self.agent_partitions)
        }

    # --- CTDE state <-> local-observation mapping (mujoco_multi.py:343-502):
    # the obsk gather program is replayed over a struct of global-obs indices,
    # so the factorization is exact for scenarios whose per-agent obs are pure
    # gathers of the single-agent observation (HalfCheetah, Ant, Walker2d, ...)

    @property
    def single_agent_env(self):
        return self.env

    @functools.cached_property
    def observation_factorization(self):
        return self.create_observation_mapping()

    def create_observation_mapping(self) -> Optional[Dict[str, np.ndarray]]:
        obs_dim = self.env.observation_space.shape[0]
        if self.agent_obsk is None:
            return {self.possible_agents[0]: np.arange(obs_dim)}
        struct = getattr(self.env, "observation_structure", None)
        if struct is None:
            return None
        mt = self.env.model.meta
        gi = np.arange(obs_dim, dtype=np.float64)
        seg = {}
        off = 0
        for key in ("qpos", "qvel", "cinert", "cvel", "qfrc_actuator",
                    "cfrc_ext"):
            n = struct.get(key, 0)
            seg[key] = gi[off:off + n]
            off += n
        assert off == obs_dim, "observation_structure does not cover the obs"
        nb = mt.nbody

        def pad(name, prefix, shape=None):
            x = np.concatenate([np.zeros(prefix), seg[name]])
            return x.reshape(shape) if shape and len(x) > prefix else x

        fake = types.SimpleNamespace(
            qpos=jnp.asarray(pad("qpos", struct.get("skipped_qpos", 0))),
            qvel=jnp.asarray(seg["qvel"]),
            cinert=jnp.asarray(pad("cinert", 10, (nb, 10) if struct.get("cinert") else None)),
            cvel=jnp.asarray(pad("cvel", 6, (nb, 6) if struct.get("cvel") else None)),
            qfrc_actuator=jnp.asarray(pad("qfrc_actuator", 6)),
            cfrc_ext=jnp.asarray(pad("cfrc_ext", 6, (nb, 6) if struct.get("cfrc_ext") else None)),
        )
        out = {}
        for agent, k_dict in zip(self.possible_agents, self.k_dicts):
            idx = obsk.build_obs(
                fake, k_dict, self.local_categories, self.global_nodes,
                self.global_categories, mt.nq, mt.nv, jnp.float64,
                index_only=True,
            )
            out[agent] = np.asarray(idx).round().astype(np.int64)
        return out

    def map_global_state_to_local_observations(self, global_state):
        """Gather each agent's observation out of the single-agent obs vector
        (mujoco_multi.py:343-371)."""
        fact = self.observation_factorization
        assert fact is not None, (
            "state mapping requires the inner env to expose "
            "observation_structure"
        )
        global_state = np.asarray(global_state)
        out = {a: global_state[idx] for a, idx in fact.items()}
        for agent in self.possible_agents:
            assert len(out[agent]) == self.observation_spaces[agent].shape[0]
        return out

    def map_local_observations_to_global_state(self, local_observation):
        """Scatter per-agent observations back into the single-agent obs
        vector, checking consistency (mujoco_multi.py:373-405)."""
        fact = self.observation_factorization
        assert fact is not None, (
            "state mapping requires the inner env to expose "
            "observation_structure"
        )
        obs_dim = self.env.observation_space.shape[0]
        global_obs = np.full(obs_dim, np.nan)
        for agent, idx in fact.items():
            vals = np.asarray(local_observation[agent])
            for local_i, global_i in enumerate(idx):
                prev = global_obs[global_i]
                assert np.isnan(prev) or prev == vals[local_i], (
                    "FATAL: at least one observation is doubly defined"
                )
                global_obs[global_i] = vals[local_i]
        assert not np.isnan(global_obs).any(), (
            "FATAL: at least one observation is undefined; observations can "
            "not be mapped"
        )
        return global_obs

    # --- functional API: obs is the dict of per-agent observations ---
    def initial(self, rng) -> core.EnvState:
        state = self.env.initial(rng)
        return dataclasses.replace(state, obs=self._agent_obs(state.data))

    def reset(self, state, rng) -> core.EnvState:
        state = self.env.reset(state, rng)
        return dataclasses.replace(state, obs=self._agent_obs(state.data))

    def step(self, state, actions: Dict[str, jnp.ndarray]) -> core.EnvState:
        global_action = self.map_local_actions_to_global_action(actions)
        state = self.env.step(state, global_action)
        return dataclasses.replace(state, obs=self._agent_obs(state.data))


class ParallelEnvAdapter:
    """PettingZoo ParallelEnv-compatible wrapper (numpy IO, shared reward),
    mirroring the reference exports (mujoco_multi.py:618-621)."""

    metadata = {
        "render_modes": ["human", "rgb_array", "depth_array"],
        "name": "mamujoco_tpu",
    }

    def __init__(self, env: MultiAgentMujocoEnv, render_mode=None):
        self.env = env
        self.possible_agents = list(env.possible_agents)
        self.agents = []
        self.render_mode = render_mode
        self._step = jax.jit(env.step)
        self._initial = jax.jit(env.initial)
        self._state = None
        self._steps = 0
        self._render_kin = None
        self._viewer = None

    def action_space(self, agent):
        return self.env.action_spaces[agent]

    def observation_space(self, agent):
        return self.env.observation_spaces[agent]

    def reset(self, seed=None, options=None):
        seed = 0 if seed is None else seed
        self._state = self._initial(jax.random.key(seed))
        self.agents = list(self.possible_agents)
        self._steps = 0
        obs = {k: np.asarray(v) for k, v in self._state.obs.items()}
        info = {a: {} for a in self.agents}
        return obs, info

    def step(self, actions):
        self._state = self._step(
            self._state, {k: jnp.asarray(v) for k, v in actions.items()}
        )
        self._steps += 1
        s = self._state
        obs = {k: np.asarray(v) for k, v in s.obs.items()}
        term = bool(s.terminated)
        trunc = self._steps >= self.env.max_episode_steps
        rewards = {a: float(s.reward) for a in self.agents}
        terms = {a: term for a in self.agents}
        truncs = {a: trunc for a in self.agents}
        infos = {a: {} for a in self.agents}
        if term or trunc:
            self.agents = []
        return obs, rewards, terms, truncs, infos

    def render(self):
        """Renders the INNER single-agent scene (the reference delegates to
        single_agent_env.render(), mujoco_multi.py:568-575) through the
        software renderer; human mode displays via render/viewer.py."""
        if self.render_mode is None or self._state is None:
            return None
        from gymnasium_robotics_tpu.physics import smooth
        from gymnasium_robotics_tpu.render import renderer as R

        inner = self.env.env  # MultiAgentMujocoEnv -> functional locomotion env
        model = getattr(inner, "model", None)
        if model is None:
            return None
        if self._render_kin is None:
            self._render_kin = jax.jit(
                lambda dd: smooth.kinematics(model, dd)
            )
        fresh = self._render_kin(self._state.data)
        xpos, xmat = jax.device_get((fresh.geom_xpos, fresh.geom_xmat))
        cam = getattr(inner, "camera_config", None) or R.FAMILY_CAMERAS.get(
            "locomotion"
        )
        frame = R.render_frame(
            model, xpos, xmat, camera=cam,
            depth=self.render_mode == "depth_array",
        )
        if self.render_mode == "human":
            if self._viewer is None:
                from gymnasium_robotics_tpu.render.viewer import HumanViewer

                self._viewer = HumanViewer()
            self._viewer.show(frame)
            return None
        return frame

    def close(self):
        if self._viewer is not None:
            self._viewer.close()
            self._viewer = None

    @property
    def unwrapped(self):
        return self

    def state(self):
        return np.concatenate(
            [np.asarray(self._state.data.qpos), np.asarray(self._state.data.qvel)]
        )

    # CTDE mapping passthroughs (reference exposes these on the ParallelEnv)
    def map_local_actions_to_global_action(self, actions):
        return self.env.map_local_actions_to_global_action(actions)

    def map_global_action_to_local_actions(self, action):
        return self.env.map_global_action_to_local_actions(action)

    def map_global_state_to_local_observations(self, global_state):
        return self.env.map_global_state_to_local_observations(global_state)

    def map_local_observations_to_global_state(self, local_observation):
        return self.env.map_local_observations_to_global_state(local_observation)

    def create_observation_mapping(self):
        return self.env.create_observation_mapping()


def parallel_env(scenario=None, agent_conf=None, agent_obsk=1, render_mode=None,
                 **kwargs):
    return ParallelEnvAdapter(
        MultiAgentMujocoEnv(scenario, agent_conf, agent_obsk, **kwargs),
        render_mode=render_mode,
    )


raw_parallel_env = parallel_env


def env(**kwargs):
    """AEC-wrapped variant (requires pettingzoo)."""
    import pettingzoo.utils.conversions as conv

    return conv.parallel_to_aec(parallel_env(**kwargs))
