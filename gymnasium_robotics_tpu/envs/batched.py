"""BatchedEnv: N env instances stepping in lockstep under jit/vmap — the
TPU-native replacement for the reference's single-sim envs plus Gymnasium's
AsyncVectorEnv (SURVEY.md §2.4: DP row). Optionally sharded over a device mesh
via gymnasium_robotics_tpu.parallel.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu import core


class BatchedEnv:
    """Vectorized, auto-resetting env.

    step(actions: (N, act_dim)) -> state with batched obs/reward/term/trunc.
    All methods are jitted; state lives on device between calls.
    """

    def __init__(self, env: core.FunctionalEnv, num_envs: int, sharding=None):
        self.env = env
        self.num_envs = num_envs
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self._sharding = sharding

        def _init(rng):
            state = jax.vmap(env.initial)(jax.random.split(rng, num_envs))
            # opt into divergence reporting: info['diverged'] distinguishes
            # the BADQACC-analogue truncation from TimeLimit (core.auto_reset)
            return core.with_diverged(state)

        def _step(state, action):
            return jax.vmap(functools.partial(core.auto_reset, env))(state, action)

        self._init = jax.jit(_init)
        self._step_fn = jax.jit(_step)
        self.state: Optional[core.EnvState] = None

    def reset(self, seed: int = 0):
        rng = jax.random.key(seed)
        if self._sharding is not None:
            rng = jax.device_put(rng)
        self.state = self._init(rng)
        if self._sharding is not None:
            self.state = jax.device_put(self.state, self._sharding)
        return self.state.obs, self.state.info

    def step(self, actions):
        actions = jnp.asarray(actions)
        self.state = self._step_fn(self.state, actions)
        s = self.state
        return s.obs, s.reward, s.terminated, s.truncated, s.info

    def __reduce__(self):
        # registry-made batched envs pickle as make() args (see
        # core.FunctionalEnv.__reduce__); runtime device state is not carried
        # (checkpoint it separately via parallel.checkpoint).
        spec = getattr(self, "_make_spec", None)
        if spec is not None:
            from gymnasium_robotics_tpu import registry

            return (registry.remake, (spec,))
        return super().__reduce__()

    # --- pure-functional access (for scan-based rollouts / pjit) ---
    def init_state(self, rng) -> core.EnvState:
        return self._init(rng)

    def step_state(self, state, actions) -> core.EnvState:
        return self._step_fn(state, actions)

    # GoalEnv passthrough for HER-style relabeling
    def compute_reward(self, achieved_goal, desired_goal, info=None):
        return self.env.compute_reward(achieved_goal, desired_goal, info)

    def compute_terminated(self, achieved_goal, desired_goal, info=None):
        return self.env.compute_terminated(achieved_goal, desired_goal, info)

    def compute_truncated(self, achieved_goal, desired_goal, info=None):
        return self.env.compute_truncated(achieved_goal, desired_goal, info)
