"""Functional environment core: the TPU-native analogue of the reference's
GoalEnv / BaseRobotEnv APIs (gymnasium_robotics/core.py:8-115,
gymnasium_robotics/envs/robot_env.py:31-245).

Reference envs are stateful objects stepping one simulation; here an env is a
bundle of pure functions over an ``EnvState`` pytree:

    env.initial(rng)          -> EnvState          (allocate + first reset)
    env.reset(state, rng)     -> EnvState          (masked/auto reset capable)
    env.step(state, action)   -> EnvState

so ``vmap(env.step)`` steps thousands of env instances in lockstep and
``jit``/``pjit`` fuse the entire step (physics + reward + termination + goal
resampling) into one device program. The GoalEnv contract —
``compute_reward/compute_terminated/compute_truncated`` recomputable with
substituted goals (HER relabeling, reference core.py:46-114) — is exposed as
pure vectorized functions on each env.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from gymnasium_robotics_tpu.physics import types as T


def _register(cls):
    meta = getattr(cls, "_meta", ())
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(
        cls,
        data_fields=[f for f in fields if f not in meta],
        meta_fields=list(meta),
    )
    return cls


@_register
@dataclasses.dataclass
class EnvState:
    """Complete per-instance env state. A pure pytree: checkpointing an env is
    saving this object (SURVEY.md §5), and batching is a leading axis."""

    data: Any            # physics Data (or None for non-physics envs)
    obs: Any             # observation pytree (dict for GoalEnv families)
    reward: Any
    terminated: Any
    truncated: Any
    info: Dict[str, Any]
    rng: Any             # per-instance jax PRNG key
    goal: Any            # desired goal (family-specific shape; () if unused)
    steps: Any           # steps since last reset (TimeLimit counter)
    aux: Dict[str, Any]  # family-specific extras (e.g. tasks_to_complete mask)


class FunctionalEnv:
    """Base for all env families. Subclasses implement initial/reset/step as
    pure functions of (state, ...); they must be trace-safe (no Python control
    flow on traced values)."""

    # Gymnasium-compatible spaces (host-side objects, built at construction)
    observation_space = None
    action_space = None
    # reference metadata mirror (render_fps asserted reference robot_env.py:83-85)
    metadata: Dict[str, Any] = {"render_modes": []}
    max_episode_steps: Optional[int] = None

    def initial(self, rng) -> EnvState:
        raise NotImplementedError

    def reset(self, state: EnvState, rng) -> EnvState:
        raise NotImplementedError

    def step(self, state: EnvState, action) -> EnvState:
        raise NotImplementedError

    def __reduce__(self):
        # Envs made via registry.make pickle as their make() arguments and
        # rebuild on load (reference EzPickle semantics: constructor-arg
        # reconstruction, tests/test_envs.py:158-172). Directly-constructed
        # envs fall back to default pickling.
        spec = getattr(self, "_make_spec", None)
        if spec is not None:
            from gymnasium_robotics_tpu import registry

            return (registry.remake, (spec,))
        return super().__reduce__()


class GoalEnv(FunctionalEnv):
    """Multi-goal API (reference gymnasium_robotics/core.py:8-115): obs is a
    dict {observation, achieved_goal, desired_goal}; reward/termination/
    truncation are pure functions of (achieved_goal, desired_goal, info) so
    they can be recomputed under goal substitution (HER) on-device."""

    def compute_reward(self, achieved_goal, desired_goal, info):
        raise NotImplementedError

    def compute_terminated(self, achieved_goal, desired_goal, info):
        raise NotImplementedError

    def compute_truncated(self, achieved_goal, desired_goal, info):
        return jnp.zeros(jnp.shape(achieved_goal)[:-1], bool)


def auto_reset(env: FunctionalEnv, state: EnvState, action) -> EnvState:
    """Step with masked in-step auto-reset (replaces the reference's Python
    retry/TimeLimit wrappers, robot_env.py:154-186): when an episode ended on
    the PREVIOUS step, the transition is replaced by a reset transition."""
    stepped = env.step(state, action)
    steps = stepped.steps
    truncated = stepped.truncated
    if env.max_episode_steps is not None:
        truncated = truncated | (steps >= env.max_episode_steps)

    # divergence guard (the MuJoCo mjWARN_BADQACC autoreset, engine.c's
    # mj_warning path): a non-finite or exploding state ends the episode as
    # truncated and the slot resets — without this a single diverged env in a
    # batch stays NaN forever (no done signal ever fires)
    data = stepped.data
    bad = jnp.zeros_like(truncated)
    if data is not None and getattr(data, "qacc", None) is not None \
            and data.qacc.size:
        q_mag = jnp.max(jnp.abs(data.qacc)) + jnp.max(jnp.abs(data.qpos))
        bad = ~jnp.isfinite(q_mag) | (q_mag > 1e10)
        truncated = truncated | bad
    stepped = dataclasses.replace(stepped, truncated=truncated)

    done = stepped.terminated | truncated
    rng, reset_rng = jax.random.split(state.rng)
    fresh = env.reset(dataclasses.replace(stepped, rng=rng), reset_rng)

    def pick(a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.where(
                jnp.reshape(done, done.shape + (1,) * (x.ndim - done.ndim)), x, y
            ),
            a, b,
        )

    out = pick(fresh, stepped)
    # reward/terminated/truncated of the *transition* are reported even when
    # the state was auto-reset (standard vectorized-env semantics)
    info = stepped.info
    if isinstance(state.info, dict) and "diverged" in state.info:
        # Surface the divergence event (advisor finding r2): the reference
        # engine resets mjData on mjWARN_BADQACC *without* a done signal;
        # here the episode ends as truncated, and info['diverged'] lets
        # consumers tell it apart from TimeLimit truncation. The key is
        # created at the batch boundary (adapters/rollout via with_diverged)
        # so per-family info pytrees stay untouched and scan carries are
        # structure-stable.
        info = dict(info)
        info["diverged"] = bad
    return dataclasses.replace(
        out,
        reward=stepped.reward,
        terminated=stepped.terminated,
        truncated=truncated,
        info=info,
    )


def with_diverged(state: EnvState) -> EnvState:
    """Opt a freshly-initialized state into divergence reporting: adds a
    ``diverged`` flag to ``info`` that auto_reset keeps updated."""
    info = dict(state.info)
    info["diverged"] = jnp.zeros(jnp.shape(state.truncated), bool)
    return dataclasses.replace(state, info=info)
