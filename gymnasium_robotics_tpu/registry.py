"""Environment registry: the analogue of the reference's 106 ``register()``
calls producing 194 env IDs (gymnasium_robotics/__init__.py:12-1261).

``make(id, num_envs=N)`` returns a jit/vmap BatchedEnv; ``make(id)`` returns a
single functional env; ``make_gym(id)`` returns a Gymnasium-API adapter so
users of the reference can switch without code changes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional


@dataclasses.dataclass
class EnvSpec:
    id: str
    entry_point: Callable[..., Any]
    kwargs: Dict[str, Any]
    max_episode_steps: Optional[int]


registry: Dict[str, EnvSpec] = {}


def register(id: str, entry_point, max_episode_steps=None, kwargs=None):
    registry[id] = EnvSpec(
        id=id,
        entry_point=entry_point,
        kwargs=dict(kwargs or {}),
        max_episode_steps=max_episode_steps,
    )


def spec(id: str) -> EnvSpec:
    if id not in registry:
        # lazy-registration hook
        from gymnasium_robotics_tpu import envs  # noqa: F401

        envs.register_all()
    if id not in registry:
        raise KeyError(
            f"Unknown env id {id!r}. Known: {sorted(registry)[:20]} ..."
        )
    return registry[id]


def make(id: str, num_envs: Optional[int] = None, **kwargs):
    """Create an env. With num_envs: a BatchedEnv stepping num_envs instances
    in lockstep under jit/vmap (the TPU-native default). Without: the raw
    functional env."""
    s = spec(id)
    kw = {**s.kwargs, **kwargs}
    env = s.entry_point(**kw)
    if s.max_episode_steps is not None and env.max_episode_steps is None:
        env.max_episode_steps = s.max_episode_steps
    env._make_spec = ("fn", id, dict(kwargs))
    if num_envs is None:
        return env
    from gymnasium_robotics_tpu.envs.batched import BatchedEnv

    benv = BatchedEnv(env, num_envs)
    benv._make_spec = ("batched", id, dict(kwargs), num_envs)
    return benv


def make_gym(id: str, parity: bool = False, render_mode=None, **kwargs):
    """Gymnasium-API (numpy, stateful) adapter for reference compatibility.
    ``parity=True`` enables the reference-exact RNG mode: reset randomness is
    drawn host-side in the reference's NumPy Generator order so seeded
    rollouts track the reference trajectory (utils/parity.py)."""
    from gymnasium_robotics_tpu.envs.adapters import GymAdapter

    env = GymAdapter(make(id, **kwargs), render_mode=render_mode, parity=parity)
    env._make_spec = ("gym", id, dict(kwargs), parity, render_mode)
    return env


def remake(spec_tuple):
    """Reconstruct an env from its ``_make_spec`` (the pickle path: envs made
    through the registry pickle as their make() arguments and rebuild on
    load, the analogue of the reference's EzPickle constructor-arg pickling,
    reference core.py / tests/test_envs.py:158-172)."""
    kind = spec_tuple[0]
    if kind == "gym":
        _, id, kwargs, parity, render_mode = spec_tuple
        return make_gym(id, parity=parity, render_mode=render_mode, **kwargs)
    if kind == "batched":
        _, id, kwargs, num_envs = spec_tuple
        return make(id, num_envs=num_envs, **kwargs)
    _, id, kwargs = spec_tuple
    return make(id, **kwargs)


def ids():
    from gymnasium_robotics_tpu import envs

    envs.register_all()
    return sorted(registry)
