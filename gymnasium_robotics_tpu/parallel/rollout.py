"""Scan-based on-device rollouts and mesh sharding — the framework's scale-out
layer (SURVEY.md §2.4: env-batch DP over jax.sharding; trajectory egress via a
single device->host transfer per rollout instead of per step).

The reference steps one env per Python call through FFI; here `rollout` runs T
steps of N envs as ONE device program (lax.scan over time, vmap over envs), so
host<->device latency is paid once per trajectory, not once per step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu import core


def make_mesh(n_devices: Optional[int] = None, axis: str = "env"):
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def env_sharding(mesh, axis: str = "env"):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis))


_ROLLOUT_CACHE = {}


def rollout(
    env: core.FunctionalEnv,
    num_envs: int,
    num_steps: int,
    policy: Optional[Callable] = None,
    rng=None,
    sharding=None,
    collect=("obs", "reward", "terminated", "truncated"),
):
    """Run a full rollout on device; returns (final_state, trajectory dict).

    policy(rng, obs) -> actions; defaults to uniform random in action space.
    With `sharding`, the env batch is laid out across the mesh and the whole
    scan runs SPMD (collectives only at user-initiated metric reductions).
    """
    rng = jax.random.key(0) if rng is None else rng
    # key on the objects themselves (strong refs): prevents a recycled id()
    # from hitting a stale compiled rollout closed over a dead env
    cache_key = (env, num_envs, num_steps, policy, sharding, collect)
    if cache_key in _ROLLOUT_CACHE:
        return _ROLLOUT_CACHE[cache_key](rng)
    lo = jnp.asarray(env.action_space.low)
    hi = jnp.asarray(env.action_space.high)

    if policy is None:
        def policy(prng, obs):
            return jax.random.uniform(
                prng, (num_envs,) + env.action_space.shape, jnp.float32,
            ) * (hi - lo) + lo

    step_batch = jax.vmap(functools.partial(core.auto_reset, env))

    def scan_fn(carry, _):
        state, prng = carry
        prng, a_rng = jax.random.split(prng)
        actions = policy(a_rng, state.obs)
        state = step_batch(state, actions)
        out = {k: getattr(state, k) for k in collect}
        return (state, prng), out

    @jax.jit
    def run(rng):
        r_init, r_scan = jax.random.split(rng)
        state = core.with_diverged(
            jax.vmap(env.initial)(jax.random.split(r_init, num_envs))
        )
        if sharding is not None:
            state = jax.lax.with_sharding_constraint(state, sharding)
        (state, _), traj = jax.lax.scan(
            scan_fn, (state, r_scan), None, length=num_steps
        )
        return state, traj

    _ROLLOUT_CACHE[cache_key] = run
    return run(rng)


def rollout_steps_per_sec(env, num_envs, num_steps, sharding=None, repeats=3):
    """Benchmark helper: compiled once, timed over `repeats` runs."""
    import time

    rng = jax.random.key(0)
    # warmup/compile
    state, traj = rollout(env, num_envs, num_steps, rng=rng, sharding=sharding)
    jax.block_until_ready(state.reward)
    t0 = time.perf_counter()
    for i in range(repeats):
        state, traj = rollout(
            env, num_envs, num_steps, rng=jax.random.key(i + 1), sharding=sharding
        )
        jax.block_until_ready(state.reward)
    dt = time.perf_counter() - t0
    return num_envs * num_steps * repeats / dt
