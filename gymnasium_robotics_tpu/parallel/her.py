"""On-device HER relabeling over collected trajectories.

The reference establishes the relabeling CONTRACT (reward recomputable under
goal substitution, gymnasium_robotics/core.py:46-66 + README "Multi-goal API")
but leaves the relabeling itself to external replay-buffer code on the host.
Here it runs as a jitted transform over the rollout pytree — no host round
trip between collection and learning.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("compute_reward", "strategy"))
def relabel(
    traj_obs: dict,
    traj_reward,
    rng,
    compute_reward: Callable,
    strategy: str = "future",
):
    """Relabel a (T, B, ...) GoalEnv trajectory with achieved goals.

    traj_obs: dict with 'achieved_goal' and 'desired_goal' of shape (T, B, G).
    strategy: 'future' substitutes the achieved goal of a uniformly sampled
    later step of the same env instance; 'final' uses the last step's.

    Returns (new_obs, new_reward) with substituted desired goals and rewards
    recomputed through the env's pure compute_reward.
    """
    achieved = traj_obs["achieved_goal"]
    T, B = achieved.shape[0], achieved.shape[1]
    if strategy == "final":
        new_goal = jnp.broadcast_to(achieved[-1], achieved.shape)
    elif strategy == "future":
        # uniform over the remaining horizon [t, T-1]: draw u ~ U[0,1) and
        # floor-scale by (T-t). (randint(0,T) % (T-t) is modulo-biased toward
        # small offsets — advisor finding r2.)
        t_idx = jnp.arange(T)[:, None]
        u = jax.random.uniform(rng, (T, B))
        offset = jnp.floor(u * (T - t_idx)).astype(jnp.int32)
        future = jnp.minimum(t_idx + offset, T - 1)
        new_goal = jnp.take_along_axis(
            achieved, future[..., None], axis=0
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    new_reward = compute_reward(achieved, new_goal)
    new_obs = dict(traj_obs)
    new_obs["desired_goal"] = new_goal
    return new_obs, new_reward
