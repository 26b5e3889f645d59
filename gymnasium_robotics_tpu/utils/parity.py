"""Reference-exact RNG parity mode (SURVEY §7 hard-part 3).

The reference seeds one ``numpy.random.Generator`` per env (gymnasium's
``Env.reset(seed)``) and consumes draws in a family-specific order during
reset (e.g. fetch ``_sample_goal`` fetch_env.py:153-166, maze
``generate_target_goal``/``generate_reset_pos``/``add_xy_position_noise``
maze_v4.py:276-368). On-device sampling uses JAX PRNG keys and can never
reproduce those sequences bitwise — so parity mode samples the reset
randomness on the HOST with a real NumPy Generator in the reference's exact
draw order, then injects the values into the functional reset
(``env.reset_with_values``). The physics afterwards is deterministic, so a
parity-mode rollout tracks the reference trajectory to solver tolerance.

Host-side by design: the reference's RNG lives on the host too, and parity
mode exists for validation (the seeded-rollout contract,
reference tests/test_envs.py:62-117), not for batched training.
"""

from __future__ import annotations

import numpy as np


def sample_reset_values(env, np_random: np.random.Generator, options=None):
    """Draw the reset randomness for ``env`` in the reference's exact order;
    returns the value dict for ``env.reset_with_values`` or None when the
    family has no parity sampler yet."""
    name = type(env).__name__
    if name == "PointMazeEnv" or name == "AntMazeEnv":
        return _maze_values(env, np_random, options)
    if "Fetch" in name:
        return _fetch_values(env, np_random)
    return None


def _maze_values(env, rng: np.random.Generator, options=None):
    """maze_v4.py:276-368: goal cell draw + xy noise, then rejection-sampled
    reset cell + xy noise; explicit goal_cell/reset_cell options replace the
    corresponding cell draws (maze_v4.py:299-358) but keep the noise draws."""
    maze = env.maze
    goal_locs = [np.array(g, np.float64) for g in maze.goal_locations]
    reset_locs = [np.array(r, np.float64) for r in maze.reset_locations]
    scale = maze.size_scaling
    nr = getattr(env, "position_noise_range", 0.25)
    options = options or {}

    def add_noise(xy):
        xy = xy.copy()
        xy[0] += rng.uniform(-nr, nr) * scale
        xy[1] += rng.uniform(-nr, nr) * scale
        return xy

    if options.get("goal_cell") is not None:
        goal = np.asarray(
            maze.cell_rowcol_to_xy(options["goal_cell"]), np.float64
        )
    else:
        goal = goal_locs[rng.integers(low=0, high=len(goal_locs))].copy()
    goal = add_noise(goal)
    if options.get("reset_cell") is not None:
        reset_pos = np.asarray(
            maze.cell_rowcol_to_xy(options["reset_cell"]), np.float64
        )
    else:
        reset_pos = goal.copy()
        while np.linalg.norm(reset_pos - goal) <= 0.5 * scale:
            reset_pos = reset_locs[
                rng.integers(low=0, high=len(reset_locs))
            ].copy()
    reset_pos = add_noise(reset_pos)
    return {"goal_xy": goal, "reset_xy": reset_pos}


def _fetch_values(env, rng: np.random.Generator):
    """fetch_env.py:376-402 (_reset_sim object placement) then :153-166
    (_sample_goal): object draw order precedes the goal draws."""
    import jax

    grip0 = np.asarray(jax.device_get(env._init_grip), np.float64)
    values = {}
    if env.has_object:
        object_xpos = grip0[:2]
        while np.linalg.norm(object_xpos - grip0[:2]) < 0.1:
            object_xpos = grip0[:2] + rng.uniform(
                -env.obj_range, env.obj_range, size=2
            )
        values["object_xy"] = object_xpos
    goal = grip0[:3] + rng.uniform(
        -env.target_range, env.target_range, size=3
    )
    if env.has_object:
        goal += np.asarray(env.target_offset, np.float64)
        goal[2] = float(env._height_offset)
        if env.target_in_the_air and rng.uniform() < 0.5:
            goal[2] += rng.uniform(0, 0.45)
    values["goal"] = goal
    return values
