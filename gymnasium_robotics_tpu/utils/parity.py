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
    if name == "HandReachEnv":
        return _hand_reach_values(env, np_random)
    if "HandManipulate" in name:
        return _hand_manipulate_values(env, np_random)
    if name.startswith("AdroitHand"):
        return _adroit_values(env, np_random)
    if name == "KitchenEnv":
        return _kitchen_noise(env, np_random)
    return None


def sample_step_values(env, np_random: np.random.Generator):
    """Families whose reference draws randomness during STEP: the kitchen
    adds observation noise in every _get_obs (franka_env.py:118-127,
    kitchen_env.py:376-385). Returns the value dict for
    ``env.step_with_values`` or None."""
    if type(env).__name__ == "KitchenEnv":
        return _kitchen_noise(env, np_random)
    return None


# --- host-side float64 rotation helpers, formula-identical to the
# reference's utils/rotations.py:140-160 (euler2quat, 'xyz' convention,
# wxyz quats) and :280-304 (quat_mul) ---

def _euler2quat(euler):
    """Bitwise copy of the reference convention (rotations.py:140-160):
    note the reversed/negated angle mapping and component permutation."""
    euler = np.asarray(euler, np.float64)
    ai, aj, ak = euler[2] / 2, -euler[1] / 2, euler[0] / 2
    si, sj, sk = np.sin(ai), np.sin(aj), np.sin(ak)
    ci, cj, ck = np.cos(ai), np.cos(aj), np.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    return np.array(
        [cj * cc + sj * ss, cj * cs - sj * sc,
         -(cj * ss + sj * cc), cj * sc - sj * cs]
    )


def _quat_mul(q1, q0):
    w0, x0, y0, z0 = q0
    w1, x1, y1, z1 = q1
    return np.array(
        [
            w1 * w0 - x1 * x0 - y1 * y0 - z1 * z0,
            w1 * x0 + x1 * w0 + y1 * z0 - z1 * y0,
            w1 * y0 - x1 * z0 + y1 * w0 + z1 * x0,
            w1 * z0 + x1 * y0 - y1 * x0 + z1 * w0,
        ]
    )


def _quat_from_angle_and_axis(angle, axis):
    """manipulate.py:12-18: normalized axis, normalized quat."""
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    quat = np.concatenate([[np.cos(angle / 2.0)], np.sin(angle / 2.0) * axis])
    return quat / np.linalg.norm(quat)


_PARALLEL_QUATS = None


def _parallel_quats():
    """manipulate.py construction: euler2quat over get_parallel_rotations()
    (the 24 axis-aligned rotations, reference rotations.py:394-408)."""
    global _PARALLEL_QUATS
    if _PARALLEL_QUATS is None:
        from gymnasium_robotics_tpu.utils import rotations

        _PARALLEL_QUATS = [
            _euler2quat(np.asarray(r, np.float64))
            for r in rotations.get_parallel_rotations()
        ]
    return _PARALLEL_QUATS


def _hand_reach_values(env, rng: np.random.Generator):
    """reach.py:99-126 draw order: finger choice, meeting-point normal noise,
    10% revert-to-initial draw."""
    import jax

    finger_names = [
        "robot0:S_fftip", "robot0:S_mftip", "robot0:S_rftip", "robot0:S_lftip",
    ]
    finger_name = rng.choice(finger_names)
    finger_idx = finger_names.index(finger_name)
    thumb_idx = 4
    palm = np.asarray(jax.device_get(env._palm_xpos), np.float64)
    initial_goal = np.asarray(jax.device_get(env._initial_goal), np.float64)
    meeting = palm + np.array([0.0, -0.09, 0.05])
    meeting = meeting + rng.normal(scale=0.005, size=3)
    goal = initial_goal.copy().reshape(-1, 3)
    for idx in (thumb_idx, finger_idx):
        direction = meeting - goal[idx]
        direction /= np.linalg.norm(direction)
        goal[idx] = meeting - 0.005 * direction
    if rng.uniform() < 0.1:
        goal = initial_goal.copy().reshape(-1, 3)
    return {"goal": goal.reshape(-1)}


def _hand_manipulate_values(env, rng: np.random.Generator):
    """manipulate.py:172-202 (_reset_sim object randomization: rotation by
    target_rotation mode, THEN position normal noise) followed by :226-279
    (_sample_goal: position offset, then goal-quat mode draws). The settle
    between them consumes no RNG."""
    import jax

    init_q = np.asarray(jax.device_get(env._init_qpos), np.float64)
    qadr = int(env._obj_qadr)
    pos0 = init_q[qadr:qadr + 3].copy()
    quat0 = init_q[qadr + 3:qadr + 7].copy()
    tr = env.target_rotation
    if env.randomize_initial_rotation:
        if tr == "z":
            angle = rng.uniform(-np.pi, np.pi)
            quat0 = _quat_mul(
                quat0, _quat_from_angle_and_axis(angle, [0.0, 0.0, 1.0])
            )
        elif tr == "parallel":
            angle = rng.uniform(-np.pi, np.pi)
            zq = _quat_from_angle_and_axis(angle, [0.0, 0.0, 1.0])
            pq = _parallel_quats()[rng.integers(len(_parallel_quats()))]
            quat0 = _quat_mul(quat0, _quat_mul(zq, pq))
        elif tr in ("xyz", "ignore"):
            angle = rng.uniform(-np.pi, np.pi)
            axis = rng.uniform(-1.0, 1.0, size=3)
            quat0 = _quat_mul(quat0, _quat_from_angle_and_axis(angle, axis))
    if env.randomize_initial_position and env.target_position != "fixed":
        pos0 = pos0 + rng.normal(size=3, scale=0.005)
    quat0 /= np.linalg.norm(quat0)

    goal_offset = np.zeros(3)
    if env.target_position == "random":
        tpr = np.asarray(jax.device_get(env.target_position_range), np.float64)
        goal_offset = rng.uniform(tpr[:, 0], tpr[:, 1])
    goal_quat = np.array([1.0, 0.0, 0.0, 0.0])
    if tr == "z":
        goal_quat = _quat_from_angle_and_axis(
            rng.uniform(-np.pi, np.pi), [0.0, 0.0, 1.0]
        )
    elif tr == "parallel":
        goal_quat = _quat_from_angle_and_axis(
            rng.uniform(-np.pi, np.pi), [0.0, 0.0, 1.0]
        )
        pq = _parallel_quats()[rng.integers(len(_parallel_quats()))]
        goal_quat = _quat_mul(goal_quat, pq)
    elif tr == "xyz":
        angle = rng.uniform(-np.pi, np.pi)
        axis = rng.uniform(-1.0, 1.0, size=3)
        goal_quat = _quat_from_angle_and_axis(angle, axis)
    return {
        "obj_qpos7": np.concatenate([pos0, quat0]),
        "goal_offset": goal_offset,
        "goal_quat": goal_quat,
    }


def _adroit_values(env, rng: np.random.Generator):
    """reset_model draw orders: adroit_door.py:359-371, adroit_hammer.py:374,
    adroit_pen.py:380-383, adroit_relocate.py:354-369."""
    task = env.task
    if task == "door":
        return {
            "door_body_pos": np.array(
                [
                    rng.uniform(low=-0.3, high=-0.2),
                    rng.uniform(low=0.25, high=0.35),
                    rng.uniform(low=0.252, high=0.35),
                ]
            )
        }
    if task == "hammer":
        return {"board_z": rng.uniform(low=0.1, high=0.25)}
    if task == "pen":
        desired_orien = np.zeros(3)
        desired_orien[0] = rng.uniform(low=-1, high=1)
        desired_orien[1] = rng.uniform(low=-1, high=1)
        return {"target_quat": _euler2quat(desired_orien)}
    if task == "relocate":
        return {
            "obj_xy": np.array(
                [
                    rng.uniform(low=-0.15, high=0.15),
                    rng.uniform(low=-0.15, high=0.3),
                ]
            ),
            "target_pos": np.array(
                [
                    rng.uniform(low=-0.2, high=0.2),
                    rng.uniform(low=-0.2, high=0.2),
                    rng.uniform(low=0.15, high=0.35),
                ]
            ),
        }
    return None


def _kitchen_noise(env, rng: np.random.Generator):
    """franka_env.py:118-127 then kitchen_env.py:376-385: robot qpos noise,
    robot qvel noise, object qpos noise, object qvel noise — raw U(-1,1)
    vectors; amplitude scaling happens on device."""
    nq = env.model.nq
    nv = env.model.meta.nv
    return {
        "robot_pos": rng.uniform(low=-1.0, high=1.0, size=9),
        "robot_vel": rng.uniform(low=-1.0, high=1.0, size=9),
        "obj_pos": rng.uniform(low=-1.0, high=1.0, size=nq - 9),
        "obj_vel": rng.uniform(low=-1.0, high=1.0, size=nv - 9),
    }


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
