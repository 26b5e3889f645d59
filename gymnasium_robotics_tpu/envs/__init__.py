"""Env family registrations — mirrors the ID set of the reference registry
(gymnasium_robotics/__init__.py:12-1261, 194 IDs: sparse/dense doubling etc.).
Families register here as they are implemented; register_all() is idempotent.
"""

from __future__ import annotations

from gymnasium_robotics_tpu.registry import register, registry

_registered = False


def register_all():
    global _registered
    if _registered:
        return
    _registered = True
    _register_point_maze()
    _register_ant_maze()
    _register_fetch()
    _register_hand()
    _register_adroit()
    _register_kitchen()
    _register_locomotion()


def _register_point_maze():
    from gymnasium_robotics_tpu.envs.maze import maps
    from gymnasium_robotics_tpu.envs.maze.point_maze import PointMazeEnv

    maze_set = {
        "UMaze": (maps.U_MAZE, 300),
        "Open": (maps.OPEN, 300),
        "Open_Diverse_G": (maps.OPEN_DIVERSE_G, 300),
        "Open_Diverse_GR": (maps.OPEN_DIVERSE_GR, 300),
        "Medium": (maps.MEDIUM_MAZE, 600),
        "Medium_Diverse_G": (maps.MEDIUM_MAZE_DIVERSE_G, 600),
        "Medium_Diverse_GR": (maps.MEDIUM_MAZE_DIVERSE_GR, 600),
        "Large": (maps.LARGE_MAZE, 800),
        "Large_Diverse_G": (maps.LARGE_MAZE_DIVERSE_G, 800),
        "Large_Diverse_GR": (maps.LARGE_MAZE_DIVERSE_GR, 800),
    }
    for name, (mmap, steps) in maze_set.items():
        for suffix, reward_type in (("", "sparse"), ("Dense", "dense")):
            register(
                id=f"PointMaze_{name}{suffix}-v3",
                entry_point=PointMazeEnv,
                max_episode_steps=steps,
                kwargs={"maze_map": mmap, "reward_type": reward_type},
            )


def _register_ant_maze():
    try:
        from gymnasium_robotics_tpu.envs.maze.ant_maze import AntMazeEnv
    except ImportError:
        return
    from gymnasium_robotics_tpu.envs.maze import maps

    maze_set = {
        "UMaze": (maps.U_MAZE, 700),
        "Open": (maps.OPEN, 700),
        "Open_Diverse_G": (maps.OPEN_DIVERSE_G, 700),
        "Open_Diverse_GR": (maps.OPEN_DIVERSE_GR, 700),
        "Medium": (maps.MEDIUM_MAZE, 1000),
        "Medium_Diverse_G": (maps.MEDIUM_MAZE_DIVERSE_G, 1000),
        "Medium_Diverse_GR": (maps.MEDIUM_MAZE_DIVERSE_GR, 1000),
        "Large": (maps.LARGE_MAZE, 1000),
        "Large_Diverse_G": (maps.LARGE_MAZE_DIVERSE_G, 1000),
        "Large_Diverse_GR": (maps.LARGE_MAZE_DIVERSE_GR, 1000),
    }
    for ver in ("v3", "v4", "v5"):
        for name, (mmap, steps) in maze_set.items():
            for suffix, reward_type in (("", "sparse"), ("Dense", "dense")):
                register(
                    id=f"AntMaze_{name}{suffix}-{ver}",
                    entry_point=AntMazeEnv,
                    max_episode_steps=steps,
                    kwargs={
                        "maze_map": mmap,
                        "reward_type": reward_type,
                        "version": ver,
                    },
                )


def _register_fetch():
    try:
        from gymnasium_robotics_tpu.envs.fetch import (
            FetchPickAndPlaceEnv, FetchPushEnv, FetchReachEnv, FetchSlideEnv,
        )
    except ImportError:
        return
    for name, cls in {
        "FetchReach": FetchReachEnv,
        "FetchPush": FetchPushEnv,
        "FetchSlide": FetchSlideEnv,
        "FetchPickAndPlace": FetchPickAndPlaceEnv,
    }.items():
        # v1 is the reference's mujoco_py-binding twin of v4
        # (gymnasium_robotics/__init__.py:19-96); one implementation here
        for ver in ("v1", "v4"):
            for suffix, reward_type in (("", "sparse"), ("Dense", "dense")):
                register(
                    id=f"{name}{suffix}-{ver}",
                    entry_point=cls,
                    max_episode_steps=50,
                    kwargs={"reward_type": reward_type},
                )


def _register_locomotion():
    """Single-agent locomotion IDs: the MaMuJoCo base scenarios (v5
    semantics) plus the legacy v2/v3 re-registrations with their FROZEN
    mujoco_py-era obs/reward conventions (reference
    gymnasium_robotics/__init__.py:1123-1261, envs/mujoco/*_v{2,3}.py —
    structural semantics implemented in locomotion/legacy.py; mujoco_py
    bitwise behavior remains out of scope, SURVEY.md §7 step 7)."""
    try:
        from gymnasium_robotics_tpu.envs.locomotion import classic as C
        from gymnasium_robotics_tpu.envs.locomotion import legacy as LG
        from gymnasium_robotics_tpu.envs.locomotion import locomotion as L
    except ImportError:
        return

    makers = {
        "Ant": (L.make_ant, 1000),
        "HalfCheetah": (L.make_half_cheetah, 1000),
        "Hopper": (L.make_hopper, 1000),
        "Walker2d": (L.make_walker2d, 1000),
        "Swimmer": (L.make_swimmer, 1000),
        "Humanoid": (C.make_humanoid, 1000),
        "HumanoidStandup": (C.make_humanoid_standup, 1000),
        "InvertedPendulum": (C.make_inverted_pendulum, 1000),
        "InvertedDoublePendulum": (C.make_inverted_double_pendulum, 1000),
        "Reacher": (C.make_reacher, 50),
        "Pusher": (C.make_pusher, 100),
    }
    for name, (maker, steps) in makers.items():
        register(
            id=f"{name}-v5",
            entry_point=maker,
            max_episode_steps=steps,
            kwargs={},
        )
    for name, (maker, versions, steps) in LG.LEGACY_REGISTRY.items():
        for ver in versions:
            register(
                id=f"{name}-{ver}",
                entry_point=maker,
                max_episode_steps=steps,
                kwargs={"version": ver},
            )


def _register_hand():
    try:
        from gymnasium_robotics_tpu.envs.hand import register_hand_envs
    except ImportError:
        return
    register_hand_envs(register)


def _register_adroit():
    try:
        from gymnasium_robotics_tpu.envs.adroit import register_adroit_envs
    except ImportError:
        return
    register_adroit_envs(register)


def _register_kitchen():
    try:
        from gymnasium_robotics_tpu.envs.kitchen import register_kitchen_envs
    except ImportError:
        return
    register_kitchen_envs(register)
