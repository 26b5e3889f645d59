"""Public MaMuJoCo entry point (mirrors gymnasium_robotics/mamujoco_v1.py:1-6)."""
from gymnasium_robotics_tpu.envs.mamujoco.mujoco_multi import (  # noqa: F401
    MultiAgentMujocoEnv, env, parallel_env, raw_parallel_env,
)
