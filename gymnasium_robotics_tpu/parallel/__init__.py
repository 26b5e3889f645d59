"""Parallelism & aux subsystems (SURVEY.md §2.4/§5): scan rollouts + mesh
sharding, multi-host init + collectives, profiling, HER relabeling, and
checkpoint/resume of batched EnvState pytrees."""

from gymnasium_robotics_tpu.parallel import checkpoint, distributed, her, profiling, rollout  # noqa: F401
