"""Benchmark harness: batched env-steps/s on the available accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline: the reference publishes no numbers (BASELINE.md); its practical
single-sim rate for these families is ~1e4-1e5 steps/s on CPU. We report
against the BASELINE.json north-star of 10,000 batched env instances stepping
per chip: vs_baseline = measured env-steps/s / (10_000 * control_rate), i.e.
>1.0 means the chip sustains >10k instances at the family's control rate.
"""

import json
import time

import jax
import numpy as np


def bench_env(env_id: str, num_envs: int, steps: int = 200, repeats: int = 3):
    """Scan-based on-device rollout: one device program for the whole
    collection loop, so host<->device latency is paid per rollout, not per
    step (the reference pays one FFI crossing per mj_step)."""
    from gymnasium_robotics_tpu import registry
    from gymnasium_robotics_tpu.parallel import rollout as R

    env = registry.make(env_id)
    return R.rollout_steps_per_sec(env, num_envs, steps, repeats=repeats)


def main():
    env_id = "PointMaze_UMaze-v3"
    num_envs = 8192
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    if platform == "cpu":
        num_envs = 1024
    sps = bench_env(env_id, num_envs)
    # control rate for PointMaze is 10 Hz agent rate at dt=0.01 & frame_skip=1
    # => "10k instances realtime" target = 10_000 * (1/dt) steps/s? The
    # BASELINE metric is env-steps/s/chip; report instances-at-realtime ratio
    # against 10k instances each stepping at its control rate (100 steps/s).
    target = 10_000 * 100.0
    print(
        json.dumps(
            {
                "metric": f"env_steps_per_s[{env_id} x{num_envs} {platform}]",
                "value": round(sps, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(sps / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
