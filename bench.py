"""Benchmark harness: batched env-steps/s per family on the available chip.

Prints ONE JSON line for the headline metric (FetchPush-v4, named by
BASELINE.json's metric: "env-steps/s/chip per task family (FetchPush,
HandManipulateBlock)") and writes BENCH_DETAIL.json with every family.

vs_baseline: the reference publishes no numbers (BASELINE.md); BASELINE.json's
north star is >= 10,000 batched env instances per chip at each family's
control rate. vs_baseline = measured env-steps/s / (10_000 * control_hz), so
1.0 == 10k instances running at the family's real-time control rate.
"""

import json
import time

import jax
import numpy as np

# (env_id, num_envs, rollout_steps, control_hz)
BENCHES = [
    ("FetchPush-v4", 4096, 50, 25.0),
    ("HandManipulateBlockRotateXYZ-v1", 2048, 50, 25.0),
    ("PointMaze_UMaze-v3", 8192, 200, 100.0),
    ("AntMaze_UMaze-v5", 2048, 100, 20.0),
    ("HalfCheetah-v5", 4096, 100, 20.0),
]


def bench_env(env_id: str, num_envs: int, steps: int, repeats: int = 2):
    from gymnasium_robotics_tpu import registry
    from gymnasium_robotics_tpu.parallel import rollout as R

    env = registry.make(env_id)
    return R.rollout_steps_per_sec(env, num_envs, steps, repeats=repeats)


def main():
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    cpu = platform == "cpu"
    detail = {}
    headline = None
    for env_id, num_envs, steps, hz in BENCHES:
        if cpu:
            num_envs = max(num_envs // 16, 64)
        try:
            t0 = time.perf_counter()
            sps = bench_env(env_id, num_envs, steps)
            detail[env_id] = {
                "env_steps_per_s": round(sps, 1),
                "num_envs": num_envs,
                "vs_10k_realtime": round(sps / (10_000 * hz), 4),
                "wall_s": round(time.perf_counter() - t0, 1),
            }
            if headline is None:
                headline = (env_id, num_envs, sps, hz)
        except Exception as e:  # keep the harness robust: report what ran
            detail[env_id] = {"error": f"{type(e).__name__}: {e}"[:300]}
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump({"platform": platform, "benches": detail}, f, indent=2)
    if headline is None:
        print(json.dumps({"metric": "bench_failed", "value": 0, "unit": "",
                          "vs_baseline": 0}))
        return
    env_id, num_envs, sps, hz = headline
    print(
        json.dumps(
            {
                "metric": f"env_steps_per_s[{env_id} x{num_envs} {platform}]",
                "value": round(sps, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(sps / (10_000 * hz), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
