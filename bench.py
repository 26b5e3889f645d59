"""Benchmark harness: batched env-steps/s per family on the available chip.

Prints ONE JSON line for the headline metric and writes BENCH_DETAIL.json with
every family. Designed to survive a driver-side kill (round-1 lesson: rc=124
lost everything): the headline line is printed and flushed AS SOON AS the
flagship family completes, and BENCH_DETAIL.json is rewritten incrementally
after every family, so a timeout mid-run still leaves full artifacts.

Each family runs in its own subprocess with a hard timeout, so a wedged
compile service cannot hang the harness.

vs_baseline: the reference publishes no performance numbers (BASELINE.md);
BASELINE.json's north star is >= 10,000 batched env instances per chip at the
family's control rate. vs_baseline = env-steps/s / (10_000 * control_hz).
"""

import json
import os
import subprocess
import sys
import time

# (env_id, num_envs, rollout_steps, control_hz) — flagship first: its result
# is the headline and is printed immediately. Batch sizes picked from the
# round-2 probe sweep (tools/tpu_probe_results.jsonl): throughput per env is
# flat-to-declining past these sizes on a single v5e.
BENCHES = [
    ("PointMaze_UMaze-v3", 8192, 200, 100.0),
    ("FetchPush-v4", 2048, 30, 25.0),
    ("HandManipulateBlockRotateXYZ-v1", 1024, 20, 25.0),
    ("AntMaze_UMaze-v5", 2048, 50, 20.0),
    ("HalfCheetah-v5", 8192, 100, 20.0),
    ("AdroitHandDoor-v1", 1024, 20, 100.0),
    ("FrankaKitchen-v1", 512, 10, 12.5),
]

_CHILD = r"""
import json, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
env_id, num_envs, steps, mode = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
from gymnasium_robotics_tpu import registry
if mode == "scan":
    from gymnasium_robotics_tpu.parallel import rollout as R
    env = registry.make(env_id)
    sps = R.rollout_steps_per_sec(env, num_envs, steps, repeats=2)
else:
    import contextlib, os
    import numpy as np
    from gymnasium_robotics_tpu.parallel import profiling
    env = registry.make(env_id, num_envs=num_envs)
    env.reset(seed=0)
    a = np.zeros((num_envs,) + env.action_space.shape, np.float32)
    out = env.step(a); jax.block_until_ready(jax.tree_util.tree_leaves(out[0])[0])
    # BENCH_TRACE=<dir>: capture an XProf device trace of the timed loop
    tracer = (profiling.trace(os.environ["BENCH_TRACE"])
              if os.environ.get("BENCH_TRACE") else contextlib.nullcontext())
    timer = profiling.StepTimer(num_envs)
    with tracer:
        timer.reset()
        for _ in range(steps):
            out = env.step(a)
            timer.tick()
        jax.block_until_ready(jax.tree_util.tree_leaves(out[0])[0])
    sps = timer.steps_per_sec
print("RESULT " + json.dumps({"sps": sps}))
"""


def bench_family(env_id, num_envs, steps, timeout_s):
    # steploop only: identical steady-state throughput to the scan mode on
    # this stack, compiles faster through the remote-compile service, and
    # avoids the large-scan-body device fault (CLAUDE.md). After a timeout,
    # wait for the device grant to recycle before the next family.
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, env_id, str(num_envs), str(steps),
             "steploop"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                time.sleep(20)  # give the exiting child's grant time to clear
                return json.loads(line[len("RESULT "):])["sps"], "steploop"
        time.sleep(20)
    except subprocess.TimeoutExpired:
        time.sleep(120)  # let the wedged grant recycle before the next family
    return None, None


def _flush_detail(platform, detail):
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump({"platform": platform, "benches": detail}, f, indent=2)


def main():
    platform = "tpu" if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",) else "cpu"
    cpu = platform == "cpu"
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 2400))
    start = time.perf_counter()
    detail = {}
    headline_printed = False
    for env_id, num_envs, steps, hz in BENCHES:
        elapsed = time.perf_counter() - start
        if elapsed > budget_s:
            detail[env_id] = {"skipped": "global bench budget exhausted"}
            _flush_detail(platform, detail)
            continue
        if cpu:
            num_envs = max(num_envs // 16, 64)
        # per-family cap: a single wedged family (device-grant hang) must not
        # starve the rest of the ladder; the flagship gets the larger slice
        # because the headline depends on it
        family_timeout = min(
            max(budget_s - elapsed, 300 if headline_printed else 900),
            900 if headline_printed else 1200,
        )
        t0 = time.perf_counter()
        sps, mode = bench_family(env_id, num_envs, steps, timeout_s=family_timeout)
        if sps is None:
            detail[env_id] = {"error": "timeout (compile service?)"}
            _flush_detail(platform, detail)
            continue
        detail[env_id] = {
            "env_steps_per_s": round(sps, 1),
            "num_envs": num_envs,
            "mode": mode,
            "vs_10k_realtime": round(sps / (10_000 * hz), 4),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        _flush_detail(platform, detail)
        if not headline_printed:
            print(
                json.dumps(
                    {
                        "metric": f"env_steps_per_s[{env_id} x{num_envs} {platform}]",
                        "value": round(sps, 1),
                        "unit": "env-steps/s/chip",
                        "vs_baseline": round(sps / (10_000 * hz), 3),
                    }
                ),
                flush=True,
            )
            headline_printed = True
    if not headline_printed:
        print(json.dumps({"metric": "bench_failed_compile_service", "value": 0,
                          "unit": "env-steps/s/chip", "vs_baseline": 0}),
              flush=True)


if __name__ == "__main__":
    main()
