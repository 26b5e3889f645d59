"""Benchmark harness: batched env-steps/s per family on the available chip.

Prints the headline JSON line EARLY and REPRINTS it whenever a better flagship
number lands (the driver records the tail of stdout, so the last printed line
wins). Designed around the documented axon failure mode (CLAUDE.md): a wedged
device-grant pool where even a trivial jit hangs. Timeline guarantees:

  t ~= 5 s    a fallback headline line (value 0) is on stdout — rc=124 can no
              longer produce "parsed: null".
  t <= ~90 s  wedge probe verdict (trivial matmul in a subprocess).
  t <= ~5 min first REAL headline from the flagship at a small batch with a
              warm .jax_cache, if the pool grants at all.
  afterwards  flagship upgrade at full batch, then the family ladder; each
              family in its own subprocess with a hard timeout so one wedge
              cannot starve the rest. BENCH_DETAIL.json rewritten after every
              family.

If the probe fails twice, the harness enters a patient recovery loop (probe
every ~8 min) for the remaining budget — the grant recycles server-side and
a later grant still produces a real headline.

vs_baseline: the reference publishes no performance numbers (BASELINE.md);
BASELINE.json's north star is >= 10,000 batched env instances per chip at the
family's control rate. vs_baseline = env-steps/s / (10_000 * control_hz).
"""

import json
import os
import subprocess
import sys
import time

# Flagship: PointMaze. Small batch first (fast compile, fast run) to bank a
# real headline within minutes; full batch afterwards upgrades it.
FLAGSHIP = ("PointMaze_UMaze-v3", 100.0)
FLAGSHIP_SMALL = 1024
FLAGSHIP_FULL = 8192

# (env_id, num_envs, rollout_steps, control_hz) for the rest of the ladder.
# Batch sizes from the round-2 probe sweep (tools/tpu_probe_results.jsonl).
BENCHES = [
    ("FetchPush-v4", 2048, 30, 25.0),
    ("HandManipulateBlockRotateXYZ-v1", 1024, 20, 25.0),
    ("AntMaze_UMaze-v5", 2048, 50, 20.0),
    ("HalfCheetah-v5", 8192, 100, 20.0),
    ("AdroitHandDoor-v1", 1024, 20, 100.0),
    ("FrankaKitchen-v1", 512, 20, 12.5),
]

# Batch-scaling curve (after the ladder, budget permitting): chip
# utilization is the thesis — BENCH_DETAIL records how env-steps/s scales
# with B for the contact-rich families (keys "<env> x<B>").
SCALING = [
    ("HandManipulateBlockRotateXYZ-v1", [2048, 4096], 15, 25.0),
    ("FetchPush-v4", [4096, 8192], 15, 25.0),
]

_PROBE = r"""
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print("PROBE_OK", float((x @ x).block_until_ready().sum()))
"""

_CHILD = r"""
import json, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
env_id, num_envs, steps = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
import contextlib, os
import numpy as np
from gymnasium_robotics_tpu import registry
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
print("RESULT " + json.dumps({"sps": timer.steps_per_sec}))
"""


def _run_child(code, args, timeout_s):
    try:
        out = subprocess.run(
            [sys.executable, "-c", code] + [str(a) for a in args],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return out.stdout
    except subprocess.TimeoutExpired:
        return None


def probe(timeout_s=75):
    out = _run_child(_PROBE, [], timeout_s)
    return out is not None and "PROBE_OK" in out


def bench_family(env_id, num_envs, steps, timeout_s):
    out = _run_child(_CHILD, [env_id, num_envs, steps], timeout_s)
    if out is not None:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                time.sleep(15)  # give the exiting child's grant time to clear
                return json.loads(line[len("RESULT "):])["sps"]
        time.sleep(15)
        return None
    time.sleep(90)  # killed child: let the wedged grant recycle
    return None


class Harness:
    def __init__(self):
        self.platform = (
            "cpu" if os.environ.get("JAX_PLATFORMS", "") == "cpu" else "tpu"
        )
        self.detail = {}
        self.headline = None  # (env_id, num_envs, sps, hz)

    def flush_detail(self):
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump({"platform": self.platform, "benches": self.detail},
                      f, indent=2)

    def print_headline(self):
        if self.headline is None:
            print(json.dumps({
                "metric": "env_steps_per_s[no_result_yet]", "value": 0,
                "unit": "env-steps/s/chip", "vs_baseline": 0}), flush=True)
            return
        env_id, num_envs, sps, hz = self.headline
        print(json.dumps({
            "metric": f"env_steps_per_s[{env_id} x{num_envs} {self.platform}]",
            "value": round(sps, 1),
            "unit": "env-steps/s/chip",
            "vs_baseline": round(sps / (10_000 * hz), 3)}), flush=True)

    def record(self, env_id, num_envs, sps, hz, wall_s, key=None):
        self.detail[key or env_id] = {
            "env_steps_per_s": round(sps, 1), "num_envs": num_envs,
            "vs_10k_realtime": round(sps / (10_000 * hz), 4),
            "wall_s": round(wall_s, 1)}
        self.flush_detail()
        # Per-family line ON STDOUT the moment it lands (VERDICT r4 #1): even
        # an rc=124 tail then carries the whole ladder, not just the flagship.
        print(json.dumps({
            "metric": f"env_steps_per_s[{key or env_id} {self.platform}]",
            "value": round(sps, 1),
            "unit": "env-steps/s/chip",
            "vs_baseline": round(sps / (10_000 * hz), 3)}), flush=True)
        # Follow every family line with the current flagship headline so the
        # LAST stdout line is always the flagship, even on a mid-ladder kill.
        if self.headline is not None and (key or env_id) != (
                f"{self.headline[0]} x{self.headline[1]}"):
            self.print_headline()

    def run_flagship(self, num_envs, steps, timeout_s):
        env_id, hz = FLAGSHIP
        t0 = time.perf_counter()
        sps = bench_family(env_id, num_envs, steps, timeout_s)
        if sps is None:
            self.detail[f"{env_id} x{num_envs}"] = {"error": "timeout"}
            self.flush_detail()
            return False
        self.record(env_id, num_envs, sps, hz, time.perf_counter() - t0,
                    key=f"{env_id} x{num_envs}")
        if self.headline is None or sps > self.headline[2]:
            self.headline = (env_id, num_envs, sps, hz)
            self.print_headline()
        return True


def main():
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 1500))
    start = time.perf_counter()
    h = Harness()
    h.print_headline()  # fallback line: never again "parsed: null"
    h.flush_detail()
    cpu = h.platform == "cpu"

    remaining = lambda: budget_s - (time.perf_counter() - start)

    if not cpu:
        # Wedge fast-path: trivial-jit probe; one grant-recycle retry.
        healthy = probe()
        if not healthy:
            time.sleep(100)
            healthy = probe()
        # Patient recovery: the grant recycles server-side; keep probing with
        # a short-timeout trivial client every ~8 min (CLAUDE.md protocol).
        while not healthy and remaining() > 600:
            time.sleep(480)
            healthy = probe()
        if not healthy:
            return  # fallback line already on stdout

    # Flagship small batch first: bank a real headline ASAP.
    small = max(FLAGSHIP_SMALL // 16, 64) if cpu else FLAGSHIP_SMALL
    h.run_flagship(small, 200, timeout_s=min(420, max(remaining(), 60)))
    # Flagship full batch: upgrades the headline if it completes.
    if remaining() > 420:
        full = max(FLAGSHIP_FULL // 16, 64) if cpu else FLAGSHIP_FULL
        h.run_flagship(full, 200, timeout_s=420)

    for env_id, num_envs, steps, hz in BENCHES:
        if remaining() < 120:
            h.detail[env_id] = {"skipped": "global bench budget exhausted"}
            h.flush_detail()
            continue
        if cpu:
            num_envs = max(num_envs // 16, 64)
        t0 = time.perf_counter()
        # 480 s cap: with a cold .jax_cache (the r5 code reworked every
        # family's HLO) compile alone is 2-4 min for hand/kitchen; the
        # remaining() guard still protects the global budget
        sps = bench_family(env_id, num_envs, steps,
                           timeout_s=min(480, remaining()))
        if sps is None:
            h.detail[env_id] = {"error": "timeout (compile service?)"}
            h.flush_detail()
            continue
        h.record(env_id, num_envs, sps, hz, time.perf_counter() - t0)

    # Ladder complete: pin the flagship headline on stdout BEFORE the
    # optional scaling section, so a timeout inside SCALING still leaves a
    # parsable best-flagship line near the tail.
    h.print_headline()

    # Batch-scaling curve (VERDICT r2 #4): only with generous leftover budget.
    for env_id, batches, steps, hz in SCALING:
        for B in batches:
            if remaining() < 300:
                break
            if cpu:
                B = max(B // 16, 64)
            t0 = time.perf_counter()
            sps = bench_family(env_id, B, steps, timeout_s=min(480, remaining()))
            key = f"{env_id} x{B}"
            if sps is None:
                h.detail[key] = {"error": "timeout or crash"}
                h.flush_detail()
                break  # larger batches of the same family won't fare better
            h.record(env_id, B, sps, hz, time.perf_counter() - t0, key=key)
    # Re-print the headline so the LAST stdout line is the best flagship
    # number even after ladder families logged anything.
    h.print_headline()


if __name__ == "__main__":
    main()
