"""Worker for the 2-process loopback distributed test
(tests/test_distributed_multiproc.py). Run as:

    python tests/_dist_worker.py <process_id> <coordinator_port>

Exercises the real multi-process code paths of parallel/distributed.py —
`jax.distributed.initialize`, a global 2-host/8-device mesh, an SPMD
PointMaze rollout sharded over that mesh, `psum_metrics` on host-local
metrics, and `gather_trajectory` egress — over 127.0.0.1 (Gloo CPU
collectives). Prints DIST_WORKER_OK on success; any assert kills the
process and fails the parent test.
"""
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/grt_jax_cache")

import numpy as np  # noqa: E402

from gymnasium_robotics_tpu.parallel import distributed, rollout  # noqa: E402

distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
mesh = distributed.global_mesh()
assert mesh.size == 8, mesh

# --- SPMD env rollout over the global mesh (both processes execute the
# same program; the batch is laid out 16 envs / 8 devices / 2 hosts).
from gymnasium_robotics_tpu import registry  # noqa: E402

env = registry.make("PointMaze_UMaze-v3")
state, traj = rollout.rollout(
    env, num_envs=16, num_steps=4,
    sharding=rollout.env_sharding(mesh),
)
# global scalar off the sharded state: identical (replicated) on every host
mean_rew = float(jax.jit(lambda s: s.reward.mean())(state))
got = distributed.gather_trajectory(np.array([mean_rew], np.float32), mesh)
assert got.shape == (2, 1), got.shape
assert abs(got[0, 0] - got[1, 0]) < 1e-6, got  # both hosts agree

# --- psum_metrics on HOST-LOCAL metrics (each host passes only its shard)
local = {
    "reward": np.arange(8, dtype=np.float32) + 100.0 * pid,
    "success": np.full((8,), float(pid), np.float32),
    "scalar": np.float32(7.0),              # identical on both hosts
    "odd": np.arange(3, dtype=np.float32),  # non-divisible -> replicated
    # genuinely HOST-LOCAL non-divisible leaf (per-host counter): must be
    # mean-reduced ACROSS processes, not assumed replicated (ADVICE r4)
    "odd_local": np.arange(3, dtype=np.float32) + 10.0 * pid,
}
out = distributed.psum_metrics(local, mesh)
assert abs(out["reward"] - 53.5) < 1e-5, out   # mean of 0..7 and 100..107
assert abs(out["success"] - 0.5) < 1e-6, out
assert abs(out["scalar"] - 7.0) < 1e-6, out
assert abs(out["odd"] - 1.0) < 1e-6, out
# mean over {0,1,2} on host 0 and {10,11,12} on host 1 = 6.0
assert abs(out["odd_local"] - 6.0) < 1e-6, out

# --- trajectory egress: host-local rollout shards -> full global batch
egress = distributed.gather_trajectory(
    {"obs": np.full((4, 8, 2), pid, np.float32)}, mesh
)
assert egress["obs"].shape == (2, 4, 8, 2), egress["obs"].shape
assert egress["obs"][0].sum() == 0.0 and egress["obs"][1].sum() == 64.0

print(f"DIST_WORKER_OK pid={pid} mean_rew={mean_rew:.4f}", flush=True)
