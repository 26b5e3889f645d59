"""TPU cost-model probe (round 2): measures what actually dominates step time
on the tunneled TPU runtime so the fusion work targets the right bottleneck.

Appends one JSON line per experiment to tools/tpu_probe_results.jsonl as it
goes (survives timeouts). Run as the ONLY TPU client.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

OUT = "/root/repo/tools/tpu_probe_results.jsonl"


def emit(**kw):
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def count_kernels(txt):
    """Proxies for device kernel launches from optimized HLO text: number of
    instructions in the ENTRY computation, and total fusion ops module-wide
    (while-loop bodies re-launch their fusions every iteration)."""
    entry = 0
    in_entry = False
    for line in txt.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                in_entry = False
                continue
            s = line.strip()
            if " = " in s:
                entry += 1
    fusions = txt.count(" fusion(") + txt.count(" fusion.")
    return {"entry_instrs": entry, "total_fusions": fusions,
            "whiles": txt.count(" while("), "custom_calls": txt.count("custom-call")}


def main():
    emit(probe="backend", backend=jax.default_backend(),
         device=str(jax.devices()[0]))

    if len(sys.argv) > 1:
        return _families()

    # 1. trivial dispatch latency
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8192,), jnp.float32)
    emit(probe="trivial_dispatch_ms", ms=timeit(f, x, n=50) * 1e3)

    # 2. while-loop iteration cost (does a device loop pay per-iteration
    # tunnel overhead?)
    def loop(n):
        def fn(x):
            return jax.lax.fori_loop(0, n, lambda i, v: v * 1.0000001 + 1e-9, x)
        return jax.jit(fn)

    for n in (10, 100, 1000):
        emit(probe=f"fori_loop_{n}_ms", ms=timeit(loop(n), x, n=20) * 1e3)

    # 3. chain of non-fusable kernels: alternating gather/scatter ops
    def chain(n):
        idx = jnp.arange(8191, -1, -1)

        def fn(x):
            for _ in range(n):
                x = x[idx]
                x = x.at[idx].add(1.0)
            return x
        return jax.jit(fn)

    for n in (8, 64):
        emit(probe=f"gather_chain_{n}_ms", ms=timeit(chain(n), x, n=20) * 1e3)
    _families()


def _families():
    # per-family batched step: wall time + kernel count vs batch size
    from gymnasium_robotics_tpu import registry

    fams = [
        ("FetchPush-v4", (512, 4096)),
        ("HandManipulateBlockRotateXYZ-v1", (256, 1024)),
        ("AntMaze_UMaze-v5", (512, 4096)),
        ("PointMaze_UMaze-v3", (8192,)),
    ]
    if len(sys.argv) > 1:
        keep = set(sys.argv[1].split(","))
        fams = [f for f in fams if f[0] in keep]
    for env_id, batches in fams:
        for B in batches:
            try:
                env = registry.make(env_id, num_envs=B)
                env.reset(seed=0)
                a = np.zeros((B,) + env.action_space.shape, np.float32)
                t0 = time.perf_counter()
                out = env.step(a)
                jax.block_until_ready(jax.tree_util.tree_leaves(out[0])[0])
                compile_s = time.perf_counter() - t0
                nk = {}
                if os.environ.get("PROBE_KERNELS"):
                    try:
                        txt = env._step_fn.lower(
                            env.state, jnp.asarray(a)
                        ).compile().as_text()
                        nk = count_kernels(txt)
                    except Exception as e:
                        nk = {"error": repr(e)[:120]}
                t = timeit(lambda: env.step(a), n=10, warmup=3)
                emit(probe="family_step", env=env_id, B=B,
                     step_ms=round(t * 1e3, 2), env_steps_per_s=round(B / t),
                     compile_s=round(compile_s, 1), kernels=nk)
            except Exception as e:
                emit(probe="family_step", env=env_id, B=B,
                     error=repr(e)[:300])


if __name__ == "__main__":
    main()
