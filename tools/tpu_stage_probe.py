"""Per-stage timing of one batched physics substep on TPU: localizes where
the ~0.1 ms/env/substep goes (smooth stack vs collision vs row build vs
solver vs integration). Appends JSON lines to tools/tpu_probe_results.jsonl.
"""

import dataclasses
import json
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


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    # block on EVERY leaf: blocking on the bare pytree object has produced
    # ~100x-too-fast readings on the tunneled runtime (see CLAUDE.md r4)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    return (time.perf_counter() - t0) / n


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "FetchPush-v4"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from gymnasium_robotics_tpu import registry
    from gymnasium_robotics_tpu.physics import (
        collision as col, constraint as cst, pipeline as pl, smooth,
    )

    env = registry.make(env_id)
    m = env.model

    def mk(rng):
        s = env.initial(rng)
        return s.data

    datas = jax.jit(jax.vmap(mk))(jax.random.split(jax.random.key(0), B))
    jax.block_until_ready(datas.qpos)

    stages = {
        "full_substep": lambda d: pl.step(m, d),
        "kinematics": lambda d: smooth.kinematics(m, d),
        "com_pos": lambda d: smooth.com_pos(m, d),
        "tendon": lambda d: smooth.tendon(m, d),
        "crb": lambda d: smooth.crb(m, d),
        "collision": lambda d: col.collision(m, d),
        "com_vel": lambda d: smooth.com_vel(m, d),
        "rne": lambda d: smooth.rne(m, d),
        "passive": lambda d: smooth.fwd_passive(m, d),
        "actuation": lambda d: smooth.fwd_actuation(m, d),
        "qacc_smooth": lambda d: jax.scipy.linalg.solve(
            d.qM, d.qfrc_smooth, assume_a="pos"
        ),
        "solve_constraints": lambda d: cst.solve_constraints(m, d).qacc,
        "build_rows_only": lambda d: cst.build_rows(m, d)[0],
        "euler": lambda d: pl._euler(m, d),
    }
    # prepare a data that has gone through forward once so all derived
    # fields are realistic
    fwd = jax.jit(jax.vmap(lambda d: pl.forward(m, d)))
    datas = fwd(datas)
    jax.block_until_ready(datas.qpos)

    for name, fn in stages.items():
        try:
            jfn = jax.jit(jax.vmap(fn))
            t = timeit(jfn, datas, n=10)
            emit(probe="stage", env=env_id, B=B, stage=name,
                 ms=round(t * 1e3, 3), us_per_env=round(t / B * 1e6, 2))
        except Exception as e:
            emit(probe="stage", env=env_id, B=B, stage=name,
                 error=repr(e)[:200])


if __name__ == "__main__":
    main()
