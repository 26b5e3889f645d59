"""Per-stage timing of the SoA (batch-last) substep on TPU. Localizes where
time goes inside soa.step for a family/batch. Appends to tpu_probe_results.jsonl.

Usage: PYTHONPATH=. python tools/tpu_soa_probe.py [env_id] [B]
"""

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
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "FetchPush-v4"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    from gymnasium_robotics_tpu import registry
    from gymnasium_robotics_tpu.physics import soa
    from gymnasium_robotics_tpu.physics import pipeline as pl

    env = registry.make(env_id)
    m = env.model

    def mk(rng):
        return env.initial(rng).data

    datas = jax.jit(jax.vmap(mk))(jax.random.split(jax.random.key(0), B))
    jax.block_until_ready(datas.qpos)

    ms = soa._model_to_soa(m, None)
    db = jax.tree_util.tree_map(lambda _: True, datas)
    to_soa = jax.jit(lambda d: soa._data_to_soa(d, db, B))
    ds = to_soa(datas)
    fwd = jax.jit(lambda d: soa.forward(ms, d))
    ds = fwd(ds)
    jax.block_until_ready(ds.qpos)

    stages = {
        "full_substep": lambda d: soa.step(ms, d),
        "kinematics": lambda d: soa.kinematics(ms, d),
        "com_pos": lambda d: soa.com_pos(ms, d),
        "tendon": lambda d: soa.tendon(ms, d),
        "crb": lambda d: soa.crb(ms, d),
        "collision": lambda d: soa.collision(ms, d),
        "com_vel": lambda d: soa.com_vel(ms, d),
        "rne": lambda d: soa.rne(ms, d),
        "passive": lambda d: soa.fwd_passive(ms, d),
        "actuation": lambda d: soa.fwd_actuation(ms, d),
        "build_rows": lambda d: soa.build_rows(ms, d)[0],
        "solve_constraints": lambda d: soa.solve_constraints(ms, d).qacc,
        "euler": lambda d: soa._euler(ms, d),
        "sensors": lambda d: soa.sensors(ms, d),
    }
    for name, fn in stages.items():
        try:
            jfn = jax.jit(fn)
            t = timeit(jfn, ds, n=10)
            emit(probe="soa_stage", env=env_id, B=B, stage=name,
                 ms=round(t * 1e3, 3), us_per_env=round(t / B * 1e6, 2))
        except Exception as e:
            emit(probe="soa_stage", env=env_id, B=B, stage=name,
                 error=repr(e)[:200])


if __name__ == "__main__":
    main()
