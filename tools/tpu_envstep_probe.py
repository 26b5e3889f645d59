"""Decompose a family's full env-step cost on TPU: physics (step_n) vs
env.step (obs/ctrl/callback) vs env.reset branch vs full auto_reset.
Appends to tools/tpu_probe_results.jsonl."""
import functools, json, sys, time

import jax, jax.numpy as jnp
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
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    from gymnasium_robotics_tpu import registry, core
    from gymnasium_robotics_tpu.physics import pipeline
    env = registry.make(env_id)
    st = jax.jit(jax.vmap(env.initial))(jax.random.split(jax.random.key(0), B))
    jax.block_until_ready(st.reward)
    a = jnp.zeros((B,) + env.action_space.shape, jnp.float32)

    n_sub_i = int(getattr(env, "n_substeps", 0) or
                  getattr(getattr(env, "cfg", None), "frame_skip", 0) or 1)
    from gymnasium_robotics_tpu.physics import soa as _soa

    def _boundary_roundtrip(d):
        db = jax.tree_util.tree_map(lambda _: True, d)
        ds = _soa._data_to_soa(d, db, B)
        return _soa._data_from_soa(ds).qpos

    probes = {
        "env_step": jax.jit(jax.vmap(env.step)),
        "physics_step_n": jax.jit(jax.vmap(
            lambda d: pipeline.step_n(env.model, d, d.ctrl, n_sub_i).qpos
        )),
        # AoS<->SoA transpose boundary alone (paid once per env.step)
        "soa_boundary": jax.jit(_boundary_roundtrip),
        "env_reset": jax.jit(jax.vmap(env.reset)),
        "auto_reset": jax.jit(jax.vmap(functools.partial(core.auto_reset, env))),
        "initial": jax.jit(jax.vmap(env.initial)),
    }
    n_sub = getattr(env, "n_substeps", getattr(getattr(env, "cfg", None), "frame_skip", 0))
    emit(probe="envstep", env=env_id, B=B, stage="meta", n_substeps=int(n_sub or 0))
    for name, fn in probes.items():
        try:
            if name == "env_step":
                t = timeit(fn, st, a)
            elif name == "env_reset":
                t = timeit(fn, st, jax.random.split(jax.random.key(1), B))
            elif name == "auto_reset":
                t = timeit(fn, st, a)
            elif name in ("physics_step_n", "soa_boundary"):
                t = timeit(fn, st.data)
            else:
                t = timeit(fn, jax.random.split(jax.random.key(2), B))
            emit(probe="envstep", env=env_id, B=B, stage=name,
                 ms=round(t * 1e3, 2), eps=round(B / t, 1))
        except Exception as e:
            emit(probe="envstep", env=env_id, B=B, stage=name, error=repr(e)[:200])

if __name__ == "__main__":
    main()
