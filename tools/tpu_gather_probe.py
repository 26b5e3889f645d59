"""Microbenchmark: per-lane gather patterns used by the pruned narrowphase
(collision_vec.take_sel / take_hull_sel) vs a one-hot matmul formulation.

TPU gathers with per-lane indices can serialize; the one-hot contraction
runs on the MXU. Run on the TPU tunnel:
    python tools/tpu_gather_probe.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def timeit(name, fn, *args, N=50):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(N):
        out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    print(f"{name:32s} {(time.perf_counter() - t0) / N * 1000:8.3f} ms",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    ngeom, B, K = 240, 512, 8
    nh, V = 41, 24
    P = jax.random.normal(key, (ngeom, 3, B))
    Rm = jax.random.normal(key, (ngeom, 3, 3, B))
    hull = jax.random.normal(key, (nh, V, 3))
    sel = jax.random.randint(key, (K, B), 0, ngeom)
    hsel = jax.random.randint(key, (K, B), 0, nh)

    # pattern A: take_along_axis per-lane geom gather (current code)
    def gather_P(P, sel):
        return jnp.take_along_axis(P, sel[:, None, :], axis=0)

    def gather_R(Rm, sel):
        return jnp.take_along_axis(Rm, sel[:, None, None, :], axis=0)

    # pattern B: one-hot matmul over the geom axis
    def onehot_P(P, sel):
        oh = jax.nn.one_hot(sel, ngeom, dtype=P.dtype)      # (K, B, ngeom)
        return jnp.einsum("kbg,gcb->kcb", oh, P)

    def onehot_R(Rm, sel):
        oh = jax.nn.one_hot(sel, ngeom, dtype=Rm.dtype)
        return jnp.einsum("kbg,gijb->kijb", oh, Rm)

    # pattern C: per-lane hull-table gather (take_hull_sel)
    def gather_hull(hull, hsel):
        return jnp.take(hull, hsel, axis=0)                  # (K, B, V, 3)

    def onehot_hull(hull, hsel):
        oh = jax.nn.one_hot(hsel, nh, dtype=hull.dtype)      # (K, B, nh)
        return jnp.einsum("kbh,hvc->kbvc", oh, hull)

    timeit("geom gather  take_along P", gather_P, P, sel)
    timeit("geom onehot  matmul     P", onehot_P, P, sel)
    timeit("geom gather  take_along R", gather_R, Rm, sel)
    timeit("geom onehot  matmul     R", onehot_R, Rm, sel)
    timeit("hull gather  take       V", gather_hull, hull, hsel)
    timeit("hull onehot  matmul     V", onehot_hull, hull, hsel)

    # pattern D: 23 groups' worth of gathers, one call each, to expose
    # per-op overhead at this size
    def many_gathers(P, sel):
        out = []
        for _ in range(23):
            out.append(jnp.take_along_axis(P, sel[:, None, :], axis=0))
        return sum(out)

    timeit("23x geom gathers (fused?)", many_gathers, P, sel)

    # pattern E: the contact-frame scatter in decode (for reference)
    con = jnp.zeros((760, 6, B))
    lam = jax.random.normal(key, (K, B))
    slot = jax.random.randint(key, (K, B), 0, 760)
    lane = jnp.arange(B)[None, :]

    def scatter_set(con, slot, lam):
        return con.at[slot, 0, lane].set(lam)

    timeit("contact scatter set", scatter_set, con, slot, lam)


if __name__ == "__main__":
    main()
