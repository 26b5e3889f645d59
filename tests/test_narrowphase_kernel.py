"""Option.narrowphase_kernel="force" (one-dispatch pallas megakernel,
narrowphase_pallas.py, interpret mode on CPU) must be bitwise equivalent to
the XLA group-chain path: the kernel body calls the SAME formula functions
on the same loaded values. FetchPush covers primitive groups, mesh groups
(per-lane hulls under pair_topk=8), the box-hull manifold, and the MPR
edge-edge upgrade (mpr="auto" is ON on CPU, so MPR runs inside the kernel
here too)."""
import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu import registry


def _rollout(mode):
    env = registry.make("FetchPush-v4")
    env.model = env.model.with_options(soa="force", narrowphase_kernel=mode)
    B = 2
    st = jax.jit(jax.vmap(env.initial))(jax.random.split(jax.random.key(0), B))
    step = jax.jit(jax.vmap(env.step))
    a = jnp.tile(jnp.asarray([0.3, -0.2, 0.1, 0.05], jnp.float32), (B, 1))
    for _ in range(3):
        st = step(st, a)
    return (np.asarray(st.data.qpos), np.asarray(st.data.contact.dist),
            np.asarray(st.data.contact.frame))


def test_megakernel_bitwise_equals_xla_path():
    qa, da, fa = _rollout(False)
    qb, db, fb = _rollout("force")
    assert np.array_equal(qa, qb)
    assert np.array_equal(da, db)
    assert np.array_equal(fa, fb)
