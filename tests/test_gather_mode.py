"""Option.gather_mode="onehot" (MXU one-hot contraction in the pruned
narrowphase, tools/tpu_gather_probe.py's pattern B) must be bitwise
equivalent to the default per-lane gathers: the 0/1-weight contraction
selects exactly one term per output element, so no rounding is involved.
FetchPush exercises both take_sel (geom state) and take_hull_sel (mesh
hull tables) under pair_topk=8."""
import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu import registry


def _rollout_qpos(mode, slot_pack=False, env_id="FetchPush-v4"):
    env = registry.make(env_id)
    env.model = env.model.with_options(
        soa="force", gather_mode=mode, slot_pack=slot_pack
    )
    B = 2
    st = jax.jit(jax.vmap(env.initial))(jax.random.split(jax.random.key(0), B))
    nu = env.action_space.shape[0]
    a = jnp.tile(
        (0.1 * jnp.arange(1, nu + 1, dtype=jnp.float32)[::-1] % 0.7) - 0.3,
        (B, 1),
    )
    step = jax.jit(jax.vmap(env.step))
    for _ in range(3):
        st = step(st, a)
    return np.asarray(st.data.qpos)


def test_onehot_gather_bitwise_equal():
    assert np.array_equal(_rollout_qpos("gather"), _rollout_qpos("onehot"))


def test_slot_pack_bitwise_equal():
    """Option.slot_pack (packed-slot decode in soa.build_rows' traced
    contact path, soa._SlotPack): one int gather + one-hot unpack must be
    bitwise identical to the per-lane gather formulation. AdroitHandDoor
    covers the aux-rebinding interplay (per-env traced body_pos with
    concrete contact-param tables)."""
    for env_id in ("FetchPush-v4", "AdroitHandDoor-v1"):
        assert np.array_equal(
            _rollout_qpos("gather", env_id=env_id),
            _rollout_qpos("gather", slot_pack="force", env_id=env_id),
        ), env_id
