"""SoA (batch-last) substep pipeline vs the reference AoS pipeline.

The SoA path (physics/soa.py) is the TPU production path (Option.soa='auto'
enables it on TPU); these tests force it on CPU and pin its semantics to the
AoS pipeline that is itself calibrated against the C engine
(tests/test_physics_parity.py). Reference behavior reached through mj_step:
gymnasium_robotics/envs/robot_env.py:340-341.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymnasium_robotics_tpu.mjcf import serialize
from gymnasium_robotics_tpu.physics import pipeline, soa

CHECK = [
    "qpos", "qvel", "xpos", "xquat", "qacc", "qfrc_constraint",
    "sensordata", "cfrc_ext", "site_xpos", "ten_length",
]


def _batch(m, B, seed=0):
    d0 = pipeline.make_data(m)
    rng = np.random.RandomState(seed)
    qpos = np.tile(np.asarray(d0.qpos), (B, 1))
    qpos += rng.uniform(-1e-3, 1e-3, qpos.shape)
    return jax.vmap(
        lambda q: dataclasses.replace(d0, qpos=q.astype(jnp.float32))
    )(jnp.asarray(qpos))


def _compare(m, B=4, n=5, tol=2e-4, ctrl_scale=0.0, seed=0):
    db = _batch(m, B, seed)
    rng = np.random.RandomState(seed + 1)
    ctrl = jnp.asarray(
        rng.uniform(-1, 1, (B, m.meta.nu)) * ctrl_scale, jnp.float32
    )
    m_ref = m.with_options(soa=False)
    m_soa = m.with_options(soa="force")
    out_ref = jax.jit(
        jax.vmap(lambda dd, cc: pipeline.step_n(m_ref, dd, cc, n))
    )(db, ctrl)
    out_soa = jax.jit(
        jax.vmap(lambda dd, cc: pipeline.step_n(m_soa, dd, cc, n))
    )(db, ctrl)
    for fld in CHECK:
        a = np.asarray(getattr(out_ref, fld))
        b = np.asarray(getattr(out_soa, fld))
        if a.size == 0:
            continue
        scale = max(1.0, float(np.abs(a).max()))
        err = float(np.abs(a - b).max()) / scale
        assert err < tol, f"{fld}: relerr {err:.3e}"


def test_soa_matches_pipeline_pointmaze():
    import os

    root = serialize.ASSETS_DIR + "/point_maze"
    name = sorted(os.listdir(root))[0][:-4]
    m, _ = serialize.load_asset("point_maze/" + name)
    _compare(m, n=10, ctrl_scale=0.5)


def test_soa_matches_pipeline_fetch_push():
    m, _ = serialize.load_asset("fetch/push")
    _compare(m, n=5)


def test_soa_matches_pipeline_hand_block_capped():
    # contact_cap exercises the traced per-env top-k slot selection
    m, _ = serialize.load_asset("hand/manipulate_block")
    _compare(m.with_options(contact_cap=16), B=3, n=3, tol=5e-4)


def _compare_models(m_a, m_b, B=3, n=3, tol=5e-4, ctrl_scale=0.0, seed=0):
    """Step two model variants from identical states and compare CHECK
    fields (contact tables may differ in shape between the variants)."""
    rng = np.random.RandomState(seed + 1)
    ctrl = jnp.asarray(
        rng.uniform(-1, 1, (B, m_a.meta.nu)) * ctrl_scale, jnp.float32
    )
    outs = []
    for m in (m_a, m_b):
        db = _batch(m, B, seed)
        outs.append(
            jax.jit(jax.vmap(lambda dd, cc: pipeline.step_n(m, dd, cc, n)))(
                db, ctrl
            )
        )
    for fld in CHECK:
        a = np.asarray(getattr(outs[0], fld))
        b = np.asarray(getattr(outs[1], fld))
        if a.size == 0:
            continue
        scale = max(1.0, float(np.abs(a).max()))
        err = float(np.abs(a - b).max()) / scale
        assert err < tol, f"{fld}: relerr {err:.3e}"


def _minimal_pruning_k(m):
    """Smallest K that still prunes exactly one pair off the largest
    candidate group (drops only the farthest pair per env)."""
    from gymnasium_robotics_tpu.physics import collision as C

    probe = C.prune_plan(m.with_options(pair_topk=1).meta)
    assert probe.active, "model has no prunable candidate groups"
    return max(len(g.idx) for g in probe.groups if g.pruned) - 1


@pytest.mark.parametrize("soa_mode", [False, "force"])
def test_pair_topk_pruned_matches_full(soa_mode):
    """Pair-level top-K broadphase (Option.pair_topk): with K one below the
    largest group size only the farthest candidate pair per env is dropped,
    so the dynamics must match the full static table. Exercises the compact
    contact table + Contact.src gather threading in both pipelines
    (TPU-shape-static analogue of MuJoCo's broadphase inside mj_collision,
    reference gymnasium_robotics/envs/robot_env.py:340-341)."""
    m, _ = serialize.load_asset("hand/manipulate_block")
    m = m.with_options(contact_cap=16, soa=soa_mode)
    k = _minimal_pruning_k(m)
    _compare_models(m, m.with_options(pair_topk=k), B=3, n=3, tol=5e-4)


def test_pair_topk_touch_sensors():
    """Touch-sensor readout under the compact pruned table must match the
    full-table readout (slot->body membership becomes traced via src)."""
    m, _ = serialize.load_asset("hand/manipulate_block_touch")
    m = m.with_options(contact_cap=16)
    k = _minimal_pruning_k(m)
    _compare_models(m, m.with_options(pair_topk=k), B=2, n=2, tol=5e-4)


def test_refresh_kin_matches_aos():
    """soa.refresh_kin (the batch-last kinematics refresh used by env-layer
    callbacks/resets) must match the AoS smooth stack under vmap."""
    from gymnasium_robotics_tpu.physics import smooth, soa

    m, _ = serialize.load_asset("fetch/push")
    db = _batch(m, B=3)
    out_ref = jax.jit(
        jax.vmap(lambda dd: smooth.com_pos(m, smooth.kinematics(m, dd)))
    )(db)
    out_soa = jax.jit(jax.vmap(lambda dd: soa.refresh_kin(m, dd)))(db)
    for fld in ["xpos", "xquat", "geom_xpos", "site_xpos", "subtree_com",
                "cdof", "cinert"]:
        a = np.asarray(getattr(out_ref, fld))
        b = np.asarray(getattr(out_soa, fld))
        scale = max(1.0, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) / scale < 2e-5, fld


def test_soa_single_env_falls_back():
    m, _ = serialize.load_asset("fetch/reach")
    d0 = pipeline.make_data(m)
    ctrl = jnp.zeros((m.meta.nu,), jnp.float32)
    a = jax.jit(
        lambda dd, cc: pipeline.step_n(m.with_options(soa="force"), dd, cc, 3)
    )(d0, ctrl)
    b = jax.jit(lambda dd, cc: pipeline.step_n_loop(m, dd, cc, 3))(d0, ctrl)
    np.testing.assert_allclose(
        np.asarray(a.qpos), np.asarray(b.qpos), rtol=0, atol=1e-6
    )


def test_fk_kernel_bitwise_equals_xla_pass():
    """Option.fk_kernel (fused FK pallas kernel, kinematics_pallas.py,
    interpret mode on CPU) must match the SoA level pass for every pose
    output the pipeline consumes. Tolerance: the kernel folds model
    constants at compile time, reordering a few f32 ops (observed max
    6e-8, ~1 ulp); everything else must agree to that noise floor."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gymnasium_robotics_tpu import registry
    from gymnasium_robotics_tpu.physics import soa

    for eid in ("FetchPush-v4",):
        env = registry.make(eid)
        m = env.model
        B = 128  # kernel requires lane-divisible batch
        datas = jax.jit(jax.vmap(lambda r: env.initial(r).data))(
            jax.random.split(jax.random.key(0), B)
        )
        mb = jax.tree_util.tree_map(lambda _: False, m)
        db = jax.tree_util.tree_map(lambda _: True, datas)
        ms = soa._model_to_soa(m, mb)
        ds = jax.jit(lambda d: soa._data_to_soa(d, db, B))(datas)
        ds = dataclasses.replace(
            ds, ctrl=jnp.zeros((m.meta.nu, B), ds.qpos.dtype)
        )
        base = jax.jit(lambda d: soa.kinematics(ms, d))(ds)
        msk = ms.with_options(fk_kernel="force")
        kern = jax.jit(lambda d: soa.kinematics(msk, d))(ds)
        for f in ("xpos", "xquat", "xmat", "xipos", "ximat", "xanchor",
                  "xaxis", "geom_xpos", "geom_xmat", "site_xpos",
                  "site_xmat"):
            a, b = np.asarray(getattr(base, f)), np.asarray(getattr(kern, f))
            np.testing.assert_allclose(
                a, b, atol=5e-7, rtol=1e-6, err_msg=f"{eid} {f}"
            )

    # big trees (kitchen, nbody=44) must NOT take the unrolled kernel —
    # its trace blows up Mosaic and interpret-mode XLA (r5) — they use the
    # pointer-jumping pass instead
    from gymnasium_robotics_tpu.physics import kinematics_pallas as KP

    envk = registry.make("FrankaKitchen-v1")
    mk = jax.tree_util.tree_map(lambda _: False, envk.model)
    msk2 = soa._model_to_soa(envk.model, mk)
    dk = jax.jit(jax.vmap(lambda r: envk.initial(r).data))(
        jax.random.split(jax.random.key(0), 128)
    )
    dbk = jax.tree_util.tree_map(lambda _: True, dk)
    dsk = jax.jit(lambda d: soa._data_to_soa(d, dbk, 128))(dk)
    assert not KP.supported(msk2, dsk)
    assert soa._jump_plan(msk2.meta).ok
