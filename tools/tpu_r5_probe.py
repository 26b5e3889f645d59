"""Round-5 TPU measurement matrix.

Usage:  python tools/tpu_r5_probe.py <mode> [env_id] [B]

Modes:
  collision  — time col.collision under option variants (narrowphase kernel
               on/off, gather vs onehot, mpr force) for one family.
  step       — time the full vmapped env.step under the same variants
               (the number that maps to bench eps).
  phases     — time collision / build_rows / solve / smooth-chain of one
               substep to localize remaining per-env cost.

Appends JSON lines to tools/tpu_probe_results.jsonl. One TPU client at a
time (CLAUDE.md operational rules); run each mode in its own process.
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
    # TWO timed passes, best-of: the first executable run after an
    # in-process compile measures up to ~35% slow on the tunnel (hand
    # matrix: 4,562 then 7,151 eps for IDENTICAL programs — gather_mode is
    # a no-op for the unpruned hand core), and warmup alone does not clear
    # it. Best-of-2 with a fresh warmup between passes does.
    best = None
    for _ in range(2):
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        # D2H read of one element: guards against the tunnel's too-fast
        # block_until_ready hazard (CLAUDE.md round-4 measurement protocol)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])
        t = (time.perf_counter() - t0) / n
        best = t if best is None else min(best, t)
    return best


def _variants():
    # NOTE gather_mode default is now "auto" (onehot on TPU); variants pin
    # both axes explicitly so the matrix is unambiguous.
    return [
        ("kernel_on_onehot", {"gather_mode": "onehot"}),
        ("kernel_on_gather", {"gather_mode": "gather"}),
        ("kernel_off_onehot",
         {"narrowphase_kernel": False, "gather_mode": "onehot"}),
        ("mpr_force_kernel_off",
         {"mpr": "force", "narrowphase_kernel": False,
          "gather_mode": "onehot"}),
        # hybrid: primitive groups in the megakernel, mesh groups in XLA MPR
        ("mpr_force_hybrid",
         {"mpr": "force", "gather_mode": "onehot"}),
    ]


def _env_with(env_id, **opts):
    from gymnasium_robotics_tpu import registry

    env = registry.make(env_id)
    if opts:
        env.model = env.model.with_options(**opts)
    return env


def mode_collision(env_id, B):
    from gymnasium_robotics_tpu.physics import collision as col

    for name, opts in _variants():
        try:
            env = _env_with(env_id, **opts)
            m = env.model
            datas = jax.jit(jax.vmap(lambda r: env.initial(r).data))(
                jax.random.split(jax.random.key(0), B)
            )
            jax.block_until_ready(datas.qpos)
            f = jax.jit(jax.vmap(lambda d: col.collision(m, d).contact.dist))
            t = timeit(f, datas)
            emit(probe="r5_collision", env=env_id, B=B, variant=name,
                 ms=round(t * 1e3, 3))
        except Exception as e:
            emit(probe="r5_collision", env=env_id, B=B, variant=name,
                 error=repr(e)[:300])


def mode_step(env_id, B):
    for name, opts in _variants():
        try:
            env = _env_with(env_id, **opts)
            st = jax.jit(jax.vmap(env.initial))(
                jax.random.split(jax.random.key(0), B)
            )
            jax.block_until_ready(st.data.qpos)
            a = jnp.zeros((B,) + env.action_space.shape, jnp.float32)
            f = jax.jit(jax.vmap(env.step))
            t = timeit(f, st, a)
            emit(probe="r5_step", env=env_id, B=B, variant=name,
                 ms=round(t * 1e3, 3), eps=round(B / t, 1))
        except Exception as e:
            emit(probe="r5_step", env=env_id, B=B, variant=name,
                 error=repr(e)[:300])


def mode_phases(env_id, B):
    """Marginal cost per phase of the PRODUCTION SoA substep (batch-last,
    the path step_n's custom_vmap rule runs): cumulative chains ending at
    successive phases, so each increment = that phase's marginal cost inside
    one fused program (no per-jit fixed floor, no AoS layout artifacts)."""
    import dataclasses

    from gymnasium_robotics_tpu.physics import soa

    env = _env_with(env_id)
    m = env.model
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
    ds = jax.jit(lambda d: soa.step(ms, d))(ds)  # realistic derived fields
    jax.block_until_ready(ds.qpos)

    def chain_to(stop):
        def f(d):
            d = soa.kinematics(ms, d)
            if stop == "kin":
                return d.xpos
            d = soa.com_pos(ms, d)
            d = soa.tendon(ms, d)
            d = soa.crb(ms, d)
            if stop == "com_crb":
                return d.qM
            d = soa.collision(ms, d)
            if stop == "collision":
                return d.contact.dist
            if stop == "collision_full":
                # force dist AND pos AND frame: no DCE of the frame/stitch
                # chains (the dist-only stop lets XLA drop them)
                return d.contact.dist, d.contact.pos, d.contact.frame
            d = soa.com_vel(ms, d)
            d = soa.rne(ms, d)
            d = soa.fwd_passive(ms, d)
            d = soa.fwd_actuation(ms, d)
            qfrc_smooth = (
                d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
                + d.qfrc_applied
            )
            if stop == "smooth_rest":
                return qfrc_smooth
            qacc_smooth = soa._spd_solve(ms, d.qM, qfrc_smooth)
            d = dataclasses.replace(
                d, qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth
            )
            if stop == "qacc_smooth":
                return d.qacc_smooth
            if stop == "build_rows":
                return soa.build_rows(ms, d)[0]
            d = soa.solve_constraints(ms, d)
            if stop == "solve":
                return d.qacc
            d = soa.sensors(ms, d)
            d = soa._euler(ms, d)
            return d.qpos
        return jax.jit(f)

    prev = 0.0
    for stop in ("kin", "com_crb", "collision", "collision_full",
                 "qacc_smooth", "build_rows", "solve", "euler"):
        t = timeit(chain_to(stop), ds) * 1e3
        emit(probe="r5_phase", env=env_id, B=B, upto=stop,
             ms=round(t, 3), marginal_ms=round(t - prev, 3))
        if stop != "build_rows":  # build_rows is re-done inside solve
            prev = t


def mode_step1(env_id, B):
    """One measurement of the CURRENT production defaults (no overrides)."""
    env = _env_with(env_id)
    st = jax.jit(jax.vmap(env.initial))(
        jax.random.split(jax.random.key(0), B)
    )
    jax.block_until_ready(st.data.qpos)
    a = jnp.zeros((B,) + env.action_space.shape, jnp.float32)
    f = jax.jit(jax.vmap(env.step))
    t = timeit(f, st, a)
    emit(probe="r5_step1", env=env_id, B=B, ms=round(t * 1e3, 3),
         eps=round(B / t, 1))


def mode_fk(env_id, B):
    """A/B the pallas FK kernel vs the XLA level pass (soa.kinematics),
    plus full step1 with it on."""
    import dataclasses

    from gymnasium_robotics_tpu.physics import (
        kinematics_pallas as KP, soa,
    )

    env = _env_with(env_id)
    m = env.model
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
    ds = jax.jit(lambda d: soa.step(ms, d))(ds)
    jax.block_until_ready(ds.qpos)
    emit(probe="r5_fk", env=env_id, B=B,
         supported=bool(KP.supported(ms, ds)))
    for name, opts in (
        ("jump", {}),                      # production default (fk_jump auto)
        ("levels", {"fk_jump": False}),    # pre-r5 level pass
        ("pallas", {"fk_kernel": "force"}),
    ):
        msx = ms.with_options(**opts) if opts else ms
        t = timeit(jax.jit(lambda d: soa.kinematics(msx, d).xpos), ds)
        emit(probe="r5_fk", env=env_id, B=B, variant=name,
             ms=round(t * 1e3, 3))
    # step-level effect of each FK routing
    for name, opts in (
        ("step_jump", {}),
        ("step_levels", {"fk_jump": False}),
        ("step_fk_kernel", {"fk_kernel": "force"}),
    ):
        env2 = _env_with(env_id, **opts)
        st = jax.jit(jax.vmap(env2.initial))(
            jax.random.split(jax.random.key(0), B)
        )
        a = jnp.zeros((B,) + env2.action_space.shape, jnp.float32)
        t = timeit(jax.jit(jax.vmap(env2.step)), st, a)
        emit(probe="r5_fk", env=env_id, B=B, variant=name,
             ms=round(t * 1e3, 3), eps=round(B / t, 1))


def mode_rowsbisect(env_id, B):
    """Bisect soa.build_rows' cost for pruned+capped f32 models: time
    cumulative sub-chains of the contact section (selection -> gathers ->
    param unpack -> jacobians -> pyramid+concat ~= full build_rows)."""
    import dataclasses

    from gymnasium_robotics_tpu.physics import (
        collision as COL, narrowphase_pallas as NPK, soa,
    )

    env = _env_with(env_id)
    m = env.model
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
    ds = jax.jit(lambda d: soa.step(ms, d))(ds)
    jax.block_until_ready(ds.qpos)
    mt = ms.meta
    cond_arr = COL.compact_condim(mt)
    cap = mt.opt.contact_cap
    dtype = jnp.float32
    import numpy as np

    def contact_chain(stop):
        def f(d):
            c = d.contact
            pk_tbl = soa._SlotPack(ms, mt)
            packed_c = jnp.take(jnp.asarray(pk_tbl.pack), c.src)
            pen_all = c.dist - pk_tbl.margin(packed_c, dtype)
            masks_np = soa.CST._body_dof_masks(mt)
            outs = []
            idxs = [np.nonzero(cond_arr == cd)[0]
                    for cd in sorted(set(cond_arr.tolist()))]
            maxg = max(len(ix) for ix in idxs)
            rows_np = np.stack([
                np.concatenate([ix, np.full(maxg - len(ix), ix[-1])])
                for ix in idxs])
            mask_np = np.stack([np.arange(maxg) < len(ix) for ix in idxs])
            order_all = NPK.topk_select(
                pen_all[jnp.asarray(rows_np)], mask_np, cap,
                interpret=jax.default_backend() != "tpu")
            if stop == "select":
                return order_all
            for gi, (cd, idx) in enumerate(
                    zip(sorted(set(cond_arr.tolist())), idxs)):
                order = order_all[gi]                      # (cap, B)
                sel_c = jnp.asarray(idx)[order]
                pos_s = jnp.take_along_axis(
                    c.pos, sel_c[:, None, :], axis=0)
                frame_s = jnp.take_along_axis(
                    c.frame, sel_c[:, None, None, :], axis=0)
                pen = jnp.take_along_axis(
                    pen_all[jnp.asarray(idx)], order, axis=0)
                pk = jnp.take_along_axis(packed_c, sel_c, axis=0)
                if stop == "gather":
                    outs += [pos_s, frame_s, pen, pk]
                    continue
                ohb1, ohb2, sr_s, si_s, mu_s = pk_tbl.unpack(pk, dtype)
                if stop == "unpack":
                    outs += [ohb1, sr_s, mu_s]
                    continue
                jp1, jr1 = soa._jacs_onehot(ms, d, masks_np, pos_s, ohb1)
                jp2, jr2 = soa._jacs_onehot(ms, d, masks_np, pos_s, ohb2)
                Jp = jp2 - jp1
                Jr = jr2 - jr1
                Jn = jnp.einsum("kvcb,kcb->kvb", Jp, frame_s[:, 0])
                if stop == "jacs":
                    outs += [Jn, Jr[:, 0]]
                    continue
            return outs
        return jax.jit(f)

    prev = 0.0
    for stop in ("select", "gather", "unpack", "jacs"):
        t = timeit(contact_chain(stop), ds) * 1e3
        emit(probe="r5_rowsbisect", env=env_id, B=B, upto=stop,
             ms=round(t, 3), marginal_ms=round(t - prev, 3))
        prev = t
    t = timeit(jax.jit(lambda d: soa.build_rows(ms, d)[0]), ds) * 1e3
    emit(probe="r5_rowsbisect", env=env_id, B=B, upto="full_build_rows",
         ms=round(t, 3), marginal_ms=round(t - prev, 3))


def mode_rows(env_id, B):
    """soa.build_rows in isolation (one jit): run with/without
    GRT_NO_SLOTPACK=1 to A/B the packed-slot decode."""
    import dataclasses
    import os

    from gymnasium_robotics_tpu.physics import soa

    env = _env_with(env_id)
    m = env.model
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
    ds = jax.jit(lambda d: soa.step(ms, d))(ds)
    jax.block_until_ready(ds.qpos)
    t = timeit(jax.jit(lambda d: soa.build_rows(ms, d)[0]), ds)
    emit(probe="r5_rows", env=env_id, B=B,
         slotpack=not os.environ.get("GRT_NO_SLOTPACK"),
         ms=round(t * 1e3, 3))


if __name__ == "__main__":
    mode = sys.argv[1]
    env_id = sys.argv[2] if len(sys.argv) > 2 else "FrankaKitchen-v1"
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    emit(probe="r5_meta", mode=mode, env=env_id, B=B,
         backend=jax.default_backend())
    {"collision": mode_collision, "step": mode_step, "step1": mode_step1,
     "phases": mode_phases, "rows": mode_rows, "fk": mode_fk,
     "rowsbisect": mode_rowsbisect}[mode](env_id, B)
