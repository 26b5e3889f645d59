"""Cross-check the SoA (batch-last) substep pipeline against the reference
AoS pipeline on real family assets (CPU, soa=force vs soa=False).

Usage: PYTHONPATH=. JAX_PLATFORMS=cpu python tools/soa_check.py [asset ...]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/grt_jax_cache")

import dataclasses

import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu.mjcf import serialize
from gymnasium_robotics_tpu.physics import pipeline, soa
from gymnasium_robotics_tpu.physics import types as T

ASSETS = {
    "point": "point_maze/" + __import__("os").listdir("gymnasium_robotics_tpu/assets/point_maze")[0][:-4],
    "reach": "fetch/reach",
    "push": "fetch/push",
    "block": "hand/manipulate_block",
    "door": "adroit/door",
    "kitchen": "kitchen/kitchen",
}

CHECK = [
    "qpos", "qvel", "act", "xpos", "xquat", "qacc", "qfrc_constraint",
    "sensordata", "cfrc_ext", "site_xpos", "ten_length",
]


def run(name, path, B=4, n=5, seed=0):
    m, _extra = serialize.load_asset(path)
    if name == "block":
        m = m.with_options(contact_cap=16)
    if name == "door":
        m = m.with_options(contact_cap=16)
    d0 = pipeline.make_data(m)
    rng = np.random.RandomState(seed)
    mt = m.meta
    qpos = np.tile(np.asarray(d0.qpos), (B, 1))
    qpos += rng.uniform(-0.001, 0.001, qpos.shape)
    qvel = np.zeros((B, mt.nv))
    ctrl = rng.uniform(-1.0, 1.0, (B, mt.nu)) * 0.3
    db = jax.vmap(lambda q, v: dataclasses.replace(
        d0, qpos=q.astype(jnp.float32), qvel=v.astype(jnp.float32)
    ))(jnp.asarray(qpos), jnp.asarray(qvel))
    ctrl = jnp.asarray(ctrl, jnp.float32)

    m_ref = m.with_options(soa=False)
    m_soa = m.with_options(soa="force")
    f_ref = jax.jit(jax.vmap(
        lambda dd, cc: pipeline.step_n(m_ref, dd, cc, n)))
    f_soa = jax.jit(jax.vmap(
        lambda dd, cc: pipeline.step_n(m_soa, dd, cc, n)))
    out_ref = f_ref(db, ctrl)
    out_soa = f_soa(db, ctrl)

    worst = 0.0
    worst_f = None
    for fld in CHECK:
        a = np.asarray(getattr(out_ref, fld))
        b = np.asarray(getattr(out_soa, fld))
        if a.size == 0:
            continue
        scale = max(1.0, float(np.abs(a).max()))
        err = float(np.abs(a - b).max()) / scale
        if err > worst:
            worst, worst_f = err, fld
        status = "OK " if err < 2e-4 else "FAIL"
        print(f"  {status} {fld:18s} relerr={err:.3e}")
    print(f"[{name}] worst={worst:.3e} ({worst_f})")
    return worst


if __name__ == "__main__":
    names = sys.argv[1:] or list(ASSETS)
    bad = 0
    for nm in names:
        print(f"=== {nm} ===")
        try:
            w = run(nm, ASSETS[nm])
            bad += w > 2e-4
        except Exception as e:
            bad += 1
            import traceback

            traceback.print_exc()
    sys.exit(1 if bad else 0)
