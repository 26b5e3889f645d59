"""Model (de)serialization: compiled models ship as .npz artifacts.

The reference ships raw MJCF + STL assets and compiles them in C at every env
construction (gymnasium_robotics/envs/robot_env.py:292-303). Here models are
compiled ONCE at asset-build time (tools/compile_assets.py, using the MuJoCo
compiler as frontend) and the frozen device-array Model is shipped; runtime
needs no MJCF parser. Numeric fields -> npz arrays; static Meta -> JSON.
"""

from __future__ import annotations

import dataclasses
import io
import json
import os

import numpy as np

from gymnasium_robotics_tpu.physics import types as T

ASSETS_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")


def _meta_to_json(meta: T.Meta) -> str:
    d = dataclasses.asdict(meta)
    d["opt"] = dataclasses.asdict(meta.opt)
    return json.dumps(d)


def _meta_from_json(s: str) -> T.Meta:
    d = json.loads(s)

    def tup(x):
        if isinstance(x, list):
            return tuple(tup(e) for e in x)
        return x

    opt = T.Option(**{k: tup(v) for k, v in d.pop("opt").items()})
    d = {k: tup(v) for k, v in d.items()}
    return T.Meta(opt=opt, **d)


def save_model(m: T.Model, path: str, extra: dict | None = None):
    arrays = {}
    for f in dataclasses.fields(T.Model):
        if f.name in T.Model._meta:
            continue
        v = getattr(m, f.name)
        if v is not None:
            arrays[f.name] = np.asarray(v)
    if extra:
        for k, v in extra.items():
            arrays[f"extra__{k}"] = np.asarray(v)
    arrays["__meta__"] = np.frombuffer(
        _meta_to_json(m.meta).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_model(path: str, dtype=np.float32):
    import jax.numpy as jnp

    z = np.load(path)
    meta = _meta_from_json(bytes(z["__meta__"]).decode())
    kw = {}
    extra = {}
    float_fields = None
    for k in z.files:
        if k == "__meta__":
            continue
        if k.startswith("extra__"):
            extra[k[len("extra__"):]] = z[k]
            continue
        arr = z[k]
        if arr.dtype.kind == "f":
            arr = arr.astype(dtype)
        kw[k] = jnp.asarray(arr)
    for f in dataclasses.fields(T.Model):
        if f.name not in T.Model._meta and f.name not in kw:
            kw[f.name] = None
    return T.Model(meta=meta, **kw), extra


def asset_path(name: str) -> str:
    return os.path.join(ASSETS_DIR, name + ".npz")


def load_asset(name: str, dtype=np.float32):
    """Load a packaged compiled model; falls back to compiling from the
    source MJCF via the builder registry in tools/compile_assets.py."""
    p = asset_path(name)
    if os.path.exists(p):
        return load_model(p, dtype=dtype)
    raise FileNotFoundError(
        f"Compiled asset {name!r} not found at {p}. "
        "Run tools/compile_assets.py (requires mujoco + source MJCF)."
    )
