"""Checkpoint / resume for batched environment state (SURVEY.md §5:
the reference only offers EzPickle + Adroit's get/set_env_state dicts,
adroit_door.py:265-277; here the whole EnvState IS an explicit pytree, so a
checkpoint is just a saved pytree and resume is total).

Uses orbax when available, with a numpy .npz fallback that preserves the
pytree structure; both round-trip batched EnvState exactly (rng keys
included, so resumed rollouts are bitwise-deterministic continuations).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_state(state: Any, path: str) -> None:
    """Save an EnvState (or any pytree of arrays) to ``path``.

    An explicit ``.npz`` path selects the numpy format; otherwise orbax is
    used when importable. Real save errors propagate — only a missing orbax
    falls back to npz (ADVICE r1: never swallow genuine I/O failures).
    Pytrees containing zero-size leaves (e.g. ``Data.act`` on models with no
    stateful actuators) are routed to npz deterministically: orbax rejects
    empty arrays by design."""
    savable = _to_savable(state)
    has_empty = any(
        getattr(x, "size", 1) == 0 for x in jax.tree_util.tree_leaves(savable)
    )
    if not path.endswith(".npz") and not has_empty:
        try:
            import orbax.checkpoint as ocp
        except ImportError:
            ocp = None
        if ocp is not None:
            ckpt = ocp.PyTreeCheckpointer()
            ckpt.save(os.path.abspath(path), savable, force=True)
            return
    leaves, treedef = _flatten(savable)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def restore_state(template: Any, path: str) -> Any:
    """Restore a checkpoint into the structure of ``template`` (e.g. the
    state returned by ``env.reset``/``initial``) — dtypes and key-ness are
    recovered from the template. Format is detected from what exists on
    disk; restore errors propagate."""
    npz_path = path if path.endswith(".npz") else path + ".npz"
    # Both formats can exist at the same logical path (e.g. a later save with
    # empty leaves fell back to npz): prefer the NEWER one so a stale npz
    # cannot silently shadow a fresh orbax checkpoint (advisor finding r2).
    has_npz = os.path.exists(npz_path)
    has_orbax = path != npz_path and os.path.isdir(path)
    if has_npz and has_orbax:
        has_npz = os.path.getmtime(npz_path) >= os.path.getmtime(path)
    if not has_npz:
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        raw = ckpt.restore(os.path.abspath(path))
        return _from_savable(template, raw)
    z = np.load(npz_path)
    leaves, treedef = _flatten(_to_savable(template))
    restored = [jnp.asarray(z[f"leaf_{i}"]) for i in range(len(leaves))]
    return _from_savable(
        template, jax.tree_util.tree_unflatten(treedef, restored)
    )


def _to_savable(state):
    """PRNG keys are typed arrays; store their raw key data."""
    def conv(x):
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            return jax.random.key_data(x)
        return x

    return jax.tree_util.tree_map(conv, state)


def _from_savable(template, raw):
    def conv(t, x):
        if isinstance(t, jax.Array) and jnp.issubdtype(t.dtype, jax.dtypes.prng_key):
            return jax.random.wrap_key_data(jnp.asarray(np.asarray(x), jnp.uint32))
        return jnp.asarray(np.asarray(x), t.dtype) if hasattr(t, "dtype") else x

    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    leaves_r = jax.tree_util.tree_leaves(raw)
    assert len(leaves_t) == len(leaves_r), (
        f"checkpoint has {len(leaves_r)} leaves, template {len(leaves_t)}"
    )
    return jax.tree_util.tree_unflatten(
        treedef, [conv(t, x) for t, x in zip(leaves_t, leaves_r)]
    )
