"""Multi-host scale-out helpers (SURVEY.md §2.4 / §5: the communication layer
is jax.distributed + sharding specs + XLA collectives riding ICI/DCN — no
hand-written transport).

The env batch is the only distributed axis (physics state is a pytree sharded
along it); trajectory egress and metric reductions are the only collectives.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize multi-host JAX (no-op on a single process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "env"):
    """Mesh over every chip of every host (env-batch data parallelism)."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def psum_metrics(tree, mesh, axis: str = "env"):
    """Mean-reduce a metrics pytree across the mesh. Leaves with a leading
    batch axis evenly divisible by the mesh size are sharded over ``axis``
    and reduced with an explicit ``lax.pmean`` inside ``shard_map`` so the
    reduction compiles to an XLA collective riding ICI/DCN — the global
    mean, not the local shard mean, even multi-host. Scalar (0-d) and
    non-divisible leaves are replicated (spec ``P()``) and mean-reduced
    locally; multi-process they are first allgathered across processes and
    the process axis folded into the mean, so genuinely host-local values
    (per-host counters) reduce to the true cross-host mean rather than
    silently assuming replication (advisor findings r2, r4).

    Multi-process semantics: each process passes its HOST-LOCAL metrics
    (the shard of the env batch this host stepped); leaves are assembled
    into global arrays with ``host_local_array_to_global_array`` and the
    returned value is the global mean, identical on every process
    (verified by the 2-process loopback test in
    ``tests/test_distributed_multiproc.py``)."""
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map
        _shmap_kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        _shmap_kw = {"check_rep": False}

    multiproc = jax.process_count() > 1
    # divisibility is judged on the axis a host actually holds: the local
    # shard must split over this host's devices (multi-process) or the
    # global batch over the whole mesh (single-process).
    n = len(mesh.local_devices) if multiproc else mesh.size

    def spec_of(x):
        x = jnp.asarray(x)
        return P(axis) if x.ndim >= 1 and x.shape[0] % n == 0 else P()

    tree = jax.tree_util.tree_map(jnp.asarray, tree)
    specs = jax.tree_util.tree_map(spec_of, tree)
    if multiproc:
        def assemble(x, s):
            if s == P():
                # Replicated leaves may be genuinely host-local (e.g. a
                # per-host counter): allgather across processes and fold the
                # process axis into the local mean instead of silently
                # assuming every host passed identical values (ADVICE r4).
                # If they ARE identical, the mean is unchanged.
                return multihost_utils.process_allgather(np.asarray(x))
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, s
            )

        tree = jax.tree_util.tree_map(assemble, tree, specs)
    else:
        tree = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs,
        )

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(specs,), out_specs=P(),
        **_shmap_kw,
    )
    def _reduce(t):
        # sharded leaves: local mean over the shard, then pmean across
        # devices — exact global mean under the even-shard invariant.
        # replicated leaves: pmean of identical values is a no-op mean.
        return jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(jnp.mean(x), axis), t
        )

    return jax.device_get(_reduce(tree))


def gather_trajectory(traj, mesh, axis: str = "env"):
    """Trajectory egress: resolve a sharded rollout pytree to the host
    (all-gather of env-batch shards; the learner-side ingestion point)."""
    from jax.experimental import multihost_utils

    if jax.process_count() > 1:
        return multihost_utils.process_allgather(traj)
    return jax.device_get(traj)
