"""One-dispatch narrowphase megakernel (pallas).

The SoA narrowphase (collision_vec) evaluates each (type1, type2) candidate
group as its own chain of XLA ops: measured on the tunneled v5e, kitchen's
32 groups lower to ~840 fusions + ~1400 layout copies per substep at
~2.5 us each — collision alone is ~11 ms of the 22.7 ms substep at B=512,
and the cost is op COUNT, not flops (the same chain fused into one program
is ~100x cheaper). This module runs the per-group contact formulas for ALL
groups inside ONE pallas program per 128-env lane block: the XLA side keeps
the cheap parts (AABB ranking, top-K selection, per-lane gathers — a few
dozen fusions), the kernel consumes the gathered group operands from HBM
refs and emits the full compact contact table (dist/pos/frame) with every
intermediate in VMEM.

Semantics are IDENTICAL to the XLA path: the kernel body calls the very
same formula functions (collision_vec._dispatch / _mesh_group_fn) on
VMEM-loaded values — one source of truth for the contact math — and a
bitwise test drives both paths (tests/test_narrowphase_kernel.py).

The reference reaches its narrowphase through MuJoCo's mj_collision
(gymnasium_robotics/envs/robot_env.py:340-341); this is the TPU-native
replacement for scenes with large static pair tables.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from gymnasium_robotics_tpu.physics import types as T

_LANES = 128
# lane-tile width per kernel program: wider tiles amortize Mosaic's per-op
# sequencing cost over more vregs (at 128 the kernel was no faster than the
# XLA chains it replaced: ~1600 tiny vector ops x grid B/128)
_TILE = 512
_BIG = 1e10


def _tpu_params():
    """Raise Mosaic's scoped-VMEM soft limit (see solver_pallas._tpu_params):
    the unrolled group sections plus hull operand blocks peak well above the
    16 MB default for kitchen-class scenes."""
    if jax.default_backend() != "tpu":
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def use_np_kernel(mt: T.Meta) -> bool:
    v = getattr(mt.opt, "narrowphase_kernel", False)
    return v is True or v == "force" or (
        v == "auto" and jax.default_backend() == "tpu"
    )


@dataclasses.dataclass(frozen=True)
class GroupSpec:
    """Static description of one candidate group's kernel section."""

    t1: int
    t2: int
    S: int            # contact slots per pair
    k: int            # pairs evaluated (K for pruned groups, len(idx) else)
    row_off: int      # first row of this group in the compact table
    n_arrays: int     # operands consumed from the flat array list
    use_mpr: bool


def _group_fn(spec: GroupSpec, hull1, hull2):
    from gymnasium_robotics_tpu.physics import collision_vec as CV

    if spec.t2 == T.MESH:
        return CV._mesh_group_fn(
            spec.t1, hull1, hull2, use_mpr=spec.use_mpr
        )
    return CV._dispatch(spec.t1, spec.t2)


def pack_group_arrays(spec_t1, p1, R1, s1, p2, R2, s2, hull1, hull2):
    """Flatten one group's operands (hulls ((fn, fd), hv) or None) into the
    kernel's array list order."""
    arrs = [p1, R1, s1, p2, R2, s2]
    for h in (hull1, hull2):
        if h is not None:
            (fn, fd), hv = h
            arrs += [fn, fd, hv]
    return arrs


def _unpack(spec: GroupSpec, vals):
    p1, R1, s1, p2, R2, s2 = vals[:6]
    rest = vals[6:]
    hull1 = hull2 = None
    # hull1 present only for (MESH, MESH) groups; hull2 for any (t1, MESH)
    if spec.t2 == T.MESH:
        if spec.t1 == T.MESH:
            hull1 = ((rest[0], rest[1]), rest[2])
            rest = rest[3:]
        hull2 = ((rest[0], rest[1]), rest[2])
    return p1, R1, s1, p2, R2, s2, hull1, hull2


def _emit_group(spec: GroupSpec, vals, lanes):
    """Run one group's formula on loaded values; returns (dist (rows, L),
    pos (rows, 3, L), frame (rows, 3, 3, L)) in the XLA path's row order
    (pair-major: row = pair * S + slot)."""
    from gymnasium_robotics_tpu.physics import collision_vec as CV

    k, S = spec.k, spec.S
    rows = k * S
    p1, R1, s1, p2, R2, s2, hull1, hull2 = _unpack(spec, vals)
    fn = _group_fn(spec, hull1, hull2)
    dtype = p1.dtype
    if fn is None:
        # Unsupported type pair: emit the SAME placeholder as the XLA branch
        # (z normal + NaN tangent through _contact_frame_soa,
        # collision_vec.py:1007-1013) so contact.frame is bitwise identical
        # between paths even for inactive slots (ADVICE r4).
        dist = jnp.full((rows, lanes), _BIG, dtype)
        pos = jnp.zeros((rows, 3, lanes), dtype)
        nn_r = jnp.zeros((rows, 3, lanes), dtype).at[:, 2].set(1.0)
        tt_r = jnp.full((rows, 3, lanes), jnp.nan, dtype)
        frame = CV._contact_frame_soa(
            jnp.swapaxes(nn_r, 0, 1), jnp.swapaxes(tt_r, 0, 1)
        )
        frame = jnp.moveaxis(frame, (0, 1, 2), (2, 1, 0))
        return dist, pos, frame
    res = fn(p1, R1, s1, p2, R2, s2)
    if len(res) == 4:
        dd, pp, nn, tt = res
    else:
        dd, pp, nn = res
        tt = jnp.full(nn.shape, jnp.nan, dtype)
    # (S,k,L) -> (k*S, L); (S,3,k,L) -> (k*S, 3, L)   [pair-major rows]
    dist = jnp.swapaxes(dd, 0, 1).reshape(rows, lanes)
    pos = jnp.moveaxis(pp, 2, 0).reshape(rows, 3, lanes)
    nn_r = jnp.moveaxis(nn, 2, 0).reshape(rows, 3, lanes)
    tt_r = jnp.moveaxis(tt, 2, 0).reshape(rows, 3, lanes)
    # frame rows exactly like the XLA path: _contact_frame_soa on (3, N, L)
    frame = CV._contact_frame_soa(
        jnp.swapaxes(nn_r, 0, 1), jnp.swapaxes(tt_r, 0, 1)
    )                                   # (3comp, 3rows, N, L)
    frame = jnp.moveaxis(frame, (0, 1, 2), (2, 1, 0))  # (N, 3rows, 3comp, L)
    return dist, pos, frame


def topk_select(rank_pad, masks_np, K: int, interpret: bool = False):
    """Indices of the K smallest ranks per (group, lane): rank_pad
    (G, maxk, B) float32, masks_np (G, maxk) numpy bool -> order (G, K, B)
    int32, first-index tie-break — the same selection (set AND order) as
    ``lax.top_k(-moveaxis(rank_pad, 1, 2), K)``, whose lane-axis sort
    measured 15.9 ms alone for kitchen's (20, 1126, 512) table on the
    tunneled v5e. Here: K rounds of (min over the SUBLANE axis + first-min
    index + mask) with the table VMEM-resident across rounds — the pair
    axis never touches the lane dimension."""
    G, maxk, B = rank_pad.shape
    # narrow tile: the (G, maxk, tile) table + iota + per-round temporaries
    # must fit Mosaic's scoped VMEM (tile=512 OOMed at kitchen's 20x1126)
    tile = min(_LANES, -(-B // _LANES) * _LANES)
    Bp = -(-B // tile) * tile
    if Bp != B:
        rank_pad = jnp.pad(rank_pad, ((0, 0), (0, 0), (0, Bp - B)))
    mask = jnp.asarray(masks_np, jnp.float32)[:, :, None]   # (G, maxk, 1)

    def kernel(rank_ref, mask_ref, out_ref):
        inf = float("inf")  # python scalar: a traced f32[] closure constant
        # would be rejected by the pallas kernel tracer
        d = jnp.where(mask_ref[...] > 0, rank_ref[...], inf)
        iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        for j in range(K):
            m = jnp.min(d, axis=1, keepdims=True)           # (G, 1, T)
            idx = jnp.min(
                jnp.where(d == m, iota, jnp.int32(maxk)), axis=1
            )                                               # (G, T)
            out_ref[:, j, :] = idx
            d = jnp.where(iota == idx[:, None, :], inf, d)

    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((G, maxk, tile), lambda i: (0, 0, i)),
            pl.BlockSpec((G, maxk, 1), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, K, tile), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((G, K, Bp), jnp.int32),
        interpret=interpret,
        compiler_params=_tpu_params(),
    )(rank_pad, mask)
    return out[..., :B]


def narrowphase_megakernel(
    specs: Tuple[GroupSpec, ...],
    arrays,
    ncon_c: int,
    B: int,
    dtype=jnp.float32,
    interpret: bool = False,
):
    """Evaluate every group's contact formula in one pallas dispatch.

    arrays: flat list (group-major, pack_group_arrays order); every array is
    batch-last with last dim == B (per-lane operand) or == 1 (static model
    table, broadcast in-kernel). Returns (dist (ncon_c, B),
    pos (ncon_c, 3, B), frame (ncon_c, 3, 3, B)).
    """
    assert ncon_c == sum(s.k * s.S for s in specs)
    # adaptive lane tile: all input/output blocks are resident (and double-
    # buffered) per program — shrink the tile until they fit the scoped
    # VMEM budget (B=1024 at tile=512 OOMed for kitchen's 225 operands)
    per_lane = sum(
        int(np.prod(a.shape[:-1])) * 4 for a in arrays if a.shape[-1] == B
    ) + ncon_c * 13 * 4
    static_b = sum(
        int(np.prod(a.shape)) * 4 for a in arrays if a.shape[-1] != B
    )
    budget = 40 * 1024 * 1024
    tile = min(_TILE, -(-B // _LANES) * _LANES)
    while tile > _LANES and per_lane * tile + static_b > budget:
        tile //= 2
    Bp = -(-B // tile) * tile
    n_in = len(arrays)

    padded = []
    in_specs = []
    for a in arrays:
        a = jnp.asarray(a, dtype) if a.dtype != dtype else a
        last = a.shape[-1]
        if last == B:
            if Bp != B:
                pad = [(0, 0)] * (a.ndim - 1) + [(0, Bp - B)]
                a = jnp.pad(a, pad)
            blk = a.shape[:-1] + (tile,)
            nlead = a.ndim - 1
            in_specs.append(
                pl.BlockSpec(blk, lambda i, n=nlead: (0,) * n + (i,))
            )
        else:
            # static table (Bm == 1): whole array resident, no tiling
            in_specs.append(
                pl.BlockSpec(a.shape, lambda i, n=a.ndim: (0,) * n)
            )
        padded.append(a)

    out_shapes = [
        jax.ShapeDtypeStruct((ncon_c, Bp), dtype),
        jax.ShapeDtypeStruct((ncon_c, 3, Bp), dtype),
        jax.ShapeDtypeStruct((ncon_c, 3, 3, Bp), dtype),
    ]
    out_specs = [
        pl.BlockSpec((ncon_c, tile), lambda i: (0, i)),
        pl.BlockSpec((ncon_c, 3, tile), lambda i: (0, 0, i)),
        pl.BlockSpec((ncon_c, 3, 3, tile), lambda i: (0, 0, 0, i)),
    ]

    def kernel(*refs):
        in_refs = refs[:n_in]
        dist_ref, pos_ref, frame_ref = refs[n_in:]
        idx = 0
        for spec in specs:
            vals = [in_refs[idx + j][...] for j in range(spec.n_arrays)]
            idx += spec.n_arrays
            dist, pos, frame = _emit_group(spec, vals, tile)
            r0, r1 = spec.row_off, spec.row_off + spec.k * spec.S
            dist_ref[r0:r1, :] = dist
            pos_ref[r0:r1, :, :] = pos
            frame_ref[r0:r1, :, :, :] = frame

    dist, pos, frame = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=_tpu_params(),
    )(*padded)
    return dist[..., :B], pos[..., :B], frame[..., :B]
