"""Fused Newton constraint solver for small systems (pallas).

The generic solver (constraint.solve_constraints) lowers to ~200 XLA kernels
per substep (Newton iterations x unrolled line search); on the tunneled TPU
runtime each kernel pays ~0.1ms dispatch, so PointMaze-class models are
kernel-count bound. This kernel runs the ENTIRE Newton loop — gradient,
2x2 Hessian solve, exact line search, final force extraction — in ONE pallas
program per 128-environment lane block (environments live on the TPU lane
dimension; a custom_vmap rule turns the env-level vmap into the block grid).

Semantics are identical to constraint.solve_constraints:420-496 (same
active-set rule, same alpha clip, same unilateral force clamp); the unit test
checks bitwise agreement on real PointMaze systems. Two kernels:
``solve_small_nv2`` is hand-specialized to nv == 2 (point-maze ball,
inverted pendulum); ``solve_small`` handles general nv up to the VMEM gate
in constraint.py (currently nv <= 36 and n_rows*nv <= 10k — hand and adroit
qualify at contact_cap=16, kitchen stays on the generic path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128


def _tpu_params():
    """Raise Mosaic's scoped-VMEM soft limit (default 16 MB; the v5e has
    128 MB): the looped Newton kernel's J block + loop-body stack peaks at
    ~20 MB for hand (nv=36, ne=272). None off-TPU (interpret mode)."""
    if jax.default_backend() != "tpu":
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _kernel(n_iter: int, n_ls: int,
            M3_ref, asm_ref, a0_ref, J0_ref, J1_ref, aref_ref, D_ref, act_ref,
            iseq_ref, qacc_ref, f_ref):
    # lane layout: every array is (rows, 128) with one env per lane
    m00 = M3_ref[0:1, :]
    m01 = M3_ref[1:2, :]
    m11 = M3_ref[2:3, :]
    as0 = asm_ref[0:1, :]
    as1 = asm_ref[1:2, :]
    J0 = J0_ref[...]
    J1 = J1_ref[...]
    aref = aref_ref[...]
    D = D_ref[...]
    act = act_ref[...]
    iseq = iseq_ref[...]
    uni = 1.0 - iseq

    # warmstart from the previous substep's qacc (mj_warmstart semantics)
    a0 = a0_ref[0:1, :]
    a1 = a0_ref[1:2, :]

    def dw_of(x):
        aset = jnp.maximum(iseq, jnp.where(x < 0.0, 1.0, 0.0)) * act
        return aset * D

    def rsum(x):
        return jnp.sum(x, axis=0, keepdims=True)

    for _ in range(n_iter):
        x = J0 * a0 + J1 * a1 - aref
        Dw = dw_of(x)
        gx = Dw * x
        da0 = a0 - as0
        da1 = a1 - as1
        grad0 = m00 * da0 + m01 * da1 + rsum(J0 * gx)
        grad1 = m01 * da0 + m11 * da1 + rsum(J1 * gx)
        h00 = m00 + rsum(Dw * J0 * J0)
        h01 = m01 + rsum(Dw * J0 * J1)
        h11 = m11 + rsum(Dw * J1 * J1)
        det = h00 * h11 - h01 * h01
        p0 = -(h11 * grad0 - h01 * grad1) / det
        p1 = -(-h01 * grad0 + h00 * grad1) / det
        # exact line search (constraint.py:454-473)
        Jp = J0 * p0 + J1 * p1
        pMp = p0 * (m00 * p0 + m01 * p1) + p1 * (m01 * p0 + m11 * p1)
        pMa = p0 * (m00 * da0 + m01 * da1) + p1 * (m01 * da0 + m11 * da1)
        alpha = jnp.ones_like(p0)
        for _ls in range(n_ls):
            x2 = x + alpha * Jp
            Dw2 = dw_of(x2)
            dphi = alpha * pMp + pMa + rsum(Dw2 * x2 * Jp)
            ddphi = pMp + rsum(Dw2 * Jp * Jp)
            alpha = alpha - dphi / jnp.maximum(ddphi, 1e-12)
        alpha = jnp.clip(alpha, 0.0, 4.0)
        a0 = a0 + alpha * p0
        a1 = a1 + alpha * p1

    x = J0 * a0 + J1 * a1 - aref
    Dw = dw_of(x)
    f = -Dw * x
    # unilateral rows cannot pull (constraint.py:489-490)
    f = jnp.where(uni > 0.0, jnp.maximum(f, 0.0), f)
    qfc0 = rsum(J0 * f)
    qfc1 = rsum(J1 * f)
    detM = m00 * m11 - m01 * m01
    q0 = as0 + (m11 * qfc0 - m01 * qfc1) / detM
    q1 = as1 + (-m01 * qfc0 + m00 * qfc1) / detM
    qacc_ref[...] = jnp.concatenate([q0, q1], axis=0)
    f_ref[...] = f


def _solve_block(M3, asm, a0, J0, J1, aref, D, act, iseq, n_iter, n_ls,
                 interpret):
    """All inputs lane-layout (rows, Bp) with Bp % 128 == 0."""
    ne, Bp = J0.shape
    dtype = J0.dtype
    grid = Bp // _LANES

    def spec(rows):
        return pl.BlockSpec((rows, _LANES), lambda i: (0, i))

    qacc, f = pl.pallas_call(
        functools.partial(_kernel, n_iter, n_ls),
        grid=(grid,),
        in_specs=[spec(3), spec(2), spec(2), spec(ne), spec(ne), spec(ne),
                  spec(ne), spec(ne), spec(ne)],
        out_specs=[spec(2), spec(ne)],
        out_shape=(
            jax.ShapeDtypeStruct((2, Bp), dtype),
            jax.ShapeDtypeStruct((ne, Bp), dtype),
        ),
        interpret=interpret,
    )(M3, asm, a0, J0, J1, aref, D, act, iseq)
    return qacc, f


def _solve_batched(M, asm, a0, J, aref, D, active, is_eq, n_iter, n_ls,
                   interpret):
    """Batched solve: M (B,2,2), asm/a0 (B,2), J (B,ne,2), rest (B,ne)."""
    B, ne = aref.shape
    dtype = J.dtype
    Bp = -(-B // _LANES) * _LANES
    pad = Bp - B

    def lane(x):  # (B, rows...) -> (rows, Bp)
        x = jnp.moveaxis(x, 0, -1)
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x.astype(dtype)

    M3 = lane(jnp.stack([M[:, 0, 0], M[:, 0, 1], M[:, 1, 1]], axis=-1))
    if pad:  # keep padded-det nonzero
        M3 = M3.at[0, B:].set(1.0).at[2, B:].set(1.0)
    asmT = lane(asm)
    a0T = lane(a0)
    J0 = lane(J[:, :, 0])
    J1 = lane(J[:, :, 1])
    qacc, f = _solve_block(
        M3, asmT, a0T, J0, J1, lane(aref), lane(D),
        lane(active.astype(dtype)), lane(is_eq.astype(dtype)),
        n_iter, n_ls, interpret,
    )
    return (
        jnp.moveaxis(qacc[:, :B], -1, 0),
        jnp.moveaxis(f[:, :B], -1, 0),
    )


@functools.lru_cache(maxsize=None)
def _make_solver(n_iter: int, n_ls: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def solve(M, asm, a0, J, aref, D, active, is_eq):
        qacc, f = _solve_batched(
            M[None], asm[None], a0[None], J[None], aref[None], D[None],
            active[None], is_eq[None], n_iter, n_ls, interpret,
        )
        return qacc[0], f[0]

    @solve.def_vmap
    def _rule(axis_size, in_batched, M, asm, a0, J, aref, D, active, is_eq):
        def bc(x, b, shape):
            return x if b else jnp.broadcast_to(x, (axis_size,) + shape)

        M = bc(M, in_batched[0], (2, 2))
        asm = bc(asm, in_batched[1], (2,))
        a0 = bc(a0, in_batched[2], (2,))
        ne = J.shape[-2] if in_batched[3] else J.shape[0]
        J = bc(J, in_batched[3], (ne, 2))
        aref = bc(aref, in_batched[4], (ne,))
        D = bc(D, in_batched[5], (ne,))
        active = bc(active, in_batched[6], (ne,))
        is_eq = bc(is_eq, in_batched[7], (ne,))
        out = _solve_batched(
            M, asm, a0, J, aref, D, active, is_eq, n_iter, n_ls, interpret
        )
        return out, (True, True)

    return solve


def solve_small_nv2(M, a_smooth, a_warm, J, aref, D, active, is_eq,
                    n_iter: int, n_ls: int, interpret: bool = False):
    """Single-env fused Newton solve for nv=2, warmstarted at a_warm
    (mj_warmstart semantics); vmap-compatible (the env-level vmap becomes the
    pallas lane/grid batching). Returns (qacc, f)."""
    solve = _make_solver(n_iter, n_ls, interpret)
    return solve(M, a_smooth, a_warm, J, aref, D, active, is_eq)


# ---------------------------------------------------------------------------
# Generic small-nv variant: same program structure, but the 2x2 closed-form
# Hessian solve becomes an unrolled in-kernel Cholesky over (1, 128) lane
# rows. nv is a compile-time constant; every loop below unrolls at trace time
# inside the ONE pallas program.
# ---------------------------------------------------------------------------

def _chol_solve_lanes(H, b, nv):
    """Solve H x = b per lane; H is a dict {(i,j): (1,128)} lower incl diag,
    b a list of nv (1,128) rows. Unrolled Cholesky (LL^T)."""
    L = {}
    for i in range(nv):
        s = H[(i, i)]
        for k in range(i):
            s = s - L[(i, k)] * L[(i, k)]
        L[(i, i)] = jnp.sqrt(jnp.maximum(s, 1e-20))
        for j in range(i + 1, nv):
            s = H[(j, i)]
            for k in range(i):
                s = s - L[(j, k)] * L[(i, k)]
            L[(j, i)] = s / L[(i, i)]
    # forward substitution L y = b
    y = []
    for i in range(nv):
        s = b[i]
        for k in range(i):
            s = s - L[(i, k)] * y[k]
        y.append(s / L[(i, i)])
    # back substitution L^T x = y
    x = [None] * nv
    for i in reversed(range(nv)):
        s = y[i]
        for k in range(i + 1, nv):
            s = s - L[(k, i)] * x[k]
        x[i] = s / L[(i, i)]
    return x


def _kernel_nv(nv: int, n_iter: int, n_ls: int,
               M_ref, asm_ref, a0_ref, J_ref, aref_ref, D_ref, act_ref,
               iseq_ref, qacc_ref, f_ref):
    # M_ref (nv*(nv+1)//2, 128) packed lower-tri rows; J_ref (nv, ne, 128)
    Mp = {}
    idx = 0
    for i in range(nv):
        for j in range(i + 1):
            Mp[(i, j)] = M_ref[idx:idx + 1, :]
            Mp[(j, i)] = Mp[(i, j)]
            idx += 1
    asm = [asm_ref[i:i + 1, :] for i in range(nv)]
    Jk = [J_ref[k] for k in range(nv)]
    aref = aref_ref[...]
    D = D_ref[...]
    act = act_ref[...]
    iseq = iseq_ref[...]
    uni = 1.0 - iseq

    def dw_of(x):
        aset = jnp.maximum(iseq, jnp.where(x < 0.0, 1.0, 0.0)) * act
        return aset * D

    def rsum(x):
        return jnp.sum(x, axis=0, keepdims=True)

    def Mmul(v):  # list of nv rows -> list of nv rows
        return [
            sum(Mp[(i, j)] * v[j] for j in range(nv)) for i in range(nv)
        ]

    def Jdot(a):  # (ne, 128)
        out = Jk[0] * a[0]
        for k in range(1, nv):
            out = out + Jk[k] * a[k]
        return out

    # warmstart from the previous substep's qacc (mj_warmstart semantics).
    # The Newton and line-search loops are lax loops (not Python unrolls):
    # Mosaic then compiles ONE body — at nv~29-36, n_iter 5-8 an unrolled
    # kernel blows past a 25-minute compile while the looped one stays in
    # the minutes range, at identical semantics (trip counts are static).
    def newton_body(_, a_mat):
        a = [a_mat[i:i + 1, :] for i in range(nv)]
        x = Jdot(a) - aref
        Dw = dw_of(x)
        gx = Dw * x
        da = [a[i] - asm[i] for i in range(nv)]
        Mda = Mmul(da)
        grad = [Mda[i] + rsum(Jk[i] * gx) for i in range(nv)]
        H = {}
        for i in range(nv):
            DJi = Dw * Jk[i]
            for j in range(i + 1):
                H[(i, j)] = Mp[(i, j)] + rsum(DJi * Jk[j])
        p = _chol_solve_lanes(H, [-g for g in grad], nv)
        # exact line search (constraint.py:454-473)
        Jp = Jdot(p)
        Mpv = Mmul(p)
        pMp = sum(p[i] * Mpv[i] for i in range(nv))
        pMa = sum(p[i] * Mda[i] for i in range(nv))

        def ls_body(_, alpha):
            x2 = x + alpha * Jp
            Dw2 = dw_of(x2)
            dphi = alpha * pMp + pMa + rsum(Dw2 * x2 * Jp)
            ddphi = pMp + rsum(Dw2 * Jp * Jp)
            return alpha - dphi / jnp.maximum(ddphi, 1e-12)

        alpha = jax.lax.fori_loop(0, n_ls, ls_body, jnp.ones_like(pMp))
        alpha = jnp.clip(alpha, 0.0, 4.0)
        return jnp.concatenate([a[i] + alpha * p[i] for i in range(nv)], axis=0)

    a_mat = jax.lax.fori_loop(0, n_iter, newton_body, a0_ref[...])
    a = [a_mat[i:i + 1, :] for i in range(nv)]

    x = Jdot(a) - aref
    Dw = dw_of(x)
    f = -Dw * x
    f = jnp.where(uni > 0.0, jnp.maximum(f, 0.0), f)
    qfc = [rsum(Jk[i] * f) for i in range(nv)]
    Mh = {k: v for k, v in Mp.items()}
    dq = _chol_solve_lanes(Mh, qfc, nv)
    qacc_ref[...] = jnp.concatenate(
        [asm[i] + dq[i] for i in range(nv)], axis=0
    )
    f_ref[...] = f


def _solve_batched_nv(M, asm, a0, J, aref, D, active, is_eq, nv, n_iter,
                      n_ls, interpret):
    """Batched solve for general small nv: M (B,nv,nv), asm/a0 (B,nv),
    J (B,ne,nv), rest (B,ne)."""
    B, ne = aref.shape
    dtype = J.dtype
    Bp = -(-B // _LANES) * _LANES
    pad = Bp - B

    def lane(x):
        x = jnp.moveaxis(x, 0, -1)
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x.astype(dtype)

    packed = [M[:, i, j] for i in range(nv) for j in range(i + 1)]
    M3 = lane(jnp.stack(packed, axis=-1))
    if pad:  # identity on padded lanes keeps the Cholesky well-posed
        idx = 0
        for i in range(nv):
            for j in range(i + 1):
                if i == j:
                    M3 = M3.at[idx, B:].set(1.0)
                idx += 1
    asmT = lane(asm)
    a0T = lane(a0)
    Jl = lane(J.transpose(0, 2, 1))  # (B, nv, ne) -> (nv, ne, Bp)
    qacc, f = _newton_lanes(
        M3, asmT, a0T, Jl, lane(aref), lane(D),
        lane(active.astype(dtype)), lane(is_eq.astype(dtype)),
        nv, n_iter, n_ls, interpret,
    )
    return (
        jnp.moveaxis(qacc[:, :B], -1, 0),
        jnp.moveaxis(f[:, :B], -1, 0),
    )


def _newton_lanes(M3, asmT, a0T, Jl, arefl, Dl, actl, iseql,
                  nv, n_iter, n_ls, interpret):
    """Lane-layout fused Newton: M3 (nM, Bp), asmT/a0T (nv, Bp),
    Jl (nv, ne, Bp), rest (ne, Bp); Bp % 128 == 0."""
    nM, Bp = M3.shape
    ne = arefl.shape[0]
    dtype = Jl.dtype
    grid = Bp // _LANES

    def spec2(rows):
        return pl.BlockSpec((rows, _LANES), lambda i: (0, i))

    return pl.pallas_call(
        functools.partial(_kernel_nv, nv, n_iter, n_ls),
        grid=(grid,),
        in_specs=[
            spec2(nM), spec2(nv), spec2(nv),
            pl.BlockSpec((nv, ne, _LANES), lambda i: (0, 0, i)),
            spec2(ne), spec2(ne), spec2(ne), spec2(ne),
        ],
        out_specs=[spec2(nv), spec2(ne)],
        out_shape=(
            jax.ShapeDtypeStruct((nv, Bp), dtype),
            jax.ShapeDtypeStruct((ne, Bp), dtype),
        ),
        interpret=interpret,
        compiler_params=_tpu_params(),
    )(M3, asmT, a0T, Jl, arefl, Dl, actl, iseql)


@functools.lru_cache(maxsize=None)
def _make_solver_nv(nv: int, n_iter: int, n_ls: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def solve(M, asm, a0, J, aref, D, active, is_eq):
        qacc, f = _solve_batched_nv(
            M[None], asm[None], a0[None], J[None], aref[None], D[None],
            active[None], is_eq[None], nv, n_iter, n_ls, interpret,
        )
        return qacc[0], f[0]

    @solve.def_vmap
    def _rule(axis_size, in_batched, M, asm, a0, J, aref, D, active, is_eq):
        def bc(x, b, shape):
            return x if b else jnp.broadcast_to(x, (axis_size,) + shape)

        ne = J.shape[-2]
        M = bc(M, in_batched[0], (nv, nv))
        asm = bc(asm, in_batched[1], (nv,))
        a0 = bc(a0, in_batched[2], (nv,))
        J = bc(J, in_batched[3], (ne, nv))
        aref = bc(aref, in_batched[4], (ne,))
        D = bc(D, in_batched[5], (ne,))
        active = bc(active, in_batched[6], (ne,))
        is_eq = bc(is_eq, in_batched[7], (ne,))
        out = _solve_batched_nv(
            M, asm, a0, J, aref, D, active, is_eq, nv, n_iter, n_ls, interpret
        )
        return out, (True, True)

    return solve


def solve_small(M, a_smooth, a_warm, J, aref, D, active, is_eq,
                n_iter: int, n_ls: int, interpret: bool = False):
    """Fused Newton solve for general small nv (compile-time constant from
    J's static shape), warmstarted at a_warm; vmap-compatible.
    Returns (qacc, f)."""
    nv = J.shape[-1]
    solve = _make_solver_nv(nv, n_iter, n_ls, interpret)
    return solve(M, a_smooth, a_warm, J, aref, D, active, is_eq)


# ---------------------------------------------------------------------------
# Fused positive-definite solve (lane layout): one pallas kernel replacing
# XLA's batched Cholesky custom-calls for qacc_smooth (pipeline.forward) and
# the Euler implicit-damping solve (pipeline._euler). Batch rides the lane
# dimension; the unrolled in-kernel Cholesky is _chol_solve_lanes.
# ---------------------------------------------------------------------------

def _kernel_chol(nv: int, M_ref, b_ref, x_ref):
    Mp = {}
    idx = 0
    for i in range(nv):
        for j in range(i + 1):
            Mp[(i, j)] = M_ref[idx:idx + 1, :]
            idx += 1
    b = [b_ref[i:i + 1, :] for i in range(nv)]
    x = _chol_solve_lanes(Mp, b, nv)
    x_ref[...] = jnp.concatenate(x, axis=0)


def _chol_batched(M, b, nv, interpret):
    B = b.shape[0]
    dtype = b.dtype
    Bp = -(-B // _LANES) * _LANES
    pad = Bp - B

    def lane(x):
        x = jnp.moveaxis(x, 0, -1)
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x.astype(dtype)

    packed = [M[:, i, j] for i in range(nv) for j in range(i + 1)]
    Ml = lane(jnp.stack(packed, axis=-1))
    if pad:
        idx = 0
        for i in range(nv):
            for j in range(i + 1):
                if i == j:
                    Ml = Ml.at[idx, B:].set(1.0)
                idx += 1
    bl = lane(b)
    x = _chol_lanes(Ml, bl, nv, interpret)
    return jnp.moveaxis(x[:, :B], -1, 0)


def _chol_lanes(Ml, bl, nv, interpret):
    """Lane-layout SPD solve: Ml (nM, Bp) packed lower-tri, bl (nv, Bp)."""
    nM, Bp = Ml.shape
    dtype = bl.dtype
    grid = Bp // _LANES

    def spec2(rows):
        return pl.BlockSpec((rows, _LANES), lambda i: (0, i))

    return pl.pallas_call(
        functools.partial(_kernel_chol, nv),
        grid=(grid,),
        in_specs=[spec2(nM), spec2(nv)],
        out_specs=spec2(nv),
        out_shape=jax.ShapeDtypeStruct((nv, Bp), dtype),
        interpret=interpret,
    )(Ml, bl)


@functools.lru_cache(maxsize=None)
def _make_chol(nv: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def solve(M, b):
        return _chol_batched(M[None], b[None], nv, interpret)[0]

    @solve.def_vmap
    def _rule(axis_size, in_batched, M, b):
        if not in_batched[0]:
            M = jnp.broadcast_to(M, (axis_size, nv, nv))
        if not in_batched[1]:
            b = jnp.broadcast_to(b, (axis_size, nv))
        return _chol_batched(M, b, nv, interpret), True

    return solve


def solve_pos_lanes(M, b, interpret: bool = False):
    """Single-env SPD solve M x = b ((nv, nv), (nv,)); vmap-compatible — the
    env batch becomes the pallas lane/grid batching. The TPU replacement for
    jax.scipy.linalg.solve(assume_a="pos")'s batched-Cholesky custom call."""
    nv = b.shape[-1]
    solve = _make_chol(nv, interpret)
    return solve(M, b)


# ---------------------------------------------------------------------------
# SoA (batch-last) direct entries: the SoA substep pipeline (physics/soa.py)
# keeps every array batch-last, so the lane layout the kernels want is just a
# pad on the trailing axis — no moveaxis boundary per call.
# ---------------------------------------------------------------------------

def _pad_b(x, Bp):
    B = x.shape[-1]
    if Bp == B:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)])


def _pack_tril_soa(M, nv):
    """M (nv, nv, B) -> (nv*(nv+1)//2, B) packed lower-tri, one gather."""
    idx = [i * nv + j for i in range(nv) for j in range(i + 1)]
    import numpy as _np

    return M.reshape(nv * nv, M.shape[-1])[jnp.asarray(_np.array(idx))]


def _diag_rows(nv):
    """Packed-lower-tri row indices of the diagonal entries."""
    rows, idx = [], 0
    for i in range(nv):
        for j in range(i + 1):
            if i == j:
                rows.append(idx)
            idx += 1
    return rows


def solve_pos_soa(M, b, interpret: bool = False):
    """Batch-last SPD solve: M (nv, nv, B), b (nv, B) -> (nv, B)."""
    nv, B = b.shape
    Bp = -(-B // _LANES) * _LANES
    Ml = _pad_b(_pack_tril_soa(M, nv).astype(b.dtype), Bp)
    if Bp != B:  # identity on padded lanes keeps the Cholesky well-posed
        Ml = Ml.at[jnp.asarray(_diag_rows(nv))[:, None], B:].set(1.0)
    x = _chol_lanes(Ml, _pad_b(b, Bp), nv, interpret)
    return x[:, :B]


def solve_small_soa(M, a_smooth, a_warm, J, aref, D, active, is_eq,
                    n_iter: int, n_ls: int, interpret: bool = False):
    """Batch-last fused Newton: M (nv, nv, B), a_smooth/a_warm (nv, B),
    J (ne, nv, B), aref/D/active/is_eq (ne, B) -> (qacc (nv, B), f (ne, B)).
    Same program as solve_small (kernel _kernel_nv), minus the B-leading
    boundary transposes."""
    nv, B = a_smooth.shape
    dtype = J.dtype
    Bp = -(-B // _LANES) * _LANES
    Ml = _pad_b(_pack_tril_soa(M, nv).astype(dtype), Bp)
    if Bp != B:
        Ml = Ml.at[jnp.asarray(_diag_rows(nv))[:, None], B:].set(1.0)
    qacc, f = _newton_lanes(
        Ml, _pad_b(a_smooth, Bp), _pad_b(a_warm, Bp),
        _pad_b(jnp.swapaxes(J, 0, 1), Bp), _pad_b(aref, Bp), _pad_b(D, Bp),
        _pad_b(active.astype(dtype), Bp), _pad_b(is_eq.astype(dtype), Bp),
        nv, n_iter, n_ls, interpret,
    )
    return qacc[:, :B], f[:, :B]
