"""Minkowski Portal Refinement for convex-hull pairs (batch-last, masked).

The face-SAT hull narrowphase (collision_vec._make_hull_hull) only evaluates
vertex/face features; penetrations supported by an edge-edge feature pair
(finger edge on block edge — the common in-hand case) get a wrong axis and a
shallower depth. MPR recovers the penetration direction/depth for any convex
pair using only support-function evaluations, which on TPU are a fixed-shape
argmax over the hull's (padded) vertex table — every loop below is a
fixed-iteration masked unroll, so the whole routine jits with static shapes.

This is the same algorithm family the reference reaches through MuJoCo's
convex collider inside mj_step (gymnasium_robotics/envs/robot_env.py:340-341;
MuJoCo's convex pipeline historically wraps libccd's ccdMPRPenetration, whose
phase structure — discover portal, expand portal, point-triangle penetration
info — is followed here). Shapes follow collision_vec's SoA convention:
vectors (3, k, B), poses R (3, 3, k, B), hull vertex tables (V, 3, k, 1).

Only the PENETRATING case is produced (depth >= 0 with `ok`); separated
pairs keep the face-SAT positive-distance estimates, which are exact for
vertex-face witness features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gymnasium_robotics_tpu.physics.collision_vec import (
    _cross, _dot, _matTvec, _matvec,
)

_EPS = 1e-9


def _support_verts(hv, d_l):
    """argmax over the hull's vertex table: hv (V, 3, k, 1), d_l (3, k, B)
    -> (3, k, B)."""
    dots = jnp.sum(hv * d_l[None], axis=1)            # (V, k, B)
    i = jnp.argmax(dots, axis=0)
    iota = jax.lax.broadcasted_iota(jnp.int32, dots.shape, 0)
    onehot = (iota == i[None]).astype(d_l.dtype)
    return jnp.sum(onehot[:, None] * hv, axis=0)


def _where(c, a, b):
    """Select with a (k, B) mask over (3, k, B) vectors."""
    return jnp.where(c[None], a, b)


def _norm3(v):
    return jnp.sqrt(jnp.maximum(_dot(v, v), 0.0))


def _normz(v):
    n = _norm3(v)
    return v / jnp.maximum(n, _EPS)[None]


def penetration(p1, R1, hv1, p2, R2, hv2, n_discover=12, n_refine=16):
    """MPR penetration for hull1 (p1, R1, hv1) vs hull2 (p2, R2, hv2).

    Returns (depth (k, B), direction (3, k, B), pos (3, k, B), ok (k, B)):
    depth >= 0 and `ok` when the hulls interpenetrate; direction is the unit
    contact normal pointing from hull1 INTO hull2 (MuJoCo frame convention),
    pos a point between the two witness supports.
    """

    def sup(d):
        """CSO (hull1 minus hull2) support S_1(d) - S_2(-d) with witnesses."""
        a = p1 + _matvec(R1, _support_verts(hv1, _matTvec(R1, d)))
        b = p2 + _matvec(R2, _support_verts(hv2, _matTvec(R2, -d)))
        return a - b, a, b

    dtype = p1.dtype
    # v0: interior CSO point from the hulls' vertex centroids (padding rows
    # repeat a real vertex, so the mean is a convex combination -> interior)
    c1 = p1 + _matvec(R1, jnp.mean(hv1, axis=0))
    c2 = p2 + _matvec(R2, jnp.mean(hv2, axis=0))
    v0 = c1 - c2
    # guard: coincident centers — nudge along x (libccd does the same)
    v0 = _where(_dot(v0, v0) < _EPS, jnp.zeros_like(v0).at[0].add(1e-4), v0)

    # --- discover portal (libccd ccdDiscoverPortal) ---
    d1 = _normz(-v0)
    v1, a1, b1 = sup(d1)
    ok = _dot(v1, d1) >= 0.0

    d2 = _cross(v0, v1)
    # degenerate: origin on (or near) the v0-v1 line — the common face-on
    # stacking configuration. libccd's discoverPortal returns a SEGMENT
    # result there (penetration |v1| along v1); the portal phases are
    # ill-conditioned for these lanes, so they take the segment answer and
    # are excluded from the portal result by the tetra validity mask below.
    seg = _dot(d2, d2) < 1e-8 * _dot(v0, v0) * jnp.maximum(_dot(v1, v1), _EPS)
    seg_depth = _norm3(v1)
    seg_dir = _normz(v1)
    seg_pos = 0.5 * (a1 + b1)
    alt = _cross(v1 - v0, jnp.zeros_like(v1).at[1].add(1.0))
    alt2 = _cross(v1 - v0, jnp.zeros_like(v1).at[2].add(1.0))
    alt = _where(_dot(alt, alt) < _EPS, alt2, alt)
    d2 = _normz(_where(seg, alt, d2))
    v2, a2, b2 = sup(d2)
    ok &= _dot(v2, d2) >= 0.0

    # apex direction: normal of (v0, v1, v2) plane, oriented away from v0
    d3 = _cross(v1 - v0, v2 - v0)
    flip = _dot(d3, v0) > 0.0
    v1, v2 = _where(flip, v2, v1), _where(flip, v1, v2)
    a1, a2 = _where(flip, a2, a1), _where(flip, a1, a2)
    b1, b2 = _where(flip, b2, b1), _where(flip, b1, b2)
    d3 = jnp.where(flip[None], -d3, d3)
    d3 = _normz(d3)

    v3, a3, b3 = sup(d3)
    ok &= _dot(v3, d3) >= 0.0
    done = jnp.zeros(ok.shape, bool)
    for _ in range(n_discover):
        # origin outside plane (v1, v0, v3): rotate v2 out
        out_a = _dot(_cross(v1, v3), v0) < 0.0
        # origin outside plane (v3, v0, v2): rotate v1 out
        out_b = _dot(_cross(v3, v2), v0) < 0.0
        settle = ~(out_a | out_b)
        repl2 = out_a & ~done
        repl1 = out_b & ~out_a & ~done
        done = done | settle
        v2 = _where(repl2, v3, v2)
        a2 = _where(repl2, a3, a2)
        b2 = _where(repl2, b3, b2)
        v1 = _where(repl1, v3, v1)
        a1 = _where(repl1, a3, a1)
        b1 = _where(repl1, b3, b1)
        d3 = _normz(_cross(v1 - v0, v2 - v0))
        v3c, a3c, b3c = sup(d3)
        upd = ~done
        v3 = _where(upd, v3c, v3)
        a3 = _where(upd, a3c, a3)
        b3 = _where(upd, b3c, b3)
        ok &= jnp.where(upd, _dot(v3, d3) >= 0.0, True)
    ok &= done

    # --- refine: expand the portal toward the CSO boundary ---
    # (libccd ccdMPRPenetration loop: portalDir -> support -> expandPortal)
    conv = jnp.zeros(ok.shape, bool)
    for _ in range(n_refine):
        n = _normz(_cross(v2 - v1, v3 - v1))
        v4, a4, b4 = sup(n)
        dv4 = _dot(v4, n)
        dmax = jnp.maximum(jnp.maximum(_dot(v1, n), _dot(v2, n)), _dot(v3, n))
        conv = conv | (dv4 - dmax < 1e-7)
        upd = ~conv
        # expandPortal: split by the plane through (v0, v4)
        v4v0 = _cross(v4, v0)
        s1 = _dot(v1, v4v0) > 0.0
        s2 = _dot(v2, v4v0) > 0.0
        s3 = _dot(v3, v4v0) > 0.0
        r1 = upd & ((s1 & s2) | (~s1 & ~s3))      # replace v1
        r2 = upd & (~s1 & s3)                      # replace v2
        r3 = upd & (s1 & ~s2)                      # replace v3
        v1 = _where(r1, v4, v1); a1 = _where(r1, a4, a1); b1 = _where(r1, b4, b1)
        v2 = _where(r2, v4, v2); a2 = _where(r2, a4, a2); b2 = _where(r2, b4, b2)
        v3 = _where(r3, v4, v3); a3 = _where(r3, a4, a3); b3 = _where(r3, b4, b3)

    # --- penetration info (libccd findPenetr/findPos) ---
    # origin must be inside the final portal halfspace (penetration confirmed)
    n = _normz(_cross(v2 - v1, v3 - v1))
    depth = _dot(v1, n)             # origin->portal-plane distance along n
    ok = ok & (depth >= -1e-9) & jnp.isfinite(depth)

    # witness: barycentric coords of the portal tetrahedron wrt the origin
    # (libccd findPos determinants over (v0, v1, v2, v3))
    b0 = _dot(_cross(v1, v2), v3)
    bb1 = _dot(_cross(v3, v2), v0)
    bb2 = _dot(_cross(v0, v1), v3)
    bb3 = _dot(_cross(v2, v1), v0)
    ssum = b0 + bb1 + bb2 + bb3
    # validity: the v0->origin ray must exit through the portal, i.e. the
    # origin lies inside the (v0, v1, v2, v3) tetrahedron — all barycentric
    # determinants share the orientation sign. Degenerate discovery (origin
    # near a portal wall) can otherwise converge onto an unrelated CSO face.
    scale = jnp.maximum(jnp.abs(ssum), _EPS)
    sgn_t = jnp.sign(ssum)
    tol = 1e-4
    inside = (
        (sgn_t * b0 >= -tol * scale)
        & (sgn_t * bb1 >= -tol * scale)
        & (sgn_t * bb2 >= -tol * scale)
        & (sgn_t * bb3 >= -tol * scale)
    )
    ok = ok & inside
    bad = jnp.abs(ssum) <= _EPS
    # fallback weights: project on the portal triangle only
    f1 = _dot(_cross(v2, v3), n)
    f2 = _dot(_cross(v3, v1), n)
    f3 = _dot(_cross(v1, v2), n)
    fsum = f1 + f2 + f3
    w0 = jnp.where(bad, 0.0, b0)
    w1 = jnp.where(bad, f1, bb1)
    w2 = jnp.where(bad, f2, bb2)
    w3 = jnp.where(bad, f3, bb3)
    wsum = jnp.where(bad, fsum, ssum)
    wsum = jnp.where(jnp.abs(wsum) < _EPS, 1.0, wsum)
    pa = (w0[None] * c1 + w1[None] * a1 + w2[None] * a2 + w3[None] * a3) / wsum[None]
    pb = (w0[None] * c2 + w1[None] * b1 + w2[None] * b2 + w3[None] * b3) / wsum[None]
    pos = 0.5 * (pa + pb)

    # n points from the CSO interior (v0 side) out through the portal. For a
    # shallow contact the portal sits near the CSO point closest to the
    # origin, so n ~ (c2 - c1) direction — the MuJoCo-convention contact
    # normal (from hull1 into hull2) is +n (consistent with the segment
    # path's +v1_hat; both calibrated against mj mesh-mesh contacts in
    # tests/test_physics_parity.py).
    dir_1to2 = n

    # segment lanes (origin on the v0-v1 line): libccd findPenetrSegment
    seg_ok = seg & (_dot(v1, d1) >= 0.0)
    depth = jnp.where(seg, seg_depth, depth)
    dir_1to2 = _where(seg, seg_dir, dir_1to2)
    pos = _where(seg, seg_pos, pos)
    ok = jnp.where(seg, seg_ok, ok)
    depth = jnp.maximum(depth, 0.0)
    return depth.astype(dtype), dir_1to2.astype(dtype), pos.astype(dtype), ok
