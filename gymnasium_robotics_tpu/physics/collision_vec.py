"""SoA batch-last narrowphase: the TPU-native layout for collision.

The AoS path (collision.py, single-env functions under vmap) puts the
3-component axis of every vector on the TPU lane dimension (3 of 128 lanes
used -> 42x padding waste); measured on a v5e it is ~90% of the FetchPush
substep. Here the env batch rides the LANE dimension instead: every vector is
shape (3, k, B) (components x candidate-pairs x envs), every scalar (k, B),
so the VPU runs fully occupied and per-slot sorts become unrolled
selection networks. Semantics are identical to collision.py's primitives
(same formulas, same slot layout, same contact-frame convention); the env
batch enters through a custom_vmap rule like the fused Newton solver
(solver_pallas.py) — single-env calls get B=1.

Replaces the narrowphase the reference reaches through mj_step's
mj_collision (gymnasium_robotics/envs/robot_env.py:340-341).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu.physics import narrowphase_pallas as NPK
from gymnasium_robotics_tpu.physics import types as T

_BIG = 1e10

# ---------------------------------------------------------------------------
# SoA vector helpers: vectors (3, k, B), rotations (3, 3, k, B), scalars (k, B)
# ---------------------------------------------------------------------------


def _dot(a, b):
    return jnp.sum(a * b, axis=0)


def _cross(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def _norm(a):
    return jnp.sqrt(jnp.maximum(_dot(a, a), 0.0))


def _normalize(a, eps=1e-12):
    n = _norm(a)
    return a / jnp.maximum(n, eps)[None], n


def _matvec(R, v):
    # R (3,3,k,B) rows x cols; v (3,k,B)
    return jnp.stack([_dot(R[i], v) for i in range(3)])


def _matTvec(R, v):
    return jnp.stack([_dot(R[:, i], v) for i in range(3)])


def _col(R, i):
    return R[:, i]


def _vec(*comps):
    return jnp.stack(list(comps))


def _where_v(c, a, b):
    return jnp.where(c[None], a, b)


# ---------------------------------------------------------------------------
# Primitives. Each takes (p1, R1, s1, p2, R2, s2) with p (3,k,B), R (3,3,k,B),
# s (3,k,1) and returns (dist (S,k,B), pos (S,3,k,B), n (S,3,k,B)[, tan1]).
# Formula-for-formula ports of collision.py:76-341.
# ---------------------------------------------------------------------------


def _plane_sphere(p1, R1, s1, p2, R2, s2):
    n = _col(R1, 2)
    dist = _dot(n, p2 - p1) - s2[0]
    pos = p2 - n * (s2[0] + 0.5 * dist)[None]
    return dist[None], pos[None], n[None]


def _plane_capsule(p1, R1, s1, p2, R2, s2):
    n = _col(R1, 2)
    axis = _col(R2, 2)
    pn = _dot(p1, n)
    outs_d, outs_p = [], []
    for sgn in (1.0, -1.0):
        e = p2 + axis * (sgn * s2[1])[None]
        dist = _dot(e, n) - pn - s2[0]
        pos = e - n * (s2[0] + 0.5 * dist)[None]
        outs_d.append(dist)
        outs_p.append(pos)
    # tan1 = capsule +z axis projected onto the plane (mjc probe convention)
    proj = axis - n * _dot(n, axis)[None]
    t1n, nrm = _normalize(proj, 1e-12)
    tan = jnp.where((nrm > 1e-8)[None], t1n, jnp.nan)
    return (
        jnp.stack(outs_d),
        jnp.stack(outs_p),
        jnp.stack([n, n]),
        jnp.stack([tan, tan]),
    )


_CORNER_SIGNS = np.array(
    [[i, j, k] for i in (-1, 1) for j in (-1, 1) for k in (-1, 1)],
    dtype=np.float32,
)


def _box_corners(p, R, s):
    """(8, 3, k, B) world-space corners."""
    outs = []
    for c in range(8):
        sgn = _CORNER_SIGNS[c]
        off = _vec(sgn[0] * s[0], sgn[1] * s[1], sgn[2] * s[2])
        off = jnp.broadcast_to(off, (3,) + p.shape[1:])
        outs.append(p + _matvec(R, off))
    return jnp.stack(outs)


def _take_smallest(dist, payloads, m):
    """Smallest-m rows of dist (S, k, B) with payload rows selected
    consistently; replaces argsort[:m] (unrolled repeated-argmin)."""
    S = dist.shape[0]
    d = dist
    iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 0)
    out_d, out_p = [], [[] for _ in payloads]
    for _ in range(m):
        i = jnp.argmin(d, axis=0)  # (k, B)
        onehot = (iota == i[None]).astype(dist.dtype)  # (S, k, B)
        out_d.append(jnp.sum(dist * onehot, axis=0))
        for pi, p in enumerate(payloads):
            out_p[pi].append(jnp.sum(p * onehot[:, None], axis=0))
        d = d + onehot * (2.0 * _BIG)
    return jnp.stack(out_d), [jnp.stack(p) for p in out_p]


def _plane_box(p1, R1, s1, p2, R2, s2):
    n = _col(R1, 2)
    corners = _box_corners(p2, R2, s2)  # (8,3,k,B)
    pn = _dot(p1, n)
    dist = jnp.stack([_dot(corners[c], n) - pn for c in range(8)])  # (8,k,B)
    d4, (c4,) = _take_smallest(dist, [corners], 4)
    pos = c4 - 0.5 * d4[:, None] * n[None]
    nrm = jnp.broadcast_to(n[None], (4,) + n.shape)
    return d4, pos, nrm


def _plane_cylinder(p1, R1, s1, p2, R2, s2):
    n = _col(R1, 2)
    axis = _col(R2, 2)
    perp = n - axis * _dot(n, axis)[None]
    pn_v, nrm = _normalize(perp, 1e-12)
    rad = -pn_v * s2[0][None]
    rad = _where_v(nrm > 1e-6, rad, _col(R2, 0) * s2[0][None])
    pn = _dot(p1, n)
    outs_d, outs_p = [], []
    for sgn in (1.0, -1.0):
        e = p2 + axis * (sgn * s2[1])[None] + rad
        dist = _dot(e, n) - pn
        outs_d.append(dist)
        outs_p.append(e - 0.5 * dist[None] * n)
    proj = axis - n * _dot(n, axis)[None]
    t1n, tn = _normalize(proj, 1e-12)
    tan = jnp.where((tn > 1e-8)[None], t1n, jnp.nan)
    return (
        jnp.stack(outs_d),
        jnp.stack(outs_p),
        jnp.stack([n, n]),
        jnp.stack([tan, tan]),
    )


def _sphere_sphere_at(c1, r1, c2, r2):
    dvec = c2 - c1
    nrm, d0 = _normalize(dvec, 1e-12)
    # stack-built unit vector: a static .at[].set is a scatter primitive,
    # which Mosaic cannot lower inside the narrowphase megakernel
    _z = jnp.zeros_like(nrm[0])
    zhat = jnp.stack([_z, _z, _z + 1.0])
    n = _where_v(d0 > 1e-9, nrm, zhat)
    dist = d0 - r1 - r2
    pos = c1 + n * (r1 + 0.5 * dist)[None]
    return dist[None], pos[None], n[None]


def _sphere_sphere(p1, R1, s1, p2, R2, s2):
    return _sphere_sphere_at(p1, s1[0], p2, s2[0])


def _closest_on_seg(p, a, b):
    ab = b - a
    t = jnp.clip(
        _dot(p - a, ab) / jnp.maximum(_dot(ab, ab), 1e-12), 0.0, 1.0
    )
    return a + t[None] * ab


def _sphere_capsule(p1, R1, s1, p2, R2, s2):
    axis = _col(R2, 2)
    a = p2 - axis * s2[1][None]
    b = p2 + axis * s2[1][None]
    c = _closest_on_seg(p1, a, b)
    return _sphere_sphere_at(p1, s1[0], c, s2[0])


def _sphere_box_at(c1, r1, p2, R2, s2):
    loc = _matTvec(R2, c1 - p2)  # (3,k,B) sphere center in box frame
    s2b = jnp.broadcast_to(s2, loc.shape)
    clamped = jnp.clip(loc, -s2b, s2b)
    inside = jnp.all(jnp.abs(loc) < s2b, axis=0)  # (k,B)
    face_dist = s2b - jnp.abs(loc)  # (3,k,B)
    k = jnp.argmin(face_dist, axis=0)  # (k,B)
    iota3 = jax.lax.broadcasted_iota(jnp.int32, loc.shape, 0)
    onehot = (iota3 == k[None]).astype(loc.dtype)
    sgn_k = jnp.sign(jnp.sum(loc * onehot, axis=0))  # (k,B)
    push = onehot * (sgn_k[None] * jnp.sum(s2b * onehot, axis=0)[None])
    surf_in = jnp.where(onehot > 0, push, loc)
    surf = _where_v(inside, surf_in, clamped)
    world = p2 + _matvec(R2, surf)
    dvec = world - c1
    nrm, d0 = _normalize(dvec, 1e-12)
    n_out = _where_v(d0 > 1e-9, nrm, _col(R2, 2))
    dist_out = d0 - r1
    dist_in = -(jnp.min(face_dist, axis=0) + r1)
    outward = onehot * sgn_k[None]  # box-frame face normal (3,k,B)
    n_in = -_matvec(R2, outward)
    n = _where_v(inside, n_in, n_out)
    dist = jnp.where(inside, dist_in, dist_out)
    pos = c1 + n * (r1 + 0.5 * dist)[None]
    return dist[None], pos[None], n[None]


def _sphere_box(p1, R1, s1, p2, R2, s2):
    return _sphere_box_at(p1, s1[0], p2, R2, s2)


def _point_cylinder(P, pc, Rc, s):
    """Signed distance point->cylinder; returns (sd (k,B), surf (3,k,B),
    n_out (3,k,B)). Port of collision.py:180-221."""
    q = _matTvec(Rc, P - pc)
    z = q[2]
    radial = q[:2]
    rlen = jnp.sqrt(jnp.maximum(q[0] ** 2 + q[1] ** 2, 0.0))
    safe = jnp.maximum(rlen, 1e-12)
    rdir = jnp.stack(
        [
            jnp.where(rlen > 1e-9, q[0] / safe, 1.0),
            jnp.where(rlen > 1e-9, q[1] / safe, 0.0),
        ]
    )  # (2,k,B)
    dr = rlen - s[0]
    dz = jnp.abs(z) - s[1]
    zsign = jnp.where(z >= 0, 1.0, -1.0).astype(P.dtype)
    outside_r = dr > 0
    outside_z = dz > 0
    zero = jnp.zeros_like(z)
    lat = jnp.stack(
        [rdir[0] * s[0], rdir[1] * s[0], jnp.clip(z, -s[1], s[1])]
    )
    rmin = jnp.minimum(rlen, s[0])
    cap = jnp.stack([rdir[0] * rmin, rdir[1] * rmin, zsign * s[1]])
    rim = jnp.stack([rdir[0] * s[0], rdir[1] * s[0], zsign * s[1]])
    inter = _where_v(dr > dz, lat, cap)
    surf_loc = _where_v(
        outside_r & outside_z, rim,
        _where_v(outside_r, lat, _where_v(outside_z, cap, inter)),
    )
    sd = jnp.where(
        outside_r & outside_z, jnp.sqrt(dr * dr + dz * dz),
        jnp.where(outside_r, dr, jnp.where(outside_z, dz,
                  jnp.maximum(dr, dz))),
    )
    surf = pc + _matvec(Rc, surf_loc)
    n_lat = _matvec(Rc, jnp.stack([rdir[0], rdir[1], zero]))
    n_cap = _col(Rc, 2) * zsign[None]
    diff = P - surf
    n_away, dn = _normalize(diff, 1e-12)
    n_out = _where_v(
        outside_r & outside_z, _where_v(dn > 1e-9, n_away, n_lat),
        _where_v(outside_r, n_lat, _where_v(outside_z, n_cap,
                 _where_v(dr > dz, n_lat, n_cap))),
    )
    return sd, surf, n_out


def _sphere_cylinder_at(c1, r1, p2, R2, s2):
    sd, surf, n_out = _point_cylinder(c1, p2, R2, s2)
    dist = sd - r1
    n = -n_out
    pos = 0.5 * ((c1 + n * r1[None]) + surf)
    return dist[None], pos[None], n[None]


def _sphere_cylinder(p1, R1, s1, p2, R2, s2):
    return _sphere_cylinder_at(p1, s1[0], p2, R2, s2)


def _capsule_cylinder(p1, R1, s1, p2, R2, s2):
    ax = _col(R1, 2)

    def sd_at(t):
        return _point_cylinder(p1 + ax * (t * s1[1])[None], p2, R2, s2)[0]

    lo = jnp.full(p1.shape[1:], -1.0, p1.dtype)
    hi = jnp.full(p1.shape[1:], 1.0, p1.dtype)
    for _ in range(24):
        m1 = lo + (hi - lo) / 3
        m2 = hi - (hi - lo) / 3
        go_right = sd_at(m1) > sd_at(m2)
        lo = jnp.where(go_right, m1, lo)
        hi = jnp.where(go_right, hi, m2)
    t = 0.5 * (lo + hi)
    c = p1 + ax * (t * s1[1])[None]
    return _sphere_cylinder_at(c, s1[0], p2, R2, s2)


def _cylinder_cylinder(p1, R1, s1, p2, R2, s2):
    d_a, pos_a, n_a = _capsule_cylinder(p1, R1, s1, p2, R2, s2)
    d_b, pos_b, n_b = _capsule_cylinder(p2, R2, s2, p1, R1, s1)
    n_b = -n_b
    use_a = d_a >= d_b
    return (
        jnp.where(use_a, d_a, d_b),
        jnp.where(use_a[:, None], pos_a, pos_b),
        jnp.where(use_a[:, None], n_a, n_b),
    )


def _seg_seg_closest(a1, b1, a2, b2):
    d1 = b1 - a1
    d2 = b2 - a2
    r = a1 - a2
    A = _dot(d1, d1)
    e = _dot(d2, d2)
    f = _dot(d2, r)
    c = _dot(d1, r)
    b = _dot(d1, d2)
    denom = A * e - b * b
    s = jnp.where(jnp.abs(denom) > 1e-12,
                  (b * f - c * e) / jnp.where(denom == 0, 1.0, denom), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.where(e > 1e-12, (b * s + f) / jnp.maximum(e, 1e-12), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip(
        jnp.where(A > 1e-12, (b * t - c) / jnp.maximum(A, 1e-12), 0.0),
        0.0, 1.0,
    )
    return a1 + s[None] * d1, a2 + t[None] * d2


def _capsule_capsule(p1, R1, s1, p2, R2, s2):
    ax1, ax2 = _col(R1, 2), _col(R2, 2)
    c1, c2 = _seg_seg_closest(
        p1 - ax1 * s1[1][None], p1 + ax1 * s1[1][None],
        p2 - ax2 * s2[1][None], p2 + ax2 * s2[1][None],
    )
    return _sphere_sphere_at(c1, s1[0], c2, s2[0])


def _capsule_box(p1, R1, s1, p2, R2, s2):
    ax = _col(R1, 2)
    outs = []
    for t in (-1.0, 0.0, 1.0):
        c = p1 + ax * (t * s1[1])[None]
        outs.append(_sphere_box_at(c, s1[0], p2, R2, s2))
    return (
        jnp.concatenate([o[0] for o in outs]),
        jnp.concatenate([o[1] for o in outs]),
        jnp.concatenate([o[2] for o in outs]),
    )


def _box_box(p1, R1, s1, p2, R2, s2):
    """Vertex-face contacts both directions, 4 deepest each (port of
    collision.py:311-341)."""

    def verts_in_box(pa, Ra, sa, pb, Rb, sb, sign):
        corners = _box_corners(pa, Ra, sa)  # (8,3,k,B)
        sbb = jnp.broadcast_to(sb, corners.shape[1:])
        dists, normals = [], []
        for c in range(8):
            loc = _matTvec(Rb, corners[c] - pb)  # (3,k,B)
            face_dist = sbb - jnp.abs(loc)
            pen = jnp.min(face_dist, axis=0)  # (k,B) >0 inside
            kk = jnp.argmin(face_dist, axis=0)
            iota3 = jax.lax.broadcasted_iota(jnp.int32, loc.shape, 0)
            onehot = (iota3 == kk[None]).astype(loc.dtype)
            sgn = jnp.sign(jnp.sum(loc * onehot, axis=0))
            n_loc = onehot * sgn[None]
            n_world = _matvec(Rb, n_loc)
            dist = jnp.where(pen > 0, -pen, _BIG)
            dists.append(dist)
            normals.append(sign * n_world)
        dist8 = jnp.stack(dists)
        d4, (c4, n4) = _take_smallest(
            dist8, [corners, jnp.stack(normals)], 4
        )
        depth = jnp.where(d4 < 0, d4, 0.0)
        pos = c4 - 0.5 * depth[:, None] * n4
        return d4, pos, n4

    d_a, pos_a, n_a = verts_in_box(p2, R2, s2, p1, R1, s1, 1.0)
    d_b, pos_b, n_b = verts_in_box(p1, R1, s1, p2, R2, s2, -1.0)
    d_e, pos_e, n_e = _box_box_edge(p1, R1, s1, p2, R2, s2)
    return (
        jnp.concatenate([d_a, d_b, d_e]),
        jnp.concatenate([pos_a, pos_b, pos_e]),
        jnp.concatenate([n_a, n_b, n_e]),
    )


def _box_box_edge(p1, R1, s1, p2, R2, s2):
    """Edge-edge contact (the case the vertex-face manifold misses): SAT over
    the 9 edge cross axes picks the least-penetrating edge pair; the contact
    point is the closest-point midpoint of the two supporting edges. The
    reported distance is clamped to the FULL SAT separation (face axes
    included) so a dominant face axis can never be undercut by a spurious
    deeper edge contact."""
    d12 = p2 - p1
    s1b = jnp.broadcast_to(s1, (3,) + d12.shape[1:])
    s2b = jnp.broadcast_to(s2, (3,) + d12.shape[1:])

    def support(R, sb, a):
        return sum(
            jnp.abs(_dot(a, _col(R, k))) * sb[k] for k in range(3)
        )

    # face-axis SAT separation (6 axes): upper bound used for clamping
    face_sep = None
    for R in (R1, R2):
        for k in range(3):
            a = _col(R, k)
            sep = jnp.abs(_dot(a, d12)) - (
                support(R1, s1b, a) + support(R2, s2b, a)
            )
            face_sep = sep if face_sep is None else jnp.maximum(face_sep, sep)

    best = None
    for i in range(3):
        e1 = _col(R1, i)
        for j in range(3):
            e2 = _col(R2, j)
            a, alen = _normalize(_cross(e1, e2), 1e-12)
            ok = alen > 1e-6  # parallel edges: no distinct axis
            sgn = jnp.where(_dot(a, d12) >= 0, 1.0, -1.0)
            a = a * sgn[None]  # oriented from box1 into box2
            sep = _dot(a, d12) - (
                support(R1, s1b, a) + support(R2, s2b, a)
            )
            sep = jnp.where(ok, sep, -_BIG)
            # supporting edge centers (zero-sign components stay centered)
            c1 = p1
            for k in range(3):
                if k != i:
                    c1 = c1 + _col(R1, k) * (
                        jnp.sign(_dot(a, _col(R1, k))) * s1b[k]
                    )[None]
            c2 = p2
            for k in range(3):
                if k != j:
                    c2 = c2 - _col(R2, k) * (
                        jnp.sign(_dot(a, _col(R2, k))) * s2b[k]
                    )[None]
            q1, q2 = _seg_seg_closest(
                c1 - e1 * s1b[i][None], c1 + e1 * s1b[i][None],
                c2 - e2 * s2b[j][None], c2 + e2 * s2b[j][None],
            )
            cand = dict(sep=sep, pos=0.5 * (q1 + q2), n=a)
            if best is None:
                best = cand
            else:
                take = cand["sep"] > best["sep"]
                best = dict(
                    sep=jnp.where(take, cand["sep"], best["sep"]),
                    pos=_where_v(take, cand["pos"], best["pos"]),
                    n=_where_v(take, cand["n"], best["n"]),
                )
    # SAT dichotomy: the edge contact only exists when an edge cross axis is
    # the least-penetrating axis overall; in the face-dominant case the
    # vertex-face manifold already covers the contact and an extra edge slot
    # (whose point/normal come from a non-witness axis) would double-count
    dist = jnp.where(best["sep"] >= face_sep, best["sep"], _BIG)
    dist = jnp.where(best["sep"] <= -_BIG / 2, _BIG, dist)
    return dist[None], best["pos"][None], best["n"][None]


# ---------------------------------------------------------------------------
# Convex hulls (MESH geoms): static-feature SAT over precomputed halfspace
# tables. Hull data per pair: verts (V, 3, k, 1) in the hull's geom frame,
# faces split into normals fn (F, 3, k, 1) and offsets fd (F, k, 1) with
# signed distance n.x + d (padding rows d = -1e10 never win the max).
# ---------------------------------------------------------------------------


def _point_hull_depth(x_l, fn, fd, support=None):
    """Deepest-face signed distance of a point (hull frame) minus an optional
    per-face support term; returns (dist (k,B), local face normal (3,k,B))."""
    dists = jnp.sum(fn * x_l[None], axis=1) + fd  # (F, k, B)
    if support is not None:
        dists = dists - support
    i = jnp.argmax(dists, axis=0)
    iota = jax.lax.broadcasted_iota(jnp.int32, dists.shape, 0)
    onehot = (iota == i[None]).astype(x_l.dtype)
    best = jnp.sum(dists * onehot, axis=0)
    n_l = jnp.sum(fn * onehot[:, None], axis=0)
    return best, n_l


def _rot_many(R, v, transpose=False):
    """Rotate MANY vectors by per-(k,B) rotations with pure broadcast
    mul-adds (no dot_general: a 3-wide contraction makes XLA relayout the
    lane axis): R (3,3,k,B), v (V,3,k,B) -> (V,3,k,B)."""
    rows = []
    for i in range(3):
        a, b, c = (R[:, i] if transpose else R[i])
        rows.append(a[None] * v[:, 0] + b[None] * v[:, 1] + c[None] * v[:, 2])
    return jnp.stack(rows, axis=1)


def _hull_world_verts(p, R, hv):
    """World-space hull verts: p (3,k,B), R (3,3,k,B), hv (V,3,k,Bm) with
    Bm in {1, B} -> (V,3,k,B). ~12 broadcast ops instead of a V-long op
    chain (op count is the cost driver on the tunneled TPU runtime).
    Bm == B is the pair-topk path (take_hull_sel gathers a possibly
    DIFFERENT hull per lane): the vert components must keep their lane
    axis — collapsing to lane 0 silently gave every env lane-0's hull
    geometry (round-4 bug)."""
    if hv.shape[-1] == 1:
        hv3 = hv[..., 0]                                # (V,3,k)
        # split the int index and the newaxis: the combined fancy index
        # (hv3[:, j, :, None]) lowers to a >2D gather Mosaic rejects
        c0, c1, c2 = (hv3[:, j][:, :, None] for j in range(3))
    else:
        c0, c1, c2 = (hv[:, j] for j in range(3))       # (V,k,B)
    rows = []
    for i in range(3):
        acc = R[i, 0][None] * c0 + R[i, 1][None] * c1 + R[i, 2][None] * c2
        rows.append(p[i][None] + acc)
    return jnp.stack(rows, axis=1)


def _points_hull_depth_max(xl, fn, fd, chunk=16):
    """Deepest-face signed distance for MANY points at once: xl (V,3,k,B)
    points in the hull frame, fn (F,3,k,Bm), fd (F,k,Bm), Bm in {1, B}
    -> (V,k,B). Face-chunked running max keeps the (V,C,k,B) intermediate
    bounded. Bm == B is the pair-topk path (per-lane hulls): the face
    normals keep their lane axis — collapsing to lane 0 silently scored
    every env against lane-0's hull faces (round-4 bug)."""
    F = fn.shape[0]
    static = fn.shape[-1] == 1
    x0, x1, x2 = xl[:, 0, :, :], xl[:, 1, :, :], xl[:, 2, :, :]  # (V,k,B)
    best = None
    for f0 in range(0, F, chunk):
        fc = fn[f0:f0 + chunk]                          # (C,3,k,Bm)
        if static:
            fc3 = fc[..., 0]                            # (C,3,k)
            # int index split from the newaxes (the mixed fancy index
            # lowers to a >2D gather Mosaic rejects)
            t0, t1, t2 = (fc3[:, j][None, :, :, None] for j in range(3))
        else:
            t0, t1, t2 = (fc[:, j][None] for j in range(3))  # (1,C,k,B)
        dc = (
            x0[:, None] * t0 + x1[:, None] * t1 + x2[:, None] * t2
            + fd[f0:f0 + chunk][None]
        )                                               # (V,C,k,B)
        mc = jnp.max(dc, axis=1)
        best = mc if best is None else jnp.maximum(best, mc)
    return best


def _verts_world_vs_hull(w, ph, Rh, fn, fd, sign, m_out):
    """Deepest m_out contacts of world points w (V,3,k,B) against a hull at
    (ph, Rh): returns (dist (m,k,B), pos (m,3,k,B), n (m,3,k,B)) with
    n = sign * hull outward normal (vectorized rewrite of the per-vert
    _point_hull_depth loops; identical formulas)."""
    xl = _rot_many(Rh, w - ph[None], transpose=True)
    best = _points_hull_depth_max(xl, fn, fd)           # (V,k,B)
    d_m, (w_m, xl_m) = _take_smallest(best, [w, xl], m_out)
    ns = []
    for i in range(m_out):
        _, n_l = _point_hull_depth(xl_m[i], fn, fd)
        ns.append(sign * _matvec(Rh, n_l))
    n = jnp.stack(ns)
    pos = w_m - 0.5 * d_m[:, None] * n
    return d_m, pos, n


def _sphere_hull_probe(c, r, p2, R2, fn, fd, support=None):
    """One contact of a sphere (center c, radius r) against a hull posed at
    (p2, R2); returns (dist, pos, n) with n from the sphere into the hull."""
    c_l = _matTvec(R2, c - p2)
    best, n_l = _point_hull_depth(c_l, fn, fd, support=support)
    dist = best - r
    n_w = _matvec(R2, n_l)  # hull outward normal, toward the sphere
    n = -n_w
    pos = c + n * (r + 0.5 * dist)[None]
    return dist[None], pos[None], n[None]


def _make_sphere_hull(hull):
    fn, fd = hull

    def f(p1, R1, s1, p2, R2, s2):
        return _sphere_hull_probe(p1, s1[0], p2, R2, fn, fd)

    return f


def _make_capsule_hull(hull, cylinder=False):
    """Two endpoint-sphere probes along the axis (the capsule/cylinder
    analogue of the capsule-box sphere probes, collision.py:296-309)."""
    fn, fd = hull

    def f(p1, R1, s1, p2, R2, s2):
        ax = _col(R1, 2)
        outs = [
            _sphere_hull_probe(
                p1 + ax * (t * s1[1])[None], s1[0], p2, R2, fn, fd
            )
            for t in (-1.0, 1.0)
        ]
        return (
            jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]),
            jnp.concatenate([o[2] for o in outs]),
        )

    return f


def _make_ellipsoid_hull(hull):
    """SAT over hull faces with the exact ellipsoid support along each face
    normal: support(n) = ||diag(s) R_e^T n||."""
    fn, fd = hull

    def f(p1, R1, s1, p2, R2, s2):
        c_l = _matTvec(R2, p1 - p2)
        # per-face world normal in the ellipsoid frame: R1^T R2 n_f
        M = jnp.einsum("jikb,jmkb->imkb", R1, R2)  # R1^T @ R2 (3,3,k,B)
        fnB = jnp.broadcast_to(fn, fn.shape[:3] + (M.shape[-1],))
        n_e = jnp.einsum("imkb,fmkb->fikb", M, fnB)  # (F,3,k,B)
        support = jnp.sqrt(
            jnp.maximum(jnp.sum((s1[None] * n_e) ** 2, axis=1), 1e-20)
        )  # (F,k,B)
        best, n_l = _point_hull_depth(c_l, fn, fd, support=support)
        n_w = _matvec(R2, n_l)
        n = -n_w
        # ellipsoid surface point along -n_w at support distance
        r_eff = jnp.sqrt(
            jnp.maximum(jnp.sum((s1 * _matTvec(R1, n_w)) ** 2, axis=0), 1e-20)
        )
        pos = p1 + n * (r_eff + 0.5 * best)[None]
        return best[None], pos[None], n[None]

    return f


def _make_plane_hull(hull_verts):
    hv = hull_verts  # (V, 3, k, 1)

    def f(p1, R1, s1, p2, R2, s2):
        n = _col(R1, 2)
        pn = _dot(p1, n)
        w = _hull_world_verts(p2, R2, hv)               # (V,3,k,B)
        d = jnp.sum(w * n[None], axis=1) - pn[None]     # (V,k,B)
        d4, (c4,) = _take_smallest(d, [w], 4)
        pos = c4 - 0.5 * d4[:, None] * n[None]
        nrm = jnp.broadcast_to(n[None], (4,) + n.shape)
        return d4, pos, nrm

    return f


def _make_box_hull(hull, use_mpr=False):
    """Box (g1) vs hull (g2): box corners vs hull halfspaces (4 deepest,
    positive distances tracked) + hull verts vs box faces (4 deepest,
    penetrating only) — the box-box manifold generalized. With use_mpr the
    deepest corner slot is upgraded by MPR when it confirms a deeper
    penetration (edge-edge witness features the vertex/face probes miss —
    the in-hand block-on-finger-edge case)."""
    (fn, fd), hv = hull

    def f(p1, R1, s1, p2, R2, s2):
        # A: box corners against the hull (corner cloud -> world -> deepest 4)
        # corner table via per-component SCALAR signs (a (8,3) array constant
        # here would be captured by the pallas megakernel trace, which
        # requires constants as inputs; scalar multiplies are exact)
        corners = jnp.stack([
            _vec(*(float(_CORNER_SIGNS[c][j]) * s1[j] for j in range(3)))
            for c in range(8)
        ])                                                    # (8,3,k,Bm)
        cw = jnp.stack([
            p1[i][None]
            + R1[i, 0][None] * corners[:, 0]
            + R1[i, 1][None] * corners[:, 1]
            + R1[i, 2][None] * corners[:, 2]
            for i in range(3)
        ], axis=1)                                            # (8,3,k,B)
        dA, pA, nA = _verts_world_vs_hull(cw, p2, R2, fn, fd, -1.0, 4)
        # B: hull verts inside the box (penetrating only, as box-box)
        w = _hull_world_verts(p2, R2, hv)                     # (V,3,k,B)
        loc = _rot_many(R1, w - p1[None], transpose=True)
        s1b = jnp.broadcast_to(s1[None], loc.shape)
        face_dist = s1b - jnp.abs(loc)                        # (V,3,k,B)
        pen = jnp.min(face_dist, axis=1)                      # (V,k,B)
        kk = jnp.argmin(face_dist, axis=1)
        iota3 = jax.lax.broadcasted_iota(jnp.int32, loc.shape, 1)
        onehot = (iota3 == kk[:, None]).astype(loc.dtype)
        sgn = jnp.sign(jnp.sum(loc * onehot, axis=1))         # (V,k,B)
        n_w = _rot_many(R1, onehot * sgn[:, None])  # box outward = g1 -> g2
        dB0 = jnp.where(pen > 0, -pen, _BIG)
        dB, (pB, nB) = _take_smallest(dB0, [w, n_w], 4)
        if use_mpr:
            from gymnasium_robotics_tpu.physics import mpr as _mpr

            corners = jnp.stack([
                _vec(*(float(_CORNER_SIGNS[c][j]) * s1[j] for j in range(3)))
                for c in range(8)
            ])                                          # (8, 3, k, Bm)
            dep, n_m, pos_m, okm = _mpr.penetration(
                p1, R1, corners, p2, R2, hv
            )
            dm = -dep
            use = okm & (dm < dA[0])
            dA = dA.at[0].set(jnp.where(use, dm, dA[0]))
            pA = pA.at[0].set(jnp.where(use[None], pos_m, pA[0]))
            nA = nA.at[0].set(jnp.where(use[None], n_m, nA[0]))
        return (
            jnp.concatenate([dA, dB]),
            jnp.concatenate([pA, pB]),
            jnp.concatenate([nA, nB]),
        )

    return f


def _make_hull_hull(hull1, hull2, use_mpr=False):
    """Hull-hull: each hull's verts against the other's halfspaces, 2 deepest
    per direction; with use_mpr the deepest slot is upgraded by MPR when it
    confirms a deeper penetration (edge-edge features face-SAT misses)."""
    (fn1, fd1), hv1 = hull1
    (fn2, fd2), hv2 = hull2

    def f(p1, R1, s1, p2, R2, s2):
        # verts of hull1 in hull2: hull2 outward normal points 2 -> 1, flip
        w1 = _hull_world_verts(p1, R1, hv1)
        dA, pA, nA = _verts_world_vs_hull(w1, p2, R2, fn2, fd2, -1.0, 2)
        # verts of hull2 in hull1: hull1 outward normal points 1 -> 2
        w2 = _hull_world_verts(p2, R2, hv2)
        dB, pB, nB = _verts_world_vs_hull(w2, p1, R1, fn1, fd1, 1.0, 2)
        if use_mpr:
            from gymnasium_robotics_tpu.physics import mpr as _mpr

            dep, n_m, pos_m, okm = _mpr.penetration(p1, R1, hv1, p2, R2, hv2)
            dm = -dep
            use = okm & (dm < dA[0])
            dA = dA.at[0].set(jnp.where(use, dm, dA[0]))
            pA = pA.at[0].set(jnp.where(use[None], pos_m, pA[0]))
            nA = nA.at[0].set(jnp.where(use[None], n_m, nA[0]))
        return (
            jnp.concatenate([dA, dB]),
            jnp.concatenate([pA, pB]),
            jnp.concatenate([nA, nB]),
        )

    return f


def _dispatch(t1, t2):
    table = {
        (T.PLANE, T.SPHERE): _plane_sphere,
        (T.PLANE, T.CAPSULE): _plane_capsule,
        (T.PLANE, T.BOX): _plane_box,
        (T.PLANE, T.CYLINDER): _plane_cylinder,
        (T.PLANE, T.ELLIPSOID): _plane_sphere,
        (T.SPHERE, T.SPHERE): _sphere_sphere,
        (T.SPHERE, T.CAPSULE): _sphere_capsule,
        (T.SPHERE, T.BOX): _sphere_box,
        (T.SPHERE, T.CYLINDER): _sphere_cylinder,
        (T.SPHERE, T.ELLIPSOID): _sphere_sphere,
        (T.CAPSULE, T.CAPSULE): _capsule_capsule,
        (T.CAPSULE, T.BOX): _capsule_box,
        (T.CAPSULE, T.CYLINDER): _capsule_cylinder,
        (T.BOX, T.BOX): _box_box,
        (T.CYLINDER, T.BOX): _capsule_box,
        (T.CYLINDER, T.CYLINDER): _cylinder_cylinder,
    }
    return table.get((t1, t2))


def _contact_frame_soa(n, t1):
    """(normal, tan1, tan2) rows from normals (3, N, B) and optional explicit
    tan1 (mju_makeFrame convention; port of collision.py:366-383)."""
    # stack-built unit vectors (a static .at[].set is a scatter primitive,
    # which Mosaic cannot lower inside the narrowphase megakernel)
    _z = jnp.zeros_like(n[0])
    _o = _z + 1.0
    yhat = jnp.stack([_z, _o, _z])
    zhat = jnp.stack([_z, _z, _o])
    cand_y = yhat - n * n[1][None]
    cand_z = zhat - n * n[2][None]
    use_y = jnp.abs(n[1]) < 0.99
    generic, _ = _normalize(_where_v(use_y, cand_y, cand_z), 1e-12)
    ok = jnp.all(jnp.isfinite(t1), axis=0)
    t1 = _where_v(ok, jnp.nan_to_num(t1), generic)
    t2 = _cross(n, t1)
    return jnp.stack([n, t1, t2], axis=1)  # (3comp, 3rows, N, B)


# ---------------------------------------------------------------------------
# Batched narrowphase over the static pair table
# ---------------------------------------------------------------------------


def use_onehot(mt: T.Meta) -> bool:
    """Gate for one-hot MXU contractions replacing per-lane gathers in the
    pruned narrowphase's take_sel/take_hull_sel. Exact either way (0/1
    weights, einsums pinned to HIGHEST precision).

    "auto" = TPU, and only while mesh groups route to XLA (the MPR hybrid,
    use_mpr_xla): the r5 step matrix showed onehot is a win exactly then
    (AntMaze 11,464 hybrid-onehot vs 10,110 kernel+gather; AdroitDoor 8,797
    vs 7,716) but catastrophic when onehot hull tables feed the megakernel
    (AntMaze 1,611; FetchPush 1,805 — layout copies into pallas), so if MPR
    is explicitly disabled (hulls back inside the kernel) "auto" falls back
    to plain gathers."""
    v = getattr(mt.opt, "gather_mode", "auto")
    if v == "onehot":
        return True
    if v != "auto":
        return False
    return jax.default_backend() == "tpu" and use_mpr_xla(mt)


def use_mpr_xla(mt: T.Meta) -> bool:
    """Gate for the XLA-op MPR upgrade. "auto" (default) = ON everywhere
    since round 5: post-pair-topk the hull groups are tiny (K<=24 pairs) and
    the r5 TPU step matrix measured MPR at ZERO throughput cost with the
    hybrid routing (mesh groups run these XLA formulas while primitive
    groups stay inside the narrowphase megakernel — Mosaic cannot lower
    MPR's scatter-adds): FetchPush 3603 vs 3590 eps, AdroitDoor 8797 vs
    7716, kitchen within noise. CPU and TPU therefore run the SAME contact
    model (the reference's libccd-MPR analogue, mirroring mj_step's one
    engine, gymnasium_robotics/envs/robot_env.py:340-341). Option.mpr=False
    restores the face-SAT approximation
    (tests/test_physics_parity.py::test_mpr_off_drift_bound bounds it)."""
    v = getattr(mt.opt, "mpr", "auto")
    return v is True or v == "force" or v == "auto"


def _mesh_group_fn(t1, hull1, hull2, use_mpr=False):
    """Narrowphase fn for a (t1, MESH) group given hull operand arrays
    (traced or static; trailing dims broadcast against the pair data)."""
    if t1 == T.PLANE:
        return _make_plane_hull(hull2[1])
    if t1 == T.SPHERE:
        return _make_sphere_hull(hull2[0])
    if t1 in (T.CAPSULE, T.CYLINDER):
        return _make_capsule_hull(hull2[0])
    if t1 == T.ELLIPSOID:
        return _make_ellipsoid_hull(hull2[0])
    if t1 == T.BOX:
        return _make_box_hull(hull2, use_mpr=use_mpr)
    if t1 == T.MESH:
        return _make_hull_hull(hull1, hull2, use_mpr=use_mpr)
    return None


def _local_aabbs(meta, sizes3, hull_vert, dtype):
    """Per-geom local AABB (center (ngeom, 3, Bm), half (ngeom, 3, Bm)) for
    the pair-topk bound. Plane rows are zeros (plane groups never prune).

    Vectorized over geoms: every primitive's half-extent is LINEAR in its
    size components (sphere (s0,s0,s0), capsule (s0,s0,s0+s1), cylinder
    (s0,s0,s1), box/ellipsoid s, plane 0), so one einsum with a static
    per-geom coefficient matrix replaces the former per-geom Python loop
    (~1000 tiny HLO ops at kitchen's ngeom=240 — measured ~4.9 ms of pure
    op overhead per substep at B=512 on the tunneled TPU). Mesh rows take
    hull bounds from the (padded) hull table exactly like the loop did."""
    ng = meta.ngeom
    coef = np.zeros((ng, 3, 3))
    mesh_mask = np.zeros(ng, bool)
    hullid = np.zeros(ng, np.int32)
    for g in range(ng):
        t = meta.geom_type[g]
        if t == T.MESH:
            mesh_mask[g] = True
            hullid[g] = meta.geom_hullid[g]
        elif t == T.SPHERE:
            coef[g, :, 0] = 1.0
        elif t == T.CAPSULE:
            coef[g, 0, 0] = coef[g, 1, 0] = coef[g, 2, 0] = 1.0
            coef[g, 2, 1] = 1.0
        elif t == T.CYLINDER:
            coef[g, 0, 0] = coef[g, 1, 0] = 1.0
            coef[g, 2, 1] = 1.0
        elif t in (T.BOX, T.ELLIPSOID):
            coef[g] = np.eye(3)
        # plane: zeros
    half = jnp.einsum(
        "gij,gjb->gib", jnp.asarray(coef, dtype), sizes3.astype(dtype)
    )                                                      # (ng, 3, Bm)
    ctr = jnp.zeros_like(half)
    if mesh_mask.any():
        hv = hull_vert.astype(dtype)                       # (nh, V, 3)
        lo, hi = jnp.min(hv, axis=1), jnp.max(hv, axis=1)  # (nh, 3)
        idx = jnp.asarray(hullid)
        ctr_h = ((lo + hi) * 0.5)[idx][..., None]          # (ng, 3, 1)
        half_h = ((hi - lo) * 0.5)[idx][..., None]
        mm = jnp.asarray(mesh_mask)[:, None, None]
        ctr = jnp.where(mm, jnp.broadcast_to(ctr_h, ctr.shape), ctr)
        half = jnp.where(mm, jnp.broadcast_to(half_h, half.shape), half)
    return ctr, half


@functools.lru_cache(maxsize=None)
def _make_narrowphase_core(meta: T.Meta):
    """SoA-native narrowphase: inputs/outputs stay batch-last (no boundary
    transposes) — P (ngeom, 3, B), Rm (ngeom, 3, 3, B), sizes3
    (ngeom, 3, Bm) with Bm in {1, B}; returns (dist (ncon, B),
    pos (ncon, 3, B), frame (ncon, 3, 3, B), src). Used directly by the SoA
    substep pipeline (physics/soa.py); _make_narrowphase wraps it for the
    env-batch-leading layout.

    With Option.pair_topk active the table is COMPACT: each oversize
    (type-pair, condim) group evaluates only the K nearest pairs per env
    (world-AABB gap bound — the shape-static analogue of MuJoCo's broadphase)
    and src (ncon_c, B) maps compact slots to canonical static slot ids;
    otherwise src is None and the layout is the full canonical table."""
    from gymnasium_robotics_tpu.physics import collision as C

    plan = C.prune_plan(meta)
    if plan.active:
        return _make_narrowphase_core_pruned(meta, plan)

    groups: dict = {}
    for order, (g1, g2) in enumerate(meta.pairs):
        t1, t2 = meta.geom_type[g1], meta.geom_type[g2]
        groups.setdefault((t1, t2), []).append((order, g1, g2))

    # static permutation group-major -> canonical pair-major slot order
    group_base = {}
    offset = 0
    for tp, entries in groups.items():
        group_base[tp] = offset
        offset += len(entries) * C.pair_slots(*tp)
    perm = np.zeros(offset, dtype=np.int64)
    pos_in_group = {tp: 0 for tp in groups}
    cursor = 0
    for g1, g2 in meta.pairs:
        tp = (meta.geom_type[g1], meta.geom_type[g2])
        k = C.pair_slots(*tp)
        src = group_base[tp] + pos_in_group[tp] * k
        perm[cursor:cursor + k] = np.arange(src, src + k)
        pos_in_group[tp] += 1
        cursor += k
    # NOTE: kept as numpy — a jnp constant built inside the lru-cached closure
    # would be created under the first caller's trace and leak into later ones
    perm_j = perm

    def core(P, Rm, sizes3, hull_vert, hull_face, geom_margin=None):
        dtype = P.dtype
        B = P.shape[-1]

        def take(idx):
            i = jnp.asarray(idx)
            p = jnp.swapaxes(P[i], 0, 1)          # (3, k, B)
            R = jnp.moveaxis(Rm[i], 0, 2)          # (3, 3, k, B)
            s = jnp.swapaxes(sizes3[i], 0, 1).astype(dtype)  # (3, k, Bm)
            return p, R, s

        def take_hull(gs):
            hidx = np.array([meta.geom_hullid[g] for g in gs])
            hv = hull_vert[hidx].astype(dtype)    # (k, V, 3)
            hf = hull_face[hidx].astype(dtype)    # (k, F, 4)
            hvT = jnp.transpose(hv, (1, 2, 0))[..., None]       # (V, 3, k, 1)
            fn = jnp.transpose(hf[..., :3], (1, 2, 0))[..., None]  # (F,3,k,1)
            fd = hf[..., 3].T[..., None]                         # (F, k, 1)
            return hvT, (fn, fd)

        all_d, all_p, all_n, all_t = [], [], [], []
        for (t1, t2), entries in groups.items():
            S = C.pair_slots(t1, t2)
            k = len(entries)
            if t2 == T.MESH:
                g1s = [e[1] for e in entries]
                g2s = [e[2] for e in entries]
                hv2, hf2 = take_hull(g2s)
                if t1 == T.PLANE:
                    fn = _make_plane_hull(hv2)
                elif t1 == T.SPHERE:
                    fn = _make_sphere_hull(hf2)
                elif t1 in (T.CAPSULE, T.CYLINDER):
                    fn = _make_capsule_hull(hf2)
                elif t1 == T.ELLIPSOID:
                    fn = _make_ellipsoid_hull(hf2)
                elif t1 == T.BOX:
                    fn = _make_box_hull(
                        (hf2, hv2), use_mpr=use_mpr_xla(meta)
                    )
                elif t1 == T.MESH:
                    hv1, hf1 = take_hull(g1s)
                    fn = _make_hull_hull(
                        (hf1, hv1), (hf2, hv2),
                        use_mpr=use_mpr_xla(meta),
                    )
                else:
                    fn = None
            else:
                fn = _dispatch(t1, t2)
            if fn is None:
                all_d.append(jnp.full((k * S, B), _BIG, dtype))
                zero = jnp.zeros((k * S, 3, B), dtype)
                all_p.append(zero)
                all_n.append(zero.at[:, 2].set(1.0))
                all_t.append(jnp.full((k * S, 3, B), jnp.nan, dtype))
                continue
            p1, R1, s1 = take([e[1] for e in entries])
            p2, R2, s2 = take([e[2] for e in entries])
            res = fn(p1, R1, s1, p2, R2, s2)
            if len(res) == 4:
                dd, pp, nn, tt = res
            else:
                dd, pp, nn = res
                tt = jnp.full(nn.shape, jnp.nan, dtype)
            # (S,k,B) -> pair-major rows (k*S, B); (S,3,k,B) -> (k*S, 3, B)
            all_d.append(jnp.swapaxes(dd, 0, 1).reshape(k * S, B))
            for src, dst in ((pp, all_p), (nn, all_n), (tt, all_t)):
                dst.append(
                    jnp.moveaxis(src, 2, 0).reshape(k * S, 3, B)
                )

        dist = jnp.concatenate(all_d)[perm_j]          # (ncon, B)
        pos = jnp.concatenate(all_p)[perm_j]           # (ncon, 3, B)
        normal = jnp.concatenate(all_n)[perm_j]
        tan1 = jnp.concatenate(all_t)[perm_j]
        # frame rows per slot: (ncon, 3, B) normals -> (3, ncon, B) for the
        # SoA frame builder, back to (ncon, 3rows, 3comp, B)
        n_soa = jnp.swapaxes(normal, 0, 1)
        t_soa = jnp.swapaxes(tan1, 0, 1)
        frame = _contact_frame_soa(n_soa, t_soa)       # (3comp, 3rows, ncon, B)
        frame = jnp.moveaxis(frame, (0, 1, 2), (2, 1, 0))  # (ncon, 3rows, 3comp, B)
        return dist, pos, frame, None

    return core


def _make_narrowphase_core_pruned(meta: T.Meta, plan):
    """Pair-topk variant of the batch-last narrowphase core (see
    _make_narrowphase_core). Emits the compact group-major table + src."""
    from gymnasium_robotics_tpu.physics import collision as C

    slot_base = C._pair_slot_base(meta)  # (npairs,) canonical slot offsets

    def core(P, Rm, sizes3, hull_vert, hull_face, geom_margin=None):
        dtype = P.dtype
        B = P.shape[-1]

        # world AABBs of every geom, computed once: cw/hw (ngeom, 3, B)
        ctr_l, half_l = _local_aabbs(meta, sizes3, hull_vert, dtype)
        cw = P + jnp.einsum("gijb,gjb->gib", Rm, _bb(ctr_l, B))
        hw = jnp.einsum("gijb,gjb->gib", jnp.abs(Rm), _bb(half_l, B))
        if geom_margin is None:
            gmarg = jnp.zeros((meta.ngeom, 1), dtype)
        else:
            gmarg = geom_margin.astype(dtype)
            if gmarg.ndim == 1:
                gmarg = gmarg[:, None]

        def take_static(gs_np):
            i = jnp.asarray(gs_np)
            p = jnp.swapaxes(P[i], 0, 1)                     # (3, k, B)
            R = jnp.moveaxis(Rm[i], 0, 2)                    # (3, 3, k, B)
            s = jnp.swapaxes(sizes3[i], 0, 1).astype(dtype)  # (3, k, Bm)
            return p, R, s

        def take_hull_static(gs_np):
            hidx = np.array([meta.geom_hullid[g] for g in gs_np])
            hv = hull_vert[hidx].astype(dtype)
            hf = hull_face[hidx].astype(dtype)
            hvT = jnp.transpose(hv, (1, 2, 0))[..., None]          # (V,3,k,1)
            fn = jnp.transpose(hf[..., :3], (1, 2, 0))[..., None]  # (F,3,k,1)
            fd = hf[..., 3].T[..., None]                           # (F, k, 1)
            return ((fn, fd), hvT)

        onehot = use_onehot(meta)

        def take_sel(gs_np, sel):
            gid = jnp.take(jnp.asarray(np.asarray(gs_np)), sel)    # (K, B)
            if onehot:
                # 0/1-weight contraction over the geom axis: exact (each
                # output element is x*1 + 0s), and MXU-shaped on TPU where
                # per-lane gathers serialize. Precision pinned HIGHEST
                # locally: exactness must not depend on the package-level
                # jax_default_matmul_precision setting (ADVICE r4).
                hi = jax.lax.Precision.HIGHEST
                oh = jax.nn.one_hot(gid, meta.ngeom, dtype=dtype)  # (K,B,g)
                p = jnp.einsum("kbg,gcb->ckb", oh, P, precision=hi)
                R = jnp.einsum("kbg,gijb->ijkb", oh, Rm, precision=hi)
                if sizes3.shape[-1] == 1:
                    s = jnp.einsum(
                        "kbg,gc->ckb", oh, sizes3[..., 0].astype(dtype),
                        precision=hi,
                    )
                else:
                    s = jnp.einsum("kbg,gcb->ckb", oh, sizes3.astype(dtype),
                                   precision=hi)
                return p, R, s
            p = jnp.swapaxes(
                jnp.take_along_axis(P, gid[:, None, :], axis=0), 0, 1
            )                                                      # (3, K, B)
            R = jnp.moveaxis(
                jnp.take_along_axis(Rm, gid[:, None, None, :], axis=0), 0, 2
            )                                                      # (3,3,K,B)
            if sizes3.shape[-1] == 1:
                s = jnp.moveaxis(
                    jnp.take(sizes3[..., 0], gid, axis=0), -1, 0
                ).astype(dtype)                                    # (3, K, B)
            else:
                s = jnp.swapaxes(
                    jnp.take_along_axis(sizes3, gid[:, None, :], axis=0), 0, 1
                ).astype(dtype)
            return p, R, s

        def take_hull_sel(gs_np, sel):
            hid_np = np.array([meta.geom_hullid[g] for g in gs_np])
            hid = jnp.take(jnp.asarray(hid_np), sel)               # (K, B)
            if onehot:
                nh = hull_vert.shape[0]
                hi = jax.lax.Precision.HIGHEST  # exactness local, not global
                oh = jax.nn.one_hot(hid, nh, dtype=dtype)          # (K,B,h)
                hvT = jnp.einsum(
                    "kbh,hvc->vckb", oh, hull_vert.astype(dtype), precision=hi
                )                                                  # (V,3,K,B)
                hf = hull_face.astype(dtype)
                fn = jnp.einsum("kbh,hfc->fckb", oh, hf[..., :3],
                                precision=hi)                      # (F,3,K,B)
                fd = jnp.einsum("kbh,hf->fkb", oh, hf[..., 3],
                                precision=hi)                      # (F, K, B)
                return ((fn, fd), hvT)
            hv = jnp.take(hull_vert, hid, axis=0).astype(dtype)    # (K,B,V,3)
            hvT = jnp.transpose(hv, (2, 3, 0, 1))                  # (V,3,K,B)
            hf = jnp.take(hull_face, hid, axis=0).astype(dtype)    # (K,B,F,4)
            fn = jnp.transpose(hf[..., :3], (2, 3, 0, 1))          # (F,3,K,B)
            fd = jnp.transpose(hf[..., 3], (2, 0, 1))              # (F, K, B)
            return ((fn, fd), hvT)

        # Merged top-K selection for ALL pruned groups: one rank chain over
        # the concatenated pruned pairs + ONE padded lax.top_k, instead of a
        # gap/rank/top_k chain per group (kitchen: 23 groups -> ~10x fewer
        # selection ops per substep). Selection per group is IDENTICAL to
        # the per-group formulation: each padded row holds one group's local
        # pair ranks (+inf beyond its length; pruned groups have k > K so
        # padding is never selected), and top_k's index tie-breaking sees
        # the same local order.
        pruned_groups = [g for g in plan.groups if g.pruned]
        sel_by_group = {}
        if pruned_groups:
            Ksel = pruned_groups[0].K  # uniform: Option.pair_topk
            maxk = max(len(g.idx) for g in pruned_groups)
            g1_cat, g2_cat, rows, mask_rows = [], [], [], []
            base_r = 0
            for g in pruned_groups:
                k = len(g.idx)
                g1_cat += [meta.pairs[j][0] for j in g.idx]
                g2_cat += [meta.pairs[j][1] for j in g.idx]
                rows.append([base_r + min(i, k - 1) for i in range(maxk)])
                mask_rows.append([i < k for i in range(maxk)])
                base_r += k
            i1c = jnp.asarray(np.array(g1_cat))
            i2c = jnp.asarray(np.array(g2_cat))
            gap_all = jnp.max(
                jnp.abs(cw[i1c] - cw[i2c]) - hw[i1c] - hw[i2c], axis=1
            )                                                     # (P, B)
            rank_all = gap_all - _bb(gmarg[i1c] + gmarg[i2c], B)
            rank_pad = rank_all[jnp.asarray(np.array(rows))]      # (G,maxk,B)
            if NPK.use_np_kernel(meta):
                # pallas K-round argmin: identical selection (set AND
                # first-index tie order) to the lane-axis top_k below,
                # which alone cost 15.9 ms for kitchen's padded table
                order_gkb = NPK.topk_select(
                    rank_pad, np.array(mask_rows), Ksel,
                    interpret=jax.default_backend() != "tpu",
                )                                                 # (G, K, B)
                for gi, g in enumerate(pruned_groups):
                    sel_by_group[id(g)] = order_gkb[gi]           # (K, B)
            else:
                rank_pad = jnp.where(
                    jnp.asarray(np.array(mask_rows))[:, :, None], rank_pad,
                    jnp.asarray(np.inf, dtype),
                )
                _, order_all = jax.lax.top_k(
                    -jnp.moveaxis(rank_pad, 1, 2), Ksel
                )                                                 # (G, B, K)
                for gi, g in enumerate(pruned_groups):
                    sel_by_group[id(g)] = jnp.swapaxes(
                        order_all[gi], 0, 1
                    ).astype(jnp.int32)                           # (K, B)

        use_kernel = NPK.use_np_kernel(meta)
        k_specs, k_arrays = [], []
        row_off = 0
        order = []       # ("k", kernel row offset, n) | ("x", xla row offset, n)
        xla_rows = 0

        all_d, all_p, all_n, all_t, all_src = [], [], [], [], []
        for g in plan.groups:
            t1, t2 = g.tp
            S, k = g.S, len(g.idx)
            g1s = np.array([meta.pairs[j][0] for j in g.idx])
            g2s = np.array([meta.pairs[j][1] for j in g.idx])
            slot_ids = (
                slot_base[np.asarray(g.idx)][:, None]
                + np.arange(S)[None]
            )                                                      # (k, S)
            if g.pruned:
                sel = sel_by_group[id(g)]                          # (K, B)
                p1, R1, s1 = take_sel(g1s, sel)
                p2, R2, s2 = take_sel(g2s, sel)
                hull1 = take_hull_sel(g1s, sel) if t1 == T.MESH else None
                hull2 = take_hull_sel(g2s, sel) if t2 == T.MESH else None
                src = jnp.swapaxes(
                    jnp.take(jnp.asarray(slot_ids), sel, axis=0), 1, 2
                ).reshape(g.K * S, B).astype(jnp.int32)
            else:
                p1, R1, s1 = take_static(g1s)
                p2, R2, s2 = take_static(g2s)
                hull1 = take_hull_static(g1s) if t1 == T.MESH else None
                hull2 = take_hull_static(g2s) if t2 == T.MESH else None
                src = jnp.broadcast_to(
                    jnp.asarray(slot_ids.reshape(-1), jnp.int32)[:, None],
                    (k * S, B),
                )
            # hybrid routing: with Option.mpr on, the groups MPR actually
            # upgrades (box-hull / hull-hull — _make_box_hull/_make_hull_hull
            # are the only use_mpr consumers) run the XLA MPR formulas
            # (Mosaic cannot lower MPR's scatter-adds) while every other
            # group — primitives AND sphere/capsule/cyl/plane-vs-mesh —
            # stays inside the megakernel.
            group_mpr = (
                t2 == T.MESH and t1 in (T.BOX, T.MESH) and use_mpr_xla(meta)
            )
            if use_kernel and not group_mpr:
                arrs = NPK.pack_group_arrays(
                    t1, p1, R1, s1, p2, R2, s2, hull1, hull2
                )
                k_specs.append(NPK.GroupSpec(
                    t1=t1, t2=t2, S=S, k=g.K, row_off=row_off,
                    n_arrays=len(arrs), use_mpr=False,
                ))
                k_arrays += arrs
                order.append(("k", row_off, g.K * S))
                row_off += g.K * S
                all_src.append(src)
                continue
            if t2 == T.MESH:
                fn = _mesh_group_fn(
                    t1, hull1, hull2, use_mpr=use_mpr_xla(meta)
                )
            else:
                fn = _dispatch(t1, t2)
            Kg = g.K
            if fn is None:
                all_d.append(jnp.full((Kg * S, B), _BIG, dtype))
                zero = jnp.zeros((Kg * S, 3, B), dtype)
                all_p.append(zero)
                all_n.append(zero.at[:, 2].set(1.0))
                all_t.append(jnp.full((Kg * S, 3, B), jnp.nan, dtype))
                all_src.append(src)
                order.append(("x", xla_rows, Kg * S))
                xla_rows += Kg * S
                continue
            res = fn(p1, R1, s1, p2, R2, s2)
            if len(res) == 4:
                dd, pp, nn, tt = res
            else:
                dd, pp, nn = res
                tt = jnp.full(nn.shape, jnp.nan, dtype)
            all_d.append(jnp.swapaxes(dd, 0, 1).reshape(Kg * S, B))
            for arr, dst in ((pp, all_p), (nn, all_n), (tt, all_t)):
                dst.append(jnp.moveaxis(arr, 2, 0).reshape(Kg * S, 3, B))
            all_src.append(src)
            order.append(("x", xla_rows, Kg * S))
            xla_rows += Kg * S

        src = jnp.concatenate(all_src)
        if use_kernel and k_specs:
            kd, kp, kf = NPK.narrowphase_megakernel(
                tuple(k_specs), k_arrays, row_off, B, dtype,
                interpret=jax.default_backend() != "tpu",
            )
            if not all_d:  # every group inside the kernel (the common path)
                return kd, kp, kf, src
            # hybrid (MPR-forced mesh groups ran in XLA): stitch the kernel
            # block and the XLA block back into the original group order
            xd = jnp.concatenate(all_d)
            xp = jnp.concatenate(all_p)
            xn = jnp.swapaxes(jnp.concatenate(all_n), 0, 1)
            xt = jnp.swapaxes(jnp.concatenate(all_t), 0, 1)
            xf = jnp.moveaxis(_contact_frame_soa(xn, xt), (0, 1, 2), (2, 1, 0))
            ds, ps, fs = [], [], []
            for tag, off, n in order:
                blk = (kd, kp, kf) if tag == "k" else (xd, xp, xf)
                ds.append(blk[0][off:off + n])
                ps.append(blk[1][off:off + n])
                fs.append(blk[2][off:off + n])
            return (jnp.concatenate(ds), jnp.concatenate(ps),
                    jnp.concatenate(fs), src)
        dist = jnp.concatenate(all_d)                      # (ncon_c, B)
        pos = jnp.concatenate(all_p)
        normal = jnp.concatenate(all_n)
        tan1 = jnp.concatenate(all_t)
        n_soa = jnp.swapaxes(normal, 0, 1)
        t_soa = jnp.swapaxes(tan1, 0, 1)
        frame = _contact_frame_soa(n_soa, t_soa)
        frame = jnp.moveaxis(frame, (0, 1, 2), (2, 1, 0))
        return dist, pos, frame, src

    return core


def _bb(x, B):
    return jnp.broadcast_to(x, x.shape[:-1] + (B,))


def slot_geoms_static(meta: T.Meta):
    """(geom1, geom2) per canonical STATIC slot, numpy (ncon_static, 2)."""
    from gymnasium_robotics_tpu.physics import collision as C

    g1s, g2s = [], []
    for g1, g2 in meta.pairs:
        k = C.pair_slots(meta.geom_type[g1], meta.geom_type[g2])
        g1s += [g1] * k
        g2s += [g2] * k
    return np.array(g1s, np.int32), np.array(g2s, np.int32)


@functools.lru_cache(maxsize=None)
def _make_narrowphase(meta: T.Meta):
    from gymnasium_robotics_tpu.physics import collision as C

    core = _make_narrowphase_core(meta)
    pruned = C.prune_plan(meta).active

    def batched(gxpos, gxmat, sizes, hull_vert, hull_face, gmargin):
        # gxpos (B, ngeom, 3) -> (ngeom, 3, B); gxmat -> (ngeom, 3, 3, B)
        P = jnp.moveaxis(gxpos, 0, -1)
        Rm = jnp.moveaxis(gxmat, 0, -1)
        dist, pos, frame, src = core(
            P, Rm, sizes[..., None], hull_vert, hull_face,
            geom_margin=gmargin,
        )
        return (
            jnp.moveaxis(dist, -1, 0),                  # (B, ncon)
            jnp.moveaxis(pos, -1, 0),                   # (B, ncon, 3)
            jnp.moveaxis(frame, -1, 0),                 # (B, ncon, 3, 3)
            (jnp.moveaxis(src, -1, 0) if pruned
             else jnp.zeros((gxpos.shape[0], 0), jnp.int32)),  # (B, ncon_c)
        )

    @jax.custom_batching.custom_vmap
    def narrow(gxpos, gxmat, sizes, hull_vert, hull_face, gmargin):
        d, p, f, s = batched(gxpos[None], gxmat[None], sizes,
                             hull_vert, hull_face, gmargin)
        return d[0], p[0], f[0], s[0]

    @narrow.def_vmap
    def _rule(axis_size, in_batched, gxpos, gxmat, sizes,
              hull_vert, hull_face, gmargin):
        ngeom = meta.ngeom
        if not in_batched[0]:
            gxpos = jnp.broadcast_to(gxpos, (axis_size, ngeom, 3))
        if not in_batched[1]:
            gxmat = jnp.broadcast_to(gxmat, (axis_size, ngeom, 3, 3))
        if in_batched[2]:
            sizes = sizes[0]  # model constants are identical across the batch
        if in_batched[3]:
            hull_vert = hull_vert[0]
        if in_batched[4]:
            hull_face = hull_face[0]
        if in_batched[5]:
            gmargin = gmargin[0]
        out = batched(gxpos, gxmat, sizes, hull_vert, hull_face, gmargin)
        return out, (True, True, True, True)

    return narrow


def collision(m: T.Model, d: T.Data) -> T.Data:
    """Drop-in replacement for collision.collision with the SoA batched
    narrowphase (single-env signature; env batches enter via vmap)."""
    mt = m.meta
    dtype = d.qpos.dtype
    from gymnasium_robotics_tpu.physics import collision as C

    n_total = C.ncon(m)
    pruned = C.prune_plan(mt).active
    if not mt.pairs or mt.opt.disable_contact:
        contact = T.Contact(
            dist=jnp.full((n_total,), _BIG, dtype),
            pos=jnp.zeros((n_total, 3), dtype),
            frame=jnp.tile(jnp.eye(3, dtype=dtype), (n_total, 1, 1)),
            geom1=jnp.zeros(n_total, jnp.int32),
            geom2=jnp.zeros(n_total, jnp.int32),
            src=jnp.zeros(n_total, jnp.int32) if pruned else None,
        )
        return dataclasses.replace(d, contact=contact)

    narrow = _make_narrowphase(mt)
    hv = m.hull_vert
    hf = m.hull_face
    if hv is None:  # no mesh geoms in this model
        hv = jnp.zeros((1, 1, 3), dtype)
        hf = jnp.zeros((1, 1, 4), dtype)
    dist, pos, frame, src = narrow(
        d.geom_xpos, d.geom_xmat, m.geom_size, hv, hf, m.geom_margin
    )

    g1s_np, g2s_np = slot_geoms_static(mt)
    if pruned:
        geom1 = jnp.take(jnp.asarray(g1s_np), src)
        geom2 = jnp.take(jnp.asarray(g2s_np), src)
    else:
        geom1 = jnp.asarray(g1s_np)
        geom2 = jnp.asarray(g2s_np)
        src = None
    contact = T.Contact(
        dist=dist.astype(dtype),
        pos=pos.astype(dtype),
        frame=frame.astype(dtype),
        geom1=geom1,
        geom2=geom2,
        src=src,
    )
    return dataclasses.replace(d, contact=contact)
