"""Narrowphase collision over the static candidate pair table.

The broadphase equivalent (which geoms may ever touch) is resolved at import
time into ``Meta.pairs`` (see mjcf/import_mjcf.py), so the jitted step has a
fixed contact layout: every candidate pair owns a fixed number of contact slots
determined by its type pair, and slots report a signed distance (``dist``);
slots with ``dist`` above the pair margin are inactive and contribute zero
constraint cost. This replaces MuJoCo's dynamic mjContact list with a
fixed-shape, vmap-friendly structure.

Contact parameter mixing (friction/solref/solimp/margin via solmix & priority,
mirroring mj_contactParam) is precomputed per pair at import time.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu.physics import math as gm
from gymnasium_robotics_tpu.physics import types as T

# contacts slots generated per (type1, type2) pair; types canonically ordered
_SLOTS = {
    (T.PLANE, T.SPHERE): 1,
    (T.PLANE, T.CAPSULE): 2,
    (T.PLANE, T.BOX): 4,
    (T.PLANE, T.CYLINDER): 2,
    (T.PLANE, T.ELLIPSOID): 1,
    (T.SPHERE, T.SPHERE): 1,
    (T.SPHERE, T.CAPSULE): 1,
    (T.SPHERE, T.BOX): 1,
    (T.SPHERE, T.CYLINDER): 1,
    (T.SPHERE, T.ELLIPSOID): 1,
    (T.CAPSULE, T.CAPSULE): 1,
    (T.CAPSULE, T.BOX): 3,
    (T.CAPSULE, T.CYLINDER): 1,
    (T.CAPSULE, T.ELLIPSOID): 1,
    (T.BOX, T.BOX): 9,  # 8 vertex-face (both ways) + 1 SAT edge-edge
    (T.CYLINDER, T.CYLINDER): 1,
    (T.CYLINDER, T.BOX): 3,
    (T.ELLIPSOID, T.BOX): 1,
    (T.ELLIPSOID, T.ELLIPSOID): 1,
    (T.ELLIPSOID, T.CYLINDER): 1,
    # convex hulls (MESH geoms; static-feature SAT in collision_vec.py)
    (T.PLANE, T.MESH): 4,
    (T.SPHERE, T.MESH): 1,
    (T.CAPSULE, T.MESH): 2,
    (T.ELLIPSOID, T.MESH): 1,
    (T.CYLINDER, T.MESH): 2,
    (T.BOX, T.MESH): 8,
    (T.MESH, T.MESH): 4,
}


def pair_slots(t1: int, t2: int) -> int:
    return _SLOTS.get((min(t1, t2), max(t1, t2)), 1)


def ncon_static(meta: T.Meta) -> int:
    """Slot count of the FULL static candidate table (per-slot model params
    con_solref/solimp/friction/includemargin are always this size)."""
    return sum(
        pair_slots(meta.geom_type[g1], meta.geom_type[g2])
        for g1, g2 in meta.pairs
    )


def ncon(m: T.Model) -> int:
    """Slot count of the contact table Data carries: compact under pair-level
    top-K pruning (Option.pair_topk), else the full static table."""
    p = prune_plan(m.meta)
    return p.ncon_c if p.active else ncon_static(m.meta)


@dataclasses.dataclass(frozen=True)
class _PruneGroup:
    tp: tuple            # (t1, t2)
    cd: int              # condim shared by every pair in the group
    idx: tuple           # positions into meta.pairs
    S: int               # slots per pair
    K: int               # pairs evaluated (== len(idx) when not pruned)
    pruned: bool
    base_c: int          # compact slot offset of this group

    @property
    def n_slots_c(self):
        return self.K * self.S


@dataclasses.dataclass(frozen=True)
class _PrunePlan:
    active: bool
    groups: tuple        # of _PruneGroup (empty when inactive)
    ncon_c: int


@functools.lru_cache(maxsize=None)
def prune_plan(meta: T.Meta) -> _PrunePlan:
    """Static layout of the pair-level top-K broadphase (Option.pair_topk).

    Pairs are grouped by (geom-type pair, condim); groups larger than K
    evaluate narrowphase on only the K nearest pairs per env (ranked by
    world-AABB gap minus margin — the TPU-shape-static analogue of MuJoCo's
    sweep-and-prune broadphase inside mj_collision, reference
    gymnasium_robotics/envs/robot_env.py:340-341). Plane-anchored groups are
    never pruned (small; plane gap needs halfspace treatment). The compact
    slot layout is group-major, pair-major, slot-minor; Contact.src maps each
    compact slot to its canonical static slot id.
    """
    K = getattr(meta.opt, "pair_topk", 0)
    topk_groups = {}
    order = []
    slot_base = []
    cursor = 0
    for j, (g1, g2) in enumerate(meta.pairs):
        t1, t2 = meta.geom_type[g1], meta.geom_type[g2]
        S = pair_slots(t1, t2)
        slot_base.append(cursor)
        cursor += S
        # condim per pair == condim of its slots (uniform within a pair)
        cd = _pair_condim(meta, j)
        key = (t1, t2, cd)
        if key not in topk_groups:
            topk_groups[key] = []
            order.append(key)
        topk_groups[key].append(j)
    any_pruned = False
    groups = []
    base_c = 0
    for key in order:
        t1, t2, cd = key
        idx = topk_groups[key]
        S = pair_slots(t1, t2)
        pruned = bool(K) and len(idx) > K and t1 != T.PLANE and t2 != T.PLANE
        Kg = K if pruned else len(idx)
        groups.append(_PruneGroup(
            tp=(t1, t2), cd=cd, idx=tuple(idx), S=S, K=Kg, pruned=pruned,
            base_c=base_c,
        ))
        base_c += Kg * S
        any_pruned |= pruned
    if not any_pruned:
        return _PrunePlan(active=False, groups=(), ncon_c=0)
    return _PrunePlan(active=True, groups=tuple(groups), ncon_c=base_c)


@functools.lru_cache(maxsize=None)
def _pair_slot_base(meta: T.Meta):
    """Canonical static slot offset per pair (meta.pairs order), numpy."""
    base = np.zeros(len(meta.pairs), np.int64)
    cursor = 0
    for j, (g1, g2) in enumerate(meta.pairs):
        base[j] = cursor
        cursor += pair_slots(meta.geom_type[g1], meta.geom_type[g2])
    return base


def _pair_condim(meta: T.Meta, j: int) -> int:
    """Condim of pair j, read from the canonical per-slot table."""
    return meta.con_condim[int(_pair_slot_base(meta)[j])]


@functools.lru_cache(maxsize=None)
def compact_condim(meta: T.Meta):
    """Condim per COMPACT slot (pair_topk layout), numpy (ncon_c,)."""
    p = prune_plan(meta)
    out = []
    for g in p.groups:
        out += [g.cd] * g.n_slots_c
    return np.array(out, np.int64)


_BIG = 1e10


def _far(n, dtype):
    return (
        jnp.full((n,), _BIG, dtype),
        jnp.zeros((n, 3), dtype),
        jnp.tile(jnp.array([0.0, 0, 1.0], dtype), (n, 1)),
    )


# Each primitive fn returns (dist (k,), pos (k,3), normal (k,3)); normal points
# from geom1 into geom2 (MuJoCo convention: frame z-axis from geom1 to geom2).

def _plane_sphere(p1, R1, s1, p2, R2, s2):
    n = R1[:, 2]
    dist = jnp.dot(n, p2 - p1) - s2[0]
    pos = p2 - n * (s2[0] + 0.5 * dist)
    return dist[None], pos[None], n[None]


def _plane_capsule(p1, R1, s1, p2, R2, s2):
    n = R1[:, 2]
    axis = R2[:, 2]
    ends = jnp.stack([p2 + axis * s2[1], p2 - axis * s2[1]])
    dist = ends @ n - jnp.dot(p1, n) - s2[0]
    pos = ends - n * (s2[0] + 0.5 * dist)[:, None]
    # mjc convention: tan1 = capsule +z axis projected onto the plane
    proj = axis - n * jnp.dot(n, axis)
    t1n, nrm = gm.normalize(proj)
    frame_t1 = jnp.where(nrm > 1e-8, t1n, jnp.full_like(t1n, jnp.nan))
    return dist, pos, jnp.tile(n, (2, 1)), jnp.tile(frame_t1, (2, 1))


def _box_corners(p, R, s):
    sign = jnp.array(
        [[i, j, k] for i in (-1, 1) for j in (-1, 1) for k in (-1, 1)],
        dtype=p.dtype,
    )
    return p + (sign * s) @ R.T  # (8, 3)


def _plane_box(p1, R1, s1, p2, R2, s2):
    n = R1[:, 2]
    corners = _box_corners(p2, R2, s2)  # (8,3)
    dist = corners @ n - jnp.dot(p1, n)
    # keep the 4 deepest corners
    idx = jnp.argsort(dist)[:4]
    dist4 = dist[idx]
    pos = corners[idx] - 0.5 * dist4[:, None] * n
    return dist4, pos, jnp.tile(n, (4, 1))


def _plane_cylinder(p1, R1, s1, p2, R2, s2):
    # approximate: two rim points nearest the plane
    n = R1[:, 2]
    axis = R2[:, 2]
    # radial direction most anti-parallel to plane normal
    perp = n - axis * jnp.dot(n, axis)
    pn, norm = gm.normalize(perp)
    rad = -pn * s2[0]
    rad = jnp.where(norm > 1e-6, rad, R2[:, 0] * s2[0])
    ends = jnp.stack([p2 + axis * s2[1] + rad, p2 - axis * s2[1] + rad])
    dist = ends @ n - jnp.dot(p1, n)
    pos = ends - 0.5 * dist[:, None] * n
    proj = axis - n * jnp.dot(n, axis)
    t1n, nrm = gm.normalize(proj)
    ft1 = jnp.where(nrm > 1e-8, t1n, jnp.full_like(t1n, jnp.nan))
    return dist, pos, jnp.tile(n, (2, 1)), jnp.tile(ft1, (2, 1))


def _sphere_sphere(p1, R1, s1, p2, R2, s2):
    dvec = p2 - p1
    nrm, dist0 = gm.normalize(dvec)
    n = jnp.where(dist0 > 1e-9, nrm, jnp.array([0.0, 0, 1.0], p1.dtype))
    dist = dist0 - s1[0] - s2[0]
    pos = p1 + n * (s1[0] + 0.5 * dist)
    return dist[None], pos[None], n[None]


def _closest_on_seg(p, a, b):
    ab = b - a
    t = jnp.clip(jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12), 0, 1)
    return a + t * ab


def _sphere_capsule(p1, R1, s1, p2, R2, s2):
    axis = R2[:, 2]
    a, b = p2 - axis * s2[1], p2 + axis * s2[1]
    c = _closest_on_seg(p1, a, b)
    return _sphere_sphere(p1, R1, s1, c, R2, jnp.array([s2[0], 0, 0], s2.dtype))


def _sphere_box(p1, R1, s1, p2, R2, s2):
    # sphere center in box frame
    loc = R2.T @ (p1 - p2)
    clamped = jnp.clip(loc, -s2, s2)
    inside = jnp.all(jnp.abs(loc) < s2)
    # outside: closest point on surface; inside: push out along min-penetration face
    face_dist = s2 - jnp.abs(loc)
    k = jnp.argmin(face_dist)
    push = jnp.zeros(3, p1.dtype).at[k].set(jnp.sign(loc[k]) * s2[k])
    surf_in = jnp.where(jnp.arange(3) == k, push, loc)
    surf = jnp.where(inside, surf_in, clamped)
    world = p2 + R2 @ surf
    dvec = world - p1
    nrm, d0 = gm.normalize(dvec)
    n_out = jnp.where(d0 > 1e-9, nrm, R2[:, 2])
    dist_out = d0 - s1[0]
    dist_in = -(jnp.min(face_dist) + s1[0])
    outward = jnp.sign(loc[k]) * jnp.eye(3, dtype=p1.dtype)[k]  # box-frame face normal
    n_in = -(R2 @ outward)
    n = jnp.where(inside, n_in, n_out)  # normal from sphere(g1) into box(g2)
    dist = jnp.where(inside, dist_in, dist_out)
    pos = p1 + n * (s1[0] + 0.5 * dist)
    return dist[None], pos[None], n[None]


def _point_cylinder(P, pc, Rc, s):
    """Signed distance from point P to a true cylinder (radius s[0], half-
    height s[1]): returns (sd, surface point, outward normal). Exact for the
    lateral / cap / rim / interior regions (flat caps, unlike the capsule
    approximation, which bulges by ~r beyond the cap face)."""
    q = Rc.T @ (P - pc)
    z = q[2]
    radial = q[:2]
    rad, rlen = gm.normalize(radial)
    rdir = jnp.where(rlen > 1e-9, rad, jnp.array([1.0, 0.0], P.dtype))
    dr = rlen - s[0]
    dz = jnp.abs(z) - s[1]
    zsign = jnp.where(z >= 0, 1.0, -1.0).astype(P.dtype)
    # region classification
    outside_r = dr > 0
    outside_z = dz > 0
    # closest surface point in cylinder frame
    lat = jnp.concatenate([rdir * s[0], jnp.clip(z, -s[1], s[1])[None]])
    cap = jnp.concatenate([rdir * jnp.minimum(rlen, s[0]), (zsign * s[1])[None]])
    rim = jnp.concatenate([rdir * s[0], (zsign * s[1])[None]])
    # interior: push out through nearer of lateral wall / cap face
    inter = jnp.where(dr > dz, lat, cap)
    surf_loc = jnp.where(
        outside_r & outside_z, rim,
        jnp.where(outside_r, lat, jnp.where(outside_z, cap, inter)),
    )
    sd = jnp.where(
        outside_r & outside_z, jnp.sqrt(dr * dr + dz * dz),
        jnp.where(outside_r, dr, jnp.where(outside_z, dz, jnp.maximum(dr, dz))),
    )
    surf = pc + Rc @ surf_loc
    # outward normal at the surface point
    n_lat = Rc @ jnp.concatenate([rdir, jnp.zeros(1, P.dtype)])
    n_cap = Rc[:, 2] * zsign
    diff = P - surf
    n_away, dn = gm.normalize(diff)
    n_out = jnp.where(
        outside_r & outside_z, jnp.where(dn > 1e-9, n_away, n_lat),
        jnp.where(outside_r, n_lat, jnp.where(outside_z, n_cap,
                  jnp.where(dr > dz, n_lat, n_cap))),
    )
    return sd, surf, n_out


def _sphere_cylinder(p1, R1, s1, p2, R2, s2):
    sd, surf, n_out = _point_cylinder(p1, p2, R2, s2)
    dist = sd - s1[0]
    n = -n_out  # from sphere (geom1) into cylinder (geom2)
    pos = 0.5 * ((p1 + n * s1[0]) + surf)
    return dist[None], pos[None], n[None]


def _capsule_cylinder(p1, R1, s1, p2, R2, s2):
    """Capsule (geom1) vs true cylinder (geom2): the point-to-cylinder
    distance is convex along the capsule segment, so a fixed-iteration
    ternary search finds the closest axis point under jit."""
    ax = R1[:, 2]

    def sd_at(t):
        return _point_cylinder(p1 + ax * (t * s1[1]), p2, R2, s2)[0]

    lo = jnp.asarray(-1.0, p1.dtype)
    hi = jnp.asarray(1.0, p1.dtype)
    for _ in range(24):
        m1 = lo + (hi - lo) / 3
        m2 = hi - (hi - lo) / 3
        go_right = sd_at(m1) > sd_at(m2)
        lo = jnp.where(go_right, m1, lo)
        hi = jnp.where(go_right, hi, m2)
    t = 0.5 * (lo + hi)
    c = p1 + ax * (t * s1[1])
    return _sphere_cylinder(c, R1, s1, p2, R2, s2)


def _cylinder_cylinder(p1, R1, s1, p2, R2, s2):
    """Each direction treats one side as a capsule (a superset of the
    cylinder, so each estimate under-reports distance); keep the larger."""
    d_a, pos_a, n_a = _capsule_cylinder(p1, R1, s1, p2, R2, s2)
    d_b, pos_b, n_b = _capsule_cylinder(p2, R2, s2, p1, R1, s1)
    n_b = -n_b  # flip back to from-geom1-into-geom2
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
    A = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = A * e - b * b
    s = jnp.where(jnp.abs(denom) > 1e-12, (b * f - c * e) / denom, 0.0)
    s = jnp.clip(s, 0, 1)
    t = jnp.where(e > 1e-12, (b * s + f) / e, 0.0)
    t = jnp.clip(t, 0, 1)
    s = jnp.clip(jnp.where(A > 1e-12, (b * t - c) / A, 0.0), 0, 1)
    return a1 + s * d1, a2 + t * d2


def _capsule_capsule(p1, R1, s1, p2, R2, s2):
    ax1, ax2 = R1[:, 2], R2[:, 2]
    c1, c2 = _seg_seg_closest(
        p1 - ax1 * s1[1], p1 + ax1 * s1[1], p2 - ax2 * s2[1], p2 + ax2 * s2[1]
    )
    return _sphere_sphere(
        c1, R1, s1, c2, R2, jnp.array([s2[0], 0, 0], s2.dtype)
    )


def _capsule_box(p1, R1, s1, p2, R2, s2):
    # sample 3 spheres along the capsule axis (ends + middle)
    ax = R1[:, 2]
    outs = []
    for t in (-1.0, 0.0, 1.0):
        c = p1 + ax * (t * s1[1])
        dist, pos, n = _sphere_box(c, R1, s1, p2, R2, s2)
        outs.append((dist, pos, n))
    return (
        jnp.concatenate([o[0] for o in outs]),
        jnp.concatenate([o[1] for o in outs]),
        jnp.concatenate([o[2] for o in outs]),
    )


def _box_box(p1, R1, s1, p2, R2, s2):
    """Vertex-face contacts both directions (4 deepest each) plus an inert
    9th slot (the SoA path, collision_vec._box_box, fills it with the SAT
    edge-edge contact; this reference AoS path keeps it far)."""

    def verts_in_box(pa, Ra, sa, pb, Rb, sb, sign):
        corners = _box_corners(pa, Ra, sa)  # (8,3)
        loc = (corners - pb) @ Rb  # in b frame
        face_dist = sb - jnp.abs(loc)  # (8,3) positive inside
        pen = jnp.min(face_dist, axis=1)  # (8,) >0 inside
        k = jnp.argmin(face_dist, axis=1)  # face index
        sgn = jnp.sign(jnp.take_along_axis(loc, k[:, None], 1))[:, 0]
        n_loc = jax.nn.one_hot(k, 3, dtype=pa.dtype) * sgn[:, None]
        n_world = n_loc @ Rb.T  # outward normal of box b at face
        dist = -pen  # negative = penetrating
        dist = jnp.where(pen > 0, dist, _BIG)  # only vertices inside count
        idx = jnp.argsort(dist)[:4]
        d4 = dist[idx]
        depth = jnp.where(d4 < 0, d4, 0.0)
        pos = corners[idx] - 0.5 * depth[:, None] * (sign * n_world[idx])
        # normal from geom1 into geom2
        return d4, pos, sign * n_world[idx]

    # vertices of box2 inside box1: normal = outward of box1 = from 1 into 2
    d_a, pos_a, n_a = verts_in_box(p2, R2, s2, p1, R1, s1, 1.0)
    # vertices of box1 inside box2: outward of box2 points from 2 into 1 -> flip
    d_b, pos_b, n_b = verts_in_box(p1, R1, s1, p2, R2, s2, -1.0)
    far = jnp.full((1,), _BIG, p1.dtype)
    return (
        jnp.concatenate([d_a, d_b, far]),
        jnp.concatenate([pos_a, pos_b, jnp.zeros((1, 3), p1.dtype)]),
        jnp.concatenate([n_a, n_b, jnp.array([[0.0, 0, 1.0]], p1.dtype)]),
    )


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


def _contact_frame(n, t1=None):
    """Orthonormal frame rows (normal, tan1, tan2), matching mju_makeFrame:
    tan1 = normalize(y_hat - (n.y_hat) n) with z_hat fallback near |n_y|=1;
    tan2 = n x tan1. Narrowphase may pass an explicit tan1 (capsule-plane
    aligns tan1 with the negated projected capsule axis, per mjc probes)."""
    yhat = jnp.array([0.0, 1.0, 0.0], n.dtype)
    zhat = jnp.array([0.0, 0.0, 1.0], n.dtype)
    cand_y = yhat - n * n[..., 1:2]
    cand_z = zhat - n * n[..., 2:3]
    use_y = (jnp.abs(n[..., 1:2]) < 0.99)
    generic, _ = gm.normalize(jnp.where(use_y, cand_y, cand_z))
    if t1 is None:
        t1 = generic
    else:
        ok = jnp.all(jnp.isfinite(t1), axis=-1, keepdims=True)
        t1 = jnp.where(ok, jnp.nan_to_num(t1), generic)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


def collision(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    dtype = d.qpos.dtype
    n_total = ncon(m)
    if not mt.pairs or mt.opt.disable_contact:
        contact = T.Contact(
            dist=jnp.full((n_total,), _BIG, dtype),
            pos=jnp.zeros((n_total, 3), dtype),
            frame=jnp.tile(jnp.eye(3, dtype=dtype), (n_total, 1, 1)),
            geom1=jnp.zeros(n_total, jnp.int32),
            geom2=jnp.zeros(n_total, jnp.int32),
        )
        return dataclasses.replace(d, contact=contact)

    # Group candidate pairs by type pair and vmap each primitive narrowphase
    # function over its whole group: trace size is O(#type-pairs), and each
    # group executes as a single batched kernel (Fetch/Hand scenes have
    # 1000+ candidate slots — per-slot tracing would dominate compile time).
    groups: dict = {}
    for order, (g1, g2) in enumerate(mt.pairs):
        t1, t2 = mt.geom_type[g1], mt.geom_type[g2]
        groups.setdefault((t1, t2), []).append((order, g1, g2))

    slot_results = {}
    for (t1, t2), entries in groups.items():
        fn = _dispatch(t1, t2)
        k = pair_slots(t1, t2)
        g1_idx = jnp.asarray(np.array([e[1] for e in entries]))
        g2_idx = jnp.asarray(np.array([e[2] for e in entries]))
        if fn is None:
            n = len(entries)
            dd = jnp.full((n, k), _BIG, dtype)
            pp = jnp.zeros((n, k, 3), dtype)
            nn = jnp.tile(jnp.array([0.0, 0, 1.0], dtype), (n, k, 1))
            tt = jnp.full((n, k, 3), jnp.nan, dtype)
        else:
            res = jax.vmap(fn)(
                d.geom_xpos[g1_idx], d.geom_xmat[g1_idx], m.geom_size[g1_idx],
                d.geom_xpos[g2_idx], d.geom_xmat[g2_idx], m.geom_size[g2_idx],
            )
            if len(res) == 4:
                dd, pp, nn, tt = res
            else:
                dd, pp, nn = res
                tt = jnp.full(nn.shape, jnp.nan, dtype)
        slot_results[(t1, t2)] = (
            dd.reshape(-1), pp.reshape(-1, 3), nn.reshape(-1, 3), tt.reshape(-1, 3)
        )

    # static permutation: group-major slot order -> canonical pair-major order
    group_base = {}
    offset = 0
    for tp, entries in groups.items():
        group_base[tp] = offset
        offset += len(entries) * pair_slots(*tp)
    perm = np.zeros(offset, dtype=np.int64)
    g1s, g2s = [], []
    pos_in_group = {tp: 0 for tp in groups}
    cursor = 0
    for g1, g2 in mt.pairs:
        tp = (mt.geom_type[g1], mt.geom_type[g2])
        k = pair_slots(*tp)
        src = group_base[tp] + pos_in_group[tp] * k
        perm[cursor:cursor + k] = np.arange(src, src + k)
        pos_in_group[tp] += 1
        cursor += k
        g1s += [g1] * k
        g2s += [g2] * k
    perm = jnp.asarray(perm)

    all_d = jnp.concatenate([slot_results[tp][0] for tp in groups])
    all_p = jnp.concatenate([slot_results[tp][1] for tp in groups])
    all_n = jnp.concatenate([slot_results[tp][2] for tp in groups])
    all_t = jnp.concatenate([slot_results[tp][3] for tp in groups])
    dist = all_d[perm]
    pos = all_p[perm]
    normal = all_n[perm]
    tan1 = all_t[perm]
    contact = T.Contact(
        dist=dist,
        pos=pos,
        frame=_contact_frame(normal, tan1),
        geom1=jnp.asarray(g1s, jnp.int32),
        geom2=jnp.asarray(g2s, jnp.int32),
    )
    return dataclasses.replace(d, contact=contact)


collision_ref = collision


def slot_params(mjm, pairs, geom_type=None) -> dict:
    """Per-contact-slot parameters from a raw mujoco.MjModel (import-time only).

    Mirrors MuJoCo's mj_contactParam mixing: priority override, solmix-weighted
    solref/solimp, elementwise-max friction, max margin/gap.
    """
    fric, solref, solimp, margin, condim = [], [], [], [], []
    gt = np.asarray(geom_type if geom_type is not None else mjm.geom_type)
    for g1, g2 in pairs:
        p1, p2 = int(mjm.geom_priority[g1]), int(mjm.geom_priority[g2])
        k = pair_slots(int(gt[g1]), int(gt[g2]))
        if p1 != p2:
            src = g1 if p1 > p2 else g2
            f3 = mjm.geom_friction[src]
            sr, si = mjm.geom_solref[src], mjm.geom_solimp[src]
            cd = int(mjm.geom_condim[src])
        else:
            f3 = np.maximum(mjm.geom_friction[g1], mjm.geom_friction[g2])
            tot = mjm.geom_solmix[g1] + mjm.geom_solmix[g2]
            mix = mjm.geom_solmix[g1] / tot if tot > 1e-12 else 0.5
            if mjm.geom_solref[g1][0] <= 0 or mjm.geom_solref[g2][0] <= 0:
                sr = np.minimum(mjm.geom_solref[g1], mjm.geom_solref[g2])
            else:
                sr = mix * mjm.geom_solref[g1] + (1 - mix) * mjm.geom_solref[g2]
            si = mix * mjm.geom_solimp[g1] + (1 - mix) * mjm.geom_solimp[g2]
            cd = max(int(mjm.geom_condim[g1]), int(mjm.geom_condim[g2]))
        f5 = np.array([f3[0], f3[0], f3[1], f3[2], f3[2]])
        # includemargin = (margin1 + margin2) - (gap1 + gap2): additive mixing,
        # calibrated against mjContact.includemargin (hopper: 0.001+0.001)
        mg = (mjm.geom_margin[g1] + mjm.geom_margin[g2]) - (
            mjm.geom_gap[g1] + mjm.geom_gap[g2]
        )
        for _ in range(k):
            fric.append(f5)
            solref.append(sr)
            solimp.append(si)
            margin.append(mg)
            condim.append(cd)
    n = len(condim)
    return dict(
        friction=np.array(fric).reshape(n, 5),
        solref=np.array(solref).reshape(n, 2),
        solimp=np.array(solimp).reshape(n, 5),
        includemargin=np.array(margin).reshape(n),
        condim=tuple(condim),
    )


# ---------------------------------------------------------------------------
# The SoA batch-last narrowphase (collision_vec) supersedes the per-slot
# vmapped implementation above: env batch rides the TPU lane dimension via a
# custom_vmap rule, ~10-40x faster on TPU (the AoS path was ~90% of the
# FetchPush substep). The original is kept as collision_ref for validation
# (tests/test_physics_parity.py compares both).
# ---------------------------------------------------------------------------
from gymnasium_robotics_tpu.physics import collision_vec as _cvec  # noqa: E402

collision = _cvec.collision
