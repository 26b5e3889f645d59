"""Calibrate pair-level top-K pruning: run C-engine rollouts per family and
count, per (geomtype1, geomtype2, condim) candidate group, the max number of
pairs simultaneously "near" (world-AABB gap < includemargin + slack). The
pruned narrowphase (collision_vec) keeps the K nearest pairs per group; K is
safe iff it exceeds these counts with headroom.

Usage: PYTHONPATH=. JAX_PLATFORMS=cpu python tools/calibrate_topk.py
"""

import itertools
import os
import sys

import mujoco
import numpy as np

SRC = os.environ.get(
    "GRT_SRC_ASSETS", "/root/reference/gymnasium_robotics/envs/assets"
)

SLACK = 0.0  # extra gap slack beyond includemargin

MODELS = {
    "fetch_push": "fetch/push.xml",
    "fetch_pnp": "fetch/pick_and_place.xml",
    "fetch_slide": "fetch/slide.xml",
    "hand_block": "hand/manipulate_block.xml",
    "hand_egg": "hand/manipulate_egg.xml",
    "adroit_door": "adroit_hand/adroit_door.xml",
    "adroit_hammer": "adroit_hand/adroit_hammer.xml",
    "adroit_relocate": "adroit_hand/adroit_relocate.xml",
    "adroit_pen": "adroit_hand/adroit_pen.xml",
}


def load_kitchen():
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    shutil.copytree(
        os.path.join(SRC, "kitchen_franka"), os.path.join(tmp, "kitchen_franka")
    )
    tex = os.path.join(tmp, "kitchen_franka/kitchen_assets/textures")
    wood = os.path.join(tex, "wood1.png")
    if not os.path.exists(wood):
        shutil.copy(os.path.join(tex, "marble1.png"), wood)
    return mujoco.MjModel.from_xml_path(
        os.path.join(tmp, "kitchen_franka/kitchen_assets/kitchen_env_model.xml")
    )


def candidate_pairs(m):
    out = []
    for g1, g2 in itertools.combinations(range(m.ngeom), 2):
        b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
        w1, w2 = m.body_weldid[b1], m.body_weldid[b2]
        if w1 == w2:
            continue
        wp1 = m.body_weldid[m.body_parentid[w1]]
        wp2 = m.body_weldid[m.body_parentid[w2]]
        if (wp1 == w2 and w2 != 0) or (wp2 == w1 and w1 != 0):
            continue
        c1, a1 = m.geom_contype[g1], m.geom_conaffinity[g1]
        c2, a2 = m.geom_contype[g2], m.geom_conaffinity[g2]
        if not ((c1 & a2) or (c2 & a1)):
            continue
        out.append((g1, g2))
    return out


def local_aabb(m, g):
    """(center, half-extent) of geom g in its own frame."""
    t = m.geom_type[g]
    if t == mujoco.mjtGeom.mjGEOM_SPHERE:
        a = np.full(3, m.geom_size[g, 0])
    elif t == mujoco.mjtGeom.mjGEOM_CAPSULE:
        a = np.array([m.geom_size[g, 0], m.geom_size[g, 0],
                      m.geom_size[g, 1] + m.geom_size[g, 0]])
    elif t == mujoco.mjtGeom.mjGEOM_CYLINDER:
        a = np.array([m.geom_size[g, 0], m.geom_size[g, 0], m.geom_size[g, 1]])
    elif t == mujoco.mjtGeom.mjGEOM_BOX:
        a = m.geom_size[g].copy()
    elif t == mujoco.mjtGeom.mjGEOM_MESH:
        mid = m.geom_dataid[g]
        v0, nv = m.mesh_vertadr[mid], m.mesh_vertnum[mid]
        v = m.mesh_vert[v0:v0 + nv]
        lo, hi = v.min(0), v.max(0)
        return (lo + hi) / 2, (hi - lo) / 2
    else:
        a = np.full(3, m.geom_rbound[g])
    return np.zeros(3), a


def aabb_world(m, d, g, cache={}):
    """World AABB (center, half-extent) of geom g."""
    c_l, a = local_aabb(m, g)
    R = d.geom_xmat[g].reshape(3, 3)
    return d.geom_xpos[g] + R @ c_l, np.abs(R) @ a


def run(name, m, steps=300, episodes=4, seed=0):
    rng = np.random.default_rng(seed)
    pairs = candidate_pairs(m)
    gt = m.geom_type
    groups = {}
    for i, (g1, g2) in enumerate(pairs):
        # condim per pair: MuJoCo takes the max condim (priority aside)
        cd = max(m.geom_condim[g1], m.geom_condim[g2])
        groups.setdefault((int(gt[g1]), int(gt[g2]), int(cd)), []).append(i)

    d = mujoco.MjData(m)
    maxnear = {k: 0 for k in groups}
    maxcon = {k: 0 for k in groups}
    for ep in range(episodes):
        mujoco.mj_resetData(m, d)
        d.qpos[:] = d.qpos + rng.uniform(-0.05, 0.05, m.nq)
        for t in range(steps):
            if m.nu:
                lo, hi = m.actuator_ctrlrange.T
                d.ctrl[:] = rng.uniform(lo, hi)
            try:
                mujoco.mj_step(m, d)
            except Exception:
                break
            # near counts per group via world AABB gap
            box = [aabb_world(m, d, g) for g in range(m.ngeom)]
            for key, idxs in groups.items():
                near = 0
                for i in idxs:
                    g1, g2 = pairs[i]
                    margin = max(m.geom_margin[g1] + m.geom_margin[g2], 0.0)
                    (c1, h1), (c2, h2) = box[g1], box[g2]
                    if gt[g1] == mujoco.mjtGeom.mjGEOM_PLANE:
                        R = d.geom_xmat[g1].reshape(3, 3)
                        n = R[:, 2]
                        gap = n @ (c2 - d.geom_xpos[g1]) - np.abs(n) @ h2
                    else:
                        gaps = np.abs(c1 - c2) - h1 - h2
                        gap = gaps.max()
                    if gap < margin + SLACK:
                        near += 1
                maxnear[key] = max(maxnear[key], near)
            # actual contacts per group
            concnt = {k: 0 for k in groups}
            gset = {}
            for i, (g1, g2) in enumerate(pairs):
                gset[(g1, g2)] = (int(gt[g1]), int(gt[g2]),
                                  int(max(m.geom_condim[g1], m.geom_condim[g2])))
            pair_hit = {}
            for ci in range(d.ncon):
                c = d.contact[ci]
                key = gset.get((min(c.geom1, c.geom2), max(c.geom1, c.geom2)))
                if key is None:
                    continue
                pk = (min(c.geom1, c.geom2), max(c.geom1, c.geom2))
                pair_hit.setdefault(key, set()).add(pk)
            for key, s in pair_hit.items():
                maxcon[key] = max(maxcon[key], len(s))
    print(f"== {name}")
    for key in sorted(groups):
        print(f"  group t{key[0]}-t{key[1]} cd{key[2]}: npairs={len(groups[key]):5d}"
              f"  max_near={maxnear[key]:4d}  max_contact_pairs={maxcon[key]:4d}")
    sys.stdout.flush()


def main():
    which = sys.argv[1:] or list(MODELS) + ["kitchen"]
    for name in which:
        if name == "kitchen":
            m = load_kitchen()
        else:
            m = mujoco.MjModel.from_xml_path(os.path.join(SRC, MODELS[name]))
        run(name, m)


if __name__ == "__main__":
    main()
