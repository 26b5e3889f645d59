"""Kinematic-graph factorization for multi-agent MuJoCo (the TPU-native
re-design of gymnasium_robotics/envs/multiagent_mujoco/obsk.py).

Nodes carry static qpos/qvel/act indices; hyperedges define joint adjacency;
``get_joints_at_kdist`` is the same BFS (obsk.py:106-153) run at build time so
each agent's observation becomes a STATIC gather program executed in jnp
(vmap-compatible, per SURVEY.md §2.4 multi-agent row). ``extra_obs`` overrides
are named transform tags instead of lambdas so they stay trace-safe.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Node:
    label: str
    qpos_ids: Optional[int]
    qvel_ids: Optional[int]
    act_ids: Optional[int]
    bodies: Tuple[int, ...] = ()
    extra_obs: Tuple[Tuple[str, Tuple], ...] = ()  # (category, transform-spec)
    body_clip: bool = False  # ant: clip body categories to [-1, 1]

    def get_extra(self, category):
        for cat, spec in self.extra_obs:
            if cat == category:
                return spec
        return None


@dataclasses.dataclass(frozen=True)
class HyperEdge:
    nodes: Tuple[str, ...]  # node labels


def get_joints_at_kdist(
    partition: Tuple[Node, ...], edges: List[HyperEdge], k: int,
    all_nodes: Dict[str, Node],
) -> Dict[int, List[Node]]:
    """BFS over hyperedges (mirrors obsk.py:106-153)."""

    def adjacent(labels):
        out = set()
        for e in edges:
            if any(l in e.nodes for l in labels):
                out |= set(e.nodes) - set(labels)
        return out

    seen = {n.label for n in partition}
    k_dict = {0: sorted(seen)}
    frontier = set(seen)
    for depth in range(1, k + 1):
        new = adjacent(frontier) - seen
        k_dict[depth] = sorted(new)
        seen |= new
        frontier = frontier | new
    return {
        d: [all_nodes[l] for l in labels] for d, labels in k_dict.items()
    }


def _apply_transform(spec, data, dtype, index_only=False):
    kind = spec[0]
    if kind == "empty":
        return jnp.zeros(0, dtype)
    if kind == "clip_qvel":
        idx, lo, hi = spec[1], spec[2], spec[3]
        vals = data.qvel[jnp.asarray(np.atleast_1d(idx))]
        return vals if index_only else jnp.clip(vals, lo, hi)
    if kind == "qpos_slice":
        return data.qpos[spec[1]:spec[2]]
    if kind == "qvel_slice":
        return data.qvel[spec[1]:spec[2]]
    if kind == "sincos_qpos":
        q = data.qpos[spec[1]]
        return jnp.stack([jnp.sin(q), jnp.cos(q)])
    if kind == "qvel_pair":
        return jnp.stack([data.qvel[spec[1]], data.qvel[spec[2]]])
    if kind == "body_dist":
        return data.xpos[spec[1]] - data.xpos[spec[2]]
    if kind == "body_xpos":
        return data.xpos[spec[1]]
    if kind == "ten_J_cols":
        return data.ten_J[spec[1]][jnp.asarray(list(spec[2]))]
    if kind == "ten_length":
        return data.ten_length[spec[1]][None]
    if kind == "ten_velocity":
        return data.ten_velocity[spec[1]][None]
    raise ValueError(f"unknown transform {kind}")


def build_obs(
    data, k_dict, local_categories, global_nodes, global_categories,
    nq: int, nv: int, dtype=jnp.float32, index_only=False,
):
    """jnp version of obsk.build_obs (obsk.py:156-229): same category order,
    body dedup per category, negative ids resolved against (nq, nv).

    ``index_only=True`` runs the same gather program on a Data-like struct
    whose fields hold global-obs INDICES, skipping value transforms (clip),
    to produce the CTDE observation factorization (mujoco_multi.py:519-538's
    index_only / ignore_body_fn mode)."""
    parts = []
    body_seen: Dict[str, set] = {}

    def emit(node, category):
        spec = node.get_extra(category)
        if spec is not None:
            parts.append(
                jnp.atleast_1d(_apply_transform(spec, data, dtype, index_only))
            )
            return
        if category == "qvel":
            parts.append(data.qvel[node.qvel_ids % nv][None])
        elif category == "qpos":
            parts.append(data.qpos[node.qpos_ids % nq][None])
        elif category == "qfrc_actuator":
            parts.append(data.qfrc_actuator[node.qvel_ids % nv][None])
        elif category in ("cvel", "cinert", "cfrc_ext"):
            seen = body_seen.setdefault(category, set())
            for body in node.bodies:
                if body in seen:
                    continue
                seen.add(body)
                items = getattr(data, category)[body].reshape(-1)
                if node.body_clip and not index_only:
                    items = jnp.clip(items, -1.0, 1.0)
                parts.append(items)
        elif category in ("ten_J", "ten_length", "ten_velocity"):
            pass  # only via extra_obs specs
        elif category == "fingertip_dist":
            pass  # only via extra_obs specs

    for k in sorted(k_dict.keys()):
        for node in k_dict[k]:
            for category in local_categories[k]:
                emit(node, category)

    body_seen.clear()
    for category in global_categories:
        for node in global_nodes:
            emit(node, category)

    return jnp.concatenate(parts) if parts else jnp.zeros(0, dtype)


# ---------------------------------------------------------------------------
# Scenario graphs (topologies mirror obsk.py:244-1059; negative qpos/qvel ids
# index from the end exactly as the reference does)
# ---------------------------------------------------------------------------

def get_parts_and_edges(label: str, partitioning: Optional[str]):
    if label == "HalfCheetah":
        names = ["bthigh", "bshin", "bfoot", "fthigh", "fshin", "ffoot"]
        nodes = {
            n: Node(n, -6 + i, -6 + i, i) for i, n in enumerate(names)
        }
        edges = [
            HyperEdge(("bfoot", "bshin")), HyperEdge(("bshin", "bthigh")),
            HyperEdge(("bthigh", "fthigh")), HyperEdge(("fthigh", "fshin")),
            HyperEdge(("fshin", "ffoot")),
        ]
        globals_ = [
            Node("root_x", 0, 0, None, extra_obs=((("qpos", ("empty",))),)),
            Node("root_z", 1, 1, None),
            Node("root_y", 2, 2, None),
        ]
        parts = {
            None: [tuple(names)],
            "2x3": [("bthigh", "bshin", "bfoot"), ("fthigh", "fshin", "ffoot")],
            "6x1": [(n,) for n in names],
        }[partitioning]
    elif label == "Ant":
        torso, fll, aux1, ank1, frl, aux2, ank2, bl, aux3, ank3, brl, aux4, ank4 = \
            1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13
        spec = [
            ("hip1", -8, 2, (torso, fll)), ("ankle1", -7, 3, (fll, aux1, ank1)),
            ("hip2", -6, 4, (torso, frl)), ("ankle2", -5, 5, (frl, aux2, ank2)),
            ("hip3", -4, 6, (torso, bl)), ("ankle3", -3, 7, (bl, aux3, ank3)),
            ("hip4", -2, 0, (torso, brl)), ("ankle4", -1, 1, (brl, aux4, ank4)),
        ]
        nodes = {
            n: Node(n, q, q, a, bodies=b, body_clip=True)
            for n, q, a, b in spec
        }
        edges = [
            HyperEdge(("ankle4", "hip4")), HyperEdge(("ankle1", "hip1")),
            HyperEdge(("ankle2", "hip2")), HyperEdge(("ankle3", "hip3")),
            HyperEdge(("hip4", "hip1", "hip2", "hip3")),
        ]
        globals_ = [
            Node("root", 0, 0, None, extra_obs=(
                ("qpos", ("qpos_slice", 2, 7)),
                ("qvel", ("qvel_slice", 0, 6)),
            )),
        ]
        parts = {
            None: [tuple(n for n, *_ in spec)],
            "2x4": [("hip1", "ankle1", "hip2", "ankle2"),
                    ("hip3", "ankle3", "hip4", "ankle4")],
            "2x4d": [("hip1", "ankle1", "hip4", "ankle4"),
                     ("hip2", "ankle2", "hip3", "ankle3")],
            "4x2": [("hip1", "ankle1"), ("hip2", "ankle2"),
                    ("hip3", "ankle3"), ("hip4", "ankle4")],
        }[partitioning]
    elif label == "Hopper":
        names = ["thigh_joint", "leg_joint", "foot_joint"]
        nodes = {
            n: Node(n, -3 + i, -3 + i, i,
                    extra_obs=(("qvel", ("clip_qvel", -3 + i, -10, 10)),))
            for i, n in enumerate(names)
        }
        edges = [HyperEdge(("foot_joint", "leg_joint")),
                 HyperEdge(("leg_joint", "thigh_joint"))]
        globals_ = [
            Node("root_x", 0, 0, None, extra_obs=(
                ("qpos", ("empty",)), ("qvel", ("clip_qvel", 0, -10, 10)))),
            Node("root_z", 1, 1, None,
                 extra_obs=(("qvel", ("clip_qvel", 1, -10, 10)),)),
            Node("root_y", 2, 2, None,
                 extra_obs=(("qvel", ("clip_qvel", 2, -10, 10)),)),
        ]
        parts = {
            None: [tuple(names)],
            "3x1": [(n,) for n in names],
        }[partitioning]
    elif label == "Walker2d":
        names = ["thigh_joint", "leg_joint", "foot_joint",
                 "thigh_left_joint", "leg_left_joint", "foot_left_joint"]
        nodes = {n: Node(n, -6 + i, -6 + i, i) for i, n in enumerate(names)}
        edges = [
            HyperEdge(("foot_joint", "leg_joint")),
            HyperEdge(("leg_joint", "thigh_joint")),
            HyperEdge(("foot_left_joint", "leg_left_joint")),
            HyperEdge(("leg_left_joint", "thigh_left_joint")),
            HyperEdge(("thigh_joint", "thigh_left_joint")),
        ]
        globals_ = [
            Node("root_x", 0, 0, None, extra_obs=(("qpos", ("empty",)),)),
            Node("root_z", 1, 1, None),
            Node("root_y", 2, 2, None),
        ]
        parts = {
            None: [tuple(names)],
            "2x3": [tuple(names[:3]), tuple(names[3:])],
        }[partitioning]
    elif label == "Swimmer":
        nodes = {
            "rot2": Node("rot2", -2, -2, 0,
                         extra_obs=(("qvel", ("qvel_pair", 0, 3)),)),
            "rot3": Node("rot3", -1, -1, 1,
                         extra_obs=(("qvel", ("qvel_pair", 1, 4)),)),
        }
        edges = [HyperEdge(("rot2", "rot3"))]
        globals_ = [Node("free_body_rot", 2, 2, None)]
        parts = {
            None: [("rot2", "rot3")],
            "2x1": [("rot2",), ("rot3",)],
        }[partitioning]
    elif label == "Reacher":
        nodes = {
            "joint0": Node("joint0", -4, -4, 0, bodies=(1, 2),
                           extra_obs=(("qpos", ("sincos_qpos", -4)),)),
            "joint1": Node("joint1", -3, -3, 1, bodies=(2, 3),
                           extra_obs=(
                               ("fingertip_dist", ("body_dist", 3, 4)),
                               ("qpos", ("sincos_qpos", -3)),
                           )),
        }
        edges = [HyperEdge(("joint0", "joint1"))]
        globals_ = [
            Node("target_x", -2, -2, None, extra_obs=(("qvel", ("empty",)),)),
            Node("target_y", -1, -1, None, extra_obs=(("qvel", ("empty",)),)),
        ]
        parts = {
            None: [("joint0", "joint1")],
            "2x1": [("joint0",), ("joint1",)],
        }[partitioning]
    elif label in ("Humanoid", "HumanoidStandup"):
        # bodies (obsk.py:467-604)
        torso, lwaist, pelvis = 1, 2, 3
        rthigh, rsin, rfoot = 4, 5, 6
        lthigh, lsin, lfoot = 7, 8, 9
        ruarm, rlarm, luarm, llarm = 10, 11, 12, 13
        spec = [
            ("abdomen_y", -17, 0, (torso, lwaist, pelvis)),
            ("abdomen_z", -16, 1, (torso, lwaist, pelvis)),
            ("abdomen_x", -15, 2, (pelvis, rthigh, lthigh)),
            ("right_hip_x", -14, 3, (rthigh, rsin)),
            ("right_hip_z", -13, 4, (rthigh, rsin)),
            ("right_hip_y", -12, 5, (rthigh, rsin)),
            ("right_knee", -11, 6, (rsin, rfoot)),
            ("left_hip_x", -10, 7, (lthigh, lsin)),
            ("left_hip_z", -9, 8, (lthigh, lsin)),
            ("left_hip_y", -8, 9, (lthigh, lsin)),
            ("left_knee", -7, 10, (lsin, lfoot)),
            ("right_shoulder1", -6, 11, (torso, ruarm, rlarm)),
            ("right_shoulder2", -5, 12, (torso, ruarm, rlarm)),
            ("right_elbow", -4, 13, (rlarm,)),
            ("left_shoulder1", -3, 14, (torso, luarm, llarm)),
            ("left_shoulder2", -2, 15, (torso, luarm, llarm)),
            ("left_elbow", -1, 16, (llarm,)),
        ]
        nodes = {n: Node(n, q, q, a, bodies=b) for n, q, a, b in spec}
        abd = ("abdomen_x", "abdomen_y", "abdomen_z")
        rhip = ("right_hip_x", "right_hip_y", "right_hip_z")
        lhip = ("left_hip_x", "left_hip_y", "left_hip_z")
        edges = [
            HyperEdge(abd), HyperEdge(rhip), HyperEdge(lhip),
            HyperEdge(("left_elbow", "left_shoulder1", "left_shoulder2")),
            HyperEdge(("right_elbow", "right_shoulder1", "right_shoulder2")),
            HyperEdge(("left_knee",) + lhip),
            HyperEdge(("right_knee",) + rhip),
            HyperEdge(("left_shoulder1", "left_shoulder2") + abd),
            HyperEdge(("right_shoulder1", "right_shoulder2") + abd),
            HyperEdge(abd + lhip),
            HyperEdge(abd + rhip),
        ]
        globals_ = [
            Node("root", None, None, None, extra_obs=(
                ("qpos", ("qpos_slice", 2, 7)),
                ("qvel", ("qvel_slice", 0, 6)),
            )),
        ]
        upper = abd + ("right_shoulder1", "right_shoulder2", "right_elbow",
                       "left_shoulder1", "left_shoulder2", "left_elbow")
        lower = rhip + ("right_knee",) + lhip + ("left_knee",)
        parts = {
            None: [tuple(n for n, *_ in spec)],
            "9|8": [upper, lower],
        }[partitioning]
    elif label == "Pusher":
        # obsk.py:677-756
        names = ["r_shoulder_pan_joint", "r_shoulder_lift_joint",
                 "r_upper_arm_roll_joint", "r_elbow_flex_joint",
                 "r_forearm_roll_joint", "r_wrist_flex_joint",
                 "r_wrist_roll_joint"]
        nodes = {n: Node(n, i, i, i) for i, n in enumerate(names)}
        edges = [HyperEdge((names[i], names[i + 1])) for i in range(6)]
        globals_ = [
            Node("tips_arm", None, None, None, extra_obs=(
                ("qpos", ("body_xpos", 10)), ("qvel", ("empty",)))),
            Node("object", None, None, None, extra_obs=(
                ("qpos", ("body_xpos", 11)), ("qvel", ("empty",)))),
            Node("goal", None, None, None, extra_obs=(
                ("qpos", ("body_xpos", 12)), ("qvel", ("empty",)))),
        ]
        parts = {
            None: [tuple(names)],
            # Shoulder / Elbow / Wrist (obsk.py Pusher "3p")
            "3p": [tuple(names[:3]), (names[3],), tuple(names[4:])],
        }[partitioning]
    elif label == "CoupledHalfCheetah":
        # obsk.py:842-936. Note the reference gives BOTH cheetahs' joint nodes
        # the same negative ids (-6..-1, i.e. the SECOND cheetah's qpos/qvel);
        # mirrored verbatim for behavior parity. Only the bthigh nodes carry
        # the tendon observations.
        ten = (
            ("ten_J", ("ten_J_cols", 0, (0, 1, 9, 10))),
            ("ten_length", ("ten_length", 0)),
            ("ten_velocity", ("ten_velocity", 0)),
        )
        names0 = ["bthigh0", "bshin0", "bfoot0", "fthigh0", "fshin0", "ffoot0"]
        names1 = ["bthigh1", "bshin1", "bfoot1", "fthigh1", "fshin1", "ffoot1"]
        nodes = {}
        for base, names in ((0, names0), (6, names1)):
            for i, n in enumerate(names):
                nodes[n] = Node(
                    n, -6 + i, -6 + i, base + i,
                    extra_obs=ten if n.startswith("bthigh") else (),
                )
        edges = []
        for names in (names0, names1):
            b, s, f, ft, fs, ff = names
            edges += [
                HyperEdge((f, s)), HyperEdge((s, b)), HyperEdge((b, ft)),
                HyperEdge((ft, fs)), HyperEdge((fs, ff)),
            ]
        globals_ = [
            Node("root_x0", 0, 0, None, extra_obs=(("qpos", ("empty",)),)),
            Node("root_y0", 2, 2, None),
            Node("root_z0", 1, 1, None),
            Node("root_x1", 9, 9, None, extra_obs=(("qpos", ("empty",)),)),
            Node("root_y1", 11, 11, None),
            Node("root_z1", 10, 10, None),
        ]
        parts = {
            None: [tuple(names0 + names1)],
            "1p1": [tuple(names0), tuple(names1)],
        }[partitioning]
    elif label == "ManySegmentSwimmer":
        n_agents, n_per = (int(x) for x in partitioning.split("x"))
        n_segs = n_agents * n_per
        names = [f"rot{i}" for i in range(n_segs)]
        nodes = {n: Node(n, -n_segs + i, -n_segs + i, i)
                 for i, n in enumerate(names)}
        edges = [HyperEdge((names[i], names[i + 1])) for i in range(n_segs - 1)]
        globals_ = []
        parts = [tuple(names[i * n_per:(i + 1) * n_per]) for i in range(n_agents)]
    elif label == "ManySegmentAnt":
        # ids/bodies mirror obsk.py ManySegmentAnt (incl. its positive-index
        # quirk for early segments); bodies: 7 per segment
        n_agents, n_per = (int(x) for x in partitioning.split("x"))
        n_segs = n_agents * n_per
        names = []
        nodes = {}
        edges = []
        prev_hips = None
        for seg in range(n_segs):
            hip1 = f"hip1_{seg}"; ankle1 = f"ankle1_{seg}"
            hip2 = f"hip2_{seg}"; ankle2 = f"ankle2_{seg}"
            torso = 1 + seg * 7
            frl, aux1, ank1 = 2 + seg * 7, 3 + seg * 7, 4 + seg * 7
            bl, aux2, ank2 = 5 + seg * 7, 6 + seg * 7, 7 + seg * 7
            off = -4 * (n_segs - 1 - seg)
            nodes[hip1] = Node(hip1, -4 - off, -4 - off, 4 * seg + 0,
                               bodies=(torso, frl), body_clip=True)
            nodes[ankle1] = Node(ankle1, -3 - off, -3 - off, 4 * seg + 1,
                                 bodies=(frl, aux1, ank1), body_clip=True)
            nodes[hip2] = Node(hip2, -2 - off, -2 - off, 4 * seg + 2,
                               bodies=(torso, bl), body_clip=True)
            nodes[ankle2] = Node(ankle2, -1 - off, -1 - off, 4 * seg + 3,
                                 bodies=(bl, aux2, ank2), body_clip=True)
            names += [hip1, ankle1, hip2, ankle2]
            edges += [HyperEdge((ankle1, hip1)), HyperEdge((ankle2, hip2)),
                      HyperEdge((hip1, hip2))]
            if prev_hips is not None:
                edges.append(HyperEdge(prev_hips + (hip1, hip2)))
            prev_hips = (hip1, hip2)
        globals_ = [
            Node("root", None, None, None, extra_obs=(
                ("qpos", ("qpos_slice", 2, 7)),
                ("qvel", ("qvel_slice", 0, 6)),
            )),
        ]
        parts = [tuple(names[i * 4 * n_per:(i + 1) * 4 * n_per])
                 for i in range(n_agents)]
    else:
        raise NotImplementedError(
            f"Scenario {label!r} factorization not yet implemented in this "
            "build (available: HalfCheetah, Ant, Hopper, Walker2d, Swimmer, "
            "Reacher, Humanoid, HumanoidStandup, Pusher, ManySegment*)."
        )

    partitions = [tuple(nodes[n] for n in p) for p in parts]
    return partitions, edges, globals_, nodes


def local_categories_for(scenario: str, agent_obsk: int):
    """Default per-depth observation categories (mujoco_multi.py:581-615)."""
    if scenario in ("Ant", "ManySegmentAnt"):
        k_cat = [["qpos", "qvel", "cfrc_ext"], ["qpos"]]
    elif scenario in ("Humanoid", "HumanoidStandup"):
        k_cat = [["qpos", "qvel", "cinert", "cvel", "qfrc_actuator", "cfrc_ext"],
                 ["qpos"]]
    elif scenario == "CoupledHalfCheetah":
        k_cat = [["qpos", "qvel", "ten_J", "ten_length", "ten_velocity"], ["qpos"]]
    elif scenario == "Reacher":
        k_cat = [["qpos", "qvel", "fingertip_dist"], ["qpos"]]
    else:
        k_cat = [["qpos", "qvel"], ["qpos"]]
    return [k_cat[k if k < len(k_cat) else -1] for k in range(agent_obsk + 1)]
