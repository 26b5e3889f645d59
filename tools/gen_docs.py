"""Docs generation — the analogue of the reference's docs/_scripts/gen_mds.py
(env pages from docstrings as the single source of truth,
reference gen_mds.py:20-40), extended: spaces/shape tables are generated from
the LIVE constructed env (spaces can't drift from docs), one page per env
class plus a family index.

Usage: PYTHONPATH=. JAX_PLATFORMS=cpu python tools/gen_docs.py -> docs/envs/
"""

import inspect
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from gymnasium_robotics_tpu import registry  # noqa: E402

FAMILY_OF_PREFIX = [
    ("Fetch", "fetch"),
    ("HandReach", "shadow_dexterous_hand"),
    ("HandManipulate", "shadow_dexterous_hand"),
    ("PointMaze", "maze"),
    ("AntMaze", "maze"),
    ("AdroitHand", "adroit_hand"),
    ("FrankaKitchen", "franka_kitchen"),
]


def family_of(env_id):
    for prefix, fam in FAMILY_OF_PREFIX:
        if env_id.startswith(prefix):
            return fam
    return "locomotion"


def _space_rows(space, prefix=""):
    import gymnasium.spaces as S

    rows = []
    if isinstance(space, S.Dict):
        for k, sub in space.spaces.items():
            rows += _space_rows(sub, f"{prefix}{k}/" if prefix else f"{k}/")
    else:
        lo = np.asarray(space.low).ravel()
        hi = np.asarray(space.high).ravel()
        lo_s = "-inf" if np.isinf(lo).all() else f"{lo.min():g}"
        hi_s = "inf" if np.isinf(hi).all() else f"{hi.max():g}"
        rows.append(
            f"| `{prefix.rstrip('/') or 'value'}` | {tuple(space.shape)} | "
            f"{np.dtype(space.dtype).name} | [{lo_s}, {hi_s}] |"
        )
    return rows


def _page_for_class(cls_name, env, ids_with_specs, gif_name):
    lines = [f"# {cls_name}", ""]
    gif_path = os.path.join("docs", "_gifs", gif_name + ".gif")
    if os.path.exists(gif_path):
        lines += [f"![{cls_name}](../_gifs/{gif_name}.gif)", ""]
    # the class's OWN docstring; else the family module docstring (richer
    # than the inherited GoalEnv base doc)
    cls = type(env)
    doc = cls.__dict__.get("__doc__") or ""
    if not doc:
        for base in cls.__mro__:
            if base.__module__.startswith("gymnasium_robotics_tpu.envs"):
                doc = base.__dict__.get("__doc__") or doc
                if doc:
                    break
        if not doc:
            mod = inspect.getmodule(cls)
            doc = (mod.__doc__ or "") if mod else ""
    if doc:
        lines += [inspect.cleandoc(doc), ""]

    lines += ["## Action space", "",
              "| field | shape | dtype | range |", "|---|---|---|---|"]
    lines += _space_rows(env.action_space)
    lines += ["", "## Observation space", "",
              "| field | shape | dtype | range |", "|---|---|---|---|"]
    lines += _space_rows(env.observation_space)

    dt = getattr(env, "dt", None)
    meta = getattr(env, "metadata", {})
    lines += ["", "## Simulation", ""]
    if dt:
        lines.append(f"- control timestep: {float(dt):g} s "
                     f"({1.0 / float(dt):g} Hz)")
    if meta.get("render_fps"):
        lines.append(f"- render_fps: {meta['render_fps']}")
    lines.append(f"- render modes: {meta.get('render_modes', [])}")

    lines += ["", "## Registered versions", "",
              "| id | max_episode_steps | kwargs |", "|---|---|---|"]
    for env_id, s in ids_with_specs:
        kw = {k: v for k, v in s.kwargs.items()
              if not isinstance(v, (list, tuple)) or len(str(v)) < 60}
        lines.append(f"| `{env_id}` | {s.max_episode_steps} | `{kw}` |")
    return "\n".join(lines) + "\n"


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_root = os.path.join(root, "docs", "envs")
    os.makedirs(out_root, exist_ok=True)

    # group ids by entry-point class
    by_class = defaultdict(list)
    for env_id in registry.ids():
        s = registry.spec(env_id)
        name = getattr(s.entry_point, "__name__", str(s.entry_point))
        by_class[(family_of(env_id), name)].append((env_id, s))

    family_pages = defaultdict(list)
    for (fam, cls_name), ids in sorted(by_class.items()):
        env_id0 = ids[0][0]
        try:
            env = registry.make(env_id0)
        except Exception as e:
            print(f"skip {cls_name}: {e}")
            continue
        fam_dir = os.path.join(out_root, fam)
        os.makedirs(fam_dir, exist_ok=True)
        gif_name = env_id0.split("-")[0]
        page = _page_for_class(cls_name, env, ids, gif_name)
        slug = cls_name.replace("Env", "").lower() or cls_name.lower()
        path = os.path.join(fam_dir, f"{slug}.md")
        with open(path, "w") as f:
            f.write(page)
        family_pages[fam].append((slug, cls_name, len(ids)))
        print(f"docs/envs/{fam}/{slug}.md ({len(ids)} ids)")

    # family indexes
    for fam, pages in sorted(family_pages.items()):
        lines = [f"# {fam}", ""]
        for slug, cls_name, n in pages:
            lines.append(f"- [{cls_name}]({slug}.md) — {n} registered ids")
        with open(os.path.join(out_root, fam, "index.md"), "w") as f:
            f.write("\n".join(lines) + "\n")

    # MaMuJoCo pages (PettingZoo scenarios live outside the registry)
    _mamujoco_pages(out_root)


_MAMUJOCO_SCENARIOS = {
    # scenario -> supported factorizations (obsk.get_parts_and_edges)
    "HalfCheetah": ["2x3", "6x1"],
    "Ant": ["2x4", "2x4d", "4x2"],
    "Hopper": ["3x1"],
    "Humanoid": ["9|8"],
    "HumanoidStandup": ["9|8"],
    "Reacher": ["2x1"],
    "Swimmer": ["2x1"],
    "Walker2d": ["2x3"],
    "Pusher": ["3p"],
    "CoupledHalfCheetah": ["1p1"],
    "ManySegmentSwimmer": ["NxM (e.g. 5x4)"],
    "ManySegmentAnt": ["NxM (e.g. 2x3)"],
}


def _mamujoco_pages(out_root):
    fam_dir = os.path.join(out_root, "MaMuJoCo")
    os.makedirs(fam_dir, exist_ok=True)
    index = ["# MaMuJoCo (multi-agent factorizations)", ""]
    for scenario in sorted(_MAMUJOCO_SCENARIOS):
        parts = _MAMUJOCO_SCENARIOS[scenario]
        lines = [f"# MaMuJoCo {scenario}", "", "Factorizations:", ""]
        for p in parts:
            lines.append(f"- `{p}`")
        lines += [
            "",
            "Create with "
            f"`mamujoco_v1.parallel_env('{scenario}', '<partition>')`.",
        ]
        slug = f"ma_{scenario.lower()}"
        with open(os.path.join(fam_dir, f"{slug}.md"), "w") as f:
            f.write("\n".join(lines) + "\n")
        index.append(f"- [{scenario}]({slug}.md)")
        print(f"docs/envs/MaMuJoCo/{slug}.md")
    with open(os.path.join(fam_dir, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")


if __name__ == "__main__":
    main()
