"""Docs generation from env class docstrings + the registry — the analogue of
the reference's docs/_scripts/gen_mds.py:20-40 (env pages from docstrings as
the single source of truth).

Usage: PYTHONPATH=. python tools/gen_docs.py   ->  docs/envs/*.md
"""

import inspect
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from gymnasium_robotics_tpu import registry  # noqa: E402

FAMILIES = [
    ("fetch", "Fetch"), ("hand_reach", "HandReach"),
    ("hand_manipulate", "HandManipulate"), ("point_maze", "PointMaze"),
    ("ant_maze", "AntMaze"), ("adroit", "Adroit"),
    ("kitchen", "FrankaKitchen"), ("locomotion", ""),
]


def family_of(env_id):
    for key, prefix in FAMILIES[:-1]:
        if prefix and env_id.startswith(prefix):
            return key
    return "locomotion"


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "envs")
    os.makedirs(out_dir, exist_ok=True)
    groups = defaultdict(list)
    for env_id in registry.ids():
        groups[family_of(env_id)].append(env_id)

    for fam, ids in sorted(groups.items()):
        lines = [f"# {fam} environments", ""]
        seen_entry = set()
        for env_id in ids:
            s = registry.spec(env_id)
            ep = s.entry_point
            name = getattr(ep, "__name__", str(ep))
            if name not in seen_entry:
                seen_entry.add(name)
                doc = inspect.getdoc(ep) or ""
                lines += [f"## {name}", "", doc, ""]
        lines += ["## Registered IDs", ""]
        for env_id in ids:
            s = registry.spec(env_id)
            kw = {k: v for k, v in s.kwargs.items()
                  if not isinstance(v, (list, tuple)) or len(str(v)) < 40}
            lines.append(
                f"- `{env_id}` (max_episode_steps={s.max_episode_steps}, "
                f"kwargs={kw})"
            )
        with open(os.path.join(out_dir, f"{fam}.md"), "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"docs/envs/{fam}.md: {len(ids)} ids")


if __name__ == "__main__":
    main()
