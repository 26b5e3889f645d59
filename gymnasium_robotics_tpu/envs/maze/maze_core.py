"""Maze compilation: maze_map (list-of-lists) -> compiled physics Model plus a
static MazeSpec (wall layout, goal/reset candidate cells).

The reference injects wall geoms into the agent MJCF with ElementTree and
writes a temp XML (gymnasium_robotics/envs/maze/maze_v4.py:149-244). Here maze
compilation is a host-side model-build step: walls become static geometry in
the compiled Model; candidate goal/reset cells become fixed arrays baked into
the env (goal sampling is then pure on-device categorical sampling — no Python
rejection loops at run time).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple, Union

import numpy as np

from gymnasium_robotics_tpu.envs.maze import maps


@dataclasses.dataclass(frozen=True)
class MazeSpec:
    maze_map: Tuple[Tuple[Union[int, str], ...], ...]
    size_scaling: float
    height: float
    map_length: int
    map_width: int
    x_center: float
    y_center: float
    goal_locations: Tuple[Tuple[float, float], ...]
    reset_locations: Tuple[Tuple[float, float], ...]

    def cell_rowcol_to_xy(self, rowcol):
        i, j = rowcol
        return np.array(
            [
                (j + 0.5) * self.size_scaling - self.x_center,
                self.y_center - (i + 0.5) * self.size_scaling,
            ]
        )

    def cell_xy_to_rowcol(self, xy):
        return np.array(
            [
                np.floor((self.y_center - xy[1]) / self.size_scaling),
                np.floor((xy[0] + self.x_center) / self.size_scaling),
            ]
        )


def analyze_maze(maze_map: List[List], size_scaling: float, height: float) -> MazeSpec:
    """Cell bookkeeping mirroring the reference semantics (maze_v4.py:172-235):
    r/g/c cells feed the candidate sets; with none present, empty cells do."""
    length, width = len(maze_map), len(maze_map[0])
    x_center = width / 2 * size_scaling
    y_center = length / 2 * size_scaling
    goals, resets, combined, empty = [], [], [], []
    for i in range(length):
        for j in range(width):
            struct = maze_map[i][j]
            x = (j + 0.5) * size_scaling - x_center
            y = y_center - (i + 0.5) * size_scaling
            if struct == 1:
                continue
            elif struct == maps.RESET:
                resets.append((x, y))
            elif struct == maps.GOAL:
                goals.append((x, y))
            elif struct == maps.COMBINED:
                combined.append((x, y))
            else:
                empty.append((x, y))
    if not goals and not resets and not combined:
        combined = empty
    elif not resets and not combined:
        resets = empty
    elif not goals and not combined:
        goals = empty
    goals = goals + combined
    resets = resets + combined
    return MazeSpec(
        maze_map=tuple(tuple(r) for r in maze_map),
        size_scaling=size_scaling,
        height=height,
        map_length=length,
        map_width=width,
        x_center=x_center,
        y_center=y_center,
        goal_locations=tuple(goals),
        reset_locations=tuple(resets),
    )


def wall_geoms_xml(maze_map, size_scaling, height) -> str:
    spec = analyze_maze(maze_map, size_scaling, height)
    out = []
    for i in range(spec.map_length):
        for j in range(spec.map_width):
            if maze_map[i][j] == 1:
                x = (j + 0.5) * size_scaling - spec.x_center
                y = spec.y_center - (i + 0.5) * size_scaling
                z = height / 2 * size_scaling
                s = 0.5 * size_scaling
                out.append(
                    f'<geom name="block_{i}_{j}" pos="{x} {y} {z}" '
                    f'size="{s} {s} {height / 2 * size_scaling}" type="box" '
                    f'contype="1" conaffinity="1" rgba="0.7 0.5 0.3 1"/>'
                )
    return "\n      ".join(out)


# Point agent scene: same dynamics constants as the reference's point.xml
# (2 slide joints, force actuators gear=100, qvel-damped ball, zero gravity,
# condim=1 ball-wall contacts) — re-authored as a generator.
POINT_MAZE_XML = """
<mujoco>
  <compiler inertiafromgeom="true" angle="radian" coordinate="local"/>
  <option timestep="0.01" gravity="0 0 0" iterations="20" integrator="Euler"/>
  <default>
    <joint damping="1" limited="false"/>
    <geom friction=".5 .1 .1" density="1000" margin="0.002" condim="1" contype="2" conaffinity="1"/>
  </default>
  <worldbody>
    <geom name="ground" size="40 40 0.25" pos="0 0 -0.1" type="plane" contype="1" conaffinity="0"/>
    {walls}
    <site name="target" pos="0 0 {site_z}" size="{site_size}" rgba="1 0 0 0.7" type="sphere"/>
    <body name="particle" pos="0 0 0">
      <geom name="particle_geom" type="sphere" size="0.1" contype="1"/>
      <site name="particle_site" pos="0 0 0" size="0.2"/>
      <joint name="ball_x" type="slide" pos="0 0 0" axis="1 0 0"/>
      <joint name="ball_y" type="slide" pos="0 0 0" axis="0 1 0"/>
    </body>
  </worldbody>
  <actuator>
    <motor name="motor_x" joint="ball_x" ctrlrange="-1.0 1.0" ctrllimited="true" gear="100"/>
    <motor name="motor_y" joint="ball_y" ctrlrange="-1.0 1.0" ctrllimited="true" gear="100"/>
  </actuator>
</mujoco>
"""


def maze_asset_key(prefix: str, maze_map, size_scaling, height) -> str:
    import hashlib
    import json

    h = hashlib.sha1(
        json.dumps([maze_map, size_scaling, height]).encode()
    ).hexdigest()[:12]
    return f"{prefix}/{h}"


def build_point_maze_model(maze_map, size_scaling=1.0, height=0.4, dtype=np.float32):
    """Compiled maze model: loads the packaged artifact when present (all
    registry maps ship precompiled); falls back to compiling the generated
    MJCF via the mujoco frontend for custom maze_map kwargs."""
    from gymnasium_robotics_tpu.mjcf import serialize

    spec = analyze_maze(maze_map, size_scaling, height)
    key = maze_asset_key("point_maze", maze_map, size_scaling, height)
    import os

    if os.path.exists(serialize.asset_path(key)):
        model, _ = serialize.load_model(serialize.asset_path(key), dtype=dtype)
        return model, spec

    from gymnasium_robotics_tpu.mjcf.import_mjcf import import_xml_string

    xml = POINT_MAZE_XML.format(
        walls=wall_geoms_xml(maze_map, size_scaling, height),
        site_z=height / 2 * size_scaling,
        site_size=0.2 * size_scaling,
    )
    model = import_xml_string(xml, dtype=dtype)
    serialize.save_model(model, serialize.asset_path(key))
    return model, spec
