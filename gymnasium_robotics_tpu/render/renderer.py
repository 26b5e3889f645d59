"""Host-side software renderer: ``rgb_array`` frames from the compiled model
plus a Data snapshot — no GL, no external engine.

The reference gets rendering from Gymnasium's MujocoRenderer
(gymnasium_robotics/envs/robot_env.py:282-290, metadata render_modes at e.g.
envs/adroit_hand/adroit_door.py:181-188). Here the physics state is an
explicit pytree, so rendering is a pure host function of
(Model, geom_xpos, geom_xmat): geoms are tessellated once per model, then
each frame is a numpy z-buffer rasterization with flat Lambertian shading.
Built for docs GIFs and qualitative debugging, not real-time use.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

from gymnasium_robotics_tpu.physics import types as T


@dataclasses.dataclass
class CameraConfig:
    """MuJoCo free-camera parameters (azimuth/elevation in degrees)."""

    lookat: tuple = (0.0, 0.0, 0.0)
    distance: float = 2.5
    azimuth: float = 135.0
    elevation: float = -25.0
    fovy: float = 45.0


# default palette for assets compiled before geom_rgba existed
_PALETTE = np.array(
    [
        [0.55, 0.62, 0.70, 1.0],
        [0.76, 0.48, 0.33, 1.0],
        [0.42, 0.62, 0.45, 1.0],
        [0.62, 0.47, 0.64, 1.0],
        [0.72, 0.66, 0.41, 1.0],
        [0.45, 0.57, 0.68, 1.0],
    ]
)


# ---------------------------------------------------------------------------
# Tessellation (unit meshes, scaled per geom size at build time)
# ---------------------------------------------------------------------------


def _uv_sphere(radius, stacks=10, slices=14):
    verts, faces = [], []
    for i in range(stacks + 1):
        phi = np.pi * i / stacks
        for j in range(slices):
            th = 2 * np.pi * j / slices
            verts.append(
                [
                    radius * np.sin(phi) * np.cos(th),
                    radius * np.sin(phi) * np.sin(th),
                    radius * np.cos(phi),
                ]
            )
    for i in range(stacks):
        for j in range(slices):
            a = i * slices + j
            b = i * slices + (j + 1) % slices
            c = (i + 1) * slices + j
            d = (i + 1) * slices + (j + 1) % slices
            faces += [[a, b, c], [b, d, c]]
    return np.array(verts), np.array(faces)


def _box(sx, sy, sz):
    s = np.array([sx, sy, sz])
    corners = (
        np.array(
            [[i, j, k] for i in (-1, 1) for j in (-1, 1) for k in (-1, 1)],
            dtype=float,
        )
        * s
    )
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    faces = []
    for (a, b, c, d) in quads:
        faces += [[a, b, c], [a, c, d]]
    return corners, np.array(faces)


def _cylinder(radius, half, slices=16, capped=True):
    verts, faces = [], []
    for z in (-half, half):
        for j in range(slices):
            th = 2 * np.pi * j / slices
            verts.append([radius * np.cos(th), radius * np.sin(th), z])
    for j in range(slices):
        a, b = j, (j + 1) % slices
        c, d = slices + j, slices + (j + 1) % slices
        faces += [[a, b, c], [b, d, c]]
    if capped:
        lo = len(verts)
        verts += [[0, 0, -half], [0, 0, half]]
        for j in range(slices):
            a, b = j, (j + 1) % slices
            faces += [[b, a, lo]]
            faces += [[slices + a, slices + b, lo + 1]]
    return np.array(verts), np.array(faces)


def _capsule(radius, half, stacks=6, slices=14):
    sv, sf = _uv_sphere(radius, 2 * stacks, slices)
    sv = sv + np.where(sv[:, 2:3] >= 0, [0, 0, half], [0, 0, -half])
    cv, cf = _cylinder(radius, half, slices, capped=False)
    return np.concatenate([sv, cv]), np.concatenate([sf, cf + len(sv)])


def _plane(size=4.0):
    # checkerboard of quads for visual depth
    n = 8
    xs = np.linspace(-size, size, n + 1)
    verts, faces, shade = [], [], []
    for i in range(n):
        for j in range(n):
            base = len(verts)
            verts += [
                [xs[i], xs[j], 0], [xs[i + 1], xs[j], 0],
                [xs[i + 1], xs[j + 1], 0], [xs[i], xs[j + 1], 0],
            ]
            faces += [
                [base, base + 1, base + 2], [base, base + 2, base + 3]
            ]
            shade += [0.92 if (i + j) % 2 == 0 else 0.78] * 2
    return np.array(verts, float), np.array(faces), np.array(shade)


@functools.lru_cache(maxsize=64)
def _model_meshes(meta: T.Meta, sizes_key):
    """Per-geom (verts, faces, shade) in geom frame; cached per model."""
    sizes = np.array(sizes_key).reshape(meta.ngeom, 3)
    out = []
    for g in range(meta.ngeom):
        t = meta.geom_type[g]
        s = sizes[g]
        shade = None
        if t == T.PLANE:
            v, f, shade = _plane(4.0 if s[0] == 0 else max(s[0], s[1]))
        elif t == T.SPHERE:
            v, f = _uv_sphere(s[0])
        elif t == T.CAPSULE:
            v, f = _capsule(s[0], s[1])
        elif t == T.CYLINDER:
            v, f = _cylinder(s[0], s[1])
        elif t == T.ELLIPSOID:
            v, f = _uv_sphere(1.0)
            v = v * s[None, :]
        else:  # BOX and mesh-approximated-as-box
            v, f = _box(max(s[0], 1e-4), max(s[1], 1e-4), max(s[2], 1e-4))
        out.append((v, f, shade))
    return out


# ---------------------------------------------------------------------------
# Rasterization
# ---------------------------------------------------------------------------


def _camera_matrix(cfg: CameraConfig):
    az = np.deg2rad(cfg.azimuth)
    el = np.deg2rad(cfg.elevation)
    lookat = np.array(cfg.lookat, float)
    # MuJoCo free camera: eye at spherical offset from lookat
    fwd = np.array(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)]
    )
    eye = lookat - cfg.distance * fwd
    z = (lookat - eye)
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(z, up)
    if np.linalg.norm(x) < 1e-6:
        x = np.array([1.0, 0.0, 0.0])
    x = x / np.linalg.norm(x)
    y = np.cross(x, z)
    R = np.stack([x, -y, z])  # rows: right, down, forward
    return R, eye


def render_frame(
    model: T.Model,
    geom_xpos: np.ndarray,
    geom_xmat: np.ndarray,
    width: int = 480,
    height: int = 480,
    camera: Optional[CameraConfig] = None,
    depth: bool = False,
) -> np.ndarray:
    """Rasterize one frame -> uint8 (height, width, 3), or, with
    depth=True, the z-buffer as float32 (height, width) normalized like an
    OpenGL depth buffer ((1 - znear/z) / (1 - znear/zfar), znear/zfar =
    0.01x/50x the scene extent — the convention Gymnasium's MujocoRenderer
    'depth_array' mode reads back, reference robot_env.py:282-290)."""
    meta = model.meta
    geom_xpos = np.asarray(geom_xpos, float)
    geom_xmat = np.asarray(geom_xmat, float)
    sizes = np.asarray(model.geom_size, float)
    if camera is None:
        # auto-frame the non-plane geoms
        mask = np.array([t != T.PLANE for t in meta.geom_type])
        pts = geom_xpos[mask] if mask.any() else geom_xpos
        center = pts.mean(axis=0)
        radius = max(float(np.linalg.norm(pts - center, axis=1).max()), 0.3)
        camera = CameraConfig(lookat=tuple(center), distance=3.0 * radius)

    rgba = model.geom_rgba
    if rgba is None:
        body = np.array(meta.geom_bodyid)
        rgba = _PALETTE[body % len(_PALETTE)]
    else:
        rgba = np.asarray(rgba, float)

    R, eye = _camera_matrix(camera)
    f = 0.5 * height / np.tan(0.5 * np.deg2rad(camera.fovy))

    # gather world-space triangles
    meshes = _model_meshes(meta, tuple(np.round(sizes, 9).ravel().tolist()))
    tri_v, tri_c = [], []
    for g in range(meta.ngeom):
        if rgba[g, 3] < 0.05:
            continue  # invisible
        v, fcs, shade = meshes[g]
        world = geom_xpos[g] + v @ geom_xmat[g].T
        tv = world[fcs]  # (F, 3, 3)
        base = np.array(rgba[g, :3])
        col = np.tile(base, (len(fcs), 1))
        if shade is not None:
            col = col * shade[:, None]
        tri_v.append(tv)
        tri_c.append(col)
    if not tri_v:
        if depth:
            return np.ones((height, width), np.float32)
        return np.zeros((height, width, 3), np.uint8)
    tv = np.concatenate(tri_v)  # (F, 3, 3)
    tc = np.concatenate(tri_c)  # (F, 3)

    # camera space + projection
    cam = (tv - eye) @ R.T  # (F, 3, 3) with z = depth
    zc = cam[..., 2]
    valid = np.all(zc > 1e-3, axis=1)
    cam, tc = cam[valid], tc[valid]
    zc = zc[valid]
    sx = cam[..., 0] / cam[..., 2] * f + width / 2
    sy = cam[..., 1] / cam[..., 2] * f + height / 2

    # flat shading from world normal
    n = np.cross(tv[valid][:, 1] - tv[valid][:, 0], tv[valid][:, 2] - tv[valid][:, 0])
    nn = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    light = np.array([0.35, 0.3, 0.89])
    lam = 0.45 + 0.55 * np.abs(nn @ light)
    shade_col = np.clip(tc * lam[:, None], 0, 1)

    img = np.full((height, width, 3), 0.96, float)
    img[:, :, 2] = 0.99  # pale sky
    zbuf = np.full((height, width), np.inf)

    order = np.argsort(-zc.mean(axis=1))  # far-to-near helps early skips
    x0 = np.clip(np.floor(sx.min(axis=1)), 0, width - 1).astype(int)
    x1 = np.clip(np.ceil(sx.max(axis=1)), 0, width - 1).astype(int)
    y0 = np.clip(np.floor(sy.min(axis=1)), 0, height - 1).astype(int)
    y1 = np.clip(np.ceil(sy.max(axis=1)), 0, height - 1).astype(int)
    for t in order:
        if x1[t] <= x0[t] or y1[t] <= y0[t]:
            continue
        xs = np.arange(x0[t], x1[t] + 1)
        ys = np.arange(y0[t], y1[t] + 1)
        px, py = np.meshgrid(xs, ys)
        ax, ay = sx[t, 0], sy[t, 0]
        bx, by = sx[t, 1], sy[t, 1]
        cx, cy = sx[t, 2], sy[t, 2]
        den = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        if abs(den) < 1e-9:
            continue
        w0 = ((by - cy) * (px - cx) + (cx - bx) * (py - cy)) / den
        w1 = ((cy - ay) * (px - cx) + (ax - cx) * (py - cy)) / den
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        # perspective-correct depth via 1/z interpolation
        iz = w0 / zc[t, 0] + w1 / zc[t, 1] + w2 / zc[t, 2]
        depth_t = 1.0 / np.maximum(iz, 1e-12)
        sub = zbuf[y0[t]:y1[t] + 1, x0[t]:x1[t] + 1]
        win = inside & (depth_t < sub)
        if not win.any():
            continue
        sub[win] = depth_t[win]
        img[y0[t]:y1[t] + 1, x0[t]:x1[t] + 1][win] = shade_col[t]
    if depth:
        # OpenGL-style znear/zfar normalization. MuJoCo derives these from
        # model.stat.extent; we use camera.distance as the extent proxy, so
        # values are monotonically consistent with the reference renderer
        # but not numerically identical.
        extent = max(float(camera.distance), 1e-3)
        znear, zfar = 0.01 * extent, 50.0 * extent
        z = np.clip(zbuf, znear, zfar)
        buf = (1.0 - znear / z) / (1.0 - znear / zfar)
        buf[~np.isfinite(zbuf)] = 1.0
        return buf.astype(np.float32)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


# per-family camera overrides (mirroring the reference DEFAULT_CAMERA_CONFIGs
# where they exist, e.g. maze_v4 / ant_maze_v5 / adroit)
FAMILY_CAMERAS = {
    # reference fetch_env.py:8-13
    "fetch": CameraConfig(lookat=(1.3, 0.75, 0.55), distance=2.5,
                          azimuth=132.0, elevation=-14.0),
    # reference shadow_dexterous_hand/hand_env.py:7-12
    "hand": CameraConfig(lookat=(1.0, 0.96, 0.14), distance=0.5,
                         azimuth=55.0, elevation=-25.0),
    # reference adroit_door.py:23-26 (per-task overrides live on the env
    # classes as .camera_config)
    "adroit": CameraConfig(lookat=(0.0, -0.2, 0.2), distance=1.5,
                           azimuth=90.0, elevation=-30.0),
    # reference franka_env.py:33-38
    "kitchen": CameraConfig(lookat=(-0.2, 0.5, 2.0), distance=2.2,
                            azimuth=70.0, elevation=-35.0),
}

# per-task Adroit viewpoints (adroit_hammer.py:24-27, adroit_pen.py:24-27,
# adroit_relocate.py:23-26)
ADROIT_CAMERAS = {
    "door": CameraConfig(lookat=(0.0, -0.2, 0.2), distance=1.5,
                         azimuth=90.0, elevation=-30.0),
    "hammer": CameraConfig(lookat=(0.0, -0.2, 0.2), distance=2.0,
                           azimuth=45.0, elevation=-30.0),
    "pen": CameraConfig(lookat=(0.0, -0.2, 0.2), distance=1.0,
                        azimuth=-45.0, elevation=-30.0),
    "relocate": CameraConfig(lookat=(0.0, -0.2, 0.2), distance=1.5,
                             azimuth=90.0, elevation=-30.0),
}
