"""Per-lane hull tables in the pruned (pair-topk) narrowphase.

take_hull_sel gathers a possibly DIFFERENT hull per env lane for the same
compact slot (each lane ranks its own top-K pairs). The hull helpers must
keep the lane axis of those tables: a round-4 bug collapsed the vertex /
face-normal tables to lane 0 (`hv[..., 0]`), silently giving every lane
lane-0's hull GEOMETRY (with per-lane poses) on the TPU production path.
These tests pin the fixed behavior with synthetic two-lane hull tables
where lane 1's hull is a half-scale copy of lane 0's.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu.physics import collision_vec as CV

_CORNERS = np.array(
    [[i, j, k] for i in (-1, 1) for j in (-1, 1) for k in (-1, 1)],
    np.float32,
)


def _two_lane_cube_hulls(scale1=1.0, scale2=0.5):
    """Vertex (V,3,K,2) and face (F,3,K,2)/(F,K,2) tables: lane 0 a cube of
    half-extent scale1, lane 1 of scale2."""
    V, K = 8, 1
    hv = np.zeros((V, 3, K, 2), np.float32)
    hv[..., 0, 0] = _CORNERS * scale1
    hv[..., 0, 1] = _CORNERS * scale2
    # axis-aligned cube halfspaces: n.x + d <= 0 inside, d = -halfextent
    fn = np.zeros((6, 3, K, 2), np.float32)
    fd = np.zeros((6, K, 2), np.float32)
    for f, (ax, sgn) in enumerate([(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]):
        fn[f, ax] = sgn
    fd[:, :, 0] = -scale1
    fd[:, :, 1] = -scale2
    return jnp.asarray(hv), jnp.asarray(fn), jnp.asarray(fd)


def test_hull_world_verts_keep_lane_axis():
    hv, _, _ = _two_lane_cube_hulls()
    p = jnp.zeros((3, 1, 2))
    R = jnp.broadcast_to(jnp.eye(3)[:, :, None, None], (3, 3, 1, 2))
    w = np.asarray(CV._hull_world_verts(p, R, hv))   # (V,3,K,B)
    assert np.allclose(w[:, :, 0, 0], _CORNERS), w[:, :, 0, 0]
    # lane 1 must be exactly half of lane 0, not a copy of it
    assert np.allclose(w[..., 1], 0.5 * w[..., 0]), (w[..., 0], w[..., 1])
    assert not np.allclose(w[..., 1], w[..., 0])


def test_points_hull_depth_max_keep_lane_axis():
    _, fn, fd = _two_lane_cube_hulls()
    # probe point at the origin: depth = -halfextent per lane
    xl = jnp.zeros((1, 3, 1, 2))
    best = np.asarray(CV._points_hull_depth_max(xl, fn, fd))
    assert np.allclose(best[0, 0], [-1.0, -0.5]), best


def test_hull_hull_distinguishes_lanes():
    """Sphere-vs-hull group fn: the same sphere pose against lane-dependent
    hulls must give lane-dependent distances."""
    hv, fn, fd = _two_lane_cube_hulls()
    p1 = jnp.zeros((3, 1, 2)).at[2].set(3.0)        # sphere 3 up
    R = jnp.broadcast_to(jnp.eye(3)[:, :, None, None], (3, 3, 1, 2))
    s1 = jnp.full((3, 1, 1), 0.25)                  # radius .25
    p2 = jnp.zeros((3, 1, 2))
    f = CV._make_sphere_hull((fn, fd))
    dist, pos, n = f(p1, R, s1, p2, R, s1)
    d = np.asarray(dist)[0, 0]                       # (B,)
    # gap = 3 - halfextent - r
    assert np.allclose(d, [3 - 1 - 0.25, 3 - 0.5 - 0.25], atol=1e-5), d
