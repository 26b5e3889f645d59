"""Named-access and control helpers over (Model, Data) — the public
equivalent of the reference's utils/mujoco_utils.py:23-469, re-designed as
pure jnp functions over the batched physics pytrees (every function is
trace-safe and vmap-compatible; name lookups happen host-side at build time
through ``ModelNames`` / ``Model.name2id``).

Reference mapping:
- robot_get_obs              <- mujoco_utils.py:23-31
- ctrl_set_action            <- mujoco_utils.py:34-48
- mocap_set_action           <- mujoco_utils.py:51-71
- reset_mocap2body_xpos      <- mujoco_utils.py:83-107
- get/set_joint_qpos/qvel    <- mujoco_utils.py:130-219 (free 7/6, ball 4/3,
                                hinge/slide 1 widths)
- get_site_xpos/xmat/xvelp/xvelr <- mujoco_utils.py:222-261
- ModelNames                 <- MujocoModelNames (mujoco_utils.py:327-469)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gymnasium_robotics_tpu.physics import types as T

_FREE, _BALL = 0, 1


def _joint_widths(jnt_type: int) -> Tuple[int, int]:
    """(qpos width, qvel width) per joint type (mujoco_utils.py:139-155)."""
    if jnt_type == _FREE:
        return 7, 6
    if jnt_type == _BALL:
        return 4, 3
    return 1, 1


class ModelNames:
    """Name->id dicts per object kind (MujocoModelNames,
    mujoco_utils.py:327-469)."""

    def __init__(self, m: T.Model):
        mt = m.meta
        kinds = {
            "body": mt.body_names,
            "joint": mt.joint_names,
            "geom": getattr(mt, "geom_names", ()),
            "site": getattr(mt, "site_names", ()),
            "actuator": getattr(mt, "actuator_names", ()),
            "sensor": getattr(mt, "sensor_names", ()),
        }
        for kind, names in kinds.items():
            n2i = {n: i for i, n in enumerate(names) if n}
            setattr(self, f"{kind}_name2id", n2i)
            setattr(self, f"{kind}_id2name", {i: n for n, i in n2i.items()})
            setattr(self, f"{kind}_names", tuple(n for n in names if n))


def joint_qpos_slice(m: T.Model, name: str) -> Tuple[int, int]:
    j = m.name2id("joint", name)
    adr = m.meta.jnt_qposadr[j]
    return adr, adr + _joint_widths(m.meta.jnt_type[j])[0]


def joint_qvel_slice(m: T.Model, name: str) -> Tuple[int, int]:
    j = m.name2id("joint", name)
    adr = m.meta.jnt_dofadr[j]
    return adr, adr + _joint_widths(m.meta.jnt_type[j])[1]


def get_joint_qpos(m: T.Model, d: T.Data, name: str) -> jnp.ndarray:
    lo, hi = joint_qpos_slice(m, name)
    return d.qpos[lo:hi]


def get_joint_qvel(m: T.Model, d: T.Data, name: str) -> jnp.ndarray:
    lo, hi = joint_qvel_slice(m, name)
    return d.qvel[lo:hi]


def set_joint_qpos(m: T.Model, d: T.Data, name: str, value) -> T.Data:
    lo, hi = joint_qpos_slice(m, name)
    value = jnp.asarray(value, d.qpos.dtype).reshape(hi - lo)
    return dataclasses.replace(d, qpos=d.qpos.at[lo:hi].set(value))


def set_joint_qvel(m: T.Model, d: T.Data, name: str, value) -> T.Data:
    lo, hi = joint_qvel_slice(m, name)
    value = jnp.asarray(value, d.qvel.dtype).reshape(hi - lo)
    return dataclasses.replace(d, qvel=d.qvel.at[lo:hi].set(value))


def robot_get_obs(m: T.Model, d: T.Data, joint_names: Sequence[str]):
    """(qpos, qvel) concatenated over the robot0:* joints
    (mujoco_utils.py:23-31)."""
    names = [n for n in joint_names if n.startswith("robot")]
    if not names:
        z = jnp.zeros(0, d.qpos.dtype)
        return z, z
    qpos = jnp.concatenate([get_joint_qpos(m, d, n) for n in names])
    qvel = jnp.concatenate([get_joint_qvel(m, d, n) for n in names])
    return qpos, qvel


def ctrl_set_action(m: T.Model, d: T.Data, action) -> T.Data:
    """Write actuator controls; position actuators (biastype != 0 in the
    reference check) add the coupled joint's current qpos as offset. When
    mocap bodies exist, the leading nmocap*7 entries of ``action`` belong to
    mocap_set_action and are skipped (mujoco_utils.py:34-48)."""
    mt = m.meta
    action = jnp.asarray(action, d.qpos.dtype)
    if mt.nmocap > 0:
        action = action[mt.nmocap * 7:]
    if mt.nu == 0:
        return d
    offs = []
    for i in range(mt.nu):
        if mt.actuator_biastype[i] != 0:
            adr = mt.jnt_qposadr[mt.actuator_trnid[i]]
            offs.append(d.qpos[adr])
        else:
            offs.append(jnp.zeros((), d.qpos.dtype))
    return dataclasses.replace(d, ctrl=action + jnp.stack(offs))


def _mocap_weld_pairs(mt: T.Meta):
    """(mocap index, welded body) pairs derived from weld equalities whose
    one side is a mocap body (mujoco_utils.py:89-103)."""
    WELD = 1
    pairs = []
    for e in range(len(mt.eq_type)):
        if mt.eq_type[e] != WELD:
            continue
        b1, b2 = mt.eq_obj1id[e], mt.eq_obj2id[e]
        m1, m2 = mt.body_mocapid[b1], mt.body_mocapid[b2]
        if m1 >= 0 and m2 < 0:
            pairs.append((m1, b2))
        elif m2 >= 0 and m1 < 0:
            pairs.append((m2, b1))
    return pairs


def reset_mocap2body_xpos(m: T.Model, d: T.Data) -> T.Data:
    """Snap every weld-attached mocap body onto its welded body's pose
    (mujoco_utils.py:83-107)."""
    pairs = _mocap_weld_pairs(m.meta)
    if not pairs:
        return d
    mocap_pos, mocap_quat = d.mocap_pos, d.mocap_quat
    for mi, body in pairs:
        mocap_pos = mocap_pos.at[mi].set(d.xpos[body])
        mocap_quat = mocap_quat.at[mi].set(d.xquat[body])
    return dataclasses.replace(d, mocap_pos=mocap_pos, mocap_quat=mocap_quat)


def mocap_set_action(m: T.Model, d: T.Data, action) -> T.Data:
    """Apply a delta pose to the mocap bodies: reset them onto their welded
    bodies then displace (mujoco_utils.py:51-71)."""
    mt = m.meta
    nmocap = d.mocap_pos.shape[0]
    if nmocap == 0:
        return d
    action = jnp.asarray(action, d.qpos.dtype)[: nmocap * 7].reshape(nmocap, 7)
    d = reset_mocap2body_xpos(m, d)
    return dataclasses.replace(
        d,
        mocap_pos=d.mocap_pos + action[:, :3],
        mocap_quat=d.mocap_quat + action[:, 3:],
    )


def reset_mocap_welds(m: T.Model) -> T.Model:
    """Zero the weld relpose data so welded bodies track their mocap exactly
    (mujoco_utils.py:74-80; returns a new Model — Model is immutable here)."""
    WELD = 1
    eq_data = m.eq_data
    head = jnp.asarray([0.0, 0, 0, 0, 0, 0, 1.0], eq_data.dtype)
    for e in range(len(m.meta.eq_type)):
        if m.meta.eq_type[e] == WELD:
            eq_data = eq_data.at[e, :7].set(head)
    return dataclasses.replace(m, eq_data=eq_data)


def get_site_xpos(m: T.Model, d: T.Data, name: str) -> jnp.ndarray:
    return d.site_xpos[m.name2id("site", name)]


def get_site_xmat(m: T.Model, d: T.Data, name: str) -> jnp.ndarray:
    return d.site_xmat[m.name2id("site", name)]


def get_site_xvelp(m: T.Model, d: T.Data, name: str) -> jnp.ndarray:
    """Site linear velocity via the site Jacobian (mujoco_utils.py:228-241)."""
    from gymnasium_robotics_tpu.envs.fetch.fetch import site_velp

    site = m.name2id("site", name)
    return site_velp(m, d, site, m.meta.site_bodyid[site])


def get_site_xvelr(m: T.Model, d: T.Data, name: str) -> jnp.ndarray:
    """Site angular velocity via the site Jacobian
    (mujoco_utils.py:244-257)."""
    from gymnasium_robotics_tpu.envs.fetch.fetch import site_velr

    site = m.name2id("site", name)
    return site_velr(m, d, site, m.meta.site_bodyid[site])
