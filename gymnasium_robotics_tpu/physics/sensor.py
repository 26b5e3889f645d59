"""Sensor readout (touch sensors for the Shadow Hand touch variants and the
Adroit hammer nail sensor, reference
envs/shadow_dexterous_hand/manipulate_touch_sensors.py:66-81 and
envs/adroit_hand/adroit_hammer.py:344-346).

Touch sensor value = sum of contact normal forces for contacts on the sensor
site's body whose position falls inside the site zone, with MuJoCo's per-site-
type inside test (validated against mj_step sensordata on the hammer nail).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gymnasium_robotics_tpu.physics import types as T

SENS_TOUCH = 0

# mjtGeom codes
_SPHERE, _CAPSULE, _ELLIPSOID, _CYLINDER, _BOX = 2, 3, 4, 5, 6


def _inside_zone(site_type: int, size, loc):
    """Is site-frame point ``loc`` inside the site volume (MuJoCo touch-sensor
    zone semantics)?"""
    if site_type == _SPHERE:
        return jnp.linalg.norm(loc) <= size[0]
    if site_type == _CAPSULE:
        z = jnp.clip(loc[2], -size[1], size[1])
        return jnp.linalg.norm(loc - jnp.array([0.0, 0.0, 1.0], loc.dtype) * z) <= size[0]
    if site_type == _ELLIPSOID:
        return jnp.sum(jnp.square(loc / size)) <= 1.0
    if site_type == _CYLINDER:
        return (jnp.linalg.norm(loc[:2]) <= size[0]) & (jnp.abs(loc[2]) <= size[1])
    # box (and default for unknown/legacy assets without site_type metadata)
    return jnp.all(jnp.abs(loc) <= size + 1e-6)


def sensors(m: T.Model, d: T.Data) -> T.Data:
    mt = m.meta
    if not mt.nsensordata:
        return d
    out = jnp.zeros(mt.nsensordata, d.qpos.dtype)
    # Touch sensors are filled by constraint solve via contact forces; other
    # sensor types used by the reference envs are read from Data fields by the
    # env layer directly. Round-1: touch = sum of penetration-proportional
    # pseudo-force near the site (upgraded with true contact forces in the
    # constraint module's force output in a later milestone).
    from gymnasium_robotics_tpu.physics import constraint as cst

    import numpy as np

    slot_geoms = cst._slot_geoms(mt)
    pruned = d.contact.src is not None
    if pruned:
        # pair-topk compact table: slot->body membership is traced (src)
        gb = np.array(mt.geom_bodyid)
        b1_all = jnp.asarray(
            gb[np.array([g1 for g1, _ in slot_geoms])]
        )[d.contact.src]
        b2_all = jnp.asarray(
            gb[np.array([g2 for _, g2 in slot_geoms])]
        )[d.contact.src]
    for s in range(mt.nsensor):
        if mt.sensor_type[s] != SENS_TOUCH:
            continue
        site = mt.sensor_objid[s]
        body = mt.site_bodyid[site]
        adr = mt.sensor_adr[s]
        stype = mt.site_type[site] if mt.site_type else _BOX
        if pruned:
            member = (b1_all == body) | (b2_all == body)   # (ncon_c,)
            rel = d.contact.pos - d.site_xpos[site][None]
            loc = rel @ d.site_xmat[site]                  # R^T @ rel, rowwise
            inside = jax.vmap(
                lambda l: _inside_zone(stype, m.site_size_arr[site], l)
            )(loc) & member
            fn = jnp.maximum(d.con_force[:, 0], 0.0)
            out = out.at[adr].set(jnp.sum(jnp.where(inside, fn, 0.0)))
            continue
        total = jnp.zeros((), d.qpos.dtype)
        for ci, (g1, g2) in enumerate(slot_geoms):
            if mt.geom_bodyid[g1] != body and mt.geom_bodyid[g2] != body:
                continue
            # contact inside the sensor site zone (site-frame inside test)
            loc = d.site_xmat[site].T @ (d.contact.pos[ci] - d.site_xpos[site])
            inside = _inside_zone(stype, m.site_size_arr[site], loc)
            fn = jnp.maximum(d.con_force[ci, 0], 0.0)
            total = total + jnp.where(inside, fn, 0.0)
        out = out.at[adr].set(total)
    return dataclasses.replace(d, sensordata=out)
