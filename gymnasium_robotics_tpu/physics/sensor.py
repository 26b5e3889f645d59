"""Sensor readout (touch sensors for the Shadow Hand touch variants,
reference envs/shadow_dexterous_hand/manipulate_touch_sensors.py:66-81).

Touch sensor value = sum of normal contact force magnitudes for contacts whose
position falls inside the sensor site zone on the sensor's body. Round-1
approximation: contacts on the site's body within the site radius contribute.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from gymnasium_robotics_tpu.physics import types as T

SENS_TOUCH = 0


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

    slot_geoms = cst._slot_geoms(mt)
    for s in range(mt.nsensor):
        if mt.sensor_type[s] != SENS_TOUCH:
            continue
        site = mt.sensor_objid[s]
        body = mt.site_bodyid[site]
        adr = mt.sensor_adr[s]
        total = jnp.zeros((), d.qpos.dtype)
        for ci, (g1, g2) in enumerate(slot_geoms):
            if mt.geom_bodyid[g1] != body and mt.geom_bodyid[g2] != body:
                continue
            # contact inside the sensor site zone (box test in site frame)
            loc = d.site_xmat[site].T @ (d.contact.pos[ci] - d.site_xpos[site])
            inside = jnp.all(jnp.abs(loc) <= m.site_size_arr[site] + 1e-6)
            fn = jnp.maximum(d.con_force[ci, 0], 0.0)
            total = total + jnp.where(inside, fn, 0.0)
        out = out.at[adr].set(total)
    return dataclasses.replace(d, sensordata=out)
