"""Sensor evaluation: gyro, velocimeter, accelerometer, subtreelinvel.

Covers the sensor set of the supported walkers (rodent.xml's head-mounted IMU
triplet + subtreelinvel; reference consumes sensordata through the unused
`_get_kinematic_sensors` helper and the offline analysis extras —
single_clip_tracking.py:356-368, analysis/rollout.py:147). The accelerometer
path implements mj_rnePostConstraint's body-acceleration chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from track_mjx_tpu.physics.model import Data, Model, PhysicsPlan

# mjtSensor enum values (stable)
SENS_ACCELEROMETER = 1
SENS_VELOCIMETER = 2
SENS_GYRO = 3
SENS_SUBTREELINVEL = 36

# mjtObj
OBJ_BODY = 1
OBJ_SITE = 6


def _body_cacc(plan: PhysicsPlan, model: Model, data: Data) -> jnp.ndarray:
    """Com-frame body accelerations incl. constraint response (the forward
    pass of mj_rnePostConstraint, without external/contact force bookkeeping)."""
    dtype = data.qpos.dtype
    cacc = jnp.zeros((plan.nbody, 6), dtype=dtype)
    cacc = cacc.at[0, 3:].set(-model.opt_gravity)
    for ids in plan.body_levels:
        parents = plan.body_parentid[ids]
        acc = cacc[parents]
        max_dof = int(plan.body_dofnum[ids].max()) if len(ids) else 0
        for k in range(max_dof):
            active = plan.body_dofnum[ids] > k
            lsel = np.nonzero(active)[0]
            dadr = plan.body_dofadr[ids[active]] + k
            acc = acc.at[lsel].add(
                data.cdof_dot[dadr] * data.qvel[dadr, None]
                + data.cdof[dadr] * data.qacc[dadr, None]
            )
        cacc = cacc.at[ids].set(acc)
    return cacc


def _point_velocity(plan, data, bodyid, point):
    """(angular, linear) world-frame velocity of `point` on `bodyid`."""
    com = data.subtree_com[plan.body_rootid[bodyid]]
    cvel = data.cvel[bodyid]
    w, v = cvel[:3], cvel[3:]
    return w, v + jnp.cross(w, point - com)


def sensor(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Evaluates all supported sensors into data.sensordata."""
    if plan.nsensor == 0:
        return data
    dtype = data.qpos.dtype
    sensordata = jnp.zeros(plan.nsensordata, dtype=dtype)

    need_acc = bool((plan.sensor_type == SENS_ACCELEROMETER).any())
    cacc = _body_cacc(plan, model, data) if need_acc else None

    for i in range(plan.nsensor):
        stype = int(plan.sensor_type[i])
        objid = int(plan.sensor_objid[i])
        adr = int(plan.sensor_adr[i])

        if stype in (SENS_GYRO, SENS_VELOCIMETER, SENS_ACCELEROMETER):
            bodyid = int(plan.site_bodyid[objid])
            point = data.site_xpos[objid]
            rot = data.site_xmat[objid]
            w, v = _point_velocity(plan, data, bodyid, point)
            if stype == SENS_GYRO:
                out = rot.T @ w
            elif stype == SENS_VELOCIMETER:
                out = rot.T @ v
            else:  # accelerometer
                com = data.subtree_com[plan.body_rootid[bodyid]]
                a = cacc[bodyid]
                aw, av = a[:3], a[3:]
                a_lin = av + jnp.cross(aw, point - com)
                # centripetal correction (mj_objectAcceleration)
                a_lin = a_lin + jnp.cross(w, v)
                out = rot.T @ a_lin
            sensordata = sensordata.at[adr : adr + 3].set(out.astype(dtype))
        elif stype == SENS_SUBTREELINVEL:
            # subtree linear momentum / subtree mass (mj_subtreeVel)
            sub_bodies = _subtree_bodies(plan, objid)
            mass = model.body_mass[sub_bodies]
            vs = []
            for b in sub_bodies:
                _, v = _point_velocity(plan, data, int(b), data.xipos[int(b)])
                vs.append(v)
            vstack = jnp.stack(vs)
            out = (mass[:, None] * vstack).sum(0) / jnp.maximum(mass.sum(), 1e-12)
            sensordata = sensordata.at[adr : adr + 3].set(out.astype(dtype))
        # unsupported sensor types remain zero

    return data.replace(sensordata=sensordata)


def _subtree_bodies(plan: PhysicsPlan, root: int) -> np.ndarray:
    """Static body-id list of the subtree rooted at `root`."""
    out = [root]
    for b in range(root + 1, plan.nbody):
        p = b
        while p > root:
            p = int(plan.body_parentid[p])
        if p == root:
            out.append(b)
    return np.array(out, dtype=np.int64)
