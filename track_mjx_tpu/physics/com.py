"""Com-based quantities: subtree_com, cinert, cdof (mj_comPos) and
cvel/cdof_dot (mj_comVel).

TPU-first notes: subtree aggregation is a single (nbody, nbody) static-mask
matmul instead of a tree walk — it rides the MXU when batched over envs. The
dof-axis computation is partitioned by joint type at trace time.

Reference reaches these via mjx inside brax's pipeline (SURVEY.md section 2b).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from track_mjx_tpu.ops import spatial
from track_mjx_tpu.physics.model import (
    Data,
    Model,
    PhysicsPlan,
    JNT_BALL,
    JNT_FREE,
    JNT_HINGE,
    JNT_SLIDE,
)


def _subtree_mask(plan: PhysicsPlan) -> np.ndarray:
    """mask[b, i] = 1 if body i is in the subtree rooted at b (incl. b)."""
    nbody = plan.nbody
    mask = np.eye(nbody, dtype=bool)
    # children come after parents in mujoco ordering: accumulate bottom-up
    for i in range(nbody - 1, 0, -1):
        p = int(plan.body_parentid[i])
        mask[p] |= mask[i]
    return mask.astype(np.float64)


def com_pos(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Computes subtree_com, cinert, cdof."""
    dtype = data.qpos.dtype
    mask = jnp.asarray(_subtree_mask(plan), dtype=dtype)

    mass = model.body_mass
    weighted = mass[:, None] * data.xipos
    subtree_mass = jnp.maximum(mask @ mass, 1e-12)
    subtree_com = (mask @ weighted) / subtree_mass[:, None]

    # cinert: body inertia about the subtree com of the body's kinematic root
    root_com = subtree_com[plan.body_rootid]
    cinert = jax.vmap(spatial.inertia_in_com_frame)(
        mass, model.body_inertia, data.ximat, data.xipos, root_com
    )

    # cdof per dof
    cdof = jnp.zeros((plan.nv, 6), dtype=dtype)
    for jt in (JNT_FREE, JNT_BALL, JNT_SLIDE, JNT_HINGE):
        jids = np.nonzero(plan.jnt_type == jt)[0]
        if len(jids) == 0:
            continue
        bodyid = plan.jnt_bodyid[jids]
        com = subtree_com[plan.body_rootid[bodyid]]
        if jt == JNT_FREE:
            dadr = plan.jnt_dofadr[jids]
            # translational dofs: world axes
            eye = jnp.eye(3, dtype=dtype)
            for i in range(3):
                cdof = cdof.at[dadr + i, 3:].set(
                    jnp.broadcast_to(eye[i], (len(jids), 3))
                )
            # rotational dofs: child-frame axes (xmat columns), about xanchor
            axes = data.xmat[bodyid]  # rows x cols: col j is axis j in world
            offset = com - data.xanchor[jids]
            for i in range(3):
                a = axes[:, :, i]
                cdof = cdof.at[dadr + 3 + i, :3].set(a)
                cdof = cdof.at[dadr + 3 + i, 3:].set(
                    jnp.cross(a, offset)
                )
        elif jt == JNT_BALL:
            dadr = plan.jnt_dofadr[jids]
            axes = data.xmat[bodyid]
            offset = com - data.xanchor[jids]
            for i in range(3):
                a = axes[:, :, i]
                cdof = cdof.at[dadr + i, :3].set(a)
                cdof = cdof.at[dadr + i, 3:].set(jnp.cross(a, offset))
        elif jt == JNT_SLIDE:
            dadr = plan.jnt_dofadr[jids]
            cdof = cdof.at[dadr, 3:].set(data.xaxis[jids])
        else:  # hinge
            dadr = plan.jnt_dofadr[jids]
            a = data.xaxis[jids]
            offset = com - data.xanchor[jids]
            cdof = cdof.at[dadr, :3].set(a)
            cdof = cdof.at[dadr, 3:].set(jnp.cross(a, offset))

    return data.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Computes cvel (body spatial velocities) and cdof_dot (mj_comVel)."""
    dtype = data.qpos.dtype
    cvel = jnp.zeros((plan.nbody, 6), dtype=dtype)
    cdof_dot = jnp.zeros((plan.nv, 6), dtype=dtype)
    qvel = data.qvel

    for ids in plan.body_levels:
        parents = plan.body_parentid[ids]
        vel = cvel[parents]
        # process joints of these bodies in order; static partition by
        # (slot, type) like kinematics
        max_jnt = int(plan.body_jntnum[ids].max()) if len(ids) else 0
        for k in range(max_jnt):
            active = plan.body_jntnum[ids] > k
            act_local = np.nonzero(active)[0]
            jids = plan.body_jntadr[ids[active]] + k
            for jt in (JNT_FREE, JNT_BALL, JNT_SLIDE, JNT_HINGE):
                sel = plan.jnt_type[jids] == jt
                if not sel.any():
                    continue
                lsel = act_local[sel]
                j_sel = jids[sel]
                dadr = plan.jnt_dofadr[j_sel]
                v = vel[lsel]
                if jt == JNT_FREE:
                    # translation: cdof_dot = 0
                    dv = jnp.zeros_like(v)
                    for i in range(3):
                        dv = dv + data.cdof[dadr + i] * qvel[dadr + i, None]
                    v = v + dv
                    # rotation: cdof_dot = cvel x cdof (with accumulated vel)
                    for i in range(3):
                        cd = data.cdof[dadr + 3 + i]
                        cdd = jax.vmap(spatial.motion_cross)(v, cd)
                        cdof_dot = cdof_dot.at[dadr + 3 + i].set(cdd)
                    for i in range(3):
                        v = v + data.cdof[dadr + 3 + i] * qvel[
                            dadr + 3 + i, None
                        ]
                elif jt == JNT_BALL:
                    for i in range(3):
                        cd = data.cdof[dadr + i]
                        cdd = jax.vmap(spatial.motion_cross)(v, cd)
                        cdof_dot = cdof_dot.at[dadr + i].set(cdd)
                    for i in range(3):
                        v = v + data.cdof[dadr + i] * qvel[dadr + i, None]
                else:  # slide / hinge: single dof
                    cd = data.cdof[dadr]
                    cdd = jax.vmap(spatial.motion_cross)(v, cd)
                    cdof_dot = cdof_dot.at[dadr].set(cdd)
                    v = v + cd * qvel[dadr, None]
                vel = vel.at[lsel].set(v)
        cvel = cvel.at[ids].set(vel)

    return data.replace(cvel=cvel, cdof_dot=cdof_dot)
