"""Forward kinematics: qpos -> body/geom/site frames (mj_kinematics parity).

TPU-first design: the kinematic tree is processed level-by-level; within a
level all bodies update in one vectorized gather/compute/scatter, and bodies
are further partitioned by (joint slot, joint type) at trace time, so the
compiled program contains no data-dependent control flow and no dynamic
shapes. The reference reaches this stage through `mjx.kinematics` inside
brax's pipeline (reference: track_mjx/environment/task/
single_clip_tracking.py:163,219 via pipeline_init/pipeline_step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from track_mjx_tpu.ops import quaternion as quat
from track_mjx_tpu.physics.model import (
    Data,
    Model,
    PhysicsPlan,
    JNT_BALL,
    JNT_FREE,
    JNT_HINGE,
    JNT_SLIDE,
)

_v_rotate = jax.vmap(quat.rotate)
_v_mul = jax.vmap(quat.mul)
_v_to_mat = jax.vmap(quat.to_mat)
_v_normalize = jax.vmap(quat.normalize)
_v_axis_angle = jax.vmap(quat.from_axis_angle)


def kinematics(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Computes xpos/xquat/xmat, xanchor/xaxis, geom/site frames from qpos."""
    qpos = data.qpos
    nbody = plan.nbody
    dtype = qpos.dtype

    xpos = jnp.zeros((nbody, 3), dtype=dtype)
    xquat = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=dtype), (nbody, 1))
    xanchor = jnp.zeros((plan.njnt, 3), dtype=dtype)
    xaxis = jnp.zeros((plan.njnt, 3), dtype=dtype)

    for ids in plan.body_levels:
        parents = plan.body_parentid[ids]
        p_pos = xpos[parents]
        p_quat = xquat[parents]
        b_pos = p_pos + _v_rotate(model.body_pos[ids], p_quat)
        b_quat = _v_mul(p_quat, model.body_quat[ids])

        max_jnt = int(plan.body_jntnum[ids].max()) if len(ids) else 0
        for k in range(max_jnt):
            active = plan.body_jntnum[ids] > k
            act_ids = ids[active]
            jids = plan.body_jntadr[act_ids] + k
            # partition by joint type at trace time
            for jt in (JNT_FREE, JNT_BALL, JNT_SLIDE, JNT_HINGE):
                sel = plan.jnt_type[jids] == jt
                if not sel.any():
                    continue
                j_sel = jids[sel]
                # local (within-level) body indices for the scatter
                lsel = np.nonzero(active)[0][sel]
                qadr = plan.jnt_qposadr[j_sel]
                cur_pos = b_pos[lsel]
                cur_quat = b_quat[lsel]

                if jt == JNT_FREE:
                    new_pos = qpos[qadr[:, None] + np.arange(3)[None]]
                    new_quat = _v_normalize(
                        qpos[qadr[:, None] + (3 + np.arange(4))[None]]
                    )
                    anchor = new_pos
                    axis = model.jnt_axis[j_sel]  # free joint axis unused
                else:
                    anchor = cur_pos + _v_rotate(model.jnt_pos[j_sel], cur_quat)
                    axis = _v_rotate(model.jnt_axis[j_sel], cur_quat)
                    if jt == JNT_SLIDE:
                        disp = (qpos[qadr] - model.qpos0[qadr])[:, None]
                        new_pos = cur_pos + axis * disp
                        new_quat = cur_quat
                    elif jt == JNT_BALL:
                        qloc = _v_normalize(
                            qpos[qadr[:, None] + np.arange(4)[None]]
                        )
                        new_quat = _v_mul(cur_quat, qloc)
                        new_pos = anchor - _v_rotate(
                            model.jnt_pos[j_sel], new_quat
                        )
                    else:  # hinge
                        angle = qpos[qadr] - model.qpos0[qadr]
                        qloc = _v_axis_angle(model.jnt_axis[j_sel], angle)
                        new_quat = _v_mul(cur_quat, qloc)
                        new_pos = anchor - _v_rotate(
                            model.jnt_pos[j_sel], new_quat
                        )

                b_pos = b_pos.at[lsel].set(new_pos)
                b_quat = b_quat.at[lsel].set(new_quat)
                xanchor = xanchor.at[j_sel].set(anchor)
                xaxis = xaxis.at[j_sel].set(axis)

        xpos = xpos.at[ids].set(b_pos)
        xquat = xquat.at[ids].set(_v_normalize(b_quat))

    xmat = _v_to_mat(xquat)

    # inertial frames
    b_quat_all = xquat
    xipos = xpos + jax.vmap(quat.rotate)(model.body_ipos, b_quat_all)
    ximat = _v_to_mat(_v_mul(b_quat_all, model.body_iquat))

    # geoms / sites
    g_body = plan.geom_bodyid
    geom_xpos = xpos[g_body] + jax.vmap(quat.rotate)(
        model.geom_pos, xquat[g_body]
    )
    geom_xmat = _v_to_mat(_v_mul(xquat[g_body], model.geom_quat))
    if plan.nsite:
        s_body = plan.site_bodyid
        site_xpos = xpos[s_body] + jax.vmap(quat.rotate)(
            model.site_pos, xquat[s_body]
        )
        site_xmat = _v_to_mat(_v_mul(xquat[s_body], model.site_quat))
    else:
        site_xpos = data.site_xpos
        site_xmat = data.site_xmat

    return data.replace(
        xpos=xpos,
        xquat=xquat,
        xmat=xmat,
        xipos=xipos,
        ximat=ximat,
        xanchor=xanchor,
        xaxis=xaxis,
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
        site_xpos=site_xpos,
        site_xmat=site_xmat,
    )
