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


def _kin_schedule(plan: PhysicsPlan):
    """Trace-time schedule: per tree level, groups of bodies sharing the same
    joint-type signature, plus the static permutations that map the
    level-order accumulation back to body/joint order.

    This is what makes the kinematics scatter-free on TPU: every group is
    processed as one dense vector op, levels are appended by concatenation,
    and body/joint order is restored by ONE constant-index gather at the end
    (round-4 trace: the previous per-level/per-slot `.at[].set` scheme spent
    1.4s/28s of a training step in serialized scatters)."""
    levels = []  # [ [ (body_ids, sig), ... ] per level ]
    body_order = [0]
    jnt_order = []
    for ids in plan.body_levels:
        sigs: dict = {}
        for b in ids:
            jn = int(plan.body_jntnum[b])
            adr = int(plan.body_jntadr[b])
            sig = tuple(int(plan.jnt_type[adr + k]) for k in range(jn))
            sigs.setdefault(sig, []).append(int(b))
        groups = []
        for sig, bodies in sigs.items():
            arr = np.asarray(bodies)
            groups.append((arr, sig))
            body_order.extend(bodies)
            for k in range(len(sig)):
                jnt_order.extend(plan.body_jntadr[arr] + k)
        levels.append(groups)
    body_inv = np.argsort(np.asarray(body_order))
    jnt_inv = (
        np.argsort(np.asarray(jnt_order)) if jnt_order else np.zeros(0, int)
    )
    pos_in_acc = np.zeros(plan.nbody, dtype=int)
    pos_in_acc[np.asarray(body_order)] = np.arange(len(body_order))
    return levels, pos_in_acc, body_inv, jnt_inv


def kinematics(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Computes xpos/xquat/xmat, xanchor/xaxis, geom/site frames from qpos."""
    qpos = data.qpos
    dtype = qpos.dtype

    levels, pos_in_acc, body_inv, jnt_inv = _kin_schedule(plan)

    # accumulated results in level order; row 0 = world
    cat_pos = jnp.zeros((1, 3), dtype=dtype)
    cat_quat = jnp.array([[1.0, 0, 0, 0]], dtype=dtype)
    anchor_parts, axis_parts = [], []

    for groups in levels:
        level_pos, level_quat = [], []
        for ids, sig in groups:
            parents = pos_in_acc[plan.body_parentid[ids]]
            p_pos = cat_pos[parents]
            p_quat = cat_quat[parents]
            b_pos = p_pos + _v_rotate(model.body_pos[ids], p_quat)
            b_quat = _v_mul(p_quat, model.body_quat[ids])

            for k, jt in enumerate(sig):
                j_sel = plan.body_jntadr[ids] + k
                qadr = plan.jnt_qposadr[j_sel]

                if jt == JNT_FREE:
                    new_pos = qpos[qadr[:, None] + np.arange(3)[None]]
                    new_quat = _v_normalize(
                        qpos[qadr[:, None] + (3 + np.arange(4))[None]]
                    )
                    anchor = new_pos
                    axis = model.jnt_axis[j_sel]  # free joint axis unused
                else:
                    anchor = b_pos + _v_rotate(model.jnt_pos[j_sel], b_quat)
                    axis = _v_rotate(model.jnt_axis[j_sel], b_quat)
                    if jt == JNT_SLIDE:
                        disp = (qpos[qadr] - model.qpos0[qadr])[:, None]
                        new_pos = b_pos + axis * disp
                        new_quat = b_quat
                    elif jt == JNT_BALL:
                        qloc = _v_normalize(
                            qpos[qadr[:, None] + np.arange(4)[None]]
                        )
                        new_quat = _v_mul(b_quat, qloc)
                        new_pos = anchor - _v_rotate(
                            model.jnt_pos[j_sel], new_quat
                        )
                    else:  # hinge
                        angle = qpos[qadr] - model.qpos0[qadr]
                        qloc = _v_axis_angle(model.jnt_axis[j_sel], angle)
                        new_quat = _v_mul(b_quat, qloc)
                        new_pos = anchor - _v_rotate(
                            model.jnt_pos[j_sel], new_quat
                        )

                b_pos, b_quat = new_pos, new_quat
                anchor_parts.append(anchor)
                axis_parts.append(axis)

            level_pos.append(b_pos)
            level_quat.append(_v_normalize(b_quat))
        cat_pos = jnp.concatenate([cat_pos] + level_pos)
        cat_quat = jnp.concatenate([cat_quat] + level_quat)

    xpos = cat_pos[body_inv]
    xquat = cat_quat[body_inv]
    if anchor_parts:
        xanchor = jnp.concatenate(anchor_parts)[jnt_inv]
        xaxis = jnp.concatenate(axis_parts)[jnt_inv]
    else:
        xanchor = jnp.zeros((plan.njnt, 3), dtype=dtype)
        xaxis = jnp.zeros((plan.njnt, 3), dtype=dtype)

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
