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

    # cdof per dof: per-type row blocks assembled by ONE static
    # inverse-permutation gather (scatter-free — the previous per-row
    # `.at[].set` scheme cost 1.1s/22s of a training step, round-4 trace)
    blocks = []  # (dof_indices np(k,), rows (k, 6))
    for jt in (JNT_FREE, JNT_BALL, JNT_SLIDE, JNT_HINGE):
        jids = np.nonzero(plan.jnt_type == jt)[0]
        if len(jids) == 0:
            continue
        bodyid = plan.jnt_bodyid[jids]
        com = subtree_com[plan.body_rootid[bodyid]]
        dadr = plan.jnt_dofadr[jids]
        zero3 = jnp.zeros((len(jids), 3), dtype=dtype)
        if jt == JNT_FREE:
            # translational dofs: world axes
            eye = jnp.eye(3, dtype=dtype)
            for i in range(3):
                blocks.append((
                    dadr + i,
                    jnp.concatenate(
                        [zero3, jnp.broadcast_to(eye[i], (len(jids), 3))], -1
                    ),
                ))
            # rotational dofs: child-frame axes (xmat columns), about xanchor
            axes = data.xmat[bodyid]  # rows x cols: col j is axis j in world
            offset = com - data.xanchor[jids]
            for i in range(3):
                a = axes[:, :, i]
                blocks.append((
                    dadr + 3 + i,
                    jnp.concatenate([a, jnp.cross(a, offset)], -1),
                ))
        elif jt == JNT_BALL:
            axes = data.xmat[bodyid]
            offset = com - data.xanchor[jids]
            for i in range(3):
                a = axes[:, :, i]
                blocks.append((
                    dadr + i,
                    jnp.concatenate([a, jnp.cross(a, offset)], -1),
                ))
        elif jt == JNT_SLIDE:
            blocks.append((dadr, jnp.concatenate([zero3, data.xaxis[jids]], -1)))
        else:  # hinge
            a = data.xaxis[jids]
            offset = com - data.xanchor[jids]
            blocks.append((dadr, jnp.concatenate([a, jnp.cross(a, offset)], -1)))

    if blocks:
        idx = np.concatenate([np.asarray(b[0]) for b in blocks])
        cat = jnp.concatenate([b[1] for b in blocks])
        cdof = cat[np.argsort(idx)]
    else:
        cdof = jnp.zeros((plan.nv, 6), dtype=dtype)

    return data.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Computes cvel (body spatial velocities) and cdof_dot (mj_comVel).

    Scatter-free (round 4): the kinematics schedule's trace-time grouping
    (level order, bodies grouped by joint signature) lets the level loop
    accumulate by concatenation; cvel/cdof_dot are restored to body/dof
    order with one constant-index gather each."""
    from track_mjx_tpu.physics.kinematics import _kin_schedule

    dtype = data.qpos.dtype
    qvel = data.qvel
    levels, pos_in_acc, body_inv, _ = _kin_schedule(plan)

    cat_vel = jnp.zeros((1, 6), dtype=dtype)  # row 0 = world
    dot_blocks = []  # (dof_indices np(k,), rows (k, 6))

    for groups in levels:
        level_vels = []
        for ids, sig in groups:
            parents = pos_in_acc[plan.body_parentid[ids]]
            v = cat_vel[parents]
            for k, jt in enumerate(sig):
                j_sel = plan.body_jntadr[ids] + k
                dadr = plan.jnt_dofadr[j_sel]
                if jt == JNT_FREE:
                    # translation: cdof_dot = 0
                    dv = jnp.zeros_like(v)
                    for i in range(3):
                        dv = dv + data.cdof[dadr + i] * qvel[dadr + i, None]
                    v = v + dv
                    for i in range(3):
                        dot_blocks.append((dadr + i, jnp.zeros_like(v)))
                    # rotation: cdof_dot = cvel x cdof (with accumulated vel)
                    for i in range(3):
                        cd = data.cdof[dadr + 3 + i]
                        dot_blocks.append(
                            (dadr + 3 + i, jax.vmap(spatial.motion_cross)(v, cd))
                        )
                    for i in range(3):
                        v = v + data.cdof[dadr + 3 + i] * qvel[
                            dadr + 3 + i, None
                        ]
                elif jt == JNT_BALL:
                    for i in range(3):
                        cd = data.cdof[dadr + i]
                        dot_blocks.append(
                            (dadr + i, jax.vmap(spatial.motion_cross)(v, cd))
                        )
                    for i in range(3):
                        v = v + data.cdof[dadr + i] * qvel[dadr + i, None]
                else:  # slide / hinge: single dof
                    cd = data.cdof[dadr]
                    dot_blocks.append(
                        (dadr, jax.vmap(spatial.motion_cross)(v, cd))
                    )
                    v = v + cd * qvel[dadr, None]
            level_vels.append(v)
        cat_vel = jnp.concatenate([cat_vel] + level_vels)

    cvel = cat_vel[body_inv]
    if dot_blocks:
        idx = np.concatenate([np.asarray(b[0]) for b in dot_blocks])
        cat = jnp.concatenate([b[1] for b in dot_blocks])
        cdof_dot = cat[np.argsort(idx)]
    else:
        cdof_dot = jnp.zeros((plan.nv, 6), dtype=dtype)

    return data.replace(cvel=cvel, cdof_dot=cdof_dot)
