"""Passive forces: joint springs, dof dampers, and fluid drag (mj_passive).

Fluid forces use MuJoCo's inertia-box model (mj_inertiaBoxFluidModel): each
body with mass is approximated by its equivalent-inertia box; viscous (linear
in velocity) and density (quadratic drag) wrenches are computed in the body
inertia frame and mapped to qfrc through the com-frame dof jacobian. The fly
workload depends on this (fruitfly_force_fast.xml sets density=0.00128,
viscosity=0.000185 in cgs units); the reference consumes the same model via
mjx (SURVEY.md section 2b). The per-geom ellipsoid fluid model (fluidshape)
is not supported and put_model rejects it loudly.

The whole fluid stage is vectorized over bodies: local-frame wrenches are
computed with (nbody, 3) elementwise math, then scattered to dofs with one
(nv, nbody) masked matmul — no per-body loop on device.
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

_MINVAL = 1e-15


def _body_dof_mask(plan: PhysicsPlan) -> np.ndarray:
    """mask[b, i] = 1 if dof i is an ancestor dof of body b (trace-time)."""
    nbody, nv = plan.nbody, plan.nv
    mask = np.zeros((nbody, nv), dtype=np.float64)
    for b in range(1, nbody):
        body = b
        while body > 0 and plan.body_dofnum[body] == 0:
            body = int(plan.body_parentid[body])
        if body == 0:
            continue
        i = int(plan.body_dofadr[body]) + int(plan.body_dofnum[body]) - 1
        while i >= 0:
            mask[b, i] = 1.0
            i = int(plan.dof_parentid[i])
    return mask


def fluid(plan: PhysicsPlan, model: Model, data: Data) -> jax.Array:
    """Inertia-box fluid forces -> qfrc contribution (nv,)."""
    dtype = data.qpos.dtype
    mass = model.body_mass
    inert = model.body_inertia  # (nbody, 3) principal moments

    # equivalent inertia box: full side lengths
    safe_mass = jnp.maximum(mass, _MINVAL)
    box = jnp.stack(
        [
            jnp.sqrt(
                jnp.maximum(
                    _MINVAL,
                    inert[:, (i + 1) % 3] + inert[:, (i + 2) % 3] - inert[:, i],
                )
                / safe_mass
                * 6.0
            )
            for i in range(3)
        ],
        axis=1,
    )  # (nbody, 3)

    # body 6D velocity at xipos, in the inertia (ximat) frame
    root_com = data.subtree_com[plan.body_rootid]
    w_world = data.cvel[:, :3]
    v_world = data.cvel[:, 3:] + jnp.cross(w_world, data.xipos - root_com)
    # local = R^T * world (ximat columns are local axes in world coords);
    # multiply-reduce instead of einsum so the per-body 3-contraction stays
    # on the VPU (see ops.spatial.inertia_in_com_frame)
    lw = jnp.sum(data.ximat * w_world[:, :, None], axis=1)
    lv = jnp.sum(data.ximat * v_world[:, :, None], axis=1)
    # subtract wind (a pure linear velocity field)
    lwind = jnp.sum(
        data.ximat * model.opt_wind.astype(dtype)[None, :, None], axis=1
    )
    lv = lv - lwind

    lfrc_ang = jnp.zeros_like(lw)
    lfrc_lin = jnp.zeros_like(lv)

    # viscous drag (sphere of equivalent mean diameter)
    diam = jnp.mean(box, axis=1, keepdims=True)
    visc = model.opt_viscosity.astype(dtype)
    lfrc_ang = lfrc_ang - jnp.pi * diam**3 * visc * lw
    lfrc_lin = lfrc_lin - 3.0 * jnp.pi * diam * visc * lv

    # quadratic (density) drag against the box faces
    dens = model.opt_density.astype(dtype)
    b0, b1, b2 = box[:, 0:1], box[:, 1:2], box[:, 2:3]
    face = jnp.concatenate([b1 * b2, b0 * b2, b0 * b1], axis=1)
    lfrc_lin = lfrc_lin - 0.5 * dens * face * jnp.abs(lv) * lv
    ang_coef = (
        jnp.concatenate(
            [
                b0 * (b1**4 + b2**4),
                b1 * (b0**4 + b2**4),
                b2 * (b0**4 + b1**4),
            ],
            axis=1,
        )
        / 64.0
    )
    lfrc_ang = lfrc_ang - dens * ang_coef * jnp.abs(lw) * lw

    # rotate wrench to world, move to the com reference point. The k=3
    # contractions run as fused VPU multiply-reduces: einsum/@ here lowers
    # to MXU-padded tiny dot_generals at 6-pass "highest" precision
    # (measured 4% of the fly's rollout — same pathology as the contact
    # projection, constraint.py `project`)
    torque_w = jnp.sum(data.ximat * lfrc_ang[:, None, :], axis=-1)
    force_w = jnp.sum(data.ximat * lfrc_lin[:, None, :], axis=-1)
    torque_com = torque_w + jnp.cross(data.xipos - root_com, force_w)
    wrench = jnp.concatenate([torque_com, force_w], axis=1)  # (nbody, 6)
    # massless bodies contribute nothing (MuJoCo skips them)
    wrench = jnp.where(mass[:, None] > _MINVAL, wrench, 0.0)

    # qfrc[i] = sum_b mask[b, i] * cdof[i] . wrench[b]
    mask = jnp.asarray(_body_dof_mask(plan), dtype=dtype)  # (nbody, nv)
    dots = jnp.sum(
        data.cdof[:, None, :] * wrench[None, :, :], axis=-1
    )  # (nv, nbody)
    return jnp.sum(dots * mask.T, axis=1).astype(dtype)


def passive(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Computes qfrc_spring, qfrc_damper, qfrc_passive (incl. fluid)."""
    dtype = data.qpos.dtype
    qfrc_spring = jnp.zeros(plan.nv, dtype=dtype)

    # scalar joints: -k * (qpos - qpos_spring)
    scalar = np.nonzero(
        (plan.jnt_type == JNT_HINGE) | (plan.jnt_type == JNT_SLIDE)
    )[0]
    if len(scalar):
        qadr = plan.jnt_qposadr[scalar]
        dadr = plan.jnt_dofadr[scalar]
        stiff = model.jnt_stiffness[scalar]
        frc = -stiff * (data.qpos[qadr] - model.qpos_spring[qadr])
        qfrc_spring = qfrc_spring.at[dadr].set(frc)

    # free joints: translational spring + rotational spring via quat subtract
    free = np.nonzero(plan.jnt_type == JNT_FREE)[0]
    for j in free:
        stiff = model.jnt_stiffness[j]
        qadr = int(plan.jnt_qposadr[j])
        dadr = int(plan.jnt_dofadr[j])
        dif = data.qpos[qadr : qadr + 3] - model.qpos_spring[qadr : qadr + 3]
        qfrc_spring = qfrc_spring.at[dadr : dadr + 3].set(-stiff * dif)
        rot = quat.subtract(
            data.qpos[qadr + 3 : qadr + 7],
            model.qpos_spring[qadr + 3 : qadr + 7],
        )
        qfrc_spring = qfrc_spring.at[dadr + 3 : dadr + 6].set(-stiff * rot)

    ball = np.nonzero(plan.jnt_type == JNT_BALL)[0]
    for j in ball:
        stiff = model.jnt_stiffness[j]
        qadr = int(plan.jnt_qposadr[j])
        dadr = int(plan.jnt_dofadr[j])
        rot = quat.subtract(
            data.qpos[qadr : qadr + 4], model.qpos_spring[qadr : qadr + 4]
        )
        qfrc_spring = qfrc_spring.at[dadr : dadr + 3].set(-stiff * rot)

    qfrc_damper = -model.dof_damping * data.qvel

    # fixed-tendon springs (deadband [lower, upper]) and dampers. The tendon
    # velocity is recomputed from qvel (not read from data.ten_velocity) so
    # velocity-derivative autodiff (implicit integrators' qDeriv) sees it.
    if plan.tendon_passive_active:
        length = (
            model.tendon_length_mat @ data.qpos + model.tendon_length0_const
        )
        lo = model.tendon_lengthspring[:, 0]
        hi = model.tendon_lengthspring[:, 1]
        disp = jnp.where(
            length > hi, hi - length, jnp.where(length < lo, lo - length, 0.0)
        )
        qfrc_spring = qfrc_spring + model.tendon_moment.T @ (
            model.tendon_stiffness * disp
        )
        qfrc_damper = qfrc_damper - model.tendon_moment.T @ (
            model.tendon_damping * (model.tendon_moment @ data.qvel)
        )

    qfrc_passive = qfrc_spring + qfrc_damper
    if plan.fluid_active:
        qfrc_passive = qfrc_passive + fluid(plan, model, data)
    return data.replace(
        qfrc_spring=qfrc_spring,
        qfrc_damper=qfrc_damper,
        qfrc_passive=qfrc_passive,
    )
