"""Tendon lengths and actuation (mj_tendon + mj_fwdActuation parity).

TPU-first: because the supported transmissions are scalar joints and fixed
(joint-coupled) tendons, actuator length/velocity/torque are three constant
matrices applied as small matmuls — no per-actuator control flow on device.
The reference's rodent drives 30 hinge + 8 tendon actuators with filter
activation dynamics and affine bias (rodent.xml actuator block), optionally
converted to pure-torque mode (track_mjx/environment/walker/rodent.py:69-78).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from track_mjx_tpu.physics.model import (
    Data,
    Model,
    PhysicsPlan,
    BIAS_AFFINE,
    BIAS_NONE,
    DYN_FILTER,
    DYN_FILTEREXACT,
    DYN_INTEGRATOR,
    DYN_NONE,
    GAIN_AFFINE,
    GAIN_FIXED,
)


def tendon(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Fixed-tendon lengths and velocities (constant jacobian)."""
    if plan.ntendon == 0:
        return data
    ten_length = model.tendon_length_mat @ data.qpos + model.tendon_length0_const
    ten_velocity = model.tendon_moment @ data.qvel
    return data.replace(ten_length=ten_length, ten_velocity=ten_velocity)


def _act_dot(plan: PhysicsPlan, model: Model, ctrl: jax.Array, act: jax.Array):
    """Activation dynamics act_dot per actuator (na == nu layouts only)."""
    if plan.na == 0:
        return jnp.zeros(0, dtype=ctrl.dtype)
    dyntype = plan.actuator_dyntype
    tau = jnp.maximum(model.actuator_dynprm[:, 0], 1e-10)
    filt = (ctrl - act) / tau
    out = jnp.zeros_like(act)
    is_filter = (dyntype == DYN_FILTER) | (dyntype == DYN_FILTEREXACT)
    out = jnp.where(jnp.asarray(is_filter), filt, out)
    out = jnp.where(jnp.asarray(dyntype == DYN_INTEGRATOR), ctrl, out)
    return out


def actuation(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Computes actuator force and qfrc_actuator from ctrl/act."""
    dtype = data.qpos.dtype
    if plan.nu == 0:
        return data

    ctrl = data.ctrl
    limited = model.actuator_ctrllimited > 0
    ctrl = jnp.where(
        limited,
        jnp.clip(ctrl, model.actuator_ctrlrange[:, 0], model.actuator_ctrlrange[:, 1]),
        ctrl,
    )

    length = model.actuator_len_mat @ data.qpos + model.actuator_len_const
    velocity = model.actuator_moment @ data.qvel

    act_dot = _act_dot(plan, model, ctrl, data.act)

    # input to force generation: act for stateful actuators, ctrl otherwise
    if plan.na:
        stateful = jnp.asarray(plan.actuator_dyntype != DYN_NONE)
        inp = jnp.where(stateful, data.act, ctrl)
    else:
        inp = ctrl

    gaintype = plan.actuator_gaintype
    gp = model.actuator_gainprm
    gain_fixed = gp[:, 0]
    gain_affine = gp[:, 0] + gp[:, 1] * length + gp[:, 2] * velocity
    gain = jnp.where(jnp.asarray(gaintype == GAIN_AFFINE), gain_affine, gain_fixed)

    biastype = plan.actuator_biastype
    bp = model.actuator_biasprm
    bias_affine = bp[:, 0] + bp[:, 1] * length + bp[:, 2] * velocity
    bias = jnp.where(jnp.asarray(biastype == BIAS_AFFINE), bias_affine, 0.0)

    force = gain * inp + bias
    flimited = model.actuator_forcelimited > 0
    force = jnp.where(
        flimited,
        jnp.clip(
            force, model.actuator_forcerange[:, 0], model.actuator_forcerange[:, 1]
        ),
        force,
    )

    qfrc_actuator = model.actuator_moment.T @ force
    return data.replace(
        actuator_length=length.astype(dtype),
        actuator_velocity=velocity.astype(dtype),
        actuator_force=force.astype(dtype),
        act_dot=act_dot.astype(dtype) if plan.na else data.act_dot,
        qfrc_actuator=qfrc_actuator.astype(dtype),
    )
