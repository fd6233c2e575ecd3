"""Passive forces: joint springs and dof dampers (mj_passive parity).

Fluid forces (density/viscosity) are not implemented — the supported models
set both to zero (rodent.xml / fruitfly xmls); put_model does not guard this
since MuJoCo defaults are zero, but a nonzero setting would simply be ignored
here. Reference consumes this stage via mjx (SURVEY.md section 2b).
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


def passive(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Computes qfrc_spring, qfrc_damper, qfrc_passive."""
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
    return data.replace(
        qfrc_spring=qfrc_spring,
        qfrc_damper=qfrc_damper,
        qfrc_passive=qfrc_spring + qfrc_damper,
    )
