"""Post-constraint per-body contact wrenches (``cfrc_ext``).

TPU-native equivalent of the contact-accumulation half of MuJoCo's
``mj_rnePostConstraint``. The reference stack exposes this through
``mjx.Data.cfrc_ext`` and logs it as ``joint_forces`` during offline rollouts
(reference: ``track_mjx/analysis/rollout.py:144``); here it is a pure
analysis-time function over the engine's static-shape contact tables, so the
hot training step never computes or carries the extra ``(nbody, 6)`` state.

Conventions (verified empirically against MuJoCo C 3.10 on a probe scene):

- ``cfrc_ext[b]`` is a spatial wrench ``[torque(3), force(3)]`` expressed in
  the world orientation about the subtree COM of body ``b``'s kinematic-tree
  root (``subtree_com[body_rootid[b]]``).
- A contact applies ``+wrench`` to geom2's body and ``-wrench`` to geom1's
  body (the contact normal points from geom1 into geom2).
- Pyramidal facet forces decode as ``fn = sum(pyr)``,
  ``ft_i = (pyr[2i] - pyr[2i+1]) * mu_i`` (``mju_decodePyramid``); elliptic
  blocks are already ``[normal, tangent1, tangent2]`` in the contact frame.

Scope: contact forces only (the contact-accumulation half of C's
``mj_rnePostConstraint``). ``xfrc_applied`` perturbations have no state in
this engine, and equality-constraint wrenches (C adds connect/weld forces to
``cfrc_ext``) are not accumulated here — both are zero in every shipped
workload.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from track_mjx_tpu.physics.collision import _combine_params, contact_bodies
from track_mjx_tpu.physics.model import CONE_ELLIPTIC, Data, Model, PhysicsPlan


def cfrc_ext(plan: PhysicsPlan, model: Model, data: Data) -> jax.Array:
    """Net external (contact) wrench per body, ``(nbody, 6)`` = [torque, force].

    Consumes the constraint outputs already stored in ``data``
    (``contact_dist/pos/frame``, ``efc_force``) — call after ``forward`` or
    ``step``. Single-env; ``jax.vmap`` over a leading batch axis.
    """
    dtype = data.qpos.dtype
    out = jnp.zeros((plan.nbody, 6), dtype)
    if plan.ncon == 0:
        return out

    geom1, geom2, body1, body2 = contact_bodies(plan)
    friction, _, _, includemargin = _combine_params(model, geom1, geom2)
    active = data.contact_dist < includemargin

    # efc row layout (constraint.make_constraint): [equality, frictionloss,
    # joint limits, condim-1 normal rows, then condim>=3 contacts grouped by
    # condim in ascending order (2*(condim-1) pyramid rows / 3 elliptic rows
    # per contact)].
    n_lim = plan.ne + plan.nf + len(plan.limited_jnt_ids)
    cd1 = np.nonzero(plan.contact_condim == 1)[0]
    cd3 = np.nonzero(plan.contact_condim >= 3)[0]
    off = n_lim + len(cd1)

    # decoded contact wrench in the contact frame: [fn, ft1, ft2, tn, t1, t2]
    f_local = jnp.zeros((plan.ncon, 6), dtype)
    if len(cd1):
        f_local = f_local.at[cd1, 0].set(data.efc_force[n_lim + np.arange(len(cd1))])
    if len(cd3):
        if plan.cone == CONE_ELLIPTIC:
            blocks = data.efc_force[off : off + 3 * len(cd3)].reshape(len(cd3), 3)
            f_local = f_local.at[cd3, :3].set(blocks)
        else:
            for cdim in sorted(set(int(c) for c in plan.contact_condim[cd3])):
                grp = cd3[plan.contact_condim[cd3] == cdim]
                nfr = cdim - 1
                nrows = 2 * nfr
                pyr = data.efc_force[off : off + nrows * len(grp)].reshape(
                    len(grp), nrows
                )
                off += nrows * len(grp)
                mu = friction[grp, :nfr]
                # mju_decodePyramid: fn = sum of pyramid forces,
                # f_i = (pyr_{2i} - pyr_{2i+1}) * mu_i
                f_local = f_local.at[grp, 0].set(pyr.sum(axis=1))
                f_local = f_local.at[grp, 1 : 1 + nfr].set(
                    (pyr[:, 0::2] - pyr[:, 1::2]) * mu
                )
    f_local = jnp.where(active[:, None], f_local, 0.0)

    # world-frame force/torque; contact frames carry rows = [normal, tan1,
    # tan2]; components 3: are torsional/rolling moments (condim 4/6)
    f_world = jnp.einsum("ci,cij->cj", f_local[:, :3], data.contact_frame)
    t_world = jnp.einsum("ci,cij->cj", f_local[:, 3:], data.contact_frame)

    com1 = data.subtree_com[plan.body_rootid[body1]]
    com2 = data.subtree_com[plan.body_rootid[body2]]
    trq2 = jnp.cross(data.contact_pos - com2, f_world) + t_world
    trq1 = jnp.cross(data.contact_pos - com1, f_world) + t_world
    out = out.at[body2].add(jnp.concatenate([trq2, f_world], axis=1))
    out = out.at[body1].add(-jnp.concatenate([trq1, f_world], axis=1))
    # C never accumulates into the world body (mj_rnePostConstraint skips it)
    return out.at[0].set(0.0)
