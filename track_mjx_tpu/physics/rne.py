"""Recursive Newton-Euler bias forces (mj_rne, flg_acc=0 parity).

Forward velocity-product pass runs level-by-level; the backward force
accumulation is a static subtree-mask matmul (MXU-friendly under vmap).
Reference consumes this via mjx (SURVEY.md section 2b).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from track_mjx_tpu.ops import spatial
from track_mjx_tpu.physics.model import Data, Model, PhysicsPlan


def _subtree_mask_body(plan: PhysicsPlan) -> np.ndarray:
    nbody = plan.nbody
    mask = np.eye(nbody, dtype=bool)
    for i in range(nbody - 1, 0, -1):
        mask[int(plan.body_parentid[i])] |= mask[i]
    return mask.astype(np.float64)


def rne(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Computes qfrc_bias = C(qpos, qvel): centrifugal/Coriolis + gravity."""
    dtype = data.qpos.dtype
    nbody = plan.nbody

    # cacc[world] = [0; -gravity]; forward propagate velocity-product accel
    cacc = jnp.zeros((nbody, 6), dtype=dtype)
    cacc = cacc.at[0, 3:].set(-model.opt_gravity)

    for ids in plan.body_levels:
        parents = plan.body_parentid[ids]
        acc = cacc[parents]
        # sum over this body's dofs of cdof_dot * qvel
        for k in range(int(plan.body_dofnum[ids].max()) if len(ids) else 0):
            active = plan.body_dofnum[ids] > k
            lsel = np.nonzero(active)[0]
            dadr = plan.body_dofadr[ids[active]] + k
            acc = acc.at[lsel].add(data.cdof_dot[dadr] * data.qvel[dadr, None])
        cacc = cacc.at[ids].set(acc)

    # body-local force: f = I*a + v x* (I*v)
    iv = jax.vmap(spatial.inert_mul)(data.cinert, data.cvel)
    ia = jax.vmap(spatial.inert_mul)(data.cinert, cacc)
    cfrc = ia + jax.vmap(spatial.force_cross)(data.cvel, iv)

    # backward accumulation over subtrees via static mask matmul
    mask = jnp.asarray(_subtree_mask_body(plan), dtype=dtype)
    cfrc_total = mask @ cfrc  # (nbody, 6)

    # project on dofs
    qfrc_bias = jnp.einsum(
        "ij,ij->i", data.cdof, cfrc_total[plan.dof_bodyid]
    )
    return data.replace(qfrc_bias=qfrc_bias.astype(dtype))
