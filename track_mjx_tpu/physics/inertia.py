"""Joint-space inertia: composite rigid body -> dense qM, Cholesky factor.

TPU-first: qM is assembled as one small matmul (cdof @ buf^T) masked by the
static dof-ancestry pattern, then factorized with XLA's batched Cholesky —
both MXU-friendly when vmapped over thousands of envs. This replaces
MuJoCo/MJX's sparse LDL machinery (mj_crb / mj_factorM), which the reference
uses via mjx (SURVEY.md section 2b); dense is the right layout for TPU at
nv<=100.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from track_mjx_tpu.ops import batched_linalg, spatial
from track_mjx_tpu.physics.model import Data, Model, PhysicsPlan


def _subtree_mask_body(plan: PhysicsPlan) -> np.ndarray:
    nbody = plan.nbody
    mask = np.eye(nbody, dtype=bool)
    for i in range(nbody - 1, 0, -1):
        p = int(plan.body_parentid[i])
        mask[p] |= mask[i]
    return mask.astype(np.float64)


def crb(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Composite-rigid-body mass matrix (mj_crb parity, dense layout)."""
    dtype = data.qpos.dtype
    # composite inertia: sum of cinert over each body's subtree
    mask = jnp.asarray(_subtree_mask_body(plan), dtype=dtype)
    crb_inert = mask @ data.cinert  # (nbody, 10)

    # buf[i] = crb[dof_bodyid[i]] * cdof[i]
    buf = jax.vmap(spatial.inert_mul)(
        crb_inert[plan.dof_bodyid], data.cdof
    )  # (nv, 6)
    # qM[i, j] = cdof[j] . buf[i] for j ancestor-or-self of i
    full = buf @ data.cdof.T  # full[i, j] = buf[i] . cdof[j]
    anc = jnp.asarray(plan.ancestry_mask, dtype=bool)
    lower = jnp.where(anc, full, 0.0)
    qm = lower + lower.T - jnp.diag(jnp.diag(lower))
    qm = qm + jnp.diag(model.dof_armature)
    # crb_buf is exported so the fused CG kernel can rebuild/factor qM in
    # VMEM from (nv, 6) operands instead of reading the dense (nv, nv)
    # matrix from HBM; when the kernel path is taken XLA dead-code-
    # eliminates the dense assembly above on the scan-carried substeps
    return data.replace(qM=qm.astype(dtype), crb_buf=buf.astype(dtype))


def factor_m(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Dense Cholesky factorization of qM (replaces sparse mj_factorM).

    Dispatches to the lane-batched Pallas kernel under vmap on TPU
    (ops/batched_linalg.py); XLA's loop-based batched cholesky there is ~100x
    off peak for these matrix sizes."""
    qld = batched_linalg.cholesky(data.qM)
    return data.replace(qLD=qld)


def solve_m(data: Data, x: jax.Array) -> jax.Array:
    """Solves qM @ res = x using the cached Cholesky factor."""
    return batched_linalg.cho_solve(data.qLD, x)


def mul_m(data: Data, x: jax.Array) -> jax.Array:
    """qM @ x."""
    return data.qM @ x
