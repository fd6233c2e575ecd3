"""Constraint row assembly: joint limits + contact friction rows.

Produces dense, fixed-shape efc arrays (J, aref, D, active) consumed by the CG
solver. Inactive candidate rows (limit not violated / contact separated) are
zero-masked, which reproduces MuJoCo's "row absent" semantics with static
shapes — the TPU-native replacement for mj_makeConstraint's dynamic row lists.
Impedance/reference math follows MuJoCo's soft-constraint model
(mj_makeImpedance / mj_referenceConstraint). Reference consumes this stage via
mjx (SURVEY.md section 2b).

Both friction-cone types are supported (opt.cone):

- pyramidal: 2*(condim-1) unilateral rows per contact (jn +/- mu_i jt_i).
- elliptic: condim rows per contact [normal, tangent...] forming one cone
  block, placed contiguously at the END of the row list so the solver can
  reshape them to (ncon_ell, condim). Row parameters were reverse-engineered
  against MuJoCo C (mj_instantiateContact): friction rows reuse the normal
  row's impedance, aref_fric = -b*jv (no position term), and
  D_fric_i = D_normal * impratio * (mu_i/mu_1)^2. The fly workload requires
  this (fruitfly_force_fast.xml cone="elliptic"); solreffriction is not
  supported (geom-derived contacts always carry solreffriction = 0).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from track_mjx_tpu.physics.collision import Contact, contact_bodies
from track_mjx_tpu.physics.model import CONE_ELLIPTIC, Data, Model, PhysicsPlan


@struct.dataclass
class EfcData:
    """Dense constraint rows (nefc static).

    For elliptic cones, the last 3*ncon_ell rows are per-contact blocks of
    [normal, tangent1, tangent2]; `ell_mu` carries each block's mu_1 (the
    first tangential friction coefficient). For pyramidal models ell_mu is
    empty and every row is an independent unilateral row."""

    J: jax.Array  # (nefc, nv)
    aref: jax.Array  # (nefc,)
    D: jax.Array  # (nefc,)
    pos: jax.Array  # (nefc,) constraint violation (debug/metrics)
    active_row: jax.Array  # (nefc,) bool: candidate row is instantiated
    ell_mu: jax.Array  # (ncon_ell,) mu_1 per elliptic contact block


def _kbi(
    model: Model,
    solref: jax.Array,
    solimp: jax.Array,
    pos: jax.Array,
):
    """Stiffness/damping/impedance from solver parameters (mj_makeImpedance)."""
    timeconst, dampratio = solref[..., 0], solref[..., 1]
    dmin, dmax, width, mid, power = (
        solimp[..., 0],
        solimp[..., 1],
        solimp[..., 2],
        solimp[..., 3],
        solimp[..., 4],
    )
    dmin = jnp.clip(dmin, 0.0001, 0.9999)
    dmax = jnp.clip(dmax, 0.0001, 0.9999)
    width = jnp.maximum(width, 1e-10)
    mid = jnp.clip(mid, 0.0001, 0.9999)
    power = jnp.maximum(power, 1.0)

    # standard (positive solref) vs direct (non-positive)
    k_std = 1.0 / jnp.maximum(
        dmax * dmax * timeconst * timeconst * dampratio * dampratio, 1e-12
    )
    b_std = 2.0 / jnp.maximum(dmax * timeconst, 1e-12)
    k = jnp.where(timeconst > 0, k_std, -solref[..., 0])
    b = jnp.where(dampratio > 0, b_std, -solref[..., 1])

    x = jnp.abs(pos) / width
    y_low = (x**power) * (mid ** (1.0 - power))
    y_high = 1.0 - ((1.0 - x) ** power) * ((1.0 - mid) ** (1.0 - power))
    y = jnp.where(x < mid, y_low, y_high)
    imp = dmin + y * (dmax - dmin)
    imp = jnp.clip(imp, dmin, dmax)
    imp = jnp.where(x > 1.0, dmax, imp)
    return k, b, imp


def _dof_body_mask(plan: PhysicsPlan) -> np.ndarray:
    """mask[b, i] = 1 if dof i is an ancestor dof of body b."""
    nbody, nv = plan.nbody, plan.nv
    mask = np.zeros((nbody, nv), dtype=np.float64)
    for b in range(1, nbody):
        # last dof of this body (if any), else walk up
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


def make_constraint(
    plan: PhysicsPlan, model: Model, data: Data, contact: Contact
) -> EfcData:
    """Assembles all efc rows with static shapes."""
    dtype = data.qpos.dtype
    nv = plan.nv
    rows_J, rows_aref, rows_D, rows_pos, rows_act = [], [], [], [], []
    ell_mu = jnp.zeros(0, dtype)

    # --- joint limits (hinge/slide), one row per limited joint ---
    jids = plan.limited_jnt_ids
    if len(jids):
        qadr = plan.jnt_qposadr[jids]
        dadr = plan.jnt_dofadr[jids]
        qpos = data.qpos[qadr]
        r0 = model.jnt_range[jids, 0]
        r1 = model.jnt_range[jids, 1]
        dist_min = qpos - r0
        dist_max = r1 - qpos
        dist = jnp.minimum(dist_min, dist_max)
        side = jnp.where(dist_min < dist_max, 1.0, -1.0).astype(dtype)
        margin = model.jnt_margin[jids]
        active = dist < margin
        pos = dist - margin

        J = jnp.zeros((len(jids), nv), dtype=dtype)
        J = J.at[jnp.arange(len(jids)), dadr].set(side)
        J = jnp.where(active[:, None], J, 0.0)

        k, b, imp = _kbi(model, model.jnt_solref[jids], model.jnt_solimp[jids], pos)
        jv = J @ data.qvel
        aref = -b * jv - k * imp * pos
        invweight = model.dof_invweight0[dadr]
        D = imp / jnp.maximum((1.0 - imp) * invweight, 1e-12)

        rows_J.append(J)
        rows_aref.append(jnp.where(active, aref, 0.0))
        rows_D.append(D)
        rows_pos.append(pos)
        rows_act.append(active)

    # --- contacts: pyramidal friction cone ---
    ncon = plan.ncon
    if ncon:
        geom1, geom2, body1, body2 = contact_bodies(plan)
        body_mask = jnp.asarray(_dof_body_mask(plan), dtype=dtype)
        diff_mask = body_mask[body2] - body_mask[body1]  # (ncon, nv)

        # per-dof point jacobian at contact pos
        com = data.subtree_com[plan.body_rootid[plan.dof_bodyid]]  # (nv, 3)
        w, v = data.cdof[:, :3], data.cdof[:, 3:]
        offset = contact.pos[:, None, :] - com[None, :, :]  # (ncon, nv, 3)
        jacp = v[None] + jnp.cross(w[None], offset)  # (ncon, nv, 3)
        jacp = jacp * diff_mask[:, :, None]

        # project on frame directions: (ncon, 3, nv)
        jfr = jnp.einsum("cdk,cik->cid", jacp, contact.frame)
        jn = jfr[:, 0]  # normal rows
        jt = jfr[:, 1:]  # (ncon, 2, nv)

        pos = contact.dist - contact.includemargin
        active = contact.dist < contact.includemargin
        k, b, imp = _kbi(model, contact.solref, contact.solimp, pos)

        invweight_n = (
            model.body_invweight0[body1, 0] + model.body_invweight0[body2, 0]
        )

        # static split of contact slots by condim
        cd1 = np.nonzero(plan.contact_condim == 1)[0]
        cd3 = np.nonzero(plan.contact_condim >= 3)[0]

        if len(cd1):
            J = jnp.where(active[cd1, None], jn[cd1], 0.0)
            jv = J @ data.qvel
            aref = jnp.where(active[cd1], -b[cd1] * jv - k[cd1] * imp[cd1] * pos[cd1], 0.0)
            D = imp[cd1] / jnp.maximum(
                (1.0 - imp[cd1]) * invweight_n[cd1], 1e-12
            )
            rows_J.append(J)
            rows_aref.append(aref)
            rows_D.append(D)
            rows_pos.append(pos[cd1])
            rows_act.append(active[cd1])

        if len(cd3) and plan.cone == CONE_ELLIPTIC:
            # elliptic: condim rows per contact [normal, t1, t2], one block
            mu = contact.friction[cd3, :2]  # (n3, 2) tangential
            jn3, jt3 = jn[cd3], jt[cd3]
            J = jnp.concatenate([jn3[:, None], jt3], axis=1)  # (n3, 3, nv)
            J = jnp.where(active[cd3, None, None], J, 0.0)
            jv = jnp.einsum("crv,v->cr", J, data.qvel)
            aref = -b[cd3, None] * jv
            # normal row gets the position feedback term; friction rows don't
            aref = aref.at[:, 0].add(-k[cd3] * imp[cd3] * pos[cd3])
            aref = jnp.where(active[cd3, None], aref, 0.0)
            imp3 = imp[cd3]
            D_n = imp3 / jnp.maximum(
                (1.0 - imp3) * invweight_n[cd3], 1e-12
            )
            mu1 = jnp.maximum(mu[:, 0], 1e-12)
            D_f = D_n[:, None] * model.opt_impratio * (mu / mu1[:, None]) ** 2
            D = jnp.concatenate([D_n[:, None], D_f], axis=1)
            nrows = len(cd3) * 3
            rows_J.append(J.reshape(nrows, nv))
            rows_aref.append(aref.reshape(nrows))
            rows_D.append(D.reshape(nrows))
            rows_pos.append(
                jnp.stack(
                    [pos[cd3], jnp.zeros_like(pos[cd3]), jnp.zeros_like(pos[cd3])],
                    axis=1,
                ).reshape(nrows)
            )
            rows_act.append(jnp.repeat(active[cd3], 3))
            ell_mu = mu1
        elif len(cd3):
            # pyramid rows: jn +/- mu_i * jt_i for i in (0, 1)
            mu = contact.friction[cd3, :2]  # (n3, 2) tangential
            jn3, jt3 = jn[cd3], jt[cd3]
            pyr = []
            for i in range(2):
                pyr.append(jn3 + mu[:, i : i + 1] * jt3[:, i])
                pyr.append(jn3 - mu[:, i : i + 1] * jt3[:, i])
            J = jnp.stack(pyr, axis=1)  # (n3, 4, nv)
            J = jnp.where(active[cd3, None, None], J, 0.0)
            jv = jnp.einsum("crv,v->cr", J, data.qvel)
            aref = -b[cd3, None] * jv - (k[cd3] * imp[cd3] * pos[cd3])[:, None]
            aref = jnp.where(active[cd3, None], aref, 0.0)
            mu2 = jnp.repeat(mu, 2, axis=1)  # (n3, 4) row-wise mu
            invweight_pyr = invweight_n[cd3, None] * (
                1.0 + mu2**2
            ) * 2.0 * mu2**2 / model.opt_impratio
            imp3 = imp[cd3, None]
            D = imp3 / jnp.maximum((1.0 - imp3) * invweight_pyr, 1e-12)
            nrows = len(cd3) * 4
            rows_J.append(J.reshape(nrows, nv))
            rows_aref.append(aref.reshape(nrows))
            rows_D.append(D.reshape(nrows))
            rows_pos.append(jnp.repeat(pos[cd3], 4))
            rows_act.append(jnp.repeat(active[cd3], 4))

    if not rows_J:
        return EfcData(
            J=jnp.zeros((0, nv), dtype),
            aref=jnp.zeros(0, dtype),
            D=jnp.zeros(0, dtype),
            pos=jnp.zeros(0, dtype),
            active_row=jnp.zeros(0, bool),
            ell_mu=ell_mu,
        )
    return EfcData(
        J=jnp.concatenate(rows_J),
        aref=jnp.concatenate(rows_aref),
        D=jnp.concatenate(rows_D),
        pos=jnp.concatenate(rows_pos),
        active_row=jnp.concatenate(rows_act),
        ell_mu=ell_mu,
    )
