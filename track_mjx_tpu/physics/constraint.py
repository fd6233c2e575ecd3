"""Constraint row assembly: equality + frictionloss + joint limits + contacts.

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

from track_mjx_tpu.ops import quaternion as quat_ops
from track_mjx_tpu.physics.collision import Contact, contact_bodies
from track_mjx_tpu.physics.model import (
    CONE_ELLIPTIC,
    JNT_BALL,
    JNT_FREE,
    Data,
    Model,
    PhysicsPlan,
)

# Finite stand-in for an unbounded force limit: equality rows are bilateral
# (never clamped). Kept well under f32 max so kernel arithmetic can't overflow.
BIG_FORCE = 1e30


def _mv(j: jax.Array, v: jax.Array) -> jax.Array:
    """Row-wise J . v as an elementwise multiply-reduce over the last axis.

    TPU: this function runs per-env under the batch vmap, where a per-env
    matvec lowers to a batched GEMV — MXU tiles padded from a handful of
    rows to full 128-lane tiles (and 6 passes each under matmul precision
    "highest"). The broadcast-multiply + sum form fuses on the VPU at full
    f32 precision instead. Works for (nv,), (rows, nv) and (c, r, nv) J."""
    return jnp.sum(j * v, axis=-1)


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
    # per-row force bounds: force = clip(-D*jar, fmin, fmax). Equality rows
    # (-BIG, BIG); frictionloss rows (-fl, fl); unilateral rows (0, BIG).
    # Elliptic block rows carry (0, BIG) but are handled by the cone math.
    fmin: jax.Array  # (nefc,)
    fmax: jax.Array  # (nefc,)
    # Compact J-row operands for the fused TPU solve's in-VMEM J build
    # (round 4/5): J[limit l] = side_l * onehot(dofadr_l); J[contact c, dir k]
    # = (frame[c,k] . s[d] + (pos x frame)[c,k] . w[d]) * diff_mask[c,d]
    # with s = cdof_lin - cross(cdof_ang, root com), w = cdof_ang; pyramid
    # rows are jfr0 +/- mu_i jfr_{1+i}. The kernel rebuilds rows from these
    # (plus the STATIC diff_mask / limit one-hot tables derived from the
    # plan, solver._jb_static), so the dense J above — whose only other
    # consumer, jv for aref, reads these operands too — is dead-code-
    # eliminated by XLA on the fused TPU path. All None unless _jb_supported:
    # the layout represents exactly [limits | condim-3 pyramid rows], so
    # models with equality/frictionloss/condim-1/condim>3/elliptic rows must
    # not emit them (ADVICE r4 #3 — the gate enforces this contract).
    jb_sw: jax.Array | None = None  # (nv, 6) [s | w]
    jb_fq: jax.Array | None = None  # (ncon, 3, 6) [frame | pos x frame], active-masked
    jb_ll: jax.Array | None = None  # (nlimit,) side * active
    jb_mu: jax.Array | None = None  # (ncon, 2) tangential friction


def _jb_supported(plan: PhysicsPlan) -> bool:
    """True when the plan's efc row structure is exactly what the scalar
    kernel's in-VMEM J build represents: [joint-limit rows | contact-major
    condim-3 pyramid rows (+t1, -t1, +t2, -t2)]. Equality / frictionloss /
    condim-1 / condim>3 / elliptic rows have no slot in that layout."""
    return bool(
        plan.ncon > 0
        and plan.ne == 0
        and plan.nf == 0
        and plan.ncon_ell == 0
        and np.all(plan.contact_condim == 3)
    )


def _jb_supported_ell(plan: PhysicsPlan) -> bool:
    """Elliptic-kernel J build (round 5): row structure must be exactly
    [joint-limit rows | per-contact (normal, t1, t2) cone blocks] — i.e.
    every contact slot is an elliptic condim-3 block (the cone sections are
    then the frame-projected rows jfr[k] directly, no pyramid combination)
    and the scalar section is limits only."""
    return bool(
        plan.ncon > 0
        and plan.ne == 0
        and plan.nf == 0
        and plan.ncon_ell == plan.ncon
        and np.all(plan.contact_condim == 3)
    )


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

    # standard (positive solref) vs direct (non-positive).
    # C floors the time constant at 2*timestep (mj_assignRef): models whose
    # solref[0] <= 2*dt (e.g. the fly: solref 2e-4 at dt 2e-4) otherwise get a
    # 4x-stiffer contact than MuJoCo and launch on deep penetration.
    tc_eff = jnp.maximum(timeconst, 2.0 * model.opt_timestep)
    k_std = 1.0 / jnp.maximum(
        dmax * dmax * tc_eff * tc_eff * dampratio * dampratio, 1e-12
    )
    b_std = 2.0 / jnp.maximum(dmax * tc_eff, 1e-12)
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


def _body_point_jac(plan: PhysicsPlan, data: Data, body: int, point: jax.Array):
    """World point jacobian (jacp, jacr) of `body` at `point`, (nv, 3) each.

    Same cdof-based construction as mj_jac: translational rows are
    cdof_v + cdof_w x (point - root com), masked to the body's ancestor dofs.
    """
    mask = jnp.asarray(_dof_body_mask(plan)[body], data.qpos.dtype)  # (nv,)
    com = data.subtree_com[plan.body_rootid[plan.dof_bodyid]]  # (nv, 3)
    w, v = data.cdof[:, :3], data.cdof[:, 3:]
    jacp = (v + jnp.cross(w, point[None, :] - com)) * mask[:, None]
    jacr = w * mask[:, None]
    return jacp, jacr


def _poly(coef: jax.Array, x: jax.Array):
    """MuJoCo's quartic coupling polynomial and its derivative."""
    val = coef[0] + x * (coef[1] + x * (coef[2] + x * (coef[3] + x * coef[4])))
    deriv = coef[1] + x * (2 * coef[2] + x * (3 * coef[3] + x * 4 * coef[4]))
    return val, deriv


def _qpos_tangent(plan: PhysicsPlan, qpos: jax.Array, qvel: jax.Array):
    """d(qpos)/dt induced by qvel: identity on scalar joints, quaternion
    derivative qdot = 0.5 q*(0, w_local) on ball/free rotations."""
    out = jnp.zeros_like(qpos)
    scalar = np.nonzero(
        (plan.jnt_type != JNT_BALL) & (plan.jnt_type != JNT_FREE)
    )[0]
    if len(scalar):
        out = out.at[plan.jnt_qposadr[scalar]].set(
            qvel[plan.jnt_dofadr[scalar]]
        )
    for j in np.nonzero(plan.jnt_type == JNT_FREE)[0]:
        qadr, dadr = int(plan.jnt_qposadr[j]), int(plan.jnt_dofadr[j])
        out = out.at[qadr : qadr + 3].set(qvel[dadr : dadr + 3])
        w = jnp.concatenate([jnp.zeros(1, qpos.dtype), qvel[dadr + 3 : dadr + 6]])
        out = out.at[qadr + 3 : qadr + 7].set(
            0.5 * quat_ops.mul(qpos[qadr + 3 : qadr + 7], w)
        )
    for j in np.nonzero(plan.jnt_type == JNT_BALL)[0]:
        qadr, dadr = int(plan.jnt_qposadr[j]), int(plan.jnt_dofadr[j])
        w = jnp.concatenate([jnp.zeros(1, qpos.dtype), qvel[dadr : dadr + 3]])
        out = out.at[qadr : qadr + 4].set(
            0.5 * quat_ops.mul(qpos[qadr : qadr + 4], w)
        )
    return out


def _connect_weld_blocks(plan: PhysicsPlan, model: Model, data: Data):
    """(eq_id, J, pos, invweight_vec) blocks for connect (3 rows) and weld
    (6 rows) constraints, built from kinematics-complete `data`."""
    dtype = data.qpos.dtype
    blocks = []

    def _anchor(o, is_site, eq_anchor):
        """(body, world point) of one connect/weld end. Body mode: eq_data
        anchor in the body frame; site mode: the site's world position
        (eq_data ignored, as C does)."""
        if is_site:
            b = int(plan.site_bodyid[o])
            return b, data.site_xpos[o]
        return o, data.xpos[o] + data.xmat[o] @ eq_anchor

    for e, o1, o2, is_site in plan.eq_connect:
        b1, p1 = _anchor(o1, is_site, model.eq_data[e, 0:3])
        b2, p2 = _anchor(o2, is_site, model.eq_data[e, 3:6])
        jacp1, _ = _body_point_jac(plan, data, b1, p1)
        jacp2, _ = _body_point_jac(plan, data, b2, p2)
        J = (jacp1 - jacp2).T  # (3, nv)
        pos = p1 - p2
        iw_t = model.body_invweight0[b1, 0] + model.body_invweight0[b2, 0]
        blocks.append((e, J, pos, jnp.stack([iw_t] * 3)))

    for e, o1, o2, is_site in plan.eq_weld:
        ts = model.eq_data[e, 10]
        b1, p1 = _anchor(o1, is_site, model.eq_data[e, 3:6])
        b2, p2 = _anchor(o2, is_site, model.eq_data[e, 0:3])
        jacp1, jacr1 = _body_point_jac(plan, data, b1, p1)
        jacp2, jacr2 = _body_point_jac(plan, data, b2, p2)
        Jp = (jacp1 - jacp2).T
        pos_p = p1 - p2
        # rotation residual ts * vec(conj(q2) * q1 * relq); jacobian
        # 0.5 * ts * A (jacr1 - jacr2) with A e_i = vec(conj(q2) e_i q1r).
        # Site mode: q are the site frames (body quat * local site quat),
        # relpose is identity (C derives the rest pose from the site frames).
        if is_site:
            q1 = quat_ops.mul(data.xquat[b1], model.site_quat[o1])
            q2 = quat_ops.mul(data.xquat[b2], model.site_quat[o2])
            q1r = q1
        else:
            q1, q2 = data.xquat[o1], data.xquat[o2]
            q1r = quat_ops.mul(q1, model.eq_data[e, 6:10])
        q2inv = quat_ops.inv(q2)
        pos_r = ts * quat_ops.mul(q2inv, q1r)[1:]
        basis = jnp.eye(4, dtype=dtype)[1:]  # pure-vector unit quats
        A = jnp.stack(
            [quat_ops.mul(q2inv, quat_ops.mul(bq, q1r))[1:] for bq in basis],
            axis=1,
        )  # (3, 3): column i = vec(conj(q2) e_i q1r)
        Jr = 0.5 * ts * (A @ (jacr1 - jacr2).T)
        J = jnp.concatenate([Jp, Jr])
        pos = jnp.concatenate([pos_p, pos_r])
        iw_t = model.body_invweight0[b1, 0] + model.body_invweight0[b2, 0]
        iw_r = model.body_invweight0[b1, 1] + model.body_invweight0[b2, 1]
        blocks.append((e, J, pos, jnp.stack([iw_t] * 3 + [iw_r] * 3)))

    return blocks


def _connect_weld_jdot_qvel(plan: PhysicsPlan, model: Model, data: Data):
    """Exact Jdot @ qvel for the stacked connect/weld rows via jvp through
    kinematics: d/dt [J(qpos(t)) @ qvel] at fixed qvel. C adds this
    second-order term to connect/weld aref (mj_referenceConstraint consumes
    efc_vel built with jacDot for these rows; probe-verified: the residual
    aref - (-B*vel - K*I*pos) equals -Jdot@qvel to f32 roundoff)."""
    from track_mjx_tpu.physics import com as _com
    from track_mjx_tpu.physics import kinematics as _kinematics

    qvel = data.qvel

    def vel_rows(qpos):
        d = _kinematics.kinematics(plan, model, data.replace(qpos=qpos))
        d = _com.com_pos(plan, model, d)
        blocks = _connect_weld_blocks(plan, model, d)
        return jnp.concatenate([J @ qvel for _, J, _, _ in blocks])

    tangent = _qpos_tangent(plan, data.qpos, qvel)
    _, jdot_qvel = jax.jvp(vel_rows, (data.qpos,), (tangent,))
    return jdot_qvel


def _equality_rows(plan: PhysicsPlan, model: Model, data: Data):
    """Equality constraint rows (mj_instantiateEquality parity, probe-verified
    against C: J/pos/aref/D match to f32 for connect/weld/joint/tendon).

    Impedance is evaluated on the NORM of the constraint's residual vector
    (all of its rows), as C does; row impedances within one constraint are
    equal. Weld rotation rows bake torquescale into J and pos. Connect/weld
    aref carries the second-order -Jdot@qvel term C applies to those rows
    (joint/tendon equality rows do not get it, matching C). Blocks are
    emitted in eq-id order, matching C's efc row order for mixed types.
    """
    dtype = data.qpos.dtype
    nv = plan.nv
    out = []  # (eq_id, J, aref, D, pos) blocks

    def kbi_norm(e, res):
        norm = jnp.sqrt(jnp.maximum(jnp.sum(res * res), 1e-30))
        return _kbi(model, model.eq_solref[e], model.eq_solimp[e], norm)

    cw_blocks = _connect_weld_blocks(plan, model, data)
    if cw_blocks:
        jdot_qvel = _connect_weld_jdot_qvel(plan, model, data)
        row0 = 0
        for e, J, pos, iw in cw_blocks:
            nrow = J.shape[0]
            k, b, imp = kbi_norm(e, pos)
            vel = _mv(J, data.qvel)
            jdot = jdot_qvel[row0 : row0 + nrow]
            row0 += nrow
            aref = -b * vel - k * imp * pos - jdot
            D = imp / jnp.maximum((1.0 - imp) * iw, 1e-12)
            out.append((e, J, aref, D.astype(dtype), pos))

    for e, j1, j2 in plan.eq_joint:
        d1, q1adr = int(plan.jnt_dofadr[j1]), int(plan.jnt_qposadr[j1])
        pos1 = data.qpos[q1adr] - model.qpos0[q1adr]
        J = jnp.zeros(nv, dtype).at[d1].set(1.0)
        if j2 >= 0:
            d2, q2adr = int(plan.jnt_dofadr[j2]), int(plan.jnt_qposadr[j2])
            dif = data.qpos[q2adr] - model.qpos0[q2adr]
            val, deriv = _poly(model.eq_data[e], dif)
            pos = pos1 - val
            J = J.at[d2].set(-deriv)
            invweight = model.dof_invweight0[d1] + model.dof_invweight0[d2]
        else:
            pos = pos1 - model.eq_data[e, 0]
            invweight = model.dof_invweight0[d1]
        k, b, imp = kbi_norm(e, pos)
        aref = -b * _mv(J, data.qvel) - k * imp * pos
        D = imp / jnp.maximum((1.0 - imp) * invweight, 1e-12)
        out.append((e, J[None], aref[None], D[None], pos[None]))

    if plan.eq_tendon:
        lengths = model.tendon_length_mat @ data.qpos + model.tendon_length0_const
        for e, t1, t2 in plan.eq_tendon:
            pos1 = lengths[t1] - model.tendon_length0[t1]
            J = model.tendon_moment[t1]
            if t2 >= 0:
                dif = lengths[t2] - model.tendon_length0[t2]
                val, deriv = _poly(model.eq_data[e], dif)
                pos = pos1 - val
                J = J - deriv * model.tendon_moment[t2]
                invweight = (
                    model.tendon_invweight0[t1] + model.tendon_invweight0[t2]
                )
            else:
                pos = pos1 - model.eq_data[e, 0]
                invweight = model.tendon_invweight0[t1]
            k, b, imp = kbi_norm(e, pos)
            aref = -b * _mv(J, data.qvel) - k * imp * pos
            D = imp / jnp.maximum((1.0 - imp) * invweight, 1e-12)
            out.append((e, J[None], aref[None], D[None], pos[None]))

    out.sort(key=lambda block: block[0])
    return [block[1:] for block in out]


def _friction_rows(plan: PhysicsPlan, model: Model, data: Data):
    """Dof/tendon frictionloss rows: pos = 0 always, K forced to 0
    (aref = -B * vel), force box-clamped to +/- frictionloss by the solver."""
    dtype = data.qpos.dtype
    nv = plan.nv
    out = []  # (J, aref, D, floss) blocks

    ids = plan.friction_dof_ids
    if len(ids):
        J = jnp.zeros((len(ids), nv), dtype).at[jnp.arange(len(ids)), ids].set(1.0)
        zero = jnp.zeros(len(ids), dtype)
        _, b, imp = _kbi(
            model, model.dof_solref_fri[ids], model.dof_solimp_fri[ids], zero
        )
        aref = -b * data.qvel[ids]
        D = imp / jnp.maximum((1.0 - imp) * model.dof_invweight0[ids], 1e-12)
        out.append((J, aref, D, model.dof_frictionloss[ids]))

    tids = plan.friction_tendon_ids
    if len(tids):
        J = model.tendon_moment[tids]
        zero = jnp.zeros(len(tids), dtype)
        _, b, imp = _kbi(
            model,
            model.tendon_solref_fri[tids],
            model.tendon_solimp_fri[tids],
            zero,
        )
        aref = -b * _mv(J, data.qvel)
        D = imp / jnp.maximum(
            (1.0 - imp) * model.tendon_invweight0[tids], 1e-12
        )
        out.append((J, aref, D, model.tendon_frictionloss[tids]))

    return out


def make_constraint(
    plan: PhysicsPlan, model: Model, data: Data, contact: Contact
) -> EfcData:
    """Assembles all efc rows with static shapes (C row order: equality,
    frictionloss, limits, contacts)."""
    dtype = data.qpos.dtype
    nv = plan.nv
    rows_J, rows_aref, rows_D, rows_pos, rows_act = [], [], [], [], []
    rows_fmin, rows_fmax = [], []
    ell_mu = jnp.zeros(0, dtype)
    jb_sw = jb_fq = jb_ll = jb_mu = None
    jb_ok = _jb_supported(plan)
    # elliptic variant: sw/fq/ll feed the elliptic kernel's J build (no mu —
    # cone rows are the frame-projected rows directly)
    jb_any = jb_ok or _jb_supported_ell(plan)

    def push(J, aref, D, pos, act, fmin, fmax):
        rows_J.append(J)
        rows_aref.append(aref)
        rows_D.append(D)
        rows_pos.append(pos)
        rows_act.append(act)
        rows_fmin.append(jnp.broadcast_to(fmin, D.shape).astype(dtype))
        rows_fmax.append(jnp.broadcast_to(fmax, D.shape).astype(dtype))

    # --- equality rows (bilateral, always active) ---
    for J, aref, D, pos in _equality_rows(plan, model, data):
        push(J, aref, D, pos, jnp.ones(D.shape, bool), -BIG_FORCE, BIG_FORCE)

    # --- frictionloss rows (box-clamped force) ---
    for J, aref, D, floss in _friction_rows(plan, model, data):
        push(
            J,
            aref,
            D,
            jnp.zeros(D.shape, dtype),
            jnp.ones(D.shape, bool),
            -floss,
            floss,
        )

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
        # jv without touching J: a one-hot row dotted with qvel is exactly
        # side * qvel[dofadr] (bit-identical — the masked row's other
        # products are 0.0 and x + 0.0 == x in f32), and keeping J out of
        # the jv dataflow lets XLA drop the dense row build entirely when
        # the fused solve assembles J in VMEM (jb_* operands below).
        jv = side * data.qvel[dadr]
        aref = -b * jv - k * imp * pos
        if jb_any:
            jb_ll = jnp.where(active, side, 0.0)
        invweight = model.dof_invweight0[dadr]
        D = imp / jnp.maximum((1.0 - imp) * invweight, 1e-12)

        push(J, jnp.where(active, aref, 0.0), D, pos, active, 0.0, BIG_FORCE)

    # --- contacts: pyramidal friction cone ---
    ncon = plan.ncon
    if ncon:
        geom1, geom2, body1, body2 = contact_bodies(plan)
        body_mask = jnp.asarray(_dof_body_mask(plan), dtype=dtype)
        diff_mask = body_mask[body2] - body_mask[body1]  # (ncon, nv)

        # Frame-projected per-dof point jacobian at contact pos, computed
        # WITHOUT the (ncon, nv, 3) jacp / (ncon, 3, nv, 3) product
        # intermediates (round-4 trace: those materializations made this
        # stage 28% of rollout device time). Triple-product identity:
        #   frame . (v + w x (p - com)) = frame . (v - w x com)
        #                               + (p x frame) . w
        # so the projection is two (3*ncon, 3) @ (3, nv) contractions of
        # trace-small operands.
        com = data.subtree_com[plan.body_rootid[plan.dof_bodyid]]  # (nv, 3)
        w, v = data.cdof[:, :3], data.cdof[:, 3:]
        s = v - jnp.cross(w, com)  # (nv, 3)
        q = jnp.cross(contact.pos[:, None, :], contact.frame)  # (ncon, 3, 3)

        def project(a_cd3, b_i3):
            # sum_k a[c,d,k] b[i,k] as a fused VPU multiply-reduce: einsum
            # here lowers to MXU-padded tiny dot_generals at 6-pass
            # "highest" precision (measured 31% of the FLY's rollout), while
            # the k=3 broadcast-reduce fuses into one loop (see _mv)
            return jnp.sum(
                a_cd3[:, :, None, :] * b_i3[None, None, :, :], axis=-1
            )

        jfr = (project(contact.frame, s) + project(q, w)) * diff_mask[
            :, None, :
        ]  # (ncon, 3, nv)
        jn = jfr[:, 0]  # normal rows
        jt = jfr[:, 1:]  # (ncon, 2, nv)

        # jv for the frame rows WITHOUT reading jfr: fold qvel and the
        # (static) diff_mask into per-contact 3-vectors first —
        #   jv[c,k] = sum_d jfr[c,k,d] qvel[d]
        #           = frame[c,k] . (dm[c] (s*qvel)) + (p x frame)[c,k] . (dm[c] (w*qvel))
        # This keeps the materialized J/jfr out of every aref below, so the
        # whole dense build DCEs away when the fused TPU solve assembles J
        # in VMEM from the compact jb_* operands (reassociated sum — covered
        # by the golden regen noted in the commit).
        sqv = s * data.qvel[:, None]  # (nv, 3)
        wqv = w * data.qvel[:, None]
        sv = jnp.sum(diff_mask[:, :, None] * sqv[None, :, :], axis=1)
        wv = jnp.sum(diff_mask[:, :, None] * wqv[None, :, :], axis=1)
        jv3 = _mv(contact.frame, sv[:, None, :]) + _mv(q, wv[:, None, :])
        # rotational directions (condim 4/6): jrot[c,k] . qvel = frame[c,k] . wv
        jv_rot = _mv(contact.frame, wv[:, None, :])

        pos = contact.dist - contact.includemargin
        active = contact.dist < contact.includemargin
        if jb_any:
            # compact J-build operands for the fused TPU solve (see EfcData;
            # emission is gated on _jb_supported(_ell) so the None contract
            # holds); mu feeds only the scalar kernel's pyramid combination
            jb_sw = jnp.concatenate([s, w], axis=1)  # (nv, 6)
            jb_fq = jnp.concatenate([contact.frame, q], axis=-1) * active[
                :, None, None
            ].astype(dtype)
            if jb_ok:
                jb_mu = contact.friction[:, :2].astype(dtype)
        # rotational rows (torsional/rolling friction, condim 4/6): the
        # angular jacobian difference projected on the contact frame
        if plan.condim > 3:
            jrot = project(contact.frame, w) * diff_mask[:, None, :]
            jdirs = jnp.concatenate([jt, jrot], axis=1)  # (ncon, 5, nv)
        else:
            jdirs = jt

        k, b, imp = _kbi(model, contact.solref, contact.solimp, pos)

        invweight_n = (
            model.body_invweight0[body1, 0] + model.body_invweight0[body2, 0]
        )

        # static split of contact slots by condim
        cd1 = np.nonzero(plan.contact_condim == 1)[0]
        cd3 = np.nonzero(plan.contact_condim >= 3)[0]

        if len(cd1):
            J = jnp.where(active[cd1, None], jn[cd1], 0.0)
            jv = jv3[cd1, 0]
            aref = jnp.where(active[cd1], -b[cd1] * jv - k[cd1] * imp[cd1] * pos[cd1], 0.0)
            D = imp[cd1] / jnp.maximum(
                (1.0 - imp[cd1]) * invweight_n[cd1], 1e-12
            )
            push(J, aref, D, pos[cd1], active[cd1], 0.0, BIG_FORCE)

        if len(cd3) and plan.cone == CONE_ELLIPTIC:
            # elliptic: condim rows per contact [normal, t1, t2], one block
            mu = contact.friction[cd3, :2]  # (n3, 2) tangential
            jn3, jt3 = jn[cd3], jt[cd3]
            J = jnp.concatenate([jn3[:, None], jt3], axis=1)  # (n3, 3, nv)
            J = jnp.where(active[cd3, None, None], J, 0.0)
            jv = jnp.where(active[cd3, None], jv3[cd3], 0.0)
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
            push(
                J.reshape(nrows, nv),
                aref.reshape(nrows),
                D.reshape(nrows),
                jnp.stack(
                    [pos[cd3], jnp.zeros_like(pos[cd3]), jnp.zeros_like(pos[cd3])],
                    axis=1,
                ).reshape(nrows),
                jnp.repeat(active[cd3], 3),
                0.0,
                BIG_FORCE,
            )
            ell_mu = mu1
        elif len(cd3):
            # pyramid rows: jn +/- mu_i * jdir_i, 2*(condim-1) rows per
            # contact. Friction dims beyond the two tangentials are the
            # rotational (torsional/rolling) directions for condim 4/6;
            # contacts are grouped by condim at trace time so each group
            # emits a uniform row block.
            for cdim in sorted(set(int(c) for c in plan.contact_condim[cd3])):
                grp = cd3[plan.contact_condim[cd3] == cdim]
                nfr = cdim - 1  # friction directions
                mu = contact.friction[grp, :nfr]  # (ng, nfr)
                jng, jdg = jn[grp], jdirs[grp]
                pyr = []
                for i in range(nfr):
                    pyr.append(jng + mu[:, i : i + 1] * jdg[:, i])
                    pyr.append(jng - mu[:, i : i + 1] * jdg[:, i])
                J = jnp.stack(pyr, axis=1)  # (ng, 2*nfr, nv)
                J = jnp.where(active[grp, None, None], J, 0.0)
                # pyramid jv from the base-direction jv's (J is linear in
                # them): rows are jvn +/- mu_i * jv_dir_i
                jv_dirs = jnp.concatenate(
                    [jv3[grp, 1:], jv_rot[grp, : nfr - 2]], axis=1
                ) if nfr > 2 else jv3[grp, 1 : 1 + nfr]
                jvn = jv3[grp, 0]
                jv = jnp.stack(
                    sum(
                        (
                            [jvn + mu[:, i] * jv_dirs[:, i],
                             jvn - mu[:, i] * jv_dirs[:, i]]
                            for i in range(nfr)
                        ),
                        [],
                    ),
                    axis=1,
                )  # (ng, 2*nfr)
                jv = jnp.where(active[grp, None], jv, 0.0)
                aref = (
                    -b[grp, None] * jv - (k[grp] * imp[grp] * pos[grp])[:, None]
                )
                aref = jnp.where(active[grp, None], aref, 0.0)
                # C regularizes every pyramid row with the FIRST friction
                # coefficient (mj_instantiateContact uses friction[0] for
                # all 2*(condim-1) rows); per-dim mu appears only in J
                mu0 = mu[:, 0:1]  # (ng, 1)
                invweight_pyr = invweight_n[grp, None] * (
                    1.0 + mu0**2
                ) * 2.0 * mu0**2 / model.opt_impratio
                impg = imp[grp, None]
                D = jnp.broadcast_to(
                    impg / jnp.maximum((1.0 - impg) * invweight_pyr, 1e-12),
                    (len(grp), 2 * nfr),
                )
                nrows = len(grp) * 2 * nfr
                push(
                    J.reshape(nrows, nv),
                    aref.reshape(nrows),
                    D.reshape(nrows),
                    jnp.repeat(pos[grp], 2 * nfr),
                    jnp.repeat(active[grp], 2 * nfr),
                    0.0,
                    BIG_FORCE,
                )

    if not rows_J:
        return EfcData(
            J=jnp.zeros((0, nv), dtype),
            aref=jnp.zeros(0, dtype),
            D=jnp.zeros(0, dtype),
            pos=jnp.zeros(0, dtype),
            active_row=jnp.zeros(0, bool),
            ell_mu=ell_mu,
            fmin=jnp.zeros(0, dtype),
            fmax=jnp.zeros(0, dtype),
        )
    return EfcData(
        J=jnp.concatenate(rows_J),
        aref=jnp.concatenate(rows_aref),
        D=jnp.concatenate(rows_D),
        pos=jnp.concatenate(rows_pos),
        active_row=jnp.concatenate(rows_act),
        ell_mu=ell_mu,
        fmin=jnp.concatenate(rows_fmin),
        fmax=jnp.concatenate(rows_fmax),
        jb_sw=jb_sw,
        jb_fq=jb_fq,
        jb_ll=jb_ll,
        jb_mu=jb_mu,
    )
