"""Constraint solvers (MuJoCo mjSOL_CG + mjSOL_NEWTON parity, dense TPU layout).

Minimizes the soft-constraint objective over qacc:

    phi(x) = 0.5 (x - qacc_smooth)^T M (x - qacc_smooth) + s(J x - aref)

where s() sums per-constraint costs. Scalar rows carry per-row force bounds
(force = clip(-D*jar, fmin, fmax)): unilateral rows (joint limits, condim-1
contacts, pyramidal friction rows; bounds (0, inf)) contribute
0.5*D_i*jar_i^2 when jar_i < 0; equality rows (bounds (-inf, inf)) always;
dof/tendon frictionloss rows (bounds (-fl, fl)) quadratically in the middle
zone and linearly outside. Elliptic cone blocks (cone="elliptic", condim-3
contacts)
contribute the cone cost reverse-engineered from MuJoCo's mj_constraintUpdate:
the contact force is the projection of -D∘u onto the friction cone
{f : f_n >= ||(f_t_i / mu_i)||} in the D^-1 metric. Because MuJoCo sets
D_fric_i = D_n * impratio * (mu_i/mu_1)^2, the projection is closed-form: in
the scaled space g_i = f_i/sqrt(D_i) the cone is circular with half-angle
mu_tilde = mu_1/sqrt(impratio) and the metric is Euclidean, giving the
classic three-zone (top/bottom/middle) second-order-cone projection. The
cost is s(u) = 0.5 u^T D u - 0.5 dist^2(p, cone) with p = -sqrt(D)∘u, and
ds/du = -force in every zone (verified numerically against
mj_constraintUpdate: cost, force, and zone labels all match).

Search directions use M-preconditioned Polak-Ribiere CG; the 1D linesearch
runs `ls_iterations` safeguarded Newton steps on phi(alpha) with exact first
and second directional derivatives (including the cone-Hessian middle-zone
term), matching the iteration structure MuJoCo configures through
opt.iterations/ls_iterations (reference sets cg/5/5:
track_mjx/config/rodent-full-clips.yaml:12-14 via
single_clip_tracking.py:65-72).

Everything is fixed-trip-count fori_loops over small dense matmuls — the
whole batched solve compiles to MXU-friendly XLA with no dynamic control flow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from track_mjx_tpu.ops import batched_linalg, cg_solver_kernel
from track_mjx_tpu.physics import inertia
from track_mjx_tpu.physics.constraint import EfcData
from track_mjx_tpu.physics.model import Data, Model, PhysicsPlan

_EPS = 1e-12

# Kill-switch for the in-kernel J build (A/B benching via
# TRACK_MJX_J_BUILD=0; the dispatch also gates on EfcData.jb_* presence and
# the kernel's VMEM budget).
import os as _os

J_BUILD = _os.environ.get("TRACK_MJX_J_BUILD", "1") != "0"


def _scalar_zone(jar, d, fmin, fmax):
    """Box-clamped scalar-row force and quadratic-zone mask.

    force = clip(-D*jar, fmin, fmax). Unilateral rows (fmin=0) reduce to
    where(jar<0, -D*jar, 0); equality rows (fmin=-BIG) are never clamped;
    frictionloss rows saturate at +/- frictionloss — the three-zone friction
    cost of mj_constraintUpdate."""
    f_un = -d * jar
    f = jnp.clip(f_un, fmin, fmax)
    quad = (f_un > fmin) & (f_un < fmax)
    return f, quad


def _scalar_cost_bounded(jar, d, fmin, fmax):
    """Per-row cost: quadratic inside the force box, linear outside
    (cost = |f_clamp|*|jar| - f_clamp^2/(2D), continuous at the boundary)."""
    f, quad = _scalar_zone(jar, d, fmin, fmax)
    lin = -f * jar - 0.5 * f * f / jnp.maximum(d, _EPS)
    return jnp.where(quad, 0.5 * d * jar * jar, lin)


# ---------------------------------------------------------------------------
# scalar-row (pyramidal/limits) solve: per-env function + fused-kernel dispatch
# ---------------------------------------------------------------------------


def _scalar_cg_single(
    iterations, ls_iterations, qm, qld, j, aref, d, smooth, warm, tol,
    fmin=None, fmax=None,
):
    """One env's CG solve over scalar rows -> (x, force, qfrc).

    With fmin/fmax None (all rows unilateral: limits/condim-1/pyramidal) this
    is the numerics-pinned path: op ordering matches round 1 exactly (golden
    trajectory tests); the fused TPU kernel mirrors it. With bounds given,
    rows are box-clamped (equality / frictionloss models)."""
    bounded = fmin is not None

    def cost(x):
        dx = x - smooth
        jar = j @ x - aref
        if bounded:
            rows = jnp.sum(_scalar_cost_bounded(jar, d, fmin, fmax))
        else:
            rows = 0.5 * jnp.sum(jnp.where(jar < 0, d * jar * jar, 0.0))
        return 0.5 * jnp.dot(dx, qm @ dx) + rows

    def force_of(jar):
        if bounded:
            return _scalar_zone(jar, d, fmin, fmax)[0]
        return jnp.where(jar < 0, -d * jar, 0.0)

    def cost_grad(x):
        jar = j @ x - aref
        grad = qm @ (x - smooth) - j.T @ force_of(jar)
        return jar, grad

    def linesearch(x, p):
        mp = qm @ p
        pmp = jnp.dot(p, mp)
        dmx = jnp.dot(p, qm @ (x - smooth))
        jp = j @ p
        jar0 = j @ x - aref

        def phi_derivs(alpha):
            jar = jar0 + alpha * jp
            if bounded:
                f, quad = _scalar_zone(jar, d, fmin, fmax)
                d1 = alpha * pmp + dmx + jnp.sum(
                    jnp.where(quad, d * jar * jp, -f * jp)
                )
                d2 = pmp + jnp.sum(jnp.where(quad, d * jp * jp, 0.0))
                return d1, jnp.maximum(d2, _EPS)
            active = jar < 0
            d1 = alpha * pmp + dmx + jnp.sum(
                jnp.where(active, d * jar * jp, 0.0)
            )
            d2 = pmp + jnp.sum(jnp.where(active, d * jp * jp, 0.0))
            return d1, jnp.maximum(d2, _EPS)

        d1, d2 = phi_derivs(0.0)
        alpha = -d1 / d2

        def newton_body(_, alpha):
            d1, d2 = phi_derivs(alpha)
            return alpha - d1 / d2

        return jax.lax.fori_loop(0, ls_iterations, newton_body, alpha)

    x0 = jnp.where(cost(warm) < cost(smooth), warm, smooth)
    jar0, grad0 = cost_grad(x0)
    mgrad0 = batched_linalg.cho_solve(qld, grad0)
    state = _CGState(
        x=x0,
        jar=jar0,
        grad=grad0,
        mgrad=mgrad0,
        p=-mgrad0,
        improved=jnp.array(True),
    )

    meaninertia = jnp.mean(jnp.diag(qm))
    nv = smooth.shape[-1]
    scale = jnp.maximum(meaninertia * jnp.asarray(nv, smooth.dtype), _EPS)

    def body(_, s):
        alpha = linesearch(s.x, s.p)
        x = s.x + alpha * s.p
        jar, grad = cost_grad(x)
        mgrad = batched_linalg.cho_solve(qld, grad)
        num = jnp.dot(grad, mgrad - s.mgrad)
        den = jnp.maximum(jnp.dot(s.grad, s.mgrad), _EPS)
        beta = jnp.maximum(0.0, num / den)
        p = -mgrad + beta * s.p
        improved = jnp.linalg.norm(grad) / scale > tol
        keep = s.improved
        new = _CGState(x=x, jar=jar, grad=grad, mgrad=mgrad, p=p, improved=improved)
        return jax.tree.map(lambda a, b: jnp.where(keep, a, b), new, s)

    state = jax.lax.fori_loop(0, iterations, body, state)
    force = force_of(state.jar)
    return state.x, force, j.T @ force


def fused_scalar_cg(plan: PhysicsPlan) -> bool:
    """True when the model solves through the fused smooth+CG op: CG solver,
    unilateral scalar rows only (limits / condim-1 / pyramidal — the rodent
    workload). These models skip factor_m/solve_m in forward(): the op owns
    factorization and the qacc_smooth solve on every backend (data.qLD is
    never materialized for them)."""
    return bool(
        plan.nefc > 0
        and plan.solver == 1
        and plan.ncon_ell == 0
        and not (plan.ne or plan.nf)
    )


def fused_elliptic_cg(plan: PhysicsPlan) -> bool:
    """True when the model solves through the fused elliptic smooth+CG op:
    CG solver, unilateral scalar rows plus elliptic cone blocks, no equality
    or frictionloss rows (the fly workload, fruitfly_force_fast.xml). Same
    contract as fused_scalar_cg: the op owns factorization and the
    qacc_smooth solve; forward() skips factor_m/solve_m."""
    return bool(
        plan.nefc > 0
        and plan.solver == 1
        and plan.ncon_ell > 0
        and not (plan.ne or plan.nf)
    )


def fused_cg(plan: PhysicsPlan) -> bool:
    """Any fused whole-CG plan (scalar or elliptic): forward() must not
    materialize qLD / qacc_smooth — the solve op produces them."""
    return fused_scalar_cg(plan) or fused_elliptic_cg(plan)


def fused_euler(plan: PhysicsPlan) -> bool:
    """True when the fused CG op also performs the Euler integrator's
    implicit-damping solve (M + h diag(damping))^-1 in the same kernel
    invocation, exported as data.qacc_eff — forward.euler() must consume it
    instead of dispatching a second factorization.

    Covers both fused variants. History: with the original per-row
    substitution the elliptic mirror measured a 15% fly regression and was
    gated to scalar-only; the blocked substitution (round 4, late) removed
    the cause and the elliptic arm re-measured as a win."""
    return fused_cg(plan) and plan.integrator == 0  # forward.INT_EULER


def _smooth_scalar_cg_single(
    iterations, ls_iterations, with_euler, qm, j, aref, d, qfrc_smooth, warm,
    tol, hd
):
    """One env's factor + smooth solve + CG -> (qacc_smooth, x, force, qfrc
    [, qacc_eff]).

    The call sequence (cholesky -> cho_solve -> _scalar_cg_single) is exactly
    the pre-fusion forward flow, so non-TPU numerics are unchanged; the
    optional Euler solve matches forward._euler_impl's former
    solve_spd(qM + diag(hd), rhs) factor-then-substitute sequence."""
    qld = batched_linalg.cholesky(qm)
    smooth = batched_linalg.cho_solve(qld, qfrc_smooth)
    x, force, qfrc = _scalar_cg_single(
        iterations, ls_iterations, qm, qld, j, aref, d, smooth, warm, tol
    )
    if not with_euler:
        return smooth, x, force, qfrc
    mh = qm + jnp.diag(hd)
    eff = batched_linalg.cho_solve(
        batched_linalg.cholesky(mh), qfrc_smooth + qfrc
    )
    return smooth, x, force, qfrc, eff


@functools.lru_cache(maxsize=None)
def _jb_static(plan: PhysicsPlan):
    """Trace-time constant tables for the in-kernel J build (numpy):
    dm (ncon, nv) — per-contact dof difference mask body2 − body1 (the same
    diff_mask constraint.py folds into its dense rows); lim1h (nlimit, nv) —
    one-hot limit rows at each limited joint's dof (the per-env side·active
    factor rides in efc.jb_ll)."""
    import numpy as np

    from track_mjx_tpu.physics.collision import contact_bodies
    from track_mjx_tpu.physics.constraint import _dof_body_mask

    _, _, body1, body2 = contact_bodies(plan)
    bm = _dof_body_mask(plan)
    dm = bm[body2] - bm[body1]
    jids = plan.limited_jnt_ids
    lim1h = np.zeros((plan.nlimit, plan.nv))
    if len(jids):
        lim1h[np.arange(len(jids)), plan.jnt_dofadr[jids]] = 1.0
    return dm, lim1h


@functools.lru_cache(maxsize=None)
def _make_scalar_cg_op(
    iterations: int, ls_iterations: int, with_euler: bool, jb_dims=None
):
    plain_ = functools.partial(
        _smooth_scalar_cg_single, iterations, ls_iterations, with_euler
    )
    n_out = 5 if with_euler else 4

    if jb_dims is None:

        def plain(qm, j, aref, d, qfrc_smooth, warm, tol, hd, buf, cdof, anc, arm):
            # the dense path consumes qM directly; the CRB factors feed only
            # the TPU kernel's in-VMEM assembly (unused args DCE away)
            return plain_(qm, j, aref, d, qfrc_smooth, warm, tol, hd)

        @jax.custom_batching.custom_vmap
        def op(qm, j, aref, d, qfrc_smooth, warm, tol, hd, buf, cdof, anc, arm):
            return plain(qm, j, aref, d, qfrc_smooth, warm, tol, hd, buf, cdof, anc, arm)

        @op.def_vmap
        def _vmap(
            axis_size, in_batched, qm, j, aref, d, qfrc_smooth, warm, tol, hd,
            buf, cdof, anc, arm,
        ):
            args = [qm, j, aref, d, qfrc_smooth, warm, tol, hd, buf, cdof, anc, arm]
            per_env = in_batched[:6]
            n = qfrc_smooth.shape[-1]
            e = aref.shape[-1]
            tol_scalar = tol[0] if in_batched[6] else tol
            if (
                all(per_env)
                and in_batched[8]
                and in_batched[9]
                and cg_solver_kernel.kernel_available(n, e)
            ):
                hd_b = (
                    hd
                    if in_batched[7]
                    else jnp.broadcast_to(hd, (axis_size,) + jnp.shape(hd))
                )
                anc_u = anc[0] if in_batched[10] else anc
                arm_u = arm[0] if in_batched[11] else arm
                out = cg_solver_kernel._cg_solve_tpu(
                    qm, j, aref, d, qfrc_smooth, warm, tol_scalar,
                    hd=hd_b if with_euler else None,
                    crb=(buf, cdof, anc_u, arm_u),
                    iterations=iterations, ls_iterations=ls_iterations,
                )
                return out, (True,) * n_out
            args = [
                a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
                for a, b in zip(args, in_batched)
            ]
            return jax.vmap(plain)(*args), (True,) * n_out

        return op

    # jb variant (round 5): six extra operands feed the kernel's in-VMEM J
    # build — fq/sw/ll/mu per env, dm/lim1h trace-time constants. The dense
    # J stays in the op signature so the non-kernel fallback is unchanged;
    # on the kernel path it is an ignored input and its XLA-side assembly
    # dead-codes away (the same contract as qm under the CRB build).
    nl, _ = jb_dims

    def plain(qm, j, aref, d, qfrc_smooth, warm, tol, hd, buf, cdof, anc,
              arm, fq, sw, ll, mu, dm, lim1h):
        return plain_(qm, j, aref, d, qfrc_smooth, warm, tol, hd)

    @jax.custom_batching.custom_vmap
    def op(qm, j, aref, d, qfrc_smooth, warm, tol, hd, buf, cdof, anc, arm,
           fq, sw, ll, mu, dm, lim1h):
        return plain(qm, j, aref, d, qfrc_smooth, warm, tol, hd, buf, cdof,
                     anc, arm, fq, sw, ll, mu, dm, lim1h)

    @op.def_vmap
    def _vmap(
        axis_size, in_batched, qm, j, aref, d, qfrc_smooth, warm, tol, hd,
        buf, cdof, anc, arm, fq, sw, ll, mu, dm, lim1h,
    ):
        args = [qm, j, aref, d, qfrc_smooth, warm, tol, hd, buf, cdof, anc,
                arm, fq, sw, ll, mu, dm, lim1h]
        per_env = in_batched[:6]
        n = qfrc_smooth.shape[-1]
        e = aref.shape[-1]
        tol_scalar = tol[0] if in_batched[6] else tol
        if (
            all(per_env)
            and in_batched[8]
            and in_batched[9]
            and cg_solver_kernel.kernel_available(n, e, jb_dims)
        ):
            def bcast(a, b):
                # env-INDEPENDENT jb operands (e.g. mu — contact friction is
                # a model constant) arrive unbatched under the env vmap;
                # broadcast them rather than silently dropping to the
                # per-env XLA fallback (a 2.5x regression the round-5 trace
                # caught: the mu gate rejected the kernel on every step)
                return a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))

            hd_b = bcast(hd, in_batched[7])
            anc_u = anc[0] if in_batched[10] else anc
            arm_u = arm[0] if in_batched[11] else arm
            dm_u = dm[0] if in_batched[16] else dm
            lim1h_u = lim1h[0] if in_batched[17] else lim1h
            out = cg_solver_kernel._cg_solve_tpu(
                qm, j, aref, d, qfrc_smooth, warm, tol_scalar,
                hd=hd_b if with_euler else None,
                crb=(buf, cdof, anc_u, arm_u),
                jb=(
                    bcast(fq, in_batched[12]),
                    bcast(sw, in_batched[13]),
                    bcast(ll, in_batched[14]) if nl else ll,
                    bcast(mu, in_batched[15]),
                    dm_u,
                    lim1h_u,
                ),
                jb_dims=jb_dims,
                iterations=iterations, ls_iterations=ls_iterations,
            )
            return out, (True,) * n_out
        args = [
            a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
            for a, b in zip(args, in_batched)
        ]
        return jax.vmap(plain)(*args), (True,) * n_out

    return op


class _PlanView(NamedTuple):
    """Duck-typed stand-in for the PhysicsPlan fields the row-math helpers
    read (_split / _force / _cost_rows / _linesearch), used by the fused
    elliptic op's per-env path where no full plan is in scope."""

    nefc: int
    ncon_ell: int
    ne: int
    nf: int


class _EfcView(NamedTuple):
    """Duck-typed stand-in for the EfcData fields the helpers read."""

    J: jax.Array
    aref: jax.Array
    D: jax.Array
    fmin: jax.Array | None
    fmax: jax.Array | None


class _DataView(NamedTuple):
    """Duck-typed stand-in for the Data fields the helpers read."""

    qM: jax.Array
    qacc_smooth: jax.Array
    qLD: jax.Array


class _EllConst(NamedTuple):
    """Trace-time constants for the elliptic blocks of one solve."""

    sqrt_d: jax.Array  # (ncon_ell, 3)
    mu_t: jax.Array  # (ncon_ell,) effective cone coefficient mu_1/sqrt(impratio)


def _ell_const(plan: PhysicsPlan, model: Model, efc: EfcData) -> _EllConst | None:
    if plan.ncon_ell == 0:
        return None
    d_blk = efc.D[plan.nefc - 3 * plan.ncon_ell :].reshape(plan.ncon_ell, 3)
    mu_t = efc.ell_mu * jax.lax.rsqrt(jnp.maximum(model.opt_impratio, _EPS))
    return _EllConst(sqrt_d=jnp.sqrt(d_blk), mu_t=mu_t)


def _split(plan: PhysicsPlan, x: jax.Array):
    """Splits an (nefc,) row vector into scalar rows and (ncon_ell, 3) blocks."""
    ns = plan.nefc - 3 * plan.ncon_ell
    return x[:ns], x[ns:].reshape(plan.ncon_ell, 3)


def _ell_zones(ell: _EllConst, u: jax.Array):
    """Zone bools + projection scalars for elliptic blocks. u: (ncon_ell, 3)."""
    p = -ell.sqrt_d * u
    n = p[:, 0]
    t_vec = p[:, 1:]
    tt = jnp.sum(t_vec * t_vec, axis=1)
    t = jnp.sqrt(jnp.maximum(tt, _EPS * _EPS))
    mu = ell.mu_t
    bottom = mu * n >= t
    top = n <= -mu * t
    s_star = (n + mu * t) / (1.0 + mu * mu)
    return p, n, t_vec, t, bottom, top, s_star


def _force_blocks(ell: _EllConst, d_b: jax.Array, u: jax.Array) -> jax.Array:
    """Elliptic block force (ncon_ell, 3): cone projection of -D*u."""
    p, n, t_vec, t, bottom, top, s_star = _ell_zones(ell, u)
    coef = ell.mu_t * s_star / t
    g = jnp.concatenate([s_star[:, None], coef[:, None] * t_vec], axis=1)
    f_mid = ell.sqrt_d * g
    f_bot = -d_b * u
    return jnp.where(bottom[:, None], f_bot, jnp.where(top[:, None], 0.0, f_mid))


def _force(plan: PhysicsPlan, efc: EfcData, ell: _EllConst | None, jar: jax.Array):
    """Constraint force per row: -ds/djar. (nefc,)"""
    jar_s, u = _split(plan, jar)
    d_s, d_b = _split(plan, efc.D)
    if plan.ne or plan.nf:
        f_s, _ = _scalar_zone(
            jar_s, d_s, _split(plan, efc.fmin)[0], _split(plan, efc.fmax)[0]
        )
    else:
        f_s = jnp.where(jar_s < 0, -d_s * jar_s, 0.0)
    if ell is None:
        return f_s
    f_blk = _force_blocks(ell, d_b, u)
    return jnp.concatenate([f_s, f_blk.reshape(-1)])


def _cost_rows(plan: PhysicsPlan, efc: EfcData, ell: _EllConst | None, jar: jax.Array):
    """Total constraint cost s(jar) (scalar)."""
    jar_s, u = _split(plan, jar)
    d_s, _ = _split(plan, efc.D)
    if plan.ne or plan.nf:
        c = jnp.sum(
            _scalar_cost_bounded(
                jar_s,
                d_s,
                _split(plan, efc.fmin)[0],
                _split(plan, efc.fmax)[0],
            )
        )
    else:
        c = 0.5 * jnp.sum(jnp.where(jar_s < 0, d_s * jar_s * jar_s, 0.0))
    if ell is None:
        return c
    p, n, t_vec, t, bottom, top, s_star = _ell_zones(ell, u)
    quad = 0.5 * jnp.sum(p * p, axis=1)
    mu = ell.mu_t
    mid = quad - 0.5 * (t - mu * n) ** 2 / (1.0 + mu * mu)
    c_blk = jnp.where(bottom, quad, jnp.where(top, 0.0, mid))
    return c + jnp.sum(c_blk)


class _CGState(NamedTuple):
    x: jax.Array  # qacc
    jar: jax.Array  # J x - aref
    grad: jax.Array
    mgrad: jax.Array  # M^-1 grad
    p: jax.Array  # search direction
    improved: jax.Array  # bool: keep iterating


def _cost_grad(
    plan: PhysicsPlan,
    efc: EfcData,
    ell: _EllConst | None,
    data: Data,
    x: jax.Array,
):
    dx = x - data.qacc_smooth
    jar = efc.J @ x - efc.aref
    force = _force(plan, efc, ell, jar)
    grad = data.qM @ dx - efc.J.T @ force
    return jar, grad


def _linesearch(
    plan: PhysicsPlan,
    efc: EfcData,
    ell: _EllConst | None,
    data: Data,
    x: jax.Array,
    p: jax.Array,
    ls_iterations: int,
):
    """Newton linesearch on phi(alpha) with exact derivatives per zone."""
    mp = data.qM @ p
    pmp = jnp.dot(p, mp)
    dmx = jnp.dot(p, data.qM @ (x - data.qacc_smooth))
    jp = efc.J @ p
    jar0 = efc.J @ x - efc.aref

    jp_s, jp_b = _split(plan, jp)
    d_s, d_b = _split(plan, efc.D)
    if ell is not None:
        q = -ell.sqrt_d * jp_b  # (ncon_ell, 3) direction in p-space
        q0 = q[:, 0]
        qt = q[:, 1:]
        qq_t = jnp.sum(qt * qt, axis=1)

    bounded = bool(plan.ne or plan.nf)
    if bounded:
        fmin_s = _split(plan, efc.fmin)[0]
        fmax_s = _split(plan, efc.fmax)[0]

    def phi_derivs(alpha):
        jar = jar0 + alpha * jp
        jar_s, u = _split(plan, jar)
        if bounded:
            f_s, quad = _scalar_zone(jar_s, d_s, fmin_s, fmax_s)
            d1 = alpha * pmp + dmx + jnp.sum(
                jnp.where(quad, d_s * jar_s * jp_s, -f_s * jp_s)
            )
            d2 = pmp + jnp.sum(jnp.where(quad, d_s * jp_s * jp_s, 0.0))
            if ell is not None:
                f_blk = _force_blocks(ell, d_b, u)
                d1 = d1 - jnp.sum(jp_b * f_blk)
        else:
            active = jar_s < 0
            # scalar-row d1 uses the fused where-sum (not dot(jp, force)): the
            # fused form matches round-1 numerics exactly
            d1 = alpha * pmp + dmx + jnp.sum(
                jnp.where(active, d_s * jar_s * jp_s, 0.0)
            )
            if ell is not None:
                f_blk = _force_blocks(ell, d_b, u)
                d1 = d1 - jnp.sum(jp_b * f_blk)
            d2 = pmp + jnp.sum(jnp.where(active, d_s * jp_s * jp_s, 0.0))
        if ell is not None:
            p_blk, n, t_vec, t, bottom, top, s_star = _ell_zones(ell, u)
            mu = ell.mu_t
            # middle-zone cone Hessian along the direction:
            # d2(cost_mid) = |q|^2 - [(T'-mu N')^2 + (T-mu N) T''] / (1+mu^2)
            t_p = jnp.sum(t_vec * qt, axis=1) / t
            t_pp = jnp.maximum(qq_t - t_p * t_p, 0.0) / t
            h_mid = (
                jnp.sum(q * q, axis=1)
                - ((t_p - mu * q0) ** 2 + (t - mu * n) * t_pp)
                / (1.0 + mu * mu)
            )
            h_bot = jnp.sum(d_b * jp_b * jp_b, axis=1)
            h_blk = jnp.where(bottom, h_bot, jnp.where(top, 0.0, h_mid))
            d2 = d2 + jnp.sum(h_blk)
        return d1, jnp.maximum(d2, _EPS)

    if ell is None:
        # scalar rows only: phi' is piecewise linear in alpha, and plain
        # Newton reproduces MuJoCo's low-iteration CG behavior (rodent
        # configures cg/6/6; parity pinned by tests/test_physics_parity.py)
        d1, d2 = phi_derivs(0.0)
        alpha = -d1 / d2

        def newton_body(_, alpha):
            d1, d2 = phi_derivs(alpha)
            return alpha - d1 / d2

        return jax.lax.fori_loop(0, ls_iterations, newton_body, alpha)

    # Elliptic blocks make phi' genuinely nonlinear between zone boundaries;
    # raw 1D Newton can cycle or diverge (observed under deep penetration).
    # Safeguarded Newton: keep a bracket [lo, hi] with d1(lo) < 0 <= d1(hi);
    # Newton candidates outside the bracket fall back to bisection (or
    # geometric expansion while no upper end is known).
    big = jnp.asarray(jnp.finfo(jar0.dtype).max, jar0.dtype)
    d1_0, d2_0 = phi_derivs(0.0)
    alpha0 = jnp.maximum(-d1_0 / d2_0, 0.0)

    def body(_, carry):
        lo, hi, alpha = carry
        d1a, d2a = phi_derivs(alpha)
        neg = d1a < 0
        lo = jnp.where(neg, jnp.maximum(lo, alpha), lo)
        hi = jnp.where(neg, hi, jnp.minimum(hi, alpha))
        newton = alpha - d1a / d2a
        fallback = jnp.where(hi < big, 0.5 * (lo + hi), 2.0 * alpha + 1e-9)
        inside = (newton > lo) & (newton < hi)
        alpha = jnp.where(inside, newton, fallback)
        return lo, hi, alpha

    _, _, alpha = jax.lax.fori_loop(
        0, ls_iterations, body, (jnp.zeros_like(alpha0), big, alpha0)
    )

    # never accept a step that increases phi (exactness of the linesearch is
    # bounded by ls_iterations; a non-improving alpha poisons CG)
    dphi = (
        0.5 * alpha * alpha * pmp
        + alpha * dmx
        + _cost_rows(plan, efc, ell, jar0 + alpha * jp)
        - _cost_rows(plan, efc, ell, jar0)
    )
    return jnp.where(dphi < 0, alpha, 0.0)


def _elliptic_cg_single(
    iterations, ls_iterations, ncon_ell, qm, j, aref, d, mu_t, qfrc_smooth,
    warm, tol,
):
    """One env's factor + smooth solve + elliptic CG
    -> (qacc_smooth, x, force, qfrc).

    The call sequence (cholesky -> cho_solve -> the elliptic CG loop below)
    is exactly the pre-fusion forward flow (factor_m -> solve_m -> solve()'s
    inline elliptic branch), so non-TPU numerics are unchanged."""
    dtype = qfrc_smooth.dtype
    qld = batched_linalg.cholesky(qm)
    smooth = batched_linalg.cho_solve(qld, qfrc_smooth)
    nefc, nv = j.shape
    plan = _PlanView(nefc=nefc, ncon_ell=ncon_ell, ne=0, nf=0)
    efc = _EfcView(J=j, aref=aref, D=d, fmin=None, fmax=None)
    data = _DataView(qM=qm, qacc_smooth=smooth, qLD=qld)
    d_blk = d[nefc - 3 * ncon_ell :].reshape(ncon_ell, 3)
    ell = _EllConst(sqrt_d=jnp.sqrt(d_blk), mu_t=mu_t)

    def cost(x):
        dx = x - smooth
        jar = j @ x - aref
        return 0.5 * jnp.dot(dx, qm @ dx) + _cost_rows(plan, efc, ell, jar)

    x0 = jnp.where(cost(warm) < cost(smooth), warm, smooth)
    jar0, grad0 = _cost_grad(plan, efc, ell, data, x0)
    mgrad0 = batched_linalg.cho_solve(qld, grad0)
    state = _CGState(
        x=x0, jar=jar0, grad=grad0, mgrad=mgrad0, p=-mgrad0,
        improved=jnp.array(True),
    )
    meaninertia = jnp.mean(jnp.diag(qm))
    scale = jnp.maximum(meaninertia * jnp.asarray(nv, dtype), _EPS)

    def body(_, s):
        alpha = _linesearch(plan, efc, ell, data, s.x, s.p, ls_iterations)
        x = s.x + alpha * s.p
        jar, grad = _cost_grad(plan, efc, ell, data, x)
        mgrad = batched_linalg.cho_solve(qld, grad)
        num = jnp.dot(grad, mgrad - s.mgrad)
        den = jnp.maximum(jnp.dot(s.grad, s.mgrad), _EPS)
        beta = jnp.maximum(0.0, num / den)
        p = -mgrad + beta * s.p
        improved = jnp.linalg.norm(grad) / scale > tol
        new = _CGState(x=x, jar=jar, grad=grad, mgrad=mgrad, p=p, improved=improved)
        return jax.tree.map(lambda a, b: jnp.where(s.improved, a, b), new, s)

    state = jax.lax.fori_loop(0, iterations, body, state)
    force = _force(plan, efc, ell, state.jar)
    return smooth, state.x, force, j.T @ force


@functools.lru_cache(maxsize=None)
def _make_elliptic_cg_op(
    iterations: int, ls_iterations: int, ncon_ell: int, with_euler: bool,
    jb_nl=None,
):
    plain_ = functools.partial(
        _elliptic_cg_single, iterations, ls_iterations, ncon_ell
    )
    n_out = 5 if with_euler else 4
    with_jb = jb_nl is not None
    n_jb = 5 if with_jb else 0  # fq, sw, ll, dm, lim1h

    def plain13(qm, j, aref, d, mu_t, qfrc_smooth, warm, tol, hd, buf, cdof,
                anc, arm, fq=None, sw=None, ll=None, dm=None, lim1h=None):
        # the dense path consumes qM directly; the CRB factors feed only the
        # TPU kernel's in-VMEM assembly (unused args DCE away)
        out = plain_(qm, j, aref, d, mu_t, qfrc_smooth, warm, tol)
        if not with_euler:
            return out
        smooth, x, force, qfrc = out
        mh = qm + jnp.diag(hd)
        eff = batched_linalg.cho_solve(
            batched_linalg.cholesky(mh), qfrc_smooth + qfrc
        )
        return smooth, x, force, qfrc, eff

    if with_jb:

        @jax.custom_batching.custom_vmap
        def op(qm, j, aref, d, mu_t, qfrc_smooth, warm, tol, hd, buf, cdof,
               anc, arm, fq, sw, ll, dm, lim1h):
            return plain13(qm, j, aref, d, mu_t, qfrc_smooth, warm, tol, hd,
                           buf, cdof, anc, arm, fq, sw, ll, dm, lim1h)

        vmap_decl = op.def_vmap

        def _vmap_jb(
            axis_size, in_batched, qm, j, aref, d, mu_t, qfrc_smooth, warm,
            tol, hd, buf, cdof, anc, arm, fq, sw, ll, dm, lim1h,
        ):
            return _vmap_impl(
                axis_size, in_batched, qm, j, aref, d, mu_t, qfrc_smooth,
                warm, tol, hd, buf, cdof, anc, arm, (fq, sw, ll, dm, lim1h),
            )

        vmap_decl(_vmap_jb)
    else:

        @jax.custom_batching.custom_vmap
        def op(qm, j, aref, d, mu_t, qfrc_smooth, warm, tol, hd, buf, cdof,
               anc, arm):
            return plain13(qm, j, aref, d, mu_t, qfrc_smooth, warm, tol, hd,
                           buf, cdof, anc, arm)

        vmap_decl = op.def_vmap

        def _vmap_plain(
            axis_size, in_batched, qm, j, aref, d, mu_t, qfrc_smooth, warm,
            tol, hd, buf, cdof, anc, arm,
        ):
            return _vmap_impl(
                axis_size, in_batched, qm, j, aref, d, mu_t, qfrc_smooth,
                warm, tol, hd, buf, cdof, anc, arm, (),
            )

        vmap_decl(_vmap_plain)

    def _vmap_impl(
        axis_size, in_batched, qm, j, aref, d, mu_t, qfrc_smooth, warm, tol,
        hd, buf, cdof, anc, arm, jb_args,
    ):
        args = [
            qm, j, aref, d, mu_t, qfrc_smooth, warm, tol, hd, buf, cdof, anc,
            arm, *jb_args,
        ]
        assert len(jb_args) == n_jb
        # mu_t/tol/jb derive partly from model constants and may trace
        # unbatched; broadcast rather than dropping to the fallback (the
        # round-5 lesson from the scalar jb dispatch). The per-env state
        # operands decide kernel dispatch.
        core = [in_batched[i] for i in (0, 1, 2, 3, 5, 6)]
        n = qfrc_smooth.shape[-1]
        nefc = aref.shape[-1]
        ns = nefc - 3 * ncon_ell

        def bcast(a, b):
            return a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))

        if (
            all(core)
            and in_batched[9]
            and in_batched[10]
            and cg_solver_kernel.ell_kernel_available(
                n, ns, ncon_ell, with_jb
            )
        ):
            mu_b = bcast(mu_t, in_batched[4])
            tol_scalar = tol[0] if in_batched[7] else tol
            hd_b = bcast(hd, in_batched[8])
            anc_u = anc[0] if in_batched[11] else anc
            arm_u = arm[0] if in_batched[12] else arm
            jb = None
            if with_jb:
                fq, sw, ll, dm, lim1h = jb_args
                jb_b = in_batched[13:]
                dm_u = dm[0] if jb_b[3] else dm
                lim1h_u = lim1h[0] if jb_b[4] else lim1h
                jb = (
                    bcast(fq, jb_b[0]),
                    bcast(sw, jb_b[1]),
                    bcast(ll, jb_b[2]) if jb_nl else ll,
                    dm_u,
                    lim1h_u,
                )
            out = cg_solver_kernel._ell_cg_solve_tpu(
                qm, j, aref, d, mu_b, qfrc_smooth, warm, tol_scalar,
                hd=hd_b if with_euler else None,
                crb=(buf, cdof, anc_u, arm_u),
                jb=jb, jb_nl=jb_nl if with_jb else None,
                ns=ns, ncon_ell=ncon_ell,
                iterations=iterations, ls_iterations=ls_iterations,
            )
            return out, (True,) * n_out
        args = [
            a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
            for a, b in zip(args, in_batched)
        ]
        return jax.vmap(plain13)(*args), (True,) * n_out

    return op


class _NewtonState(NamedTuple):
    x: jax.Array  # qacc
    improved: jax.Array  # bool: keep iterating


def _newton(
    plan: PhysicsPlan, model: Model, data: Data, efc: EfcData
) -> Data:
    """mjSOL_NEWTON over scalar rows (limits / condim-1 / pyramidal).

    Exact-Hessian Newton on the same soft-constraint objective the CG path
    minimizes: each iteration rebuilds the active set, assembles
    H = M + J^T diag(D * active) J, Cholesky-solves for the step, and runs
    the shared exact linesearch. MuJoCo's rank-1 active-set Hessian updates
    are replaced by a full rebuild + refactor — branch-free and batchable,
    the TPU-friendly shape of the same math. Elliptic cone models are
    rejected at dispatch (`solve`); the shipped elliptic workload (fly)
    configures CG."""
    dtype = data.qpos.dtype

    def cost(x):
        dx = x - data.qacc_smooth
        jar = efc.J @ x - efc.aref
        return 0.5 * jnp.dot(dx, data.qM @ dx) + _cost_rows(plan, efc, None, jar)

    x0 = jnp.where(
        cost(data.qacc_warmstart) < cost(data.qacc_smooth),
        data.qacc_warmstart,
        data.qacc_smooth,
    )
    meaninertia = jnp.mean(jnp.diag(data.qM))
    scale = jnp.maximum(meaninertia * jnp.asarray(plan.nv, dtype), _EPS)

    def body(_, s: _NewtonState) -> _NewtonState:
        jar, grad = _cost_grad(plan, efc, None, data, s.x)
        if plan.ne or plan.nf:
            # equality rows always curve; friction rows only in the middle
            # (quadratic) zone — clamped rows contribute no Hessian
            active = _scalar_zone(jar, efc.D, efc.fmin, efc.fmax)[1].astype(
                dtype
            )
        else:
            active = (jar < 0).astype(dtype)
        dj = efc.J * (efc.D * active)[:, None]
        h = data.qM + efc.J.T @ dj
        l = jnp.linalg.cholesky(h)
        p = -jax.scipy.linalg.cho_solve((l, True), grad)
        alpha = _linesearch(plan, efc, None, data, s.x, p, plan.ls_iterations)
        x = s.x + alpha * p
        improved = jnp.linalg.norm(grad) / scale > model.opt_tolerance
        new = _NewtonState(x=x, improved=improved)
        return jax.tree.map(lambda a, b: jnp.where(s.improved, a, b), new, s)

    state = jax.lax.fori_loop(
        0, plan.iterations, body, _NewtonState(x=x0, improved=jnp.array(True))
    )
    jar = efc.J @ state.x - efc.aref
    force = _force(plan, efc, None, jar)
    qfrc_constraint = efc.J.T @ force
    return data.replace(
        qacc=state.x,
        qfrc_constraint=qfrc_constraint.astype(dtype),
        efc_force=force.astype(dtype),
    )


def solve(
    plan: PhysicsPlan, model: Model, data: Data, efc: EfcData
) -> Data:
    """Runs the configured solver and writes qacc / qfrc_constraint /
    efc_force into Data.

    CG (mjSOL_CG) covers every shipped workload; Newton (mjSOL_NEWTON) is
    implemented for scalar-row models (limits / pyramidal / condim-1).
    Anything else — PGS, or Newton combined with an elliptic cone — raises
    at trace time. A model that never solves (nefc == 0, e.g. kinematic
    ghost walkers whose XML carries the MuJoCo-default Newton) is allowed
    through. Round-1 behavior (newton silently running CG) was a VERDICT
    finding."""
    dtype = data.qpos.dtype
    if plan.nefc and plan.solver not in (1, 2):  # mjSOL_CG, mjSOL_NEWTON
        raise NotImplementedError(
            f"solver {plan.solver} not supported: CG (mjSOL_CG=1) and "
            "Newton (mjSOL_NEWTON=2) are implemented (the reference "
            "workloads all configure cg: track_mjx/config/*.yaml)"
        )
    if plan.nefc and plan.solver == 2 and plan.ncon_ell:
        raise NotImplementedError(
            "newton + elliptic cone not supported: use solver=cg for "
            "elliptic-cone models (the shipped elliptic workload, fly, "
            "configures cg: track_mjx/config/fly-mc-intention.yaml)"
        )
    if plan.nefc == 0:
        return data.replace(
            qacc=data.qacc_smooth,
            qfrc_constraint=jnp.zeros(plan.nv, dtype=dtype),
        )

    if plan.solver == 2:  # mjSOL_NEWTON (scalar rows; elliptic rejected above)
        return _newton(plan, model, data, efc)

    ell = _ell_const(plan, model, efc)

    if ell is None:
        if plan.ne or plan.nf:
            # box-clamped rows (equality / frictionloss): plain jnp path,
            # vectorizes under the env vmap (no fused kernel — these models
            # are outside the shipped perf workloads)
            x, force, qfrc = _scalar_cg_single(
                plan.iterations,
                plan.ls_iterations,
                data.qM,
                data.qLD,
                efc.J,
                efc.aref,
                efc.D,
                data.qacc_smooth,
                data.qacc_warmstart,
                model.opt_tolerance,
                fmin=efc.fmin,
                fmax=efc.fmax,
            )
            return data.replace(
                qacc=x,
                qfrc_constraint=qfrc.astype(dtype),
                efc_force=force.astype(dtype),
            )
        # unilateral scalar rows only: the fused smooth+CG op owns the qM
        # factorization AND the qacc_smooth solve (forward() skipped
        # factor_m/solve_m for this plan — see fused_scalar_cg); on TPU the
        # whole chain is one Pallas kernel per batch tile. Euler plans fold
        # the integrator's (M + h diag(damping)) solve in too (fused_euler).
        with_euler = fused_euler(plan)
        jb_dims = None
        jb_args = ()
        if J_BUILD and efc.jb_fq is not None:
            # in-kernel J build (round 5): ship the compact fq/sw/ll/mu
            # operands + static dm/lim1h tables; the dense efc.J argument is
            # ignored by the kernel and its assembly DCEs away on TPU
            jb_dims = (int(plan.nlimit), int(plan.ncon))
            dm_np, lim1h_np = _jb_static(plan)
            ll = (
                efc.jb_ll
                if plan.nlimit
                else jnp.zeros((0,), dtype)
            )
            jb_args = (
                efc.jb_fq,
                efc.jb_sw,
                ll,
                efc.jb_mu,
                jnp.asarray(dm_np, dtype),
                jnp.asarray(lim1h_np, dtype),
            )
        op = _make_scalar_cg_op(
            plan.iterations, plan.ls_iterations, with_euler, jb_dims
        )
        hd = (model.opt_timestep * model.dof_damping).astype(dtype)
        out = op(
            data.qM,
            efc.J,
            efc.aref,
            efc.D,
            data.qfrc_smooth,
            data.qacc_warmstart,
            model.opt_tolerance,
            hd,
            data.crb_buf,
            data.cdof,
            jnp.asarray(plan.ancestry_mask, dtype),
            model.dof_armature.astype(dtype),
            *jb_args,
        )
        smooth, x, force, qfrc = out[:4]
        data = data.replace(
            qacc_smooth=smooth.astype(dtype),
            qacc=x,
            qfrc_constraint=qfrc.astype(dtype),
            efc_force=force.astype(dtype),
        )
        if with_euler:
            data = data.replace(qacc_eff=out[4].astype(dtype))
        return data

    if not (plan.ne or plan.nf):
        # fused elliptic plans (the fly): the op owns factorization and the
        # smooth solve — forward() skipped factor_m/solve_m (fused_cg); on
        # TPU the whole chain is one Pallas kernel per batch tile
        mu_t = efc.ell_mu * jax.lax.rsqrt(jnp.maximum(model.opt_impratio, _EPS))
        with_euler = fused_euler(plan)
        jb_nl = None
        jb_args = ()
        if J_BUILD and efc.jb_fq is not None:
            # in-kernel J build, elliptic variant (round 5): cone sections
            # are the frame-projected rows directly; dense efc.J DCEs away
            jb_nl = int(plan.nlimit)
            dm_np, lim1h_np = _jb_static(plan)
            ll = efc.jb_ll if plan.nlimit else jnp.zeros((0,), dtype)
            jb_args = (
                efc.jb_fq,
                efc.jb_sw,
                ll,
                jnp.asarray(dm_np, dtype),
                jnp.asarray(lim1h_np, dtype),
            )
        op = _make_elliptic_cg_op(
            plan.iterations, plan.ls_iterations, plan.ncon_ell, with_euler,
            jb_nl,
        )
        out = op(
            data.qM,
            efc.J,
            efc.aref,
            efc.D,
            mu_t,
            data.qfrc_smooth,
            data.qacc_warmstart,
            model.opt_tolerance,
            (model.opt_timestep * model.dof_damping).astype(dtype),
            data.crb_buf,
            data.cdof,
            jnp.asarray(plan.ancestry_mask, dtype),
            model.dof_armature.astype(dtype),
            *jb_args,
        )
        smooth, x, force, qfrc = out[:4]
        data = data.replace(
            qacc_smooth=smooth.astype(dtype),
            qacc=x,
            qfrc_constraint=qfrc.astype(dtype),
            efc_force=force.astype(dtype),
        )
        if with_euler:
            data = data.replace(qacc_eff=out[4].astype(dtype))
        return data

    def cost(x):
        dx = x - data.qacc_smooth
        jar = efc.J @ x - efc.aref
        return 0.5 * jnp.dot(dx, data.qM @ dx) + _cost_rows(plan, efc, ell, jar)

    # warmstart vs qacc_smooth start: take the cheaper one (mj_fwdConstraint
    # compares actual costs)
    x0 = jnp.where(
        cost(data.qacc_warmstart) < cost(data.qacc_smooth),
        data.qacc_warmstart,
        data.qacc_smooth,
    )
    jar0, grad0 = _cost_grad(plan, efc, ell, data, x0)

    mgrad0 = inertia.solve_m(data, grad0)
    state = _CGState(
        x=x0,
        jar=jar0,
        grad=grad0,
        mgrad=mgrad0,
        p=-mgrad0,
        improved=jnp.array(True),
    )

    # convergence scale (mirrors MuJoCo's scaled tolerance test)
    meaninertia = jnp.mean(jnp.diag(data.qM))
    scale = jnp.maximum(meaninertia * jnp.asarray(plan.nv, dtype), _EPS)

    def body(_, s: _CGState) -> _CGState:
        alpha = _linesearch(
            plan, efc, ell, data, s.x, s.p, plan.ls_iterations
        )
        x = s.x + alpha * s.p
        jar, grad = _cost_grad(plan, efc, ell, data, x)
        mgrad = inertia.solve_m(data, grad)
        # Polak-Ribiere (preconditioned)
        num = jnp.dot(grad, mgrad - s.mgrad)
        den = jnp.maximum(jnp.dot(s.grad, s.mgrad), _EPS)
        beta = jnp.maximum(0.0, num / den)
        p = -mgrad + beta * s.p
        # keep iterating while gradient is significant
        improved = jnp.linalg.norm(grad) / scale > model.opt_tolerance
        # freeze updates once converged (matches MuJoCo's early termination)
        keep = s.improved
        new = _CGState(x=x, jar=jar, grad=grad, mgrad=mgrad, p=p, improved=improved)
        return jax.tree.map(
            lambda a, b: jnp.where(keep, a, b), new, s
        )

    state = jax.lax.fori_loop(0, plan.iterations, body, state)

    force = _force(plan, efc, ell, state.jar)
    qfrc_constraint = efc.J.T @ force
    return data.replace(
        qacc=state.x,
        qfrc_constraint=qfrc_constraint.astype(dtype),
        efc_force=force.astype(dtype),
    )
