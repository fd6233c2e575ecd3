"""Primal CG constraint solver (MuJoCo mjSOL_CG parity, dense TPU layout).

Minimizes the soft-constraint objective over qacc:

    phi(x) = 0.5 (x - qacc_smooth)^T M (x - qacc_smooth)
           + 0.5 sum_i active_i(x) * D_i * (J_i x - aref_i)^2

with unilateral rows active iff jar_i = J_i x - aref_i < 0 (all rows here are
unilateral: joint limits + pyramidal friction rows). Search directions use
M-preconditioned Polak-Ribiere CG; the 1D linesearch runs `ls_iterations`
safeguarded Newton steps on the piecewise-quadratic phi(alpha), matching the
iteration structure MuJoCo configures through opt.iterations/ls_iterations
(reference sets cg/5/5: track_mjx/config/rodent-full-clips.yaml:12-14 via
single_clip_tracking.py:65-72).

Everything is fixed-trip-count fori_loops over small dense matmuls — the
whole batched solve compiles to MXU-friendly XLA with no dynamic control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from track_mjx_tpu.physics import inertia
from track_mjx_tpu.physics.constraint import EfcData
from track_mjx_tpu.physics.model import Data, Model, PhysicsPlan


class _CGState(NamedTuple):
    x: jax.Array  # qacc
    jar: jax.Array  # J x - aref
    grad: jax.Array
    mgrad: jax.Array  # M^-1 grad
    p: jax.Array  # search direction
    improved: jax.Array  # bool: keep iterating


def _cost_grad(data: Data, efc: EfcData, x: jax.Array):
    dx = x - data.qacc_smooth
    jar = efc.J @ x - efc.aref
    active = jar < 0
    force = jnp.where(active, -efc.D * jar, 0.0)
    grad = data.qM @ dx - efc.J.T @ force
    return jar, grad


def _linesearch(
    data: Data, efc: EfcData, x: jax.Array, p: jax.Array, ls_iterations: int
):
    """Newton linesearch on phi(alpha) with active-set recomputation."""
    mp = data.qM @ p
    pmp = jnp.dot(p, mp)
    dmx = jnp.dot(p, data.qM @ (x - data.qacc_smooth))
    jp = efc.J @ p
    jar0 = efc.J @ x - efc.aref

    def phi_derivs(alpha):
        jar = jar0 + alpha * jp
        active = jar < 0
        d1 = alpha * pmp + dmx + jnp.sum(
            jnp.where(active, efc.D * jar * jp, 0.0)
        )
        d2 = pmp + jnp.sum(jnp.where(active, efc.D * jp * jp, 0.0))
        return d1, jnp.maximum(d2, 1e-12)

    d1, d2 = phi_derivs(0.0)
    alpha = -d1 / d2

    def body(_, alpha):
        d1, d2 = phi_derivs(alpha)
        return alpha - d1 / d2

    alpha = jax.lax.fori_loop(0, ls_iterations, body, alpha)
    return alpha


def solve(
    plan: PhysicsPlan, model: Model, data: Data, efc: EfcData
) -> Data:
    """Runs CG and writes qacc / qfrc_constraint / efc_force into Data."""
    dtype = data.qpos.dtype
    if plan.nefc == 0:
        return data.replace(
            qacc=data.qacc_smooth,
            qfrc_constraint=jnp.zeros(plan.nv, dtype=dtype),
        )

    x0 = data.qacc_warmstart
    jar0, grad0 = _cost_grad(data, efc, x0)
    # fall back to qacc_smooth start if warmstart is worse (mj_fwdConstraint
    # compares costs; comparing via gradient norm is equivalent in practice
    # because both starts are refined identically — we follow MuJoCo and
    # compare actual costs)
    def cost(x):
        dx = x - data.qacc_smooth
        jar = efc.J @ x - efc.aref
        c = 0.5 * jnp.dot(dx, data.qM @ dx)
        c = c + 0.5 * jnp.sum(jnp.where(jar < 0, efc.D * jar * jar, 0.0))
        return c

    better = cost(x0) < cost(data.qacc_smooth)
    x0 = jnp.where(better, x0, data.qacc_smooth)
    jar0, grad0 = _cost_grad(data, efc, x0)

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
    scale = jnp.maximum(meaninertia * jnp.asarray(plan.nv, dtype), 1e-12)

    def body(_, s: _CGState) -> _CGState:
        alpha = _linesearch(data, efc, s.x, s.p, plan.ls_iterations)
        x = s.x + alpha * s.p
        jar, grad = _cost_grad(data, efc, x)
        mgrad = inertia.solve_m(data, grad)
        # Polak-Ribiere (preconditioned)
        num = jnp.dot(grad, mgrad - s.mgrad)
        den = jnp.maximum(jnp.dot(s.grad, s.mgrad), 1e-12)
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

    force = jnp.where(state.jar < 0, -efc.D * state.jar, 0.0)
    qfrc_constraint = efc.J.T @ force
    return data.replace(
        qacc=state.x,
        qfrc_constraint=qfrc_constraint.astype(dtype),
        efc_force=force.astype(dtype),
    )
