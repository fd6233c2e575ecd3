"""Interpret-mode parity tests for the Pallas TPU kernels (VERDICT r2 #3).

The fused whole-CG kernel (ops/cg_solver_kernel.py) and the lane-batched
linalg kernels (ops/batched_linalg.py) only dispatch on real TPU hardware, so
the CPU suite normally exercises their fallbacks. These tests run the actual
kernel bodies through the Pallas interpreter on CPU and pin their numerics
against the unfused per-env path on contact-rich rodent states — the same
configuration the reference workload solves
(track_mjx/environment/task/single_clip_tracking.py:65-72: cg, dense
jacobian).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from track_mjx_tpu.ops import batched_linalg, cg_solver_kernel
from track_mjx_tpu.physics import forward as fwd
from track_mjx_tpu.physics import model as pm
from track_mjx_tpu.physics import solver as solver_mod

pytestmark = pytest.mark.oracle

_ITERS = 6
_LS_ITERS = 6


@pytest.fixture(scope="module")
def cg_rodent(rodent_mj_model):
    """Rodent compiled with the workload solver config (cg/6/6, dense)."""
    m = copy.copy(rodent_mj_model)
    m.opt.solver = 1  # mjSOL_CG
    m.opt.iterations = _ITERS
    m.opt.ls_iterations = _LS_ITERS
    m.opt.jacobian = 0
    plan, model = pm.put_model(m)
    assert solver_mod.fused_scalar_cg(plan), "fixture must be a fused-CG plan"
    return m, plan, model


def _solver_inputs(m, plan, model, n_envs=6):
    """Batched (qM, J, aref, D, qfrc_smooth, warm) from contact-rich states.

    States are produced by running the real forward stages (fwd_position /
    velocity / actuation / acceleration) on dropped+perturbed configurations,
    i.e. exactly what solve() receives mid-rollout.
    """
    rng = np.random.RandomState(3)
    qpos = np.tile(m.qpos0, (n_envs, 1))
    qpos[:, 2] -= rng.uniform(0.008, 0.016, n_envs)  # drop into contact
    qpos[:, 7:] += rng.uniform(-0.08, 0.08, (n_envs, m.nq - 7))
    qvel = rng.uniform(-0.5, 0.5, (n_envs, m.nv))
    ctrl = rng.uniform(-0.5, 0.5, (n_envs, m.nu))
    warm = rng.uniform(-1.0, 1.0, (n_envs, m.nv))

    def stages(qpos, qvel, ctrl):
        data = pm.make_data(plan, model)
        data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
        data, efc = fwd.fwd_position(plan, model, data)
        data = fwd.fwd_velocity(plan, model, data)
        data = fwd.fwd_actuation(plan, model, data)
        data = fwd.fwd_acceleration(plan, model, data)
        return data.qM, efc.J, efc.aref, efc.D, data.qfrc_smooth

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    qm, j, aref, d_rows, qfrc = jax.jit(jax.vmap(stages))(
        f32(qpos), f32(qvel), f32(ctrl)
    )
    return qm, j, aref, d_rows, qfrc, f32(warm)


def test_whole_cg_kernel_matches_unfused(cg_rodent):
    m, plan, model = cg_rodent
    qm, j, aref, d_rows, qfrc, warm = _solver_inputs(m, plan, model)
    tol = jnp.asarray(m.opt.tolerance, jnp.float32)

    ref = jax.vmap(
        lambda QM, J, A, D, F, W: solver_mod._smooth_scalar_cg_single(
            _ITERS, _LS_ITERS, QM, J, A, D, F, W, tol
        )
    )(qm, j, aref, d_rows, qfrc, warm)
    # contact-rich sanity: every env must have active constraint rows
    assert float(jnp.min(jnp.max(jnp.abs(ref[2]), axis=1))) > 0

    out = cg_solver_kernel._cg_solve_tpu(
        qm, j, aref, d_rows, qfrc, warm, tol,
        iterations=_ITERS, ls_iterations=_LS_ITERS, interpret=True,
    )

    # the kernel recomputes M@v as L(L^T v) (documented intentional
    # difference) — everything else is op-for-op, so agreement must sit at
    # f32-roundoff level; force rows multiply jar by the large D weights, so
    # they amplify that roundoff by ~1 decade (a wrong zone/sign would be O(1))
    tols = {
        "qacc_smooth": 5e-5,
        "qacc": 1e-4,
        "efc_force": 1e-3,
        "qfrc_constraint": 1e-3,
    }
    for (name, rel), a, b in zip(tols.items(), out, ref):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(1.0, np.abs(b).max())
        err = np.abs(a - b).max() / scale
        assert err < rel, f"{name}: rel err {err:.2e}"


def test_cg_kernel_tolerance_freeze(cg_rodent):
    """A huge tolerance freezes every lane at x0: the kernel must reproduce
    the unfused path's freeze semantics (zero-length steps, warmstart-vs-
    smooth selection still applied)."""
    m, plan, model = cg_rodent
    qm, j, aref, d_rows, qfrc, warm = _solver_inputs(m, plan, model, n_envs=3)
    tol = jnp.asarray(1e9, jnp.float32)

    ref = jax.vmap(
        lambda QM, J, A, D, F, W: solver_mod._smooth_scalar_cg_single(
            _ITERS, _LS_ITERS, QM, J, A, D, F, W, tol
        )
    )(qm, j, aref, d_rows, qfrc, warm)
    out = cg_solver_kernel._cg_solve_tpu(
        qm, j, aref, d_rows, qfrc, warm, tol,
        iterations=_ITERS, ls_iterations=_LS_ITERS, interpret=True,
    )
    # scale-relative (not elementwise): rows sitting on a zone boundary
    # (jar ~ 0) amplify f32 roundoff into large elementwise ratios while
    # being numerically negligible against the solve's magnitude
    for a, b in zip(out, ref):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        err = np.abs(a - b).max() / max(1.0, np.abs(b).max())
        assert err < 1e-3, f"rel err {err:.2e}"


def test_batched_cholesky_interpret_matches_fallback():
    rng = np.random.RandomState(0)
    n, b = 23, 5
    g = rng.randn(b, n, n).astype(np.float32)
    a = jnp.asarray(g @ np.swapaxes(g, 1, 2) + n * np.eye(n, dtype=np.float32))
    out = batched_linalg._cholesky_tpu(a, interpret=True)
    ref = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=1e-5)


def test_batched_cho_solve_interpret_matches_fallback():
    rng = np.random.RandomState(1)
    n, b = 23, 5
    g = rng.randn(b, n, n).astype(np.float32)
    a = jnp.asarray(g @ np.swapaxes(g, 1, 2) + n * np.eye(n, dtype=np.float32))
    l = jnp.linalg.cholesky(a)
    rhs = jnp.asarray(rng.randn(b, n).astype(np.float32))
    out = batched_linalg._cho_solve_tpu(l, rhs, interpret=True)
    ref = jax.vmap(
        lambda L, r: jax.scipy.linalg.cho_solve((L, True), r)
    )(l, rhs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_batched_solve_spd_interpret_matches_fallback():
    rng = np.random.RandomState(2)
    n, b = 23, 5
    g = rng.randn(b, n, n).astype(np.float32)
    a = jnp.asarray(g @ np.swapaxes(g, 1, 2) + n * np.eye(n, dtype=np.float32))
    rhs = jnp.asarray(rng.randn(b, n).astype(np.float32))
    out = batched_linalg._solve_spd_tpu(a, rhs, interpret=True)
    ref = jnp.linalg.solve(a, rhs[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
