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
            _ITERS, _LS_ITERS, False, QM, J, A, D, F, W, tol, None
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
            _ITERS, _LS_ITERS, False, QM, J, A, D, F, W, tol, None
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


# ---------------------------------------------------------------------------
# Elliptic-cone variant (the fly workload: cg/4/4, cone=elliptic, condim 3)
# ---------------------------------------------------------------------------

_ELL_ITERS = 4
_ELL_LS_ITERS = 4


@pytest.fixture(scope="module")
def cg_fly():
    """Fly compiled with the workload solver config (cg/4/4 — the
    fly-mc-intention env_args; track_mjx/config/fly-mc-intention.yaml:14-16)."""
    import mujoco

    from track_mjx_tpu.envs.walker.base import DEFAULT_ASSET_ROOT
    from track_mjx_tpu.envs.walker.fly import ensure_fly_assets
    import os

    root = ensure_fly_assets(DEFAULT_ASSET_ROOT)
    m = mujoco.MjModel.from_xml_path(
        os.path.join(root, "fruitfly_force_fast.xml")
    )
    m.opt.solver = 1  # mjSOL_CG
    m.opt.iterations = _ELL_ITERS
    m.opt.ls_iterations = _ELL_LS_ITERS
    m.opt.jacobian = 0
    plan, model = pm.put_model(m)
    assert solver_mod.fused_elliptic_cg(plan), "fixture must be elliptic-CG"
    return m, plan, model


def _fly_solver_inputs(m, plan, model, n_envs=6):
    """Batched elliptic solver operands from contact-rich fly states.

    The last two envs are static drops (zero velocity/ctrl/warmstart, gentle
    penetration): their contacts carry almost no tangential demand, putting
    cone blocks in the bottom (static-friction) zone, which the randomized
    sliding states never reach (see test_elliptic_cg_kernel_zone_coverage)."""
    rng = np.random.RandomState(7)
    qpos = np.tile(m.qpos0, (n_envs, 1))
    qpos[:, 2] -= rng.uniform(0.02, 0.12, n_envs)  # drop legs into the floor
    qpos[:, 7:] += rng.uniform(-0.10, 0.10, (n_envs, m.nq - 7))
    qvel = rng.uniform(-2.0, 2.0, (n_envs, m.nv))
    ctrl = rng.uniform(-0.3, 0.3, (n_envs, m.nu))
    warm = rng.uniform(-5.0, 5.0, (n_envs, m.nv))
    qpos[-2:] = m.qpos0
    # small joint perturbation: at exactly qpos0 several limit rows sit
    # EXACTLY on their zone boundary and 1-ulp reduction-order differences
    # flip them — a knife-edge no real rollout state occupies
    qpos[-2:, 7:] += rng.uniform(-0.02, 0.02, (2, m.nq - 7))
    qpos[-2:, 2] -= [0.02, 0.04]
    qvel[-2:] = 0.0
    ctrl[-2:] = 0.0
    # warmstart the static envs at MuJoCo-C's converged qacc: from a good
    # start the contact forces hold the body and low-tangential blocks sit
    # in the cone's static-friction (bottom) zone — unreachable within cg/4
    # from a zero warmstart at these penetration depths (mid-rollout states
    # reach it through the carried warmstart the same way)
    import mujoco

    md = mujoco.MjData(m)
    for k in (-2, -1):
        md.qpos[:] = qpos[k]
        md.qvel[:] = qvel[k]
        md.ctrl[:] = ctrl[k]
        mujoco.mj_forward(m, md)
        warm[k] = md.qacc

    def stages(qpos, qvel, ctrl):
        data = pm.make_data(plan, model)
        data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
        data, efc = fwd.fwd_position(plan, model, data)
        data = fwd.fwd_velocity(plan, model, data)
        data = fwd.fwd_actuation(plan, model, data)
        data = fwd.fwd_acceleration(plan, model, data)
        mu_t = efc.ell_mu * jax.lax.rsqrt(
            jnp.maximum(model.opt_impratio, 1e-12)
        )
        return data.qM, efc.J, efc.aref, efc.D, mu_t, data.qfrc_smooth

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    qm, j, aref, d_rows, mu_t, qfrc = jax.jit(jax.vmap(stages))(
        f32(qpos), f32(qvel), f32(ctrl)
    )
    return qm, j, aref, d_rows, mu_t, qfrc, f32(warm)


def _ell_objective_f64(qm, j, aref, d_rows, mu_t, smooth, x, ns, c):
    """Per-env constraint objective phi(x) in float64 (the solver's own
    cost: 0.5 dx M dx + scalar rows + cone blocks), used to judge solve
    quality independently of iterate-level roundoff."""
    qm, j, aref, d_rows, mu_t, smooth, x = (
        np.asarray(t, np.float64) for t in (qm, j, aref, d_rows, mu_t, smooth, x)
    )
    out = []
    for b in range(x.shape[0]):
        dx = x[b] - smooth[b]
        jar = j[b] @ x[b] - aref[b]
        jar_s, u = jar[:ns], jar[ns:].reshape(c, 3)
        d_s, d_b = d_rows[b][:ns], d_rows[b][ns:].reshape(c, 3)
        cs = 0.5 * np.sum(np.where(jar_s < 0, d_s * jar_s**2, 0.0))
        p = -np.sqrt(d_b) * u
        t = np.sqrt(np.maximum(p[:, 1] ** 2 + p[:, 2] ** 2, 1e-24))
        mu = mu_t[b]
        bottom = mu * p[:, 0] >= t
        top = p[:, 0] <= -mu * t
        quad = 0.5 * (p * p).sum(1)
        mid = quad - 0.5 * (t - mu * p[:, 0]) ** 2 / (1 + mu * mu)
        cb = np.sum(np.where(bottom, quad, np.where(top, 0.0, mid)))
        out.append(0.5 * dx @ (qm[b] @ dx) + cs + cb)
    return np.array(out)


def test_elliptic_cg_kernel_matches_unfused_one_iteration(cg_fly):
    """Iterate-level parity at iterations=1: one warmstart selection, one
    safeguarded linesearch (bracketing + the non-increase accept check), one
    force extraction. At this depth the two implementations compute the same
    f32 quantities, so agreement must sit at roundoff level — this pins every
    piece of cone math (zones, projection force, cost, curvature) in the
    kernel. At the workload's 4 iterations iterate-level parity is NOT a
    meaningful spec: near convergence the linesearch derivative phi'(alpha)
    is f32 noise (observed |d1| ~ 1e2 against ~1e12 operand scale), so
    bracket decisions legitimately flip with reduction order — even the
    unfused path diverges from its own float64 run by ~9% there. Solve
    QUALITY at 4 iterations is pinned by the objective test below."""
    m, plan, model = cg_fly
    qm, j, aref, d_rows, mu_t, qfrc, warm = _fly_solver_inputs(m, plan, model)
    tol = jnp.asarray(m.opt.tolerance, jnp.float32)
    ns = plan.nefc - 3 * plan.ncon_ell

    ref = jax.vmap(
        lambda QM, J, A, D, MU, F, W: solver_mod._elliptic_cg_single(
            1, _ELL_LS_ITERS, plan.ncon_ell, QM, J, A, D, MU, F, W, tol
        )
    )(qm, j, aref, d_rows, mu_t, qfrc, warm)
    # contact-rich sanity: every env must carry nonzero constraint force
    assert float(jnp.min(jnp.max(jnp.abs(ref[2]), axis=1))) > 0

    out = cg_solver_kernel._ell_cg_solve_tpu(
        qm, j, aref, d_rows, mu_t, qfrc, warm, tol,
        ns=ns, ncon_ell=plan.ncon_ell,
        iterations=1, ls_iterations=_ELL_LS_ITERS, interpret=True,
    )

    tols = {
        "qacc_smooth": 5e-5,
        "qacc": 2e-4,
        "efc_force": 1e-3,
        "qfrc_constraint": 1e-3,
    }
    for (name, rel), a, b in zip(tols.items(), out, ref):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(1.0, np.abs(b).max())
        err = np.abs(a - b).max() / scale
        assert err < rel, f"{name}: rel err {err:.2e}"


def test_elliptic_cg_kernel_objective_parity(cg_fly):
    """At the workload depth (cg/4/4) the kernel must solve as well as the
    unfused path, judged by OPTIMALITY GAP against a converged (cg/60/15)
    reference: iterate-level comparison is noise-driven there (see the
    1-iteration test's note), and raw-cost ratios are too — at cg/4 both
    paths sit 20-50% above the converged objective by design, wandering the
    same noise-driven step sequence differently. A genuine math bug (wrong
    zone, sign flip) blows the gap up by an order of magnitude; observed
    noise-level disagreement is <1.6x. The smooth solve must agree at
    roundoff."""
    m, plan, model = cg_fly
    qm, j, aref, d_rows, mu_t, qfrc, warm = _fly_solver_inputs(m, plan, model)
    tol = jnp.asarray(m.opt.tolerance, jnp.float32)
    ns = plan.nefc - 3 * plan.ncon_ell

    star = jax.vmap(
        lambda QM, J, A, D, MU, F, W: solver_mod._elliptic_cg_single(
            60, 15, plan.ncon_ell, QM, J, A, D, MU, F, W, tol
        )
    )(qm, j, aref, d_rows, mu_t, qfrc, warm)
    ref = jax.vmap(
        lambda QM, J, A, D, MU, F, W: solver_mod._elliptic_cg_single(
            _ELL_ITERS, _ELL_LS_ITERS, plan.ncon_ell, QM, J, A, D, MU, F, W, tol
        )
    )(qm, j, aref, d_rows, mu_t, qfrc, warm)
    out = cg_solver_kernel._ell_cg_solve_tpu(
        qm, j, aref, d_rows, mu_t, qfrc, warm, tol,
        ns=ns, ncon_ell=plan.ncon_ell,
        iterations=_ELL_ITERS, ls_iterations=_ELL_LS_ITERS, interpret=True,
    )
    sm_err = np.abs(np.asarray(out[0]) - np.asarray(ref[0])).max() / max(
        1.0, np.abs(np.asarray(ref[0])).max()
    )
    assert sm_err < 5e-5, f"qacc_smooth rel err {sm_err:.2e}"

    cost_star = _ell_objective_f64(
        qm, j, aref, d_rows, mu_t, star[0], star[1], ns, plan.ncon_ell
    )
    gap_kernel = (
        _ell_objective_f64(
            qm, j, aref, d_rows, mu_t, star[0], out[1], ns, plan.ncon_ell
        )
        - cost_star
    )
    gap_unfused = (
        _ell_objective_f64(
            qm, j, aref, d_rows, mu_t, star[0], ref[1], ns, plan.ncon_ell
        )
        - cost_star
    )
    bound = 2.0 * gap_unfused + 1e-3 * np.abs(cost_star)
    assert np.all(gap_kernel <= bound), (
        f"optimality gaps kernel={gap_kernel} vs unfused={gap_unfused}"
    )


def test_elliptic_cg_kernel_zone_coverage(cg_fly):
    """The parity fixture must exercise all three cone zones (bottom = static
    friction inside the cone, middle = sliding projection, top = separating)
    across envs — otherwise the cone projection logic is untested. Checked on
    the unfused path's final jar."""
    m, plan, model = cg_fly
    qm, j, aref, d_rows, mu_t, qfrc, warm = _fly_solver_inputs(m, plan, model)
    tol = jnp.asarray(m.opt.tolerance, jnp.float32)

    ns = plan.nefc - 3 * plan.ncon_ell
    seen = {"bottom": False, "top": False, "mid": False}
    # census over both parity depths (the bottom zone appears at the
    # C-warmstarted static envs' early iterates and the truncated solve
    # walks back out of it by cg/4)
    for iters in (1, _ELL_ITERS):
        _, x, _, _ = jax.vmap(
            lambda QM, J, A, D, MU, F, W: solver_mod._elliptic_cg_single(
                iters, _ELL_LS_ITERS, plan.ncon_ell, QM, J, A, D, MU, F, W, tol
            )
        )(qm, j, aref, d_rows, mu_t, qfrc, warm)
        jar = jnp.einsum("ben,bn->be", j, x) - aref
        u = jar[:, ns:].reshape(-1, plan.ncon_ell, 3)
        d_blk = d_rows[:, ns:].reshape(-1, plan.ncon_ell, 3)
        p = -jnp.sqrt(d_blk) * u
        t = jnp.sqrt(jnp.maximum(p[..., 1] ** 2 + p[..., 2] ** 2, 1e-24))
        bottom = mu_t * p[..., 0] >= t
        top = p[..., 0] <= -mu_t * t
        seen["bottom"] |= bool(jnp.any(bottom))
        seen["top"] |= bool(jnp.any(top))
        seen["mid"] |= bool(jnp.any(~bottom & ~top))
    assert seen["bottom"], "no block in the static-friction zone"
    assert seen["top"], "no block in the separating zone"
    assert seen["mid"], "no block in the sliding zone"


def test_cg_kernel_fused_euler_solve(cg_rodent):
    """The in-kernel Euler implicit-damping solve (qacc_eff output, round-4
    fusion) must match the unfused cholesky(M + h diag(damping)) +
    substitution sequence the integrator previously dispatched."""
    m, plan, model = cg_rodent
    qm, j, aref, d_rows, qfrc, warm = _solver_inputs(m, plan, model)
    tol = jnp.asarray(m.opt.tolerance, jnp.float32)
    hd1 = jnp.asarray(m.opt.timestep * m.dof_damping, jnp.float32)
    hd = jnp.broadcast_to(hd1, (qm.shape[0],) + hd1.shape)
    assert float(jnp.max(hd)) > 0, "fixture must have damped dofs"

    ref = jax.vmap(
        lambda QM, J, A, D, F, W, HD: solver_mod._smooth_scalar_cg_single(
            _ITERS, _LS_ITERS, True, QM, J, A, D, F, W, tol, HD
        )
    )(qm, j, aref, d_rows, qfrc, warm, hd)
    out = cg_solver_kernel._cg_solve_tpu(
        qm, j, aref, d_rows, qfrc, warm, tol, hd=hd,
        iterations=_ITERS, ls_iterations=_LS_ITERS, interpret=True,
    )
    assert len(out) == 5 and len(ref) == 5
    a = np.asarray(out[4], np.float64)
    b = np.asarray(ref[4], np.float64)
    err = np.abs(a - b).max() / max(1.0, np.abs(b).max())
    # 5e-4: qacc_eff inherits qfrc (pinned at 1e-3 in the main parity test),
    # whose f32 roundoff grew slightly when the scalar iterations moved to
    # MuJoCo-style incremental jar/Ma updates (documented difference,
    # cg_solver_kernel.py module docstring); measured 1.3e-4.
    assert err < 5e-4, f"qacc_eff rel err {err:.2e}"
    # the CG outputs must be untouched by the extra solve
    for name, x, y in zip(("smooth", "x", "force", "qfrc"), out[:4], ref[:4]):
        e = np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64)).max() / max(
            1.0, np.abs(np.asarray(y)).max()
        )
        assert e < 1e-3, f"{name} rel err {e:.2e}"


def test_cg_kernel_qm_build_matches_dense(cg_rodent):
    """The in-VMEM qM assembly from CRB factors (round-4 fusion) must match
    the dense-qM kernel path at f32-roundoff level on all outputs."""
    from track_mjx_tpu.physics import forward as fwd2

    m, plan, model = cg_rodent
    rng = np.random.RandomState(5)
    n_envs = 4
    qpos = np.tile(m.qpos0, (n_envs, 1))
    qpos[:, 2] -= rng.uniform(0.008, 0.016, n_envs)
    qpos[:, 7:] += rng.uniform(-0.08, 0.08, (n_envs, m.nq - 7))
    qvel = rng.uniform(-0.5, 0.5, (n_envs, m.nv))
    ctrl = rng.uniform(-0.5, 0.5, (n_envs, m.nu))
    warm = jnp.asarray(rng.uniform(-1.0, 1.0, (n_envs, m.nv)), jnp.float32)

    def stages(qpos, qvel, ctrl):
        data = pm.make_data(plan, model)
        data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
        data, efc = fwd2.fwd_position(plan, model, data)
        data = fwd2.fwd_velocity(plan, model, data)
        data = fwd2.fwd_actuation(plan, model, data)
        data = fwd2.fwd_acceleration(plan, model, data)
        return (
            data.qM, data.crb_buf, data.cdof, efc.J, efc.aref, efc.D,
            data.qfrc_smooth,
        )

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    qm, buf, cdof, j, aref, d_rows, qfrc = jax.jit(jax.vmap(stages))(
        f32(qpos), f32(qvel), f32(ctrl)
    )
    tol = jnp.asarray(m.opt.tolerance, jnp.float32)
    hd = jnp.broadcast_to(
        jnp.asarray(m.opt.timestep * m.dof_damping, jnp.float32),
        (n_envs, m.nv),
    )
    anc = jnp.asarray(plan.ancestry_mask, jnp.float32)
    arm = jnp.asarray(model.dof_armature, jnp.float32)

    dense = cg_solver_kernel._cg_solve_tpu(
        qm, j, aref, d_rows, qfrc, warm, tol, hd=hd,
        iterations=_ITERS, ls_iterations=_LS_ITERS, interpret=True,
    )
    built = cg_solver_kernel._cg_solve_tpu(
        qm, j, aref, d_rows, qfrc, warm, tol, hd=hd,
        crb=(buf, cdof, anc, arm),
        iterations=_ITERS, ls_iterations=_LS_ITERS, interpret=True,
    )
    names = ("qacc_smooth", "qacc", "efc_force", "qfrc_constraint", "qacc_eff")
    for name, a, b in zip(names, built, dense):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        err = np.abs(a - b).max() / max(1.0, np.abs(b).max())
        assert err < 2e-4, f"{name}: rel err {err:.2e}"


def test_elliptic_cg_kernel_fused_euler_solve(cg_fly):
    """The elliptic kernel's in-kernel Euler implicit-damping solve must
    match the unfused cholesky(M + h diag(damping)) + substitution
    sequence (round-4 fusion, mirroring the scalar kernel)."""
    m, plan, model = cg_fly
    qm, j, aref, d_rows, mu_t, qfrc, warm = _fly_solver_inputs(m, plan, model)
    tol = jnp.asarray(m.opt.tolerance, jnp.float32)
    ns = plan.nefc - 3 * plan.ncon_ell
    hd1 = jnp.asarray(m.opt.timestep * m.dof_damping, jnp.float32)
    hd = jnp.broadcast_to(hd1, (qm.shape[0],) + hd1.shape)

    op = solver_mod._make_elliptic_cg_op(1, _ELL_LS_ITERS, plan.ncon_ell, True)
    z6 = jnp.zeros((plan.nv, 6), jnp.float32)
    znn = jnp.zeros((plan.nv, plan.nv), jnp.float32)
    zn = jnp.zeros((plan.nv,), jnp.float32)
    ref = jax.vmap(
        lambda QM, J, A, D, MU, F, W, HD: op(
            QM, J, A, D, MU, F, W, tol, HD, z6, z6, znn, zn
        )
    )(qm, j, aref, d_rows, mu_t, qfrc, warm, hd)
    out = cg_solver_kernel._ell_cg_solve_tpu(
        qm, j, aref, d_rows, mu_t, qfrc, warm, tol, hd=hd,
        ns=ns, ncon_ell=plan.ncon_ell,
        iterations=1, ls_iterations=_ELL_LS_ITERS, interpret=True,
    )
    assert len(out) == 5 and len(ref) == 5
    a = np.asarray(out[4], np.float64)
    b = np.asarray(ref[4], np.float64)
    err = np.abs(a - b).max() / max(1.0, np.abs(b).max())
    assert err < 1e-3, f"qacc_eff rel err {err:.2e}"


def test_elliptic_cg_kernel_qm_build_matches_dense(cg_fly):
    """The elliptic kernel's in-VMEM qM assembly from CRB factors must match
    the dense-qM path at f32-roundoff level (round-4, mirrors the scalar
    kernel's test)."""
    from track_mjx_tpu.physics import forward as fwd3

    m, plan, model = cg_fly
    rng = np.random.RandomState(11)
    n_envs = 3
    qpos = np.tile(m.qpos0, (n_envs, 1))
    qpos[:, 2] -= rng.uniform(0.0003, 0.0008, n_envs)
    qpos[:, 7:] += rng.uniform(-0.04, 0.04, (n_envs, m.nq - 7))
    qvel = rng.uniform(-0.2, 0.2, (n_envs, m.nv))
    ctrl = rng.uniform(-0.3, 0.3, (n_envs, m.nu))
    warm = jnp.asarray(rng.uniform(-0.5, 0.5, (n_envs, m.nv)), jnp.float32)

    def stages(qpos, qvel, ctrl):
        data = pm.make_data(plan, model)
        data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
        data, efc = fwd3.fwd_position(plan, model, data)
        data = fwd3.fwd_velocity(plan, model, data)
        data = fwd3.fwd_actuation(plan, model, data)
        data = fwd3.fwd_acceleration(plan, model, data)
        mu_t = efc.ell_mu * jax.lax.rsqrt(
            jnp.maximum(model.opt_impratio, 1e-12)
        )
        return (
            data.qM, data.crb_buf, data.cdof, efc.J, efc.aref, efc.D, mu_t,
            data.qfrc_smooth,
        )

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    qm, buf, cdof, j, aref, d_rows, mu_t, qfrc = jax.jit(jax.vmap(stages))(
        f32(qpos), f32(qvel), f32(ctrl)
    )
    tol = jnp.asarray(m.opt.tolerance, jnp.float32)
    ns = plan.nefc - 3 * plan.ncon_ell
    anc = jnp.asarray(plan.ancestry_mask, jnp.float32)
    arm = jnp.asarray(model.dof_armature, jnp.float32)

    dense = cg_solver_kernel._ell_cg_solve_tpu(
        qm, j, aref, d_rows, mu_t, qfrc, warm, tol,
        ns=ns, ncon_ell=plan.ncon_ell,
        iterations=1, ls_iterations=_ELL_LS_ITERS, interpret=True,
    )
    built = cg_solver_kernel._ell_cg_solve_tpu(
        qm, j, aref, d_rows, mu_t, qfrc, warm, tol,
        crb=(buf, cdof, anc, arm),
        ns=ns, ncon_ell=plan.ncon_ell,
        iterations=1, ls_iterations=_ELL_LS_ITERS, interpret=True,
    )
    names = ("qacc_smooth", "qacc", "efc_force", "qfrc_constraint")
    for name, a, b in zip(names, built, dense):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        err = np.abs(a - b).max() / max(1.0, np.abs(b).max())
        assert err < 2e-4, f"{name}: rel err {err:.2e}"


def test_cg_kernel_j_build_matches_dense(cg_rodent):
    """The in-VMEM J assembly from the compact jb operands (round-5 fusion,
    VERDICT r4 #3) must match the dense-J kernel path at f32-roundoff level
    on all outputs — incl. the force scatter back to efc row order."""
    from track_mjx_tpu.physics import forward as fwdj

    m, plan, model = cg_rodent
    rng = np.random.RandomState(17)
    n_envs = 4
    qpos = np.tile(m.qpos0, (n_envs, 1))
    qpos[:, 2] -= rng.uniform(0.008, 0.016, n_envs)
    qpos[:, 7:] += rng.uniform(-0.08, 0.08, (n_envs, m.nq - 7))
    qvel = rng.uniform(-0.5, 0.5, (n_envs, m.nv))
    ctrl = rng.uniform(-0.5, 0.5, (n_envs, m.nu))
    warm = jnp.asarray(rng.uniform(-1.0, 1.0, (n_envs, m.nv)), jnp.float32)

    def stages(qpos, qvel, ctrl):
        data = pm.make_data(plan, model)
        data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
        data, efc = fwdj.fwd_position(plan, model, data)
        data = fwdj.fwd_velocity(plan, model, data)
        data = fwdj.fwd_actuation(plan, model, data)
        data = fwdj.fwd_acceleration(plan, model, data)
        assert efc.jb_fq is not None, "rodent plan must emit jb operands"
        return (
            data.qM, data.crb_buf, data.cdof, efc.J, efc.aref, efc.D,
            data.qfrc_smooth, efc.jb_fq, efc.jb_sw, efc.jb_ll, efc.jb_mu,
        )

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    qm, buf, cdof, j, aref, d_rows, qfrc, fq, sw, ll, mu = jax.jit(
        jax.vmap(stages)
    )(f32(qpos), f32(qvel), f32(ctrl))
    tol = jnp.asarray(m.opt.tolerance, jnp.float32)
    hd = jnp.broadcast_to(
        jnp.asarray(m.opt.timestep * m.dof_damping, jnp.float32),
        (n_envs, m.nv),
    )
    anc = jnp.asarray(plan.ancestry_mask, jnp.float32)
    arm = jnp.asarray(model.dof_armature, jnp.float32)
    dm_np, lim1h_np = solver_mod._jb_static(plan)
    jb = (fq, sw, ll, mu, f32(dm_np), f32(lim1h_np))
    jb_dims = (int(plan.nlimit), int(plan.ncon))

    # active-contact sanity: the built J must have nonzero pyramid rows
    assert float(jnp.max(jnp.abs(fq))) > 0

    dense = cg_solver_kernel._cg_solve_tpu(
        qm, j, aref, d_rows, qfrc, warm, tol, hd=hd,
        crb=(buf, cdof, anc, arm),
        iterations=_ITERS, ls_iterations=_LS_ITERS, interpret=True,
    )
    built = cg_solver_kernel._cg_solve_tpu(
        qm, j, aref, d_rows, qfrc, warm, tol, hd=hd,
        crb=(buf, cdof, anc, arm), jb=jb, jb_dims=jb_dims,
        iterations=_ITERS, ls_iterations=_LS_ITERS, interpret=True,
    )
    names = ("qacc_smooth", "qacc", "efc_force", "qfrc_constraint", "qacc_eff")
    # the J build reassociates the frame-projection sum (6 slab products vs
    # two 3-term contractions added) — f32 drift comparable to the qm build
    for name, a, b in zip(names, built, dense):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        err = np.abs(a - b).max() / max(1.0, np.abs(b).max())
        assert err < 5e-4, f"{name}: rel err {err:.2e}"


def test_jb_operand_gating():
    """EfcData.jb_* must be None whenever the plan's row structure is not
    exactly [limits | condim-3 pyramid rows] (ADVICE r4 #3): an equality-
    constrained model must not emit them."""
    import mujoco

    from track_mjx_tpu.physics import constraint as con

    xml = """
    <mujoco>
      <worldbody>
        <body name="a"><joint name="j1" type="hinge" range="-1 1" limited="true"/>
          <geom type="capsule" size="0.05" fromto="0 0 0 0.3 0 0"/>
          <body name="b" pos="0.3 0 0"><joint name="j2" type="hinge"/>
            <geom type="capsule" size="0.05" fromto="0 0 0 0.3 0 0"/>
          </body>
        </body>
      </worldbody>
      <equality><joint joint1="j1" joint2="j2"/></equality>
    </mujoco>
    """
    m = mujoco.MjModel.from_xml_string(xml)
    m.opt.solver = 1
    plan, model = pm.put_model(m)
    assert plan.ne > 0
    assert not con._jb_supported(plan)
    data = pm.make_data(plan, model)
    data, efc = fwd.fwd_position(plan, model, data)
    assert efc.jb_fq is None and efc.jb_sw is None
    assert efc.jb_ll is None and efc.jb_mu is None


def test_elliptic_cg_kernel_j_build_matches_dense(cg_fly):
    """The elliptic kernel's in-VMEM J assembly (round 5: cone sections are
    the frame-projected rows directly, limit one-hots in the scalar section)
    must match the dense-J kernel path at f32-roundoff level. Both arms run
    the SAME kernel math apart from where J comes from, so the comparison is
    immune to the elliptic linesearch's knife-edge bracket sensitivity at
    the iterate level (unlike a fused-vs-unfused comparison)."""
    from track_mjx_tpu.physics import forward as fwde

    m, plan, model = cg_fly
    qm, j, aref, d_rows, mu_t, qfrc, warm = _fly_solver_inputs(m, plan, model)
    tol = jnp.asarray(m.opt.tolerance, jnp.float32)
    ns = plan.nefc - 3 * plan.ncon_ell
    hd = jnp.broadcast_to(
        jnp.asarray(m.opt.timestep * m.dof_damping, jnp.float32),
        (qm.shape[0], m.nv),
    )

    n_envs = qm.shape[0]
    rng = np.random.RandomState(7)
    qpos = np.tile(m.qpos0, (n_envs, 1))
    qpos[:, 2] -= rng.uniform(0.02, 0.12, n_envs)
    qpos[:, 7:] += rng.uniform(-0.10, 0.10, (n_envs, m.nq - 7))
    qvel = rng.uniform(-2.0, 2.0, (n_envs, m.nv))
    ctrl = rng.uniform(-0.3, 0.3, (n_envs, m.nu))
    qpos[-2:] = m.qpos0
    qpos[-2:, 7:] += rng.uniform(-0.02, 0.02, (2, m.nq - 7))
    qpos[-2:, 2] -= [0.02, 0.04]
    qvel[-2:] = 0.0
    ctrl[-2:] = 0.0

    def jb_stage(qpos, qvel, ctrl):
        d = pm.make_data(plan, model)
        d = d.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
        d, efc = fwde.fwd_position(plan, model, d)
        assert efc.jb_fq is not None, "fly plan must emit jb operands"
        return efc.jb_fq, efc.jb_sw, efc.jb_ll

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    fq, sw, ll = jax.jit(jax.vmap(jb_stage))(f32(qpos), f32(qvel), f32(ctrl))
    dm_np, lim1h_np = solver_mod._jb_static(plan)
    assert int(plan.nlimit) == ns, "elliptic jb gate: scalar rows == limits"
    jb = (fq, sw, ll, f32(dm_np), f32(lim1h_np))

    dense = cg_solver_kernel._ell_cg_solve_tpu(
        qm, j, aref, d_rows, mu_t, qfrc, warm, tol, hd=hd,
        ns=ns, ncon_ell=plan.ncon_ell,
        iterations=_ELL_ITERS, ls_iterations=_ELL_LS_ITERS, interpret=True,
    )
    built = cg_solver_kernel._ell_cg_solve_tpu(
        qm, j, aref, d_rows, mu_t, qfrc, warm, tol, hd=hd,
        jb=jb, jb_nl=ns,
        ns=ns, ncon_ell=plan.ncon_ell,
        iterations=_ELL_ITERS, ls_iterations=_ELL_LS_ITERS, interpret=True,
    )
    # The built rows reassociate the frame projection (6 slab products vs
    # two 3-term contractions added): J entries differ at ~1 ulp (verified
    # directly below). On the two STATIC knife-edge envs (MuJoCo-C
    # warmstart, cone blocks at zone boundaries) the safeguarded
    # linesearch's bracket decisions legitimately flip under that ulp (the
    # same sensitivity documented by the one-iteration test), so those envs
    # are held to OBJECTIVE parity while the sliding envs are held to
    # iterate-level roundoff.
    names = ("qacc_smooth", "qacc", "efc_force", "qfrc_constraint", "qacc_eff")
    for name, a, b in zip(names, built, dense):
        a = np.asarray(a, np.float64)[:-2]
        b = np.asarray(b, np.float64)[:-2]
        err = np.abs(a - b).max() / max(1.0, np.abs(b).max())
        assert err < 1e-3, f"{name}: rel err {err:.2e}"
    # knife-edge envs: judge by optimality gap against a converged
    # (cg/60/15) reference, with the bound the objective-parity test
    # established (2x the dense arm's gap + 1e-3 |cost*|)
    star = jax.vmap(
        lambda QM, J, A, D, MU, F, W: solver_mod._elliptic_cg_single(
            60, 15, plan.ncon_ell, QM, J, A, D, MU, F, W, tol
        )
    )(qm, j, aref, d_rows, mu_t, qfrc, warm)
    cost_star = _ell_objective_f64(
        qm, j, aref, d_rows, mu_t, star[0], star[1], ns, plan.ncon_ell
    )
    gap_built = (
        _ell_objective_f64(
            qm, j, aref, d_rows, mu_t, star[0], built[1], ns, plan.ncon_ell
        )
        - cost_star
    )
    gap_dense = (
        _ell_objective_f64(
            qm, j, aref, d_rows, mu_t, star[0], dense[1], ns, plan.ncon_ell
        )
        - cost_star
    )
    bound = 2.0 * gap_dense + 1e-3 * np.abs(cost_star)
    assert np.all(gap_built <= bound), (
        f"optimality gaps built={gap_built} vs dense={gap_dense}"
    )
