"""Forward dynamics pipeline and Euler step (mj_forward / mj_step parity).

Single-env functions; vectorize with jax.vmap over a batch of Data and run the
whole epoch under one jit. Reference reaches the equivalent functionality via
brax's PipelineEnv pipeline_init/pipeline_step over mjx (reference:
track_mjx/environment/task/single_clip_tracking.py:163,219).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from track_mjx_tpu.ops import quaternion as quat
from track_mjx_tpu.physics import actuation as _actuation
from track_mjx_tpu.physics import collision as _collision
from track_mjx_tpu.physics import com as _com
from track_mjx_tpu.physics import constraint as _constraint
from track_mjx_tpu.physics import inertia as _inertia
from track_mjx_tpu.physics import kinematics as _kinematics
from track_mjx_tpu.physics import passive as _passive
from track_mjx_tpu.physics import rne as _rne
from track_mjx_tpu.physics import sensors as _sensors
from track_mjx_tpu.physics import solver as _solver
from track_mjx_tpu.physics.model import (
    Data,
    Model,
    PhysicsPlan,
    DYN_FILTEREXACT,
    JNT_BALL,
    JNT_FREE,
    JNT_HINGE,
    JNT_SLIDE,
)


def fwd_position(plan: PhysicsPlan, model: Model, data: Data):
    # named scopes: per-stage device-time attribution in jax.profiler traces
    # (tools/trace_phases.py buckets by these names)
    with jax.named_scope("kinematics"):
        data = _kinematics.kinematics(plan, model, data)
        data = _com.com_pos(plan, model, data)
    with jax.named_scope("tendon"):
        data = _actuation.tendon(plan, model, data)
    with jax.named_scope("crb"):
        data = _inertia.crb(plan, model, data)
        if not _solver.fused_cg(plan):
            # fused-CG plans (scalar or elliptic) never materialize qLD: the
            # solve op factors qM in-kernel (solver.fused_cg)
            data = _inertia.factor_m(plan, model, data)
    with jax.named_scope("collide"):
        data, contact = _collision.collide(plan, model, data)
    with jax.named_scope("make_constraint"):
        efc = _constraint.make_constraint(plan, model, data, contact)
    return data, efc


def fwd_velocity(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    with jax.named_scope("com_vel"):
        data = _com.com_vel(plan, model, data)
    with jax.named_scope("passive"):
        data = _passive.passive(plan, model, data)
    with jax.named_scope("rne"):
        data = _rne.rne(plan, model, data)
    return data


def fwd_actuation(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    return _actuation.actuation(plan, model, data)


def fwd_acceleration(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    qfrc_smooth = data.qfrc_passive - data.qfrc_bias + data.qfrc_actuator
    if _solver.fused_cg(plan):
        # qacc_smooth is produced by the fused smooth+CG op in solve()
        return data.replace(qfrc_smooth=qfrc_smooth)
    qacc_smooth = _inertia.solve_m(data, qfrc_smooth)
    return data.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


def forward(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Full forward dynamics: qpos/qvel/ctrl/act -> qacc and all stages.

    The physics pipeline runs under matmul precision "highest": on TPU the
    default f32 matmul uses bf16 MXU passes (~1e-3 relative error), which is
    fine for neural nets but corrupts mass-matrix/constraint solves. The
    pipeline's matmuls are tiny, so the precision bump costs little.
    """
    with jax.default_matmul_precision("highest"):
        data, efc = fwd_position(plan, model, data)
        data = fwd_velocity(plan, model, data)
        with jax.named_scope("actuation"):
            data = fwd_actuation(plan, model, data)
            data = fwd_acceleration(plan, model, data)
        with jax.named_scope("solve"):
            data = _solver.solve(plan, model, data, efc)
        with jax.named_scope("sensor"):
            data = _sensors.sensor(plan, model, data)
    return data


def _integrate_pos(
    plan: PhysicsPlan, model: Model, qpos: jax.Array, qvel: jax.Array, dt
) -> jax.Array:
    """mj_integratePos: joint-type-aware position integration."""
    out = qpos
    scalar = np.nonzero(
        (plan.jnt_type == JNT_HINGE) | (plan.jnt_type == JNT_SLIDE)
    )[0]
    if len(scalar):
        qadr = plan.jnt_qposadr[scalar]
        dadr = plan.jnt_dofadr[scalar]
        out = out.at[qadr].set(qpos[qadr] + dt * qvel[dadr])
    for j in np.nonzero(plan.jnt_type == JNT_FREE)[0]:
        qadr, dadr = int(plan.jnt_qposadr[j]), int(plan.jnt_dofadr[j])
        out = out.at[qadr : qadr + 3].set(
            qpos[qadr : qadr + 3] + dt * qvel[dadr : dadr + 3]
        )
        new_quat = quat.integrate(
            qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt
        )
        out = out.at[qadr + 3 : qadr + 7].set(new_quat)
    for j in np.nonzero(plan.jnt_type == JNT_BALL)[0]:
        qadr, dadr = int(plan.jnt_qposadr[j]), int(plan.jnt_dofadr[j])
        new_quat = quat.integrate(
            qpos[qadr : qadr + 4], qvel[dadr : dadr + 3], dt
        )
        out = out.at[qadr : qadr + 4].set(new_quat)
    return out


def _advance_act(plan: PhysicsPlan, model: Model, data: Data, dt) -> jax.Array:
    if plan.na == 0:
        return data.act
    act = data.act + dt * data.act_dot
    # exact filter integration where requested
    exact = jnp.asarray(plan.actuator_dyntype == DYN_FILTEREXACT)
    tau = jnp.maximum(model.actuator_dynprm[:, 0], 1e-10)
    ctrl = data.ctrl
    act_exact = ctrl + (data.act - ctrl) * jnp.exp(-dt / tau)
    act = jnp.where(exact, act_exact, act)
    limited = model.actuator_actlimited > 0
    act = jnp.where(
        limited,
        jnp.clip(act, model.actuator_actrange[:, 0], model.actuator_actrange[:, 1]),
        act,
    )
    return act


INT_EULER = 0
INT_RK4 = 1
INT_IMPLICIT = 2
INT_IMPLICITFAST = 3


def euler(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Semi-implicit Euler with implicit joint damping (mj_Euler parity).

    Raises at trace time if called with a non-Euler plan (RK4 and
    implicit/implicitfast have their own entry points, dispatched by
    `step`): all reference workloads compile to Euler, and kinematic-only
    models (e.g. the stick ghost walker, whose XML requests RK4 but is never
    stepped) pack fine and only fail if actually integrated."""
    if plan.integrator != INT_EULER:
        raise NotImplementedError(
            f"integrator {plan.integrator} not supported by euler(): use "
            "step(), which dispatches Euler/RK4/implicit/implicitfast"
        )
    with jax.default_matmul_precision("highest"), jax.named_scope("integrate"):
        return _euler_impl(plan, model, data)


def _euler_impl(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    dt = model.opt_timestep
    # implicit damping: qvel_new = qvel + h * (M + h D)^-1 qfrc_total
    # (C uses the raw force, not M @ qacc — they differ when the CG solve is
    # inexact, and matching C here is what keeps trajectories aligned)
    if _solver.fused_euler(plan):
        # the fused CG kernel already performed this solve in the same
        # invocation (qM never re-entered HBM) — see solver.fused_euler
        qacc_eff = data.qacc_eff
    else:
        from track_mjx_tpu.ops import batched_linalg

        mh = data.qM + dt * jnp.diag(model.dof_damping)
        rhs = data.qfrc_smooth + data.qfrc_constraint
        # factor + substitution in one fused kernel on TPU (the (M + h D)
        # factor never round-trips through HBM); CPU numerics identical to
        # cholesky-then-cho_solve
        qacc_eff = batched_linalg.solve_spd(mh, rhs)

    act = _advance_act(plan, model, data, dt)
    qvel = data.qvel + dt * qacc_eff
    qpos = _integrate_pos(plan, model, data.qpos, qvel, dt)
    return data.replace(
        qpos=qpos,
        qvel=qvel,
        act=act,
        time=data.time + dt,
        qacc_warmstart=data.qacc,
    )


# classic RK4 Butcher tableau (mj_RungeKutta with N=4)
_RK4_A = ((0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 1.0))
_RK4_B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)
_RK4_C = (0.5, 0.5, 1.0)


def rk4(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """4th-order Runge-Kutta integration (mj_RungeKutta(m, d, 4) parity).

    `data` must be post-`forward` (stage-0 derivatives come from it). Three
    more full forward evaluations produce the remaining stage derivatives;
    position updates integrate on the quaternion manifold via
    `_integrate_pos` exactly as C does. Stage solves warmstart from the
    step-initial qacc, matching mj_step's warmstart copy placement."""
    dt = model.opt_timestep
    time0, qpos0, qvel0, act0 = data.time, data.qpos, data.qvel, data.act
    has_act = plan.na > 0

    # C copies qacc -> qacc_warmstart after the step-initial forward; the
    # three stage forwards (and the next step's) all use that warmstart
    d = data.replace(qacc_warmstart=data.qacc)
    derivs = [(d.qvel, d.qacc, d.act_dot)]
    for i in range(1, 4):
        a = _RK4_A[i - 1]
        dqvel = sum(a[j] * derivs[j][0] for j in range(i) if a[j])
        dqacc = sum(a[j] * derivs[j][1] for j in range(i) if a[j])
        d = d.replace(
            time=time0 + _RK4_C[i - 1] * dt,
            qpos=_integrate_pos(plan, model, qpos0, dqvel, dt),
            qvel=qvel0 + dt * dqacc,
        )
        if has_act:
            dact = sum(a[j] * derivs[j][2] for j in range(i) if a[j])
            d = d.replace(act=act0 + dt * dact)
        d = forward(plan, model, d)
        derivs.append((d.qvel, d.qacc, d.act_dot))

    dqvel = sum(b * f[0] for b, f in zip(_RK4_B, derivs))
    dqacc = sum(b * f[1] for b, f in zip(_RK4_B, derivs))
    act = act0
    if has_act:
        act = act0 + dt * sum(b * f[2] for b, f in zip(_RK4_B, derivs))
        limited = model.actuator_actlimited > 0
        act = jnp.where(
            limited,
            jnp.clip(
                act, model.actuator_actrange[:, 0], model.actuator_actrange[:, 1]
            ),
            act,
        )
    return data.replace(
        time=time0 + dt,
        qpos=_integrate_pos(plan, model, qpos0, dqvel, dt),
        qvel=qvel0 + dt * dqacc,
        act=act,
        qacc_warmstart=data.qacc,
    )


def _qderiv(
    plan: PhysicsPlan, model: Model, data: Data, include_rne: bool
) -> jax.Array:
    """d(qfrc_passive + qfrc_actuator [- qfrc_bias]) / d qvel, (nv, nv).

    The velocity derivative of the smooth force at fixed pose — C's
    mjd_smooth_vel (engine_derivative.c), which hand-derives the damping,
    fluid-drag, actuator gain/bias, and (for implicit only) RNE terms.
    Here it is exact forward-mode autodiff through the same velocity-stage
    functions the forward pass runs, so every velocity dependence the engine
    actually has is captured, including the inertia-box fluid model.

    One deliberate C quirk is reproduced: C stores qDeriv in the mass
    matrix's ancestor-pair sparsity, so derivative entries coupling dofs on
    different kinematic branches (possible only through tendon damping or
    multi-joint actuator transmissions) are silently dropped. The autodiff
    matrix is masked to the same pattern — verified against mj_step on a
    probe with a cross-branch damped tendon (tests/test_integrators.py)."""

    def f(qvel):
        d = data.replace(qvel=qvel)
        d = _com.com_vel(plan, model, d)
        d = _passive.passive(plan, model, d)
        d = _actuation.actuation(plan, model, d)
        out = d.qfrc_passive + d.qfrc_actuator
        if include_rne:
            d = _rne.rne(plan, model, d)
            out = out - d.qfrc_bias
        return out

    return jax.jacfwd(f)(data.qvel) * jnp.asarray(
        _ancestor_pair_mask(plan), data.qpos.dtype
    )


def _ancestor_pair_mask(plan: PhysicsPlan) -> np.ndarray:
    """(nv, nv) 0/1 mask of dof pairs on a common kinematic chain (the mass
    matrix's sparsity pattern; trace-time constant)."""
    nv = plan.nv
    mask = np.eye(nv)
    for j in range(nv):
        i = int(plan.dof_parentid[j])
        while i >= 0:
            mask[i, j] = mask[j, i] = 1.0
            i = int(plan.dof_parentid[i])
    return mask


def implicit(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """Implicit-in-velocity integration (mj_implicit parity).

    implicitfast (mjINT_IMPLICITFAST): qDeriv skips the RNE term and is
    symmetrized, so (M - h*qDeriv) admits a Cholesky solve — C's documented
    construction. implicit (mjINT_IMPLICIT): full qDeriv including the
    Coriolis/centrifugal derivative, general LU solve. Both then advance
    exactly like Euler (act integration, velocity update from the raw
    qfrc_smooth + qfrc_constraint force, manifold position integration).
    Joint damping enters through qDeriv, not an extra eulerdamp term."""
    from track_mjx_tpu.ops import batched_linalg

    dt = model.opt_timestep
    with jax.default_matmul_precision("highest"):
        fast = plan.integrator == INT_IMPLICITFAST
        qderiv = _qderiv(plan, model, data, include_rne=not fast)
        rhs = data.qfrc_smooth + data.qfrc_constraint
        if fast:
            qderiv = 0.5 * (qderiv + qderiv.T)
            mh = data.qM - dt * qderiv
            qacc_eff = batched_linalg.solve_spd(mh, rhs)
        else:
            qacc_eff = jnp.linalg.solve(data.qM - dt * qderiv, rhs)
        act = _advance_act(plan, model, data, dt)
        qvel = data.qvel + dt * qacc_eff
        qpos = _integrate_pos(plan, model, data.qpos, qvel, dt)
    return data.replace(
        qpos=qpos,
        qvel=qvel,
        act=act,
        time=data.time + dt,
        qacc_warmstart=data.qacc,
    )


def step(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """One physics step: forward dynamics + integration (Euler / RK4 /
    implicit / implicitfast, per the compiled model's opt.integrator)."""
    data = forward(plan, model, data)
    if plan.integrator == INT_RK4:
        return rk4(plan, model, data)
    if plan.integrator in (INT_IMPLICIT, INT_IMPLICITFAST):
        return implicit(plan, model, data)
    return euler(plan, model, data)


# the dynamic state that must survive between physics substeps; everything
# else in Data is recomputed by forward() and would otherwise be dragged
# through the scan carry (~70 MB/1024 envs, ~3 ms/substep of pure traffic)
_CARRY_FIELDS = ("time", "qpos", "qvel", "act", "ctrl", "qacc_warmstart")


@struct.dataclass
class SlimData:
    """The minimal dynamic state between CONTROL steps (same field set as the
    physics-substep scan carry). Wrapper/trainer loops carry this instead of
    the full Data (~70 MB/1024 envs of derived stages that forward() would
    recompute anyway); `expand_slim` rebuilds a full Data template on entry
    to the next pipeline_step."""

    time: jax.Array
    qpos: jax.Array
    qvel: jax.Array
    act: jax.Array
    ctrl: jax.Array
    qacc_warmstart: jax.Array


def slim_data(data) -> SlimData:
    """Full Data (or SlimData) -> SlimData."""
    return SlimData(**{f: getattr(data, f) for f in _CARRY_FIELDS})


def expand_slim(plan: PhysicsPlan, model: Model, slim: SlimData) -> Data:
    """SlimData -> full Data template (derived fields zeroed; forward()
    repopulates them)."""
    from track_mjx_tpu.physics.model import make_data

    base = make_data(plan, model)
    return base.replace(**{f: getattr(slim, f) for f in _CARRY_FIELDS})


def n_step(plan: PhysicsPlan, model: Model, data: Data, n: int) -> Data:
    """n physics substeps under lax.scan (pipeline_step's inner loop).

    The scan carries only the minimal dynamic state; the final substep runs
    outside the scan so the returned Data has all derived stages populated
    (matching MuJoCo's post-step convention: xpos/forces from the last
    forward(), qpos/qvel integrated past it)."""
    if n <= 1:
        return step(plan, model, data)

    def expand(slim: dict) -> Data:
        base = make_data_like(plan, model, data)
        return base.replace(**slim)

    def slim_of(d: Data) -> dict:
        return {f: getattr(d, f) for f in _CARRY_FIELDS}

    def body(slim, _):
        d = step(plan, model, expand(slim))
        return slim_of(d), None

    slim, _ = jax.lax.scan(body, slim_of(data), None, length=n - 1)
    return step(plan, model, expand(slim))


def make_data_like(plan: PhysicsPlan, model: Model, data: Data) -> Data:
    """A zeroed Data template matching `data`'s dtypes (cheap under jit: the
    constants are materialized once)."""
    from track_mjx_tpu.physics.model import make_data

    return make_data(plan, model)
