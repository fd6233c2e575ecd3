"""CG-kernel microbenchmark: where does the solve's device time live?

Times `_cg_solve_tpu` directly on realistic contact-rich rodent batches at
several iteration counts; the slope against `iterations` is the per-CG-
iteration cost (matvecs + linesearch + one chosolve), the intercept is the
fixed part (qM build + factor + smooth solve + warmstart selection [+ the
fused Euler refactor+solve when hd is passed]). Run on the TPU host:

    python tools/kernel_microbench.py [batch]

This quantifies round-5 lead #1 (ROUND_NOTES.md): if the intercept and the
slope are both dominated by substitution-like serialized work, a blocked
(panel-8) substitution is the next kernel move.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from track_mjx_tpu.envs.walker.base import DEFAULT_ASSET_ROOT
from track_mjx_tpu.ops import cg_solver_kernel
from track_mjx_tpu.physics import forward as fwd
from track_mjx_tpu.physics import model as pm


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    m = mujoco.MjModel.from_xml_path(DEFAULT_ASSET_ROOT + "/rodent/rodent.xml")
    m.opt.solver = 1
    m.opt.iterations = 4
    m.opt.ls_iterations = 4
    m.opt.jacobian = 0
    plan, model = pm.put_model(m)

    rng = np.random.RandomState(0)
    qpos = np.tile(m.qpos0, (batch, 1))
    qpos[:, 2] -= rng.uniform(0.008, 0.016, batch)
    qpos[:, 7:] += rng.uniform(-0.08, 0.08, (batch, m.nq - 7))
    qvel = rng.uniform(-0.5, 0.5, (batch, m.nv))
    ctrl = rng.uniform(-0.5, 0.5, (batch, m.nu))

    def stages(qpos, qvel, ctrl):
        d = pm.make_data(plan, model)
        d = d.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
        d, efc = fwd.fwd_position(plan, model, d)
        d = fwd.fwd_velocity(plan, model, d)
        d = fwd.fwd_actuation(plan, model, d)
        d = fwd.fwd_acceleration(plan, model, d)
        return (
            d.qM, d.crb_buf, d.cdof, efc.J, efc.aref, efc.D, d.qfrc_smooth
        )

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    qm, buf, cdof, j, aref, d_rows, qfrc = jax.jit(jax.vmap(stages))(
        f32(qpos), f32(qvel), f32(ctrl)
    )
    warm = f32(rng.uniform(-1.0, 1.0, (batch, m.nv)))
    tol = jnp.asarray(m.opt.tolerance, jnp.float32)
    hd = jnp.broadcast_to(
        f32(m.opt.timestep * m.dof_damping), (batch, m.nv)
    )
    anc = jnp.asarray(plan.ancestry_mask, jnp.float32)
    arm = jnp.asarray(model.dof_armature, jnp.float32)
    jax.block_until_ready(qm)

    def timeit(label, fn, reps=30):
        # scan over reps with a tiny input perturbation so XLA can't hoist
        def scanned(args):
            def body(carry, _):
                out = fn(*carry)
                bumped = (carry[0] * (1.0 + 1e-7),) + carry[1:]
                return bumped, out[1][0, 0]

            _, ys = jax.lax.scan(body, args, None, length=reps)
            return ys

        f = jax.jit(scanned)
        args = (qfrc, qm, buf, cdof, j, aref, d_rows, warm)
        ys = f(args)
        jax.block_until_ready(ys)
        times = []
        for _ in range(3):
            t0 = time.time()
            ys = f(args)
            jax.block_until_ready(ys)
            times.append(time.time() - t0)
        dt = min(times) / reps
        print(f"{label:40s} {dt * 1e3:8.3f} ms/solve")
        return dt

    results = {}
    for iters in (0, 1, 2, 4, 6):
        def solve(qfrc_, qm_, buf_, cdof_, j_, aref_, d_, warm_, iters=iters):
            return cg_solver_kernel._cg_solve_tpu(
                qm_, j_, aref_, d_, qfrc_, warm_, tol, hd=hd,
                crb=(buf_, cdof_, anc, arm),
                iterations=iters, ls_iterations=4,
            )

        results[iters] = timeit(f"qm-build+euler, iterations={iters}", solve)

    # dense-qM variant at the workload depth for comparison
    def solve_dense(qfrc_, qm_, buf_, cdof_, j_, aref_, d_, warm_):
        return cg_solver_kernel._cg_solve_tpu(
            qm_, j_, aref_, d_, qfrc_, warm_, tol, hd=hd,
            iterations=4, ls_iterations=4,
        )

    timeit("dense-qM+euler, iterations=4", solve_dense)

    # no-euler variant (isolates the second factor+substitution)
    def solve_noeuler(qfrc_, qm_, buf_, cdof_, j_, aref_, d_, warm_):
        return cg_solver_kernel._cg_solve_tpu(
            qm_, j_, aref_, d_, qfrc_, warm_, tol,
            crb=(buf_, cdof_, anc, arm),
            iterations=4, ls_iterations=4,
        )

    timeit("qm-build NO euler, iterations=4", solve_noeuler)

    # jb (in-kernel J build) variant at the workload depth: operands from the
    # real constraint stage, static tables from the solver helper
    from track_mjx_tpu.physics import solver as solver_mod

    def stages_jb(qpos, qvel, ctrl):
        d = pm.make_data(plan, model)
        d = d.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
        d, efc = fwd.fwd_position(plan, model, d)
        return efc.jb_fq, efc.jb_sw, efc.jb_ll, efc.jb_mu

    fq, sw, ll, mu = jax.jit(jax.vmap(stages_jb))(
        f32(qpos), f32(qvel), f32(ctrl)
    )
    dm_np, lim1h_np = solver_mod._jb_static(plan)
    jb_static = (f32(dm_np), f32(lim1h_np))
    jb_dims = (int(plan.nlimit), int(plan.ncon))
    jax.block_until_ready(fq)

    for iters in (0, 4):
        def solve_jb(qfrc_, qm_, buf_, cdof_, j_, aref_, d_, warm_, iters=iters):
            return cg_solver_kernel._cg_solve_tpu(
                qm_, j_, aref_, d_, qfrc_, warm_, tol, hd=hd,
                crb=(buf_, cdof_, anc, arm),
                jb=(fq, sw, ll, mu) + jb_static, jb_dims=jb_dims,
                iterations=iters, ls_iterations=4,
            )

        timeit(f"qm+J-build+euler, iterations={iters}", solve_jb)

    it = sorted(k for k in results)
    slope = (results[it[-1]] - results[it[0]]) / (it[-1] - it[0])
    print(
        f"\nper-CG-iteration cost ~ {slope * 1e3:.3f} ms; fixed part "
        f"(build+factor+smooth+warmstart+euler) ~ {results[0] * 1e3:.3f} ms"
    )


if __name__ == "__main__":
    main()
