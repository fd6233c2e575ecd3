"""Per-stage physics timing at batch N on the local device.

Usage: python tools/profile_stages.py [batch] [walker]
Times each pipeline stage jitted separately (vmapped over the batch), plus the
fused full step, to localize bottlenecks.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, ".")

from track_mjx_tpu.envs.walker.base import DEFAULT_ASSET_ROOT
from track_mjx_tpu.physics import model as pm
from track_mjx_tpu.physics import forward as fwd
from track_mjx_tpu.physics.kinematics import kinematics
from track_mjx_tpu.physics.com import com_pos, com_vel
from track_mjx_tpu.physics.inertia import crb, factor_m, solve_m
from track_mjx_tpu.physics.rne import rne
from track_mjx_tpu.physics.passive import passive
from track_mjx_tpu.physics.actuation import actuation, tendon
from track_mjx_tpu.physics.collision import collide
from track_mjx_tpu.physics.constraint import make_constraint
from track_mjx_tpu.physics import solver as solver_mod


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    path = DEFAULT_ASSET_ROOT + "/rodent/rodent.xml"
    m = mujoco.MjModel.from_xml_path(path)
    m.opt.solver = 1
    m.opt.iterations = 5
    m.opt.ls_iterations = 5
    plan, model = pm.put_model(m)
    print(f"batch={batch} nv={plan.nv} ncon={plan.ncon} nefc={plan.nefc}",
          file=sys.stderr)

    rng = np.random.RandomState(0)
    qpos = np.tile(m.qpos0, (batch, 1))
    qpos[:, 2] -= 0.01
    qpos[:, 7:] += rng.uniform(-0.05, 0.05, (batch, m.nq - 7))
    qvel = rng.uniform(-0.2, 0.2, (batch, m.nv))
    ctrl = rng.uniform(-0.5, 0.5, (batch, m.nu))

    def batch_data(qpos, qvel, ctrl):
        def mk(q, v, c):
            d = pm.make_data(plan, model)
            return d.replace(qpos=q, qvel=v, ctrl=c)

        return jax.vmap(mk)(qpos, qvel, ctrl)

    data = jax.jit(batch_data)(
        jnp.asarray(qpos, jnp.float32),
        jnp.asarray(qvel, jnp.float32),
        jnp.asarray(ctrl, jnp.float32),
    )
    # a fully-populated state for isolated stage timing
    full = jax.jit(jax.vmap(lambda d: fwd.forward(plan, model, d)))(data)
    jax.block_until_ready(full.qacc)

    scan_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    def timeit(name, fn, *args, n=5, returns_data=True):
        reps = scan_reps if returns_data else 1
        if reps > 1:
            # amortize the per-call dispatch floor: time scan(stage, reps);
            # perturb the carry slightly so XLA can't hoist the body
            inner = fn

            def fn_scanned(d):
                def body(carry, _):
                    out = inner(carry)
                    return out.replace(qpos=out.qpos * (1.0 + 1e-7)), None

                carry, _ = jax.lax.scan(body, d, None, length=reps)
                return carry

            f = jax.jit(fn_scanned)
        else:
            f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        times = []
        for _ in range(n):
            t0 = time.time()
            out = f(*args)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        dt = min(times) / reps
        print(f"{name:22s} {dt * 1e3:8.2f} ms", file=sys.stderr)
        return dt

    hp = jax.default_matmul_precision("highest")

    def stage(f):
        def g(d):
            with hp:
                return jax.vmap(lambda dd: f(plan, model, dd))(d)

        return g

    timeit("kinematics", stage(kinematics), full)
    timeit("com_pos", stage(com_pos), full)
    timeit("com_vel", stage(com_vel), full)
    timeit("crb", stage(crb), full)
    timeit("factor_m (cholesky)", stage(factor_m), full)
    timeit("rne", stage(rne), full)
    timeit("passive", stage(passive), full)
    timeit("tendon+actuation",
           stage(lambda p, mo, d: actuation(p, mo, tendon(p, mo, d))), full)

    def coll(d):
        with hp:
            return jax.vmap(lambda dd: collide(plan, model, dd)[0])(d)

    timeit("collision", coll, full)

    def constr(d):
        with hp:
            def one(dd):
                dd, contact = collide(plan, model, dd)
                return make_constraint(plan, model, dd, contact)

            return jax.vmap(one)(d)

    timeit("collision+constraint", constr, full, returns_data=False)

    def slv(d):
        with hp:
            def one(dd):
                dd, contact = collide(plan, model, dd)
                efc = make_constraint(plan, model, dd, contact)
                return solver_mod.solve(plan, model, dd, efc)

            return jax.vmap(one)(d)

    timeit("coll+constr+solver", slv, full)

    def solve_only(d):
        with hp:
            return jax.vmap(lambda dd: solve_m(dd, dd.qfrc_bias))(d)

    timeit("solve_m (2 trisolve)", solve_only, full, returns_data=False)

    timeit("euler", stage(fwd.euler), full)

    def full_step(d):
        return jax.vmap(lambda dd: fwd.step(plan, model, dd))(d)

    dt = timeit("FULL STEP", full_step, full, n=3)
    print(f"full-step throughput: {batch / dt:,.0f} env-steps/s (physics only)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
