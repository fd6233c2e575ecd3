"""TPU fused smooth+CG kernel check: numerics vs unfused fallback + timing.

The fused op factors qM in-kernel and solves qacc_smooth before the CG
iterations (see ops/cg_solver_kernel.py); the unfused reference is the
per-env cholesky -> cho_solve -> CG chain it replaced.

Usage: python tools/test_cg_kernel.py [batch]
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np, mujoco

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from track_mjx_tpu.envs.walker.base import DEFAULT_ASSET_ROOT
from track_mjx_tpu.physics import model as pm, forward as fwd, solver as slv
from track_mjx_tpu.ops import cg_solver_kernel as ck

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
m = mujoco.MjModel.from_xml_path(DEFAULT_ASSET_ROOT + "/rodent/rodent.xml")
m.opt.solver = 1; m.opt.iterations = 5; m.opt.ls_iterations = 5
plan, model = pm.put_model(m)
print("backend", jax.default_backend(), "kernel_available:",
      ck.kernel_available(plan.nv, plan.nefc),
      "fused plan:", slv.fused_scalar_cg(plan), flush=True)

rng = np.random.RandomState(0)
qpos = np.tile(m.qpos0, (batch, 1)); qpos[:, 2] -= 0.01
qpos[:, 7:] += rng.uniform(-0.05, 0.05, (batch, m.nq - 7))
qvel = rng.uniform(-0.2, 0.2, (batch, m.nv))
ctrl = rng.uniform(-0.5, 0.5, (batch, m.nu))

def upto_solver(q, v, c):
    d = pm.make_data(plan, model)
    d = d.replace(qpos=q, qvel=v, ctrl=c)
    import jax as _j
    with _j.default_matmul_precision("highest"):
        d, efc = fwd.fwd_position(plan, model, d)
        d = fwd.fwd_velocity(plan, model, d)
        d = fwd.fwd_actuation(plan, model, d)
        d = fwd.fwd_acceleration(plan, model, d)
    return d, efc

f32 = lambda x: jnp.asarray(x, jnp.float32)
data, efc = jax.jit(jax.vmap(upto_solver))(f32(qpos), f32(qvel), f32(ctrl))
jax.block_until_ready(data.qfrc_smooth)
print("pre-solver state ready", flush=True)

op = slv._make_scalar_cg_op(plan.iterations, plan.ls_iterations)

@jax.jit
def fused(data, efc):
    with jax.default_matmul_precision("highest"):
        return jax.vmap(
            lambda qm, J, aref, D, qf, wm: op(qm, J, aref, D, qf, wm, model.opt_tolerance)
        )(data.qM, efc.J, efc.aref, efc.D, data.qfrc_smooth, data.qacc_warmstart)

@jax.jit
def unfused(data, efc):
    with jax.default_matmul_precision("highest"):
        return jax.vmap(
            lambda qm, J, aref, D, qf, wm: slv._smooth_scalar_cg_single(
                plan.iterations, plan.ls_iterations, qm, J, aref, D, qf, wm, model.opt_tolerance)
        )(data.qM, efc.J, efc.aref, efc.D, data.qfrc_smooth, data.qacc_warmstart)

t0 = time.time(); sf, xf, ff, qf = fused(data, efc); jax.block_until_ready(xf)
print(f"fused compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); su, xu, fu, qu = unfused(data, efc); jax.block_until_ready(xu)
print(f"unfused compile+run {time.time()-t0:.1f}s", flush=True)

for name, a, b in [("smooth", sf, su), ("qacc", xf, xu), ("force", ff, fu), ("qfrc", qf, qu)]:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    err = np.abs(a - b).max() / max(1.0, np.abs(b).max())
    print(f"{name}: rel err fused vs unfused {err:.2e}", flush=True)

REPS = 50

def scan_version(solve_fn):
    # chain reps through the warmstart so XLA can't CSE them away;
    # amortizes the ~25-29 ms tunnel dispatch floor over REPS solves
    @jax.jit
    def run(data, efc):
        def body(warm, _):
            _, x, f_, q = solve_fn(data.replace(qacc_warmstart=warm), efc)
            return x, ()
        out, _ = jax.lax.scan(body, data.qacc_warmstart, (), length=REPS)
        return out
    return run

def timeit(f, *args, n=3):
    jax.block_until_ready(f(*args))  # compile
    ts = []
    for _ in range(n):
        t0 = time.time(); out = f(*args); jax.block_until_ready(out); ts.append(time.time()-t0)
    return min(ts) / REPS

fused_s = scan_version(lambda d, e: fused(d, e))
unfused_s = scan_version(lambda d, e: unfused(d, e))
print(f"fused solve:   {timeit(fused_s, data, efc)*1e3:8.3f} ms/solve (x{REPS} scan)")
print(f"unfused solve: {timeit(unfused_s, data, efc)*1e3:8.3f} ms/solve (x{REPS} scan)")
