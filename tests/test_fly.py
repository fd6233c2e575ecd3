"""Fly-walker physics parity (converged solver agreement with MuJoCo C).

The fly model exercises features the rodent doesn't: mixed condim 1/3 geoms,
nonzero contact margins, mesh visual geoms (6 shipped as placeholders — see
track_mjx_tpu/envs/walker/fly.py), and capsule-capsule self-collision
candidates. Low-iteration CG paths legitimately differ between engines, so
parity is asserted at 20 solver iterations where both converge."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from track_mjx_tpu.envs.walker.base import DEFAULT_ASSET_ROOT
from track_mjx_tpu.envs.walker.fly import ensure_fly_assets
from track_mjx_tpu.physics import model as pm
from track_mjx_tpu.physics.forward import forward


@pytest.fixture(scope="module")
def fly_model():
    d = ensure_fly_assets(DEFAULT_ASSET_ROOT)
    m = mujoco.MjModel.from_xml_path(d + "/fruitfly_force_fast.xml")
    m.opt.solver = 1
    m.opt.iterations = 20
    m.opt.ls_iterations = 10
    m.opt.jacobian = 0
    m.opt.cone = 0  # pyramidal in both engines (elliptic is approximated)
    return m


def test_fly_packs(fly_model):
    plan, model = pm.put_model(fly_model)
    assert plan.nv == 42
    assert plan.ncon > 0
    assert plan.nefc == plan.nlimit + int(
        np.where(
            plan.contact_condim == 1, 1, 2 * (plan.contact_condim - 1)
        ).sum()
    )


def test_fly_forward_parity(fly_model):
    m = fly_model
    plan, model = pm.put_model(m)
    rng = np.random.RandomState(0)
    qpos = m.qpos0.copy()
    qpos[2] -= 0.002
    qpos[7:] += rng.uniform(-0.05, 0.05, m.nq - 7)
    qvel = rng.uniform(-0.2, 0.2, m.nv)
    ctrl = rng.uniform(-0.2, 0.2, m.nu)
    d = mujoco.MjData(m)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    d.ctrl[:] = ctrl
    mujoco.mj_forward(m, d)
    assert d.ncon > 0

    @jax.jit
    def run(model, qpos, qvel, ctrl):
        data = pm.make_data(plan, model)
        data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
        return forward(plan, model, data)

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    data = run(model, f32(qpos), f32(qvel), f32(ctrl))
    for name, tol in [("qacc_smooth", 1e-3), ("qacc", 1e-3)]:
        a = np.asarray(getattr(data, name), np.float64)
        b = getattr(d, name)
        err = np.abs(a - b).max() / max(1.0, np.abs(b).max())
        assert err < tol, f"{name}: rel err {err:.2e}"
