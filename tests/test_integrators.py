"""implicit / implicitfast integrator parity vs MuJoCo C (mj_implicit).

The reference reaches integrators through mjx (SURVEY §2b "put_model / step /
forward" row); its shipped workloads compile to Euler, so these exist for
framework completeness. The probe model exercises every velocity-derivative
term qDeriv can carry: joint damping, fixed-tendon damping, inertia-box fluid
drag (density/viscosity), and a velocity-affine actuator (damper-style
gainprm/biasprm), on hinge/slide/ball/free joints.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from track_mjx_tpu.physics import forward as fwd
from track_mjx_tpu.physics import model as pm

PROBE_XML = """
<mujoco>
  <option timestep="0.002" density="1.2" viscosity="0.0002" solver="CG"
          iterations="30" ls_iterations="20" tolerance="0" integrator="{integrator}"/>
  <worldbody>
    <body name="root" pos="0 0 0.4">
      <freejoint/>
      <geom type="box" size="0.06 0.04 0.03" mass="0.4"
            contype="0" conaffinity="0"/>
      <body name="arm" pos="0.1 0 0">
        <joint name="swing" type="hinge" axis="0 1 0" range="-1.2 1.2"
               damping="0.08" stiffness="1.5"/>
        <geom type="capsule" fromto="0 0 0 0.18 0 0" size="0.02" mass="0.12"
              contype="0" conaffinity="0"/>
        <body name="wrist" pos="0.18 0 0">
          <joint name="ball" type="ball" damping="0.03"/>
          <geom type="sphere" size="0.03" mass="0.06"
                contype="0" conaffinity="0"/>
          <site name="tip" pos="0.03 0 0"/>
        </body>
      </body>
      <body name="slider" pos="-0.1 0 0">
        <joint name="slide" type="slide" axis="0 0 1" range="-0.15 0.15"
               damping="0.12"/>
        <geom type="box" size="0.02 0.02 0.02" mass="0.05"
              contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="couple" damping="0.05">
      <joint joint="swing" coef="1.0"/>
      <joint joint="slide" coef="-0.7"/>
    </fixed>
  </tendon>
  <actuator>
    <motor joint="swing" gear="1"/>
    <general joint="slide" gainprm="2 0 -0.3" biasprm="0 -1.0 -0.2"
             biastype="affine"/>
  </actuator>
</mujoco>
"""


def _run_pair(integrator_name: str, n_steps: int = 10):
    m = mujoco.MjModel.from_xml_string(
        PROBE_XML.format(integrator=integrator_name)
    )
    plan, model = pm.put_model(m)

    rng = np.random.default_rng(3)
    qpos = m.qpos0.copy()
    qpos[7:] += rng.uniform(-0.2, 0.2, m.nq - 7)
    quat = rng.normal(size=4)
    qpos[3:7] = quat / np.linalg.norm(quat)
    qvel = rng.uniform(-0.5, 0.5, m.nv)
    ctrl = np.array([0.25, -0.4])

    d = mujoco.MjData(m)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    d.ctrl[:] = ctrl
    for _ in range(n_steps):
        mujoco.mj_step(m, d)

    @jax.jit
    def run(model, qpos, qvel, ctrl):
        data = pm.make_data(plan, model)
        data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)

        def body(dd, _):
            return fwd.step(plan, model, dd), None

        data, _ = jax.lax.scan(body, data, None, length=n_steps)
        return data

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    data = run(model, f32(qpos), f32(qvel), f32(ctrl))
    return m, d, data


def _assert_traj(m, d, data, rel):
    scale = max(1.0, np.abs(d.qpos).max())
    np.testing.assert_allclose(
        np.asarray(data.qpos), d.qpos, atol=rel * scale, err_msg="qpos"
    )
    vscale = max(1.0, np.abs(d.qvel).max())
    np.testing.assert_allclose(
        np.asarray(data.qvel), d.qvel, atol=rel * vscale, err_msg="qvel"
    )


class TestImplicitIntegrators:
    def test_implicitfast_trajectory(self):
        """implicitfast: qDeriv = d(passive+actuator)/dqvel, symmetrized,
        Cholesky solve (mj_implicit with mjINT_IMPLICITFAST)."""
        m, d, data = _run_pair("implicitfast")
        assert int(m.opt.integrator) == pm.INT_IMPLICITFAST
        _assert_traj(m, d, data, rel=2e-3)

    def test_implicit_trajectory(self):
        """implicit: full qDeriv including the RNE (Coriolis) velocity
        derivative, unsymmetrized LU solve (mjINT_IMPLICIT)."""
        m, d, data = _run_pair("implicit")
        assert int(m.opt.integrator) == pm.INT_IMPLICIT
        _assert_traj(m, d, data, rel=2e-3)

    def test_integrators_differ(self):
        """The two implicit variants must not be accidentally aliased: with
        fluid drag + Coriolis present their 10-step trajectories differ."""
        _, _, fast = _run_pair("implicitfast")
        _, _, full = _run_pair("implicit")
        assert not np.allclose(
            np.asarray(fast.qpos), np.asarray(full.qpos), atol=1e-7
        )
