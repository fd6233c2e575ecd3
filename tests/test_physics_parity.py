"""Physics engine parity tests against the MuJoCo C engine (the numerical
oracle). Stage-by-stage comparisons are the diagnostic core; trajectory tests
are bounded by the system's own chaos floor (a 1e-7 perturbation amplifies to
~1e-1 within 10 contact-rich steps in the C engine itself)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from track_mjx_tpu.physics import model as pm
from track_mjx_tpu.physics.actuation import actuation, tendon
from track_mjx_tpu.physics.com import com_pos, com_vel
from track_mjx_tpu.physics.forward import forward, step
from track_mjx_tpu.physics.inertia import crb
from track_mjx_tpu.physics.kinematics import kinematics
from track_mjx_tpu.physics import postconstraint
from track_mjx_tpu.physics.passive import passive
from track_mjx_tpu.physics.rne import rne


def _random_state(m, seed=0, drop=0.0, joint_scale=0.3):
    rng = np.random.RandomState(seed)
    qpos = m.qpos0.copy()
    qpos[2] -= drop
    if m.nq > 7:
        qpos[7:] += rng.uniform(-joint_scale, joint_scale, m.nq - 7)
    qvel = rng.uniform(-0.5, 0.5, m.nv)
    ctrl = rng.uniform(-0.5, 0.5, m.nu) if m.nu else np.zeros(0)
    return qpos, qvel, ctrl


def _c_forward(m, qpos, qvel, ctrl):
    d = mujoco.MjData(m)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    if m.nu:
        d.ctrl[:] = ctrl
    mujoco.mj_forward(m, d)
    return d


def _jax_stages(plan, model, qpos, qvel, ctrl):
    @jax.jit
    def run(model, qpos, qvel, ctrl):
        data = pm.make_data(plan, model)
        data = data.replace(
            qpos=qpos, qvel=qvel, ctrl=ctrl if plan.nu else data.ctrl
        )
        data = kinematics(plan, model, data)
        data = com_pos(plan, model, data)
        data = com_vel(plan, model, data)
        data = crb(plan, model, data)
        data = tendon(plan, model, data)
        data = passive(plan, model, data)
        data = rne(plan, model, data)
        data = actuation(plan, model, data)
        return data

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return run(model, f32(qpos), f32(qvel), f32(ctrl))


def _assert_close(a, b, rel=1e-3, name=""):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(1.0, np.abs(b).max()) if b.size else 1.0
    err = np.abs(a - b).max() if a.size else 0.0
    assert err / scale < rel, f"{name}: rel err {err / scale:.2e}"


class TestRodentStages:
    @pytest.fixture(scope="class")
    def stages(self, rodent_mj_model, rodent_system):
        m = rodent_mj_model
        plan, model = rodent_system
        qpos, qvel, ctrl = _random_state(m, seed=0)
        d = _c_forward(m, qpos, qvel, ctrl)
        data = _jax_stages(plan, model, qpos, qvel, ctrl)
        return m, d, data

    def test_kinematics(self, stages):
        m, d, data = stages
        _assert_close(data.xpos, d.xpos, name="xpos")
        _assert_close(np.abs(data.xquat), np.abs(d.xquat), name="xquat")
        _assert_close(data.geom_xpos, d.geom_xpos, name="geom_xpos")
        _assert_close(data.site_xpos, d.site_xpos, name="site_xpos")
        _assert_close(data.xanchor, d.xanchor, name="xanchor")
        _assert_close(data.xaxis, d.xaxis, name="xaxis")

    def test_com(self, stages):
        m, d, data = stages
        _assert_close(data.subtree_com, d.subtree_com, name="subtree_com")
        _assert_close(data.cinert, d.cinert, name="cinert")
        _assert_close(data.cdof, d.cdof, name="cdof")
        _assert_close(data.cvel, d.cvel, name="cvel")
        _assert_close(data.cdof_dot, d.cdof_dot, name="cdof_dot")

    def test_crb(self, stages):
        m, d, data = stages
        qm = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, qm)
        _assert_close(data.qM, qm, name="qM")

    def test_rne_passive(self, stages):
        m, d, data = stages
        _assert_close(data.qfrc_bias, d.qfrc_bias, name="qfrc_bias")
        _assert_close(data.qfrc_passive, d.qfrc_passive, name="qfrc_passive")

    def test_actuation(self, stages):
        m, d, data = stages
        _assert_close(data.ten_length, d.ten_length, name="ten_length")
        _assert_close(
            data.actuator_length, d.actuator_length, name="actuator_length"
        )
        _assert_close(
            data.actuator_velocity, d.actuator_velocity, name="actuator_velocity"
        )
        _assert_close(
            data.actuator_force, d.actuator_force, name="actuator_force"
        )
        _assert_close(data.act_dot, d.act_dot, name="act_dot")
        _assert_close(
            data.qfrc_actuator, d.qfrc_actuator, name="qfrc_actuator"
        )


class TestRodentForward:
    def test_forward_with_contacts(self, rodent_mj_model, rodent_system):
        m = rodent_mj_model
        plan, model = rodent_system
        qpos, qvel, ctrl = _random_state(m, seed=1, drop=0.012, joint_scale=0.05)
        d = _c_forward(m, qpos, qvel, ctrl)
        assert d.ncon > 0, "test state must be contact-rich"

        @jax.jit
        def run(model, qpos, qvel, ctrl):
            data = pm.make_data(plan, model)
            data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
            return forward(plan, model, data)

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        data = run(model, f32(qpos), f32(qvel), f32(ctrl))
        _assert_close(data.qacc_smooth, d.qacc_smooth, rel=1e-4, name="qacc_smooth")
        _assert_close(data.qacc, d.qacc, rel=1e-4, name="qacc")
        _assert_close(
            data.qfrc_constraint, d.qfrc_constraint, rel=1e-4, name="qfrc_constraint"
        )

    def test_newton_solver_parity(self, rodent_mj_model):
        """Native mjSOL_NEWTON matches MuJoCo C Newton on a contact-rich
        state (qacc + qfrc_constraint)."""
        import copy

        m = copy.copy(rodent_mj_model)
        m.opt.solver = 2  # mjSOL_NEWTON
        plan, model = pm.put_model(m)
        assert plan.solver == 2
        qpos, qvel, ctrl = _random_state(m, seed=1, drop=0.012, joint_scale=0.05)
        d = _c_forward(m, qpos, qvel, ctrl)
        assert d.ncon > 0, "test state must be contact-rich"

        @jax.jit
        def run(model, qpos, qvel, ctrl):
            data = pm.make_data(plan, model)
            data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
            return forward(plan, model, data)

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        data = run(model, f32(qpos), f32(qvel), f32(ctrl))
        _assert_close(data.qacc, d.qacc, rel=1e-4, name="qacc")
        _assert_close(
            data.qfrc_constraint, d.qfrc_constraint, rel=1e-4, name="qfrc_constraint"
        )

    def test_cfrc_ext(self, rodent_mj_model, rodent_system):
        """Post-constraint body wrenches match mj_rnePostConstraint on a
        contact-rich state (contact contributions; no xfrc/equality here)."""
        m = rodent_mj_model
        plan, model = rodent_system
        qpos, qvel, ctrl = _random_state(m, seed=1, drop=0.012, joint_scale=0.05)
        d = _c_forward(m, qpos, qvel, ctrl)
        assert d.ncon > 0, "test state must be contact-rich"
        mujoco.mj_rnePostConstraint(m, d)

        @jax.jit
        def run(model, qpos, qvel, ctrl):
            data = pm.make_data(plan, model)
            data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
            data = forward(plan, model, data)
            return postconstraint.cfrc_ext(plan, model, data)

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        ours = run(model, f32(qpos), f32(qvel), f32(ctrl))
        assert np.abs(np.asarray(ours)).max() > 0, "wrenches must be nonzero"
        _assert_close(ours, d.cfrc_ext, rel=2e-3, name="cfrc_ext")

    def test_one_step(self, rodent_mj_model, rodent_system):
        m = rodent_mj_model
        plan, model = rodent_system
        qpos, qvel, ctrl = _random_state(m, seed=2, drop=0.005, joint_scale=0.05)
        d = mujoco.MjData(m)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        mujoco.mj_step(m, d)

        @jax.jit
        def run(model, qpos, qvel, ctrl):
            data = pm.make_data(plan, model)
            data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
            return step(plan, model, data)

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        data = run(model, f32(qpos), f32(qvel), f32(ctrl))
        _assert_close(data.qpos, d.qpos, rel=1e-5, name="qpos")
        _assert_close(data.qvel, d.qvel, rel=1e-3, name="qvel")
        _assert_close(data.act, d.act, rel=1e-5, name="act")
        assert float(data.time) == pytest.approx(m.opt.timestep)

    def test_airborne_trajectory(self, rodent_mj_model, rodent_system):
        """Contact-free (airborne) trajectories are non-chaotic and must stay
        tight over many steps."""
        m = rodent_mj_model
        plan, model = rodent_system
        qpos, qvel, ctrl = _random_state(m, seed=3, joint_scale=0.1)
        qpos[2] += 0.5  # lift well above the floor
        d = mujoco.MjData(m)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        nsteps = 20
        for _ in range(nsteps):
            mujoco.mj_step(m, d)
        assert d.ncon == 0

        @jax.jit
        def run(model, qpos, qvel, ctrl):
            data = pm.make_data(plan, model)
            data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)

            def body(dd, _):
                return step(plan, model, dd), None

            data, _ = jax.lax.scan(body, data, None, length=nsteps)
            return data

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        data = run(model, f32(qpos), f32(qvel), f32(ctrl))
        _assert_close(data.qpos, d.qpos, rel=1e-4, name="qpos")
        _assert_close(data.qvel, d.qvel, rel=1e-3, name="qvel")


TOY_XML = """
<mujoco>
  <option timestep="0.002" solver="CG" iterations="6" ls_iterations="6"/>
  <default>
    <geom contype="1" conaffinity="0"/>
  </default>
  <worldbody>
    <geom name="floor" type="plane" size="1 1 0.1" contype="1" conaffinity="1"/>
    <body name="root" pos="0 0 0.3">
      <freejoint/>
      <geom name="torso" type="sphere" size="0.05" mass="0.5"/>
      <body name="arm" pos="0.1 0 0">
        <joint name="swing" type="hinge" axis="0 1 0" range="-1 1"
               damping="0.05" stiffness="2"/>
        <geom name="arm_g" type="capsule" fromto="0 0 0 0.15 0 0"
              size="0.02" mass="0.1"/>
        <body name="wrist" pos="0.15 0 0">
          <joint name="ball" type="ball" damping="0.02"/>
          <geom name="hand" type="sphere" size="0.03" mass="0.05"/>
        </body>
      </body>
      <body name="slider" pos="-0.1 0 0">
        <joint name="slide" type="slide" axis="0 0 1" range="-0.1 0.1"
               damping="0.1"/>
        <geom name="slide_g" type="box" size="0.02 0.02 0.02" mass="0.05"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="swing" gear="1"/>
    <motor joint="slide" gear="2"/>
  </actuator>
</mujoco>
"""


class TestToyModel:
    """Covers ball/slide joints and sphere/box collisions absent from the
    rodent."""

    @pytest.fixture(scope="class")
    def toy(self):
        m = mujoco.MjModel.from_xml_string(TOY_XML)
        plan, model = pm.put_model(m)
        return m, plan, model

    def test_forward(self, toy):
        m, plan, model = toy
        rng = np.random.RandomState(0)
        qpos = m.qpos0.copy()
        qpos[2] = 0.06  # bodies touching floor
        q = rng.normal(size=4)
        qpos[3:7] = q / np.linalg.norm(q)
        bq = rng.normal(size=4)
        # ball joint quaternion (keep it mild so nothing tunnels)
        qpos[8:12] = np.array([1.0, 0.1, -0.05, 0.02])
        qpos[8:12] /= np.linalg.norm(qpos[8:12])
        qvel = rng.uniform(-0.3, 0.3, m.nv)
        ctrl = rng.uniform(-0.5, 0.5, m.nu)
        d = _c_forward(m, qpos, qvel, ctrl)

        @jax.jit
        def run(model, qpos, qvel, ctrl):
            data = pm.make_data(plan, model)
            data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
            return forward(plan, model, data)

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        data = run(model, f32(qpos), f32(qvel), f32(ctrl))
        _assert_close(data.qacc_smooth, d.qacc_smooth, rel=2e-4, name="qacc_smooth")
        _assert_close(data.qacc, d.qacc, rel=5e-4, name="qacc")

    def test_trajectory(self, toy):
        m, plan, model = toy
        qpos = m.qpos0.copy()
        qvel = np.zeros(m.nv)
        ctrl = np.array([0.3, -0.2])
        d = mujoco.MjData(m)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        for _ in range(10):
            mujoco.mj_step(m, d)

        @jax.jit
        def run(model, qpos, qvel, ctrl):
            data = pm.make_data(plan, model)
            data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)

            def body(dd, _):
                return step(plan, model, dd), None

            data, _ = jax.lax.scan(body, data, None, length=10)
            return data

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        data = run(model, f32(qpos), f32(qvel), f32(ctrl))
        _assert_close(data.qpos, d.qpos, rel=2e-3, name="qpos")

    def test_rk4_trajectory(self):
        """RK4 integrator parity over a short trajectory (mj_RungeKutta):
        hinge/slide/ball/free joints, actuators, contacts."""
        m = mujoco.MjModel.from_xml_string(TOY_XML)
        m.opt.integrator = 1  # mjINT_RK4
        plan, model = pm.put_model(m)
        assert plan.integrator == 1
        qpos = m.qpos0.copy()
        qvel = np.zeros(m.nv)
        ctrl = np.array([0.3, -0.2])
        d = mujoco.MjData(m)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        for _ in range(10):
            mujoco.mj_step(m, d)

        @jax.jit
        def run(model, qpos, qvel, ctrl):
            data = pm.make_data(plan, model)
            data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)

            def body(dd, _):
                return step(plan, model, dd), None

            data, _ = jax.lax.scan(body, data, None, length=10)
            return data

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        data = run(model, f32(qpos), f32(qvel), f32(ctrl))
        _assert_close(data.qpos, d.qpos, rel=2e-3, name="qpos")
        _assert_close(data.qvel, d.qvel, rel=5e-3, name="qvel")
        assert float(data.time) == pytest.approx(10 * m.opt.timestep, rel=1e-5)


class TestSensors:
    """Sensor parity vs the C engine (rodent IMU triplet + subtreelinvel)."""

    def test_sensordata(self, rodent_mj_model, rodent_system):
        m = rodent_mj_model
        plan, model = rodent_system
        qpos, qvel, ctrl = _random_state(m, seed=4, joint_scale=0.1)
        qpos[2] += 0.3  # airborne: accelerometer sees smooth dynamics only
        d = mujoco.MjData(m)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        mujoco.mj_forward(m, d)

        @jax.jit
        def run(model, qpos, qvel, ctrl):
            data = pm.make_data(plan, model)
            data = data.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
            return forward(plan, model, data)

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        data = run(model, f32(qpos), f32(qvel), f32(ctrl))
        # compare per sensor with its own scale
        for i in range(m.nsensor):
            adr, dim = int(m.sensor_adr[i]), int(m.sensor_dim[i])
            mine = np.asarray(data.sensordata[adr : adr + dim], np.float64)
            ref = d.sensordata[adr : adr + dim]
            scale = max(1.0, np.abs(ref).max())
            name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_SENSOR, i) or str(i)
            assert np.abs(mine - ref).max() / scale < 2e-3, (
                f"sensor {name}: {mine} vs {ref}"
            )


CONDIM_XML = """
<mujoco>
  <option timestep="0.002" solver="CG" iterations="40" ls_iterations="20"
          tolerance="0"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1" contype="1" conaffinity="1"
          friction="0.8 0.02 0.003"/>
    <body name="ball6" pos="0 0 0.0995">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="0.5" condim="6"
            friction="0.8 0.02 0.003" contype="1" conaffinity="1"/>
    </body>
    <body name="ball4" pos="0.5 0 0.0995">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="0.5" condim="4"
            friction="0.8 0.02 0" contype="1" conaffinity="1"/>
    </body>
  </worldbody>
</mujoco>
"""


class TestCondim46:
    """Torsional/rolling friction (condim 4/6, pyramidal): spinning and
    rolling spheres on a plane must decelerate exactly as C does. C reference:
    mj_instantiateContact pyramid rows over all condim-1 friction directions
    (consumed via mjx by the reference, SURVEY section 2b)."""

    def test_spin_roll_trajectory(self):
        m = mujoco.MjModel.from_xml_string(CONDIM_XML)
        plan, model = pm.put_model(m)
        assert plan.condim == 6
        d = mujoco.MjData(m)
        # ball6 spins about the normal (torsional) and rolls (rolling);
        # ball4 spins (torsional only at condim 4)
        d.qvel[3:6] = [1.0, 0.0, 6.0]
        d.qvel[0] = 0.5
        d.qvel[9:12] = [0.0, 0.0, 8.0]
        qpos0, qvel0 = d.qpos.copy(), d.qvel.copy()
        for _ in range(20):
            mujoco.mj_step(m, d)

        @jax.jit
        def run(model, qpos, qvel):
            data = pm.make_data(plan, model)
            data = data.replace(qpos=qpos, qvel=qvel)

            def body(dd, _):
                return step(plan, model, dd), None

            data, _ = jax.lax.scan(body, data, None, length=20)
            return data

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        data = run(model, f32(qpos0), f32(qvel0))
        # torsional/rolling forces must have acted: spins decelerate in C
        assert d.qvel[5] < 5.6 and d.qvel[11] < 7.7
        _assert_close(data.qvel, d.qvel, rel=5e-3, name="qvel")
        _assert_close(data.qpos, d.qpos, rel=2e-3, name="qpos")

    def test_cfrc_ext_torsion(self):
        """cfrc_ext carries the torsional moment for condim>3 contacts."""
        m = mujoco.MjModel.from_xml_string(CONDIM_XML)
        plan, model = pm.put_model(m)
        d = mujoco.MjData(m)
        d.qvel[3:6] = [0.0, 0.0, 6.0]
        mujoco.mj_forward(m, d)
        mujoco.mj_rnePostConstraint(m, d)

        data = pm.make_data(plan, model)
        data = data.replace(
            qpos=jnp.asarray(d.qpos, jnp.float32),
            qvel=jnp.asarray(d.qvel, jnp.float32),
        )
        data = forward(plan, model, data)
        ours = postconstraint.cfrc_ext(plan, model, data)
        c = d.cfrc_ext
        scale = max(1.0, np.abs(c).max())
        np.testing.assert_allclose(
            np.asarray(ours), c, atol=5e-3 * scale, err_msg="cfrc_ext"
        )
