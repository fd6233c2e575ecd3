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
