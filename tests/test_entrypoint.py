"""End-to-end entrypoint test: python -m track_mjx_tpu.train wiring
(config load + dotted overrides -> data load -> env build -> trainer ->
checkpoint + preemption run-state + local wandb logs), at the smallest
possible rodent scale."""

import json
import os
from pathlib import Path

import numpy as np
import pytest


def test_train_entrypoint_end_to_end(tmp_path, monkeypatch):
    from track_mjx_tpu.envs.walker.rodent import Rodent
    from track_mjx_tpu.io import load as load_lib
    from track_mjx_tpu.io.synthetic import synthesize_clips
    from track_mjx_tpu.utils.config import load_config
    from track_mjx_tpu import train as train_mod

    monkeypatch.chdir(tmp_path)

    # synthesize a tiny dataset in the grouped HDF5 format
    cfg0 = load_config("rodent-full-clips")
    walker = Rodent(
        joint_names=cfg0.walker_config.joint_names,
        body_names=cfg0.walker_config.body_names,
        end_eff_names=cfg0.walker_config.end_eff_names,
        torque_actuators=cfg0.walker_config.torque_actuators,
        rescale_factor=cfg0.walker_config.rescale_factor,
    )
    clips = synthesize_clips(walker._mj_model, n_clips=1, n_frames=60)
    data_path = tmp_path / "clips.h5"
    load_lib.save_reference_clip_data(clips, data_path)

    cfg = load_config(
        "rodent-full-clips",
        overrides=[
            f"data_path={data_path}",
            f"logging_config.model_path={tmp_path / 'ckpts'}",
            "reference_config.clip_length=60",
            "reference_config.random_init_range=10",
            "train_setup.train_subset_ratio=null",
            "train_setup.eval_every=32",
            "train_setup.reset_every=32",
            "train_setup.train_config.num_envs=8",
            "train_setup.train_config.num_timesteps=64",
            "train_setup.train_config.batch_size=8",
            "train_setup.train_config.num_eval_envs=8",
            "train_setup.train_config.num_minibatches=1",
            "train_setup.train_config.num_updates_per_batch=1",
            "train_setup.train_config.unroll_length=2",
            "network_config.encoder_layer_sizes=[16]",
            "network_config.decoder_layer_sizes=[16]",
            "network_config.critic_layer_sizes=[16]",
            "network_config.intention_size=4",
        ],
    )
    make_inference_fn, params = train_mod.main(cfg)

    # a checkpoint directory with composite saves must exist
    ckpt_root = tmp_path / "ckpts"
    runs = list(ckpt_root.iterdir())
    assert runs, "no checkpoint run directory created"
    steps = [p for p in runs[0].iterdir() if p.name.startswith("PPONetwork")]
    assert steps, "no PPONetwork checkpoint steps saved"

    # run-state was cleaned up after successful completion
    assert not list(ckpt_root.glob("run_state_*.json"))

    # local wandb fallback recorded metrics
    metric_files = list(Path("wandb_local").rglob("metrics.jsonl"))
    assert metric_files
    lines = metric_files[0].read_text().strip().splitlines()
    assert any("eval/episode_reward" in ln for ln in lines)

    # params usable for inference
    policy = make_inference_fn(params, deterministic=True)
    import jax

    obs_size = np.asarray(params[0].mean).shape[-1]
    action, _ = policy(np.zeros(obs_size, np.float32), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(action)).all()
