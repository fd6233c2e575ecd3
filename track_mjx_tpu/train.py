"""Training entrypoint: config load, env build, trainer dispatch.

Behavioral parity with track_mjx/train.py:
- env registration rodent_single_clip/rodent_multi_clip/fly_multi_clip
  (:66-68);
- preemption discovery / run-state restore / fresh-run branching (:70-133),
  with the checkpoint's stored config authoritative on resume (:117-133);
- Orbax CheckpointManager with step_prefix "PPONetwork" (:140-147);
- data load + train/test split paths (:163-218);
- episode length = (clip_length - random_init_range - traj_length) *
  steps_for_cur_frame (:221-225);
- MLP-vs-LSTM pipeline select (:229-255); wandb init with resume semantics
  (:269-276, via utils.wandb_compat); train_fn partial (:295-316); render
  callback (:334-346); cleanup on success (:354-359).

Usage:
    python -m track_mjx_tpu.train [--config-name NAME] [key.sub=value ...]

Multi-host TPU: set JAX_COORDINATOR_ADDRESS etc. and pass
``distributed=true`` to run jax.distributed.initialize before device use.
"""

from __future__ import annotations

import functools
import json
import logging
import os
import sys
from datetime import datetime
from pathlib import Path

os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import fcntl

import jax
import orbax.checkpoint as ocp

from track_mjx_tpu.agent import checkpointing, preemption, wandb_logging
from track_mjx_tpu.analysis import render
from track_mjx_tpu.envs import base as envs
from track_mjx_tpu.envs import wrappers
from track_mjx_tpu.envs.task.reward import RewardConfig
from track_mjx_tpu.envs.task.tracking import MultiClipTracking, SingleClipTracking
from track_mjx_tpu.envs.walker.fly import Fly
from track_mjx_tpu.envs.walker.rodent import Rodent
from track_mjx_tpu.io import load
from track_mjx_tpu.utils.config import ConfigDict, load_config
from track_mjx_tpu.utils.wandb_compat import wandb

_WALKERS = {"rodent": Rodent, "fly": Fly}


def main(cfg: ConfigDict):
    """Runs training from a loaded config."""
    if cfg.get("distributed"):
        jax.distributed.initialize()

    logging.info("Using %d devices", jax.device_count())

    envs.register_environment("rodent_single_clip", SingleClipTracking)
    envs.register_environment("rodent_multi_clip", MultiClipTracking)
    envs.register_environment("fly_multi_clip", MultiClipTracking)

    # ---- preemption / resume branching (reference :70-133) ---------------
    existing_run_state = preemption.discover_existing_run_state(cfg)
    if existing_run_state:
        run_id = existing_run_state["run_id"]
        checkpoint_path = str(Path(existing_run_state["checkpoint_path"]).resolve())
        logging.info("Resuming from existing run: %s", run_id)
        cfg["train_setup"]["checkpoint_to_restore"] = checkpoint_path
    elif cfg["train_setup"].get("restore_from_run_state") is not None:
        base_path = Path(cfg["logging_config"]["model_path"]).resolve()
        full_path = base_path / cfg["train_setup"]["restore_from_run_state"]
        with open(full_path, "r") as f:
            fcntl.flock(f.fileno(), fcntl.LOCK_SH)
            existing_run_state = json.load(f)
            fcntl.flock(f.fileno(), fcntl.LOCK_UN)
        run_id = existing_run_state["run_id"]
        checkpoint_path = str(Path(existing_run_state["checkpoint_path"]).resolve())
        logging.info("Restoring from run state: %s", run_id)
        cfg["train_setup"]["checkpoint_to_restore"] = checkpoint_path
    else:
        run_id = datetime.now().strftime("%y%m%d_%H%M%S_%f")
        model_path = Path(cfg["logging_config"]["model_path"])
        if not model_path.is_absolute():
            model_path = Path.cwd() / model_path
        checkpoint_path = str(model_path / run_id)

    if cfg["train_setup"].get("checkpoint_to_restore") is not None:
        checkpoint_to_restore = str(
            Path(cfg["train_setup"]["checkpoint_to_restore"]).resolve()
        )
        # the checkpoint's stored config is authoritative on resume
        cfg = ConfigDict(
            checkpointing.load_config_from_checkpoint(checkpoint_to_restore)
        )
        cfg["train_setup"]["checkpoint_to_restore"] = checkpoint_to_restore
        checkpoint_path = checkpoint_to_restore
        run_id = os.path.basename(checkpoint_path)

    cfg_dict = cfg.to_dict()
    logging.info("Configs: %s", cfg_dict)

    mgr_options = ocp.CheckpointManagerOptions(
        create=True,
        max_to_keep=cfg["train_setup"].get("checkpoint_max_to_keep"),
        keep_period=cfg["train_setup"].get("checkpoint_keep_period"),
        step_prefix="PPONetwork",
    )
    ckpt_mgr = ocp.CheckpointManager(checkpoint_path, options=mgr_options)

    logging.info("run_id: %s", run_id)
    logging.info("Training checkpoint path: %s", checkpoint_path)

    env_args = dict(cfg["env_config"]["env_args"])
    env_rewards = dict(cfg["env_config"]["reward_weights"])
    train_config = dict(cfg["train_setup"]["train_config"])
    walker_config = dict(cfg["walker_config"])
    traj_config = dict(cfg["reference_config"])

    logging.info("Loading data: %s", cfg["data_path"])
    walker = _WALKERS[cfg["env_config"]["walker_name"]](**walker_config)
    env_rewards["healthy_z_range"] = tuple(env_rewards["healthy_z_range"])
    reward_config = RewardConfig(**env_rewards)

    # ---- data / test-set split (reference :163-218) ----------------------
    test_env = None
    if cfg["train_setup"].get("train_test_split_info") is not None:
        all_clips = load.load_data(cfg["data_path"])
        with open(cfg["train_setup"]["train_test_split_info"], "r") as f:
            split_info = json.load(f)
        test_idx = split_info["test"]
        if cfg["train_setup"].get("train_subset_ratio") is None:
            train_idx = split_info["train"]
        else:
            train_idx = split_info["train_subset"][
                f"{cfg['train_setup']['train_subset_ratio']:.2f}"
            ]
        test_clips = load.select_clips(all_clips, test_idx)
        train_clips = load.select_clips(all_clips, train_idx)
        test_env = envs.get_environment(
            cfg["env_config"]["env_name"],
            reference_clip=test_clips,
            walker=walker,
            reward_config=reward_config,
            **env_args,
            **traj_config,
        )
    elif cfg["train_setup"].get("train_subset_ratio") is not None:
        all_clips = load.load_data(cfg["data_path"])
        train_clips, test_clips = load.generate_train_test_split(
            all_clips, test_ratio=1 - cfg["train_setup"]["train_subset_ratio"]
        )
        test_env = envs.get_environment(
            cfg["env_config"]["env_name"],
            reference_clip=test_clips,
            walker=walker,
            reward_config=reward_config,
            **env_args,
            **traj_config,
        )
    else:
        train_clips = load.load_data(cfg["data_path"])

    env = envs.get_environment(
        cfg["env_config"]["env_name"],
        reference_clip=train_clips,
        walker=walker,
        reward_config=reward_config,
        **env_args,
        **traj_config,
    )

    episode_length = (
        traj_config["clip_length"]
        - traj_config["random_init_range"]
        - traj_config["traj_length"]
    ) * env._steps_for_cur_frame
    logging.info("episode_length %s", episode_length)

    # ---- pipeline select (reference :229-255) -----------------------------
    if train_config["use_lstm"]:
        from track_mjx_tpu.agent.lstm_ppo import ppo as lstm_ppo
        from track_mjx_tpu.agent.lstm_ppo import ppo_networks as lstm_ppo_networks

        logging.info("Using LSTM pipeline")
        ppo = lstm_ppo
        render_wrapper = wrappers.RenderRolloutWrapperTrackingLSTM
        network_factory = functools.partial(
            lstm_ppo_networks.make_intention_ppo_networks,
            intention_latent_size=cfg["network_config"]["intention_size"],
            hidden_state_size=cfg["network_config"]["hidden_state_size"],
            hidden_layer_num=cfg["network_config"]["hidden_layer_num"],
            encoder_hidden_layer_sizes=tuple(
                cfg["network_config"]["encoder_layer_sizes"]
            ),
            decoder_hidden_layer_sizes=tuple(
                cfg["network_config"]["decoder_layer_sizes"]
            ),
            value_hidden_layer_sizes=tuple(
                cfg["network_config"]["critic_layer_sizes"]
            ),
        )
    else:
        from track_mjx_tpu.agent.mlp_ppo import ppo as mlp_ppo
        from track_mjx_tpu.agent.mlp_ppo import ppo_networks as mlp_ppo_networks

        logging.info("Using MLP pipeline")
        ppo = mlp_ppo
        render_wrapper = wrappers.RenderRolloutWrapperMulticlipTracking
        network_factory = functools.partial(
            mlp_ppo_networks.make_intention_ppo_networks,
            intention_latent_size=cfg["network_config"]["intention_size"],
            encoder_hidden_layer_sizes=tuple(
                cfg["network_config"]["encoder_layer_sizes"]
            ),
            decoder_hidden_layer_sizes=tuple(
                cfg["network_config"]["decoder_layer_sizes"]
            ),
            value_hidden_layer_sizes=tuple(
                cfg["network_config"]["critic_layer_sizes"]
            ),
        )

    run_id = f"{cfg['logging_config']['exp_name']}_{run_id}"

    if existing_run_state:
        wandb_run_id = existing_run_state["wandb_run_id"]
        wandb_resume = "must"
    else:
        wandb_run_id = run_id
        wandb_resume = "allow"

    wandb.init(
        project=cfg["logging_config"]["project_name"],
        config=cfg_dict,
        id=wandb_run_id,
        resume=wandb_resume,
        group=cfg["logging_config"]["group_name"],
    )

    if not existing_run_state:
        preemption.save_run_state(
            cfg=cfg,
            run_id=run_id,
            checkpoint_path=checkpoint_path,
            wandb_run_id=wandb.run.id,
        )
    checkpoint_callback = preemption.create_checkpoint_callback(
        cfg=cfg,
        run_id=run_id,
        checkpoint_path=checkpoint_path,
        wandb_run_id=wandb.run.id,
    )

    train_fn = functools.partial(
        ppo.train,
        **train_config,
        num_evals=int(
            train_config["num_timesteps"] / cfg["train_setup"]["eval_every"]
        ),
        num_resets_per_eval=(
            cfg["train_setup"]["eval_every"] // cfg["train_setup"]["reset_every"]
        ),
        episode_length=int(episode_length),
        kl_weight=cfg["network_config"]["kl_weight"],
        network_factory=network_factory,
        ckpt_mgr=ckpt_mgr,
        checkpoint_to_restore=cfg["train_setup"].get("checkpoint_to_restore"),
        config_dict=cfg_dict,
        use_kl_schedule=cfg["network_config"]["kl_schedule"],
        eval_env_test_set=test_env,
        freeze_decoder=bool(cfg["train_setup"].get("freeze_decoder", False)),
        checkpoint_callback=checkpoint_callback,
    )

    def wandb_progress(num_steps, metrics):
        metrics["num_steps_thousands"] = num_steps
        wandb.log(metrics)

    if train_config["use_lstm"]:
        rollout_env = render_wrapper(
            env=env,
            lstm_features=cfg["network_config"]["hidden_state_size"],
            hidden_layer_num=cfg["network_config"]["hidden_layer_num"],
        )
    else:
        rollout_env = render_wrapper(env=env)

    jit_reset = jax.jit(rollout_env.reset)
    jit_step = jax.jit(rollout_env.step)
    renderer, mj_model, mj_data, scene_option = render.make_rollout_renderer(cfg)
    policy_params_fn = functools.partial(
        wandb_logging.rollout_logging_fn,
        rollout_env,
        jit_reset,
        jit_step,
        cfg,
        checkpoint_path,
        renderer,
        mj_model,
        mj_data,
        scene_option,
    )

    make_inference_fn, params, _ = train_fn(
        environment=env,
        progress_fn=wandb_progress,
        policy_params_fn=policy_params_fn,
    )

    # drain orbax's async save threads before exiting: without this the last
    # checkpoint can be left as an uncommitted .orbax-checkpoint-tmp dir
    # (observed on the fly workload when the process exits right after the
    # final eval's save)
    try:
        ckpt_mgr.wait_until_finished()
        ckpt_mgr.close()
    except Exception as e:  # noqa: BLE001
        logging.warning("Checkpoint manager finalization failed: %s", e)

    try:
        preemption.cleanup_run_state(cfg)
        logging.info("Training completed successfully, cleaned up run state")
    except Exception as e:  # noqa: BLE001
        logging.warning("Failed to cleanup run state: %s", e)

    return make_inference_fn, params


def expand_multirun(overrides):
    """Hydra-multirun-style sweep expansion: comma-separated override values
    (``a.b=1,2 c=x,y``) expand to the cartesian product of single-value
    override sets, in Hydra's job order (the reference launches sweeps via
    ``python -m track_mjx.train -m``; track_mjx/train.py:56). Values whose
    YAML parse is already a list (``a=[1,2]``) are NOT sweep syntax."""
    import itertools

    import yaml

    axes = []
    for ov in overrides:
        key, _, raw = ov.partition("=")
        parts = raw.split(",") if raw else [raw]
        if len(parts) > 1:
            try:
                # bracketed lists parse as one YAML value -> not a sweep
                if isinstance(yaml.safe_load(raw), list):
                    parts = [raw]
            except Exception:
                pass
        axes.append([f"{key}={p}" for p in parts])
    return [list(combo) for combo in itertools.product(*axes)]


def cli():
    """CLI: python -m track_mjx_tpu.train [--config-name NAME] [-m|--multirun]
    [a.b=c ...]. With --multirun, comma-separated override values sweep the
    cartesian product sequentially (Hydra multirun parity)."""
    logging.basicConfig(level=logging.INFO)
    args = sys.argv[1:]
    config_name = "rodent-full-clips"
    multirun = False
    overrides = []
    i = 0
    while i < len(args):
        if args[i] in ("--config-name", "-cn"):
            config_name = args[i + 1]
            i += 2
        elif args[i].startswith("--config-name="):
            config_name = args[i].split("=", 1)[1]
            i += 1
        elif args[i] in ("-m", "--multirun"):
            multirun = True
            i += 1
        else:
            overrides.append(args[i])
            i += 1
    if multirun:
        jobs = expand_multirun(overrides)
        for job_idx, job_overrides in enumerate(jobs):
            logging.info(
                "multirun job %d/%d: %s", job_idx + 1, len(jobs), job_overrides
            )
            main(load_config(config_name, job_overrides))
        return
    cfg = load_config(config_name, overrides)
    main(cfg)


if __name__ == "__main__":
    cli()
