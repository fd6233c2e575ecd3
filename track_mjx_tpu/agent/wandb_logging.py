"""Rollout logging: latent statistics, per-frame metric line plots, and
ghost-pair rollout videos.

Behavioral parity with track_mjx/agent/wandb_logging.py:
- full-clip rollout with jitted reset/step/inference (MLP or LSTM) (:64-97);
- per-latent-dim mean/std logging (:99-115);
- per-frame metric line plots for the configured rollout_metrics (:124-132);
- ghost-pair video: rollout qpos ++ reference qpos repeated steps_for_cur_frame
  times into a doubled model, mj_forward + mujoco.Renderer + imageio mp4
  (:134-153), wandb.Video upload (:168-171).

Framework differences: the wandb module comes through utils.wandb_compat (a
local JSONL logger when wandb isn't installed), and video rendering degrades
gracefully when no GL backend is available (renderer is None).
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import mujoco
import numpy as np
from jax import numpy as jp

from track_mjx_tpu.utils.wandb_compat import wandb


def rollout_logging_fn(
    env,
    jit_reset,
    jit_step,
    cfg,
    model_path: str,
    renderer,
    mj_model,
    mj_data,
    scene_option,
    current_step: int,  # args above are bound by functools.partial
    jit_logging_inference_fn,
    params,
    policy_params_fn_key: jax.Array,
    render_video: bool = True,
) -> None:
    """Runs a full-clip policy rollout and logs metrics (+ optional video)."""
    train_config = cfg["train_setup"]["train_config"]
    _, reset_rng, act_rng = jax.random.split(policy_params_fn_key, 3)

    state = jit_reset(reset_rng)

    use_lstm = bool(train_config.get("use_lstm", None))
    if use_lstm:
        hidden_state = state.info["hidden_state"]

    rollout = [state]
    latent_means = []
    latent_logvars = []
    if "reference_config" in cfg:
        episode_length = int(
            cfg["reference_config"]["clip_length"] * env._steps_for_cur_frame
        )
    else:
        episode_length = int(train_config["episode_length"])
    for _ in range(episode_length):
        _, act_rng = jax.random.split(act_rng)
        obs = state.obs
        if use_lstm:
            ctrl, extras, hidden_state = jit_logging_inference_fn(
                params, obs, act_rng, hidden_state
            )
        else:
            ctrl, extras = jit_logging_inference_fn(params, obs, act_rng)
        ctrl = jp.squeeze(ctrl, axis=0) if ctrl.shape[0] == 1 else ctrl
        latent_means.append(extras["latent_mean"])
        latent_logvars.append(extras["latent_logvar"])
        state = jit_step(state, ctrl)
        rollout.append(state)

    # latent-dimension statistics over the rollout
    latent_logvars = jp.stack(latent_logvars)
    latent_means = jp.stack(latent_means)
    latent_means_means = jp.mean(latent_means, axis=0).ravel()
    latent_logvars_means = jp.mean(latent_logvars, axis=0).ravel()
    latent_means_stds = jp.std(latent_means, axis=0).ravel()
    latent_logvars_stds = jp.std(latent_logvars, axis=0).ravel()
    for i in range(latent_means_means.shape[0]):
        wandb.log(
            {
                f"latents/latent_means_mean{i}": latent_means_means[i],
                f"latents/latent_means_std{i}": latent_means_stds[i],
                f"latents/latent_logvars_mean{i}": latent_logvars_means[i],
                f"latents/latent_logvars_std{i}": latent_logvars_stds[i],
            },
            commit=False,
        )

    if render_video:
        for rollout_metric in cfg["logging_config"]["rollout_metrics"]:
            log_lineplot_to_wandb(
                f"eval/rollout_{rollout_metric}",
                rollout_metric,
                list(
                    enumerate(
                        [float(s.metrics[rollout_metric]) for s in rollout]
                    )
                ),
                title=f"{rollout_metric} for each rollout frame",
            )

        if renderer is None:
            logging.warning(
                "No GL backend available; skipping rollout video render."
            )
            return

        import imageio

        from track_mjx_tpu.analysis.render import _mp4_writable

        render_fps = cfg["env_config"].get("render_fps") or int(1.0 / env.dt)
        ext = "mp4" if _mp4_writable() else "gif"
        video_path = f"{model_path}/{current_step}.{ext}"
        qposes_rollout = np.array(
            [np.asarray(s.pipeline_state.qpos) for s in rollout]
        )
        ref_traj = env._get_reference_clip(rollout[0].info)
        qposes_ref = np.repeat(
            np.hstack(
                [
                    np.asarray(ref_traj.position),
                    np.asarray(ref_traj.quaternion),
                    np.asarray(ref_traj.joints),
                ]
            ),
            int(env._steps_for_cur_frame),
            axis=0,
        )
        with imageio.get_writer(video_path, fps=render_fps) as video:
            for qpos1, qpos2 in zip(qposes_rollout, qposes_ref):
                mj_data.qpos = np.append(qpos1, qpos2)
                mujoco.mj_forward(mj_model, mj_data)
                renderer.update_scene(
                    mj_data,
                    camera=cfg["env_config"]["render_camera_name"],
                    scene_option=scene_option,
                )
                pixels = renderer.render()
                video.append_data(pixels)
        wandb.log(
            {"videos/rollout": wandb.Video(video_path, format=ext)},
            commit=False,
        )


def log_lineplot_to_wandb(name: str, metric_name: str, data, title: str) -> None:
    """Logs a (frame, value) table + line plot (reference :174-205)."""
    if isinstance(data[0], tuple):
        frames, values = zip(*data)
    else:
        frames, values = data
    table = wandb.Table(
        data=[[x, y] for x, y in zip(frames, values)],
        columns=["frame", metric_name],
    )
    wandb.log(
        {name: wandb.plot.line(table, "frame", metric_name, title=title)},
        commit=False,
    )
