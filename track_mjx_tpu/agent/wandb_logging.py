"""Rollout logging: latent statistics, per-frame metric curves, ghost videos.

Equivalent capability to track_mjx/agent/wandb_logging.py (full-clip policy
rollout logged to wandb every eval), restructured into this framework's own
stages: ``collect_rollout`` produces a ``RolloutTrace`` (env states + latent
samples), and three independent emitters consume it — latent statistics,
per-frame metric curves, and the ghost-pair video. The wandb module comes
through utils.wandb_compat (a local JSONL logger when wandb isn't installed)
and video rendering degrades gracefully when no GL backend exists.

``rollout_logging_fn`` keeps the trainer-facing contract: the leading args
are bound with functools.partial in train.py and the trainer invokes it as
policy_params_fn(current_step=..., jit_logging_inference_fn=..., params=...,
policy_params_fn_key=..., render_video=...) — same shape as the reference's
policy_params_fn hook.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, List, Optional

import jax
import mujoco
import numpy as np
from jax import numpy as jp

from track_mjx_tpu.utils.wandb_compat import wandb


@dataclasses.dataclass
class RolloutTrace:
    """One full-clip policy rollout plus per-step latent samples."""

    states: List[Any]  # episode_length + 1 env states (incl. the reset state)
    latent_means: jax.Array  # (episode_length, latent)
    latent_logvars: jax.Array  # (episode_length, latent)


def _episode_length(env, cfg) -> int:
    if "reference_config" in cfg:
        return int(cfg["reference_config"]["clip_length"] * env._steps_for_cur_frame)
    return int(cfg["train_setup"]["train_config"]["episode_length"])


def collect_rollout(
    env,
    jit_reset,
    jit_step,
    cfg,
    jit_logging_inference_fn,
    params,
    key: jax.Array,
) -> RolloutTrace:
    """Rolls the policy over one full clip (MLP or LSTM inference)."""
    _, reset_rng, act_rng = jax.random.split(key, 3)
    state = jit_reset(reset_rng)

    use_lstm = bool(cfg["train_setup"]["train_config"].get("use_lstm", None))
    hidden = state.info["hidden_state"] if use_lstm else None

    states, means, logvars = [state], [], []
    for _ in range(_episode_length(env, cfg)):
        _, act_rng = jax.random.split(act_rng)
        if use_lstm:
            ctrl, extras, hidden = jit_logging_inference_fn(
                params, state.obs, act_rng, hidden
            )
        else:
            ctrl, extras = jit_logging_inference_fn(params, state.obs, act_rng)
        if ctrl.shape[0] == 1:
            ctrl = jp.squeeze(ctrl, axis=0)
        means.append(extras["latent_mean"])
        logvars.append(extras["latent_logvar"])
        state = jit_step(state, ctrl)
        states.append(state)
    return RolloutTrace(states, jp.stack(means), jp.stack(logvars))


def _masked_stats(x: jp.ndarray, finite: jp.ndarray) -> tuple[jp.ndarray, jp.ndarray]:
    """(mean, std) over axis 0 counting only frames where ``finite`` is True."""
    w = finite[:, None]
    n = jp.maximum(w.sum().astype(x.dtype), 1.0)
    xz = jp.where(w, x, 0.0)  # where, not multiply: NaN * 0 is NaN
    mean = xz.sum(axis=0) / n
    var = jp.where(w, jp.square(xz - mean), 0.0).sum(axis=0) / n
    return mean, jp.sqrt(var)


def log_latent_statistics(trace: RolloutTrace) -> None:
    """Per-latent-dimension mean/std of the intention distribution.

    Frames with non-finite latents are excluded: the logging rollout keeps
    stepping past done (full-clip parity, reference wandb_logging.py:30-171),
    so after a mid-clip physics blow-up the remaining frames carry NaN
    latents (nan_to_num leaves inf-magnitude obs at float-max, which
    overflows inside the policy MLP — diagnosed round 4). Without masking
    one bad frame turned ALL latents/* stats NaN. The excluded-frame count
    is logged as latents/nonfinite_frames."""
    finite = jp.all(
        jp.isfinite(trace.latent_means) & jp.isfinite(trace.latent_logvars),
        axis=1,
    )
    means_mean, means_std = _masked_stats(trace.latent_means, finite)
    logvars_mean, logvars_std = _masked_stats(trace.latent_logvars, finite)
    stats = {
        "latent_means_mean": means_mean.ravel(),
        "latent_means_std": means_std.ravel(),
        "latent_logvars_mean": logvars_mean.ravel(),
        "latent_logvars_std": logvars_std.ravel(),
    }
    wandb.log(
        {"latents/nonfinite_frames": float(jp.sum(~finite))}, commit=False
    )
    for i in range(stats["latent_means_mean"].shape[0]):
        wandb.log(
            {f"latents/{k}{i}": v[i] for k, v in stats.items()},
            commit=False,
        )


def log_metric_curves(trace: RolloutTrace, metric_names) -> None:
    """One (frame, value) line plot per configured rollout metric."""
    for name in metric_names:
        values = [float(s.metrics[name]) for s in trace.states]
        log_lineplot_to_wandb(
            f"eval/rollout_{name}",
            name,
            list(enumerate(values)),
            title=f"{name} for each rollout frame",
        )


def render_ghost_video(
    trace: RolloutTrace,
    env,
    cfg,
    model_path: str,
    current_step: int,
    renderer,
    mj_model,
    mj_data,
    scene_option,
) -> Optional[str]:
    """Renders rollout-vs-reference into the doubled (ghost-pair) model and
    logs it; returns the video path. The renderer is never None — headless
    hosts get the software rasterizer (analysis.render._make_renderer)."""
    import imageio

    from track_mjx_tpu.analysis.render import _mp4_writable

    render_fps = cfg["env_config"].get("render_fps") or int(1.0 / env.dt)
    ext = "mp4" if _mp4_writable() else "gif"
    video_path = f"{model_path}/{current_step}.{ext}"

    qposes_rollout = np.array(
        [np.asarray(s.pipeline_state.qpos) for s in trace.states]
    )
    ref = env._get_reference_clip(trace.states[0].info)
    qposes_ref = np.repeat(
        np.hstack(
            [
                np.asarray(ref.position),
                np.asarray(ref.quaternion),
                np.asarray(ref.joints),
            ]
        ),
        int(env._steps_for_cur_frame),
        axis=0,
    )
    with imageio.get_writer(video_path, fps=render_fps) as video:
        for qpos_policy, qpos_ref in zip(qposes_rollout, qposes_ref):
            mj_data.qpos = np.append(qpos_policy, qpos_ref)
            mujoco.mj_forward(mj_model, mj_data)
            renderer.update_scene(
                mj_data,
                camera=cfg["env_config"]["render_camera_name"],
                scene_option=scene_option,
            )
            video.append_data(renderer.render())
    wandb.log(
        {"videos/rollout": wandb.Video(video_path, format=ext)}, commit=False
    )
    return video_path


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
    current_step: int,
    jit_logging_inference_fn,
    params,
    policy_params_fn_key: jax.Array,
    render_video: bool = True,
) -> None:
    """Trainer hook: collect one rollout, then emit all logging artifacts."""
    trace = collect_rollout(
        env, jit_reset, jit_step, cfg, jit_logging_inference_fn, params,
        policy_params_fn_key,
    )
    log_latent_statistics(trace)
    if render_video:
        log_metric_curves(trace, cfg["logging_config"]["rollout_metrics"])
        render_ghost_video(
            trace, env, cfg, model_path, current_step,
            renderer, mj_model, mj_data, scene_option,
        )


def log_lineplot_to_wandb(name: str, metric_name: str, data, title: str) -> None:
    """Logs a (frame, value) table + line plot."""
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
