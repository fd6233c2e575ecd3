"""Offline rollout generation from configs/checkpoints.

Behavioral parity with track_mjx/analysis/rollout.py:
- env registration at import (:25-27);
- ``create_environment(cfg)`` incl. the legacy energy_cost_weight backfill
  (:30-70, :56-58);
- ``create_rollout_generator`` (:73-269): render-wrapper selection by
  env/LSTM type, jitted inference/reset/step, generate_rollout(clip_idx, seed)
  scans clip_length*steps_for_cur_frame - 1 steps and returns
  {qposes_ref (repeated), qposes_rollout, ctrl, state_rewards, optional
  metrics/activations/joint_forces/sensor_readings}; the whole generator is
  jitted and vmap-able over clip indices.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional, Union

import jax
import numpy as np
from jax import numpy as jnp

from track_mjx_tpu.envs import base as envs
from track_mjx_tpu.envs import wrappers
from track_mjx_tpu.envs.task.reward import RewardConfig
from track_mjx_tpu.envs.task.tracking import MultiClipTracking, SingleClipTracking
from track_mjx_tpu.envs.walker.fly import Fly
from track_mjx_tpu.envs.walker.rodent import Rodent
from track_mjx_tpu.envs.walker.stick import Stick
from track_mjx_tpu.io import load
from track_mjx_tpu.physics import postconstraint

envs.register_environment("rodent_single_clip", SingleClipTracking)
envs.register_environment("rodent_multi_clip", MultiClipTracking)
envs.register_environment("fly_multi_clip", MultiClipTracking)

_WALKER_MAP = {"rodent": Rodent, "fly": Fly, "stick": Stick}


def create_environment(cfg_dict) -> envs.Env:
    """Rebuilds the tracking env described by a (checkpoint) config."""
    env_args = dict(cfg_dict["env_config"]["env_args"])
    env_rewards = dict(cfg_dict["env_config"]["reward_weights"])
    walker_config = dict(cfg_dict["walker_config"])
    traj_config = dict(cfg_dict["reference_config"])

    reference_data_path = cfg_dict["data_path"]
    logging.info("Loading data: %s", reference_data_path)
    try:
        reference_clip = load.make_multiclip_data(
            reference_data_path, n_frames_per_clip=traj_config["clip_length"]
        )
    except KeyError:
        logging.info(
            "Loading from stac-mjx format failed. Loading from ReferenceClip format."
        )
        reference_clip = load.load_reference_clip_data(reference_data_path)

    walker_class = _WALKER_MAP[cfg_dict["env_config"]["walker_name"]]
    walker = walker_class(**walker_config)

    # legacy-config backfill (reference :56-58)
    if "energy_cost_weight" not in env_rewards:
        env_rewards["energy_cost_weight"] = 0.0
    env_rewards["healthy_z_range"] = tuple(env_rewards["healthy_z_range"])

    reward_config = RewardConfig(**env_rewards)
    return envs.get_environment(
        cfg_dict["env_config"]["env_name"],
        reference_clip=reference_clip,
        walker=walker,
        reward_config=reward_config,
        **env_args,
        **traj_config,
    )


def create_rollout_generator(
    cfg,
    environment: envs.Env,
    inference_fn: Callable,
    model: str = "mlp",
    log_activations: bool = False,
    log_metrics: bool = False,
    log_sensor_data: bool = False,
) -> Callable[[Optional[int]], Dict]:
    """Returns a jitted generate_rollout(clip_idx, seed) function."""
    ref_traj_config = cfg["reference_config"]
    rollout_env = environment
    if type(environment) == MultiClipTracking:
        rollout_env = wrappers.RenderRolloutWrapperMulticlipTracking(environment)
    elif type(environment) == SingleClipTracking:
        rollout_env = wrappers.RenderRolloutWrapperSingleclipTracking(environment)
    if cfg["train_setup"]["train_config"]["use_lstm"]:
        # the reference constructs this wrapper with default hidden sizes
        # regardless of the network config (analysis/rollout.py:103) — a
        # latent shape bug we fix by threading the configured sizes
        rollout_env = wrappers.RenderRolloutWrapperTrackingLSTM(
            environment,
            lstm_features=cfg["network_config"]["hidden_state_size"],
            hidden_layer_num=cfg["network_config"]["hidden_layer_num"],
        )

    jit_inference_fn = jax.jit(inference_fn)
    jit_reset = jax.jit(rollout_env.reset)
    jit_step = jax.jit(rollout_env.step)

    def _body_wrenches(pipeline_state):
        # per-body contact wrench (nbody, 6), the reference's cfrc_ext
        # "joint_forces" channel (track_mjx/analysis/rollout.py:144)
        return postconstraint.cfrc_ext(
            environment.plan, environment.model, pipeline_state
        )

    def generate_rollout(clip_idx: Optional[int] = None, seed: int = 42) -> Dict:
        rollout_key = jax.random.PRNGKey(seed)
        rollout_key, reset_rng, act_rng = jax.random.split(rollout_key, 3)
        init_state = jit_reset(reset_rng, clip_idx=clip_idx)

        num_steps = (
            int(ref_traj_config["clip_length"] * environment._steps_for_cur_frame)
            - 1
        )

        def _step_fn_mlp(carry, _):
            state, act_rng = carry
            act_rng, new_rng = jax.random.split(act_rng)
            ctrl, extras = jit_inference_fn(state.obs, act_rng)
            next_state = jit_step(state, ctrl)
            sensor_reading = (
                next_state.pipeline_state.sensordata if log_sensor_data else None
            )
            joint_force = (
                _body_wrenches(next_state.pipeline_state) if log_sensor_data else None
            )
            activations = extras["activations"] if log_activations else None
            return (next_state, new_rng), (
                next_state,
                ctrl,
                activations,
                joint_force,
                sensor_reading,
            )

        def _step_fn_lstm(carry, _):
            state, act_rng, hidden = carry
            act_rng, new_rng = jax.random.split(act_rng)
            ctrl, extras, new_hidden = jit_inference_fn(state.obs, act_rng, hidden)
            ctrl = jnp.squeeze(ctrl, axis=0)
            next_state = jit_step(state, ctrl)
            sensor_reading = (
                next_state.pipeline_state.sensordata if log_sensor_data else None
            )
            joint_force = (
                _body_wrenches(next_state.pipeline_state) if log_sensor_data else None
            )
            activations = extras["activations"] if log_activations else None
            return (next_state, new_rng, new_hidden), (
                next_state,
                ctrl,
                hidden,
                activations,
                joint_force,
                sensor_reading,
            )

        states = ctrls = activations = joint_forces = sensor_readings = None
        if model == "mlp":
            init_carry = (init_state, jax.random.PRNGKey(0))
            (final_state, _), (
                states,
                ctrls,
                activations,
                joint_forces,
                sensor_readings,
            ) = jax.lax.scan(_step_fn_mlp, init_carry, None, length=num_steps)
        elif model == "lstm":
            init_carry = (
                init_state,
                jax.random.PRNGKey(0),
                init_state.info["hidden_state"],
            )
            (final_state, _, _), (
                states,
                ctrls,
                _,
                activations,
                joint_forces,
                sensor_readings,
            ) = jax.lax.scan(_step_fn_lstm, init_carry, None, length=num_steps)
        else:
            raise ValueError(f"unknown model type {model}")

        def prepend(element, arr):
            if arr.ndim == 0:
                return arr
            return jnp.concatenate([element[None], arr])

        rollout_states = jax.tree.map(prepend, init_state, states)

        ref_traj = rollout_env._get_reference_clip(init_state.info)
        qposes_ref = jnp.repeat(
            jnp.hstack(
                [ref_traj.position, ref_traj.quaternion, ref_traj.joints]
            ),
            int(environment._steps_for_cur_frame),
            axis=0,
        )
        qposes_rollout = jax.vmap(lambda s: s.pipeline_state.qpos)(rollout_states)
        state_rewards = jax.vmap(lambda s: s.reward)(rollout_states)

        result = {
            "qposes_ref": qposes_ref,
            "qposes_rollout": qposes_rollout,
            "ctrl": ctrls,
            "state_rewards": state_rewards,
        }
        if log_metrics:
            rollout_metrics = {}
            for rollout_metric in cfg["logging_config"]["rollout_metrics"]:
                rollout_metrics[f"{rollout_metric}s"] = jax.vmap(
                    lambda s: s.metrics[rollout_metric]
                )(rollout_states)
            result["rollout_metrics"] = rollout_metrics
        if log_activations and activations is not None:
            result["activations"] = activations
        if log_sensor_data:
            if joint_forces is not None:
                result["joint_forces"] = joint_forces
            if sensor_readings is not None:
                result["sensor_readings"] = sensor_readings
        return result

    return jax.jit(generate_rollout)
