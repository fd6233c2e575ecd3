"""Env correctness check (script equivalent of notebooks/env_test.ipynb):
build the rodent env from config with synthetic clips, wrap, jit reset/step,
run a batched random-policy rollout, and report termination metrics
(fall/too_far/bad_pose/bad_quat/nan) and frame-index progression.

Usage: python examples/01_env_rollout.py [num_envs] [num_steps]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from track_mjx_tpu.envs import wrappers
from track_mjx_tpu.envs.task.reward import RewardConfig
from track_mjx_tpu.envs.task.tracking import MultiClipTracking
from track_mjx_tpu.envs.walker.rodent import Rodent
from track_mjx_tpu.io.synthetic import synthesize_clips
from track_mjx_tpu.utils.config import load_config


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    num_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    cfg = load_config("rodent-full-clips")
    walker = Rodent(
        joint_names=cfg.walker_config.joint_names,
        body_names=cfg.walker_config.body_names,
        end_eff_names=cfg.walker_config.end_eff_names,
        torque_actuators=cfg.walker_config.torque_actuators,
        rescale_factor=cfg.walker_config.rescale_factor,
    )
    clips = synthesize_clips(walker._mj_model, n_clips=2, n_frames=250)
    rewards = dict(cfg.env_config.reward_weights)
    rewards["healthy_z_range"] = tuple(rewards["healthy_z_range"])
    env = MultiClipTracking(
        reference_clip=clips,
        walker=walker,
        reward_config=RewardConfig(**rewards),
        **dict(cfg.env_config.env_args),
        **dict(cfg.reference_config),
    )
    wrapped = wrappers.wrap(env, episode_length=195, use_lstm=False)

    reset_fn = jax.jit(wrapped.reset)
    step_fn = jax.jit(wrapped.step)
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = reset_fn(keys)
    print("reset qpos vs reference frame: max |err| =",
          float(jnp.abs(state.pipeline_state.qpos[:, 2] -
                        clips.position[0, 0, 2]).max()))

    term_counts = {k: 0.0 for k in ("fall", "too_far", "bad_pose", "bad_quat", "nan")}
    rng = jax.random.PRNGKey(1)
    for t in range(num_steps):
        rng, k = jax.random.split(rng)
        action = jax.random.uniform(
            k, (num_envs, env.action_size), minval=-1.0, maxval=1.0
        )
        state = step_fn(state, action)
        for key in term_counts:
            term_counts[key] += float(jnp.sum(state.metrics[key]))
    print(f"after {num_steps} random steps x {num_envs} envs:")
    for key, v in term_counts.items():
        print(f"  {key}: {v:.0f} terminations")
    print("mean reward (final step):", float(state.reward.mean()))


if __name__ == "__main__":
    main()
