"""Decoder-only reuse (script equivalent of
notebooks/checkpoint_playground.ipynb): drive a frozen decoder with random or
recorded intentions through the HighLevelWrapper.

Usage: python examples/03_decoder_playground.py <checkpoint_dir>
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from track_mjx_tpu.agent import checkpointing
from track_mjx_tpu.agent.mlp_ppo.ppo_networks import make_decoder_policy_fn
from track_mjx_tpu.analysis import rollout as rollout_lib
from track_mjx_tpu.envs import wrappers


def main():
    ckpt_path = sys.argv[1]
    cfg = checkpointing.load_config_from_checkpoint(ckpt_path)
    env = rollout_lib.create_environment(cfg)

    decoder_policy = make_decoder_policy_fn(ckpt_path)
    reference_obs_size = cfg["network_config"]["reference_obs_size"]
    intention_size = cfg["network_config"]["intention_size"]

    hl_env = wrappers.HighLevelWrapper(
        wrappers.RenderRolloutWrapperMulticlipTracking(env),
        decoder_policy,
        reference_obs_size,
    )
    state = jax.jit(hl_env.reset, static_argnums=1)(jax.random.PRNGKey(0), 0)
    step = jax.jit(hl_env.step)

    rng = jax.random.PRNGKey(1)
    rewards = []
    for _ in range(50):
        rng, k = jax.random.split(rng)
        # random latent intentions drive the frozen decoder
        z = jax.random.normal(k, (intention_size,))
        state = step(state, z)
        rewards.append(float(state.reward))
    print("50 random-intention steps; mean reward:", np.mean(rewards))


if __name__ == "__main__":
    main()
