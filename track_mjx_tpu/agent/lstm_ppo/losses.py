"""PPO loss for the LSTM intention pipeline.

Adapter over the shared objective library (agent/ppo_math.py): the forward
pass re-unrolls the recurrent policy over the stored sequence with the saved
first hidden state (BPTT), zero-resetting the carry across episode
boundaries; the latent prior is a plain standard normal with a fixed KL
weight (reference semantics: track_mjx/agent/lstm_ppo/losses.py:151-264).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from track_mjx_tpu.agent import ppo_math, types
from track_mjx_tpu.agent.ppo_math import PPONetworkParams  # noqa: F401
from track_mjx_tpu.agent.mlp_ppo.losses import compute_gae  # noqa: F401


def compute_ppo_loss(
    params: PPONetworkParams,
    normalizer_params: Any,
    data: types.Transition,
    rng: jnp.ndarray,
    step,
    ppo_network,
    entropy_cost: float = 1e-4,
    kl_weight: float = 1e-3,
    discounting: float = 0.9,
    reward_scaling: float = 1.0,
    gae_lambda: float = 0.95,
    clipping_epsilon: float = 0.3,
    normalize_advantage: bool = True,
    kl_schedule: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, types.Metrics]:
    """Clipped surrogate + value + entropy + standard-normal latent KL."""
    del step, kl_schedule  # no KL schedule in the LSTM pipeline (reference)

    def forward(policy_params, norm_params, tm_data, key):
        """Re-unrolls the policy through time with done-masked carries."""
        first_carry = (
            tm_data.extras["hidden_state"][0],
            tm_data.extras["cell_state"][0],
        )
        done = 1.0 - tm_data.discount

        def tick(carry, step_in):
            obs_t, done_t = step_in
            logits, z_mean, z_logvar, next_carry = (
                ppo_network.policy_network.apply(
                    norm_params,
                    policy_params,
                    obs_t,
                    key,
                    carry,
                    get_activation=False,
                )
            )
            # a finished episode hands the next step a fresh (zero) carry
            keep = (1.0 - done_t)[:, None, None]
            next_carry = jax.tree.map(lambda s: s * keep, next_carry)
            return next_carry, (logits, z_mean, z_logvar)

        _, (logits, z_mean, z_logvar) = jax.lax.scan(
            tick, first_carry, (tm_data.observation, done)
        )
        return logits, z_mean, z_logvar

    return ppo_math.assemble_ppo_loss(
        params,
        normalizer_params,
        data,
        rng,
        ppo_network=ppo_network,
        policy_forward=forward,
        latent_kl=ppo_math.gaussian_kl_standard,
        kl_weight=kl_weight,
        entropy_cost=entropy_cost,
        discounting=discounting,
        reward_scaling=reward_scaling,
        gae_lambda=gae_lambda,
        clipping_epsilon=clipping_epsilon,
        normalize_advantage=normalize_advantage,
    )
