"""PPO loss for the MLP intention pipeline.

Adapter over the shared objective library (agent/ppo_math.py): the MLP
pipeline's forward pass is a direct policy apply over the stored
observations, and its latent prior is the AR(1) Gaussian with a scheduled
KL weight (reference semantics: track_mjx/agent/mlp_ppo/losses.py:39-290).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax.numpy as jnp

from track_mjx_tpu.agent import ppo_math, types
from track_mjx_tpu.agent.ppo_math import (  # noqa: F401  (public API)
    PPONetworkParams,
    create_ramp_schedule,
)


def compute_gae(
    truncation: jnp.ndarray,
    termination: jnp.ndarray,
    rewards: jnp.ndarray,
    values: jnp.ndarray,
    bootstrap_value: jnp.ndarray,
    lambda_: float = 1.0,
    discount: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Truncation-masked TD(λ) targets (time-major [T, B] inputs)."""
    return ppo_math.gae_targets(
        rewards,
        values,
        bootstrap_value,
        continuation=1.0 - termination,
        valid=1.0 - truncation,
        lambda_=lambda_,
        discount=discount,
    )


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
    """Clipped surrogate + value + entropy + scheduled AR(1) latent KL."""
    if kl_schedule is not None:
        kl_weight = kl_schedule(step)

    def forward(policy_params, norm_params, tm_data, key):
        return ppo_network.policy_network.apply(
            norm_params, policy_params, tm_data.observation, key
        )

    total, metrics = ppo_math.assemble_ppo_loss(
        params,
        normalizer_params,
        data,
        rng,
        ppo_network=ppo_network,
        policy_forward=forward,
        latent_kl=ppo_math.gaussian_kl_ar1,
        kl_weight=kl_weight,
        entropy_cost=entropy_cost,
        discounting=discounting,
        reward_scaling=reward_scaling,
        gae_lambda=gae_lambda,
        clipping_epsilon=clipping_epsilon,
        normalize_advantage=normalize_advantage,
    )
    metrics["kl_weight"] = kl_weight
    return total, metrics
