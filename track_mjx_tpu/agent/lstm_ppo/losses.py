"""PPO loss for the LSTM intention pipeline.

Behavioral parity with track_mjx/agent/lstm_ppo/losses.py:
- the policy is re-unrolled over the stored sequence with lax.scan, carrying
  (h, c) from the stored first hidden state and zero-resetting the carry on
  done (:151-205); the final hidden is stop-gradiented (:208);
- same truncation-masked GAE / clipped surrogate / 0.25*MSE value loss;
- KL to a standard normal only (no AR(1) prior, no schedule) (:255-264).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp

from track_mjx_tpu.agent import types
from track_mjx_tpu.agent.mlp_ppo.losses import compute_gae  # identical math


@flax.struct.dataclass
class PPONetworkParams:
    """Policy and value parameters."""

    policy: types.Params
    value: types.Params


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
    """PPO loss with BPTT re-unroll of the LSTM policy."""
    del step, kl_schedule  # the LSTM pipeline has no KL schedule (reference)
    _, policy_key, entropy_key = jax.random.split(rng, 3)
    parametric_action_distribution = ppo_network.parametric_action_distribution
    policy_apply = ppo_network.policy_network.apply
    value_apply = ppo_network.value_network.apply

    # time axis first
    data = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), data)

    hidden_state = (
        data.extras["hidden_state"][0],
        data.extras["cell_state"][0],
    )

    def scan_policy_fn(carry, inputs):
        (h, c) = carry
        x_t, next_done, _ = inputs
        logits_t, latent_mean_t, latent_logvar_t, new_hidden_state = policy_apply(
            normalizer_params,
            params.policy,
            x_t,
            policy_key,
            (h, c),
            get_activation=False,
        )
        (new_h, new_c) = new_hidden_state
        done_mask = next_done[:, None].reshape((next_done.shape[0], 1, 1))
        new_h = jnp.where(done_mask, jnp.zeros_like(h), new_h)
        new_c = jnp.where(done_mask, jnp.zeros_like(c), new_c)
        return (new_h, new_c), (logits_t, latent_mean_t, latent_logvar_t, h, c)

    (final_h, final_c), (
        policy_logits,
        latent_mean,
        latent_logvar,
        _stack_h,
        _stack_c,
    ) = jax.lax.scan(
        scan_policy_fn,
        hidden_state,
        (data.observation, 1 - data.discount, data.extras),
    )
    _ = jax.tree.map(jax.lax.stop_gradient, (final_h, final_c))

    baseline = value_apply(normalizer_params, params.value, data.observation)
    bootstrap_value = value_apply(
        normalizer_params, params.value, data.next_observation[-1]
    )

    rewards = data.reward * reward_scaling
    truncation = data.extras["state_extras"]["truncation"]
    termination = (1 - data.discount) * (1 - truncation)

    target_action_log_probs = parametric_action_distribution.log_prob(
        policy_logits, data.extras["policy_extras"]["raw_action"]
    )
    behaviour_action_log_probs = data.extras["policy_extras"]["log_prob"]

    vs, advantages = compute_gae(
        truncation=truncation,
        termination=termination,
        rewards=rewards,
        values=baseline,
        bootstrap_value=bootstrap_value,
        lambda_=gae_lambda,
        discount=discounting,
    )
    if normalize_advantage:
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
    rho_s = jnp.exp(target_action_log_probs - behaviour_action_log_probs)

    surrogate_loss1 = rho_s * advantages
    surrogate_loss2 = (
        jnp.clip(rho_s, 1 - clipping_epsilon, 1 + clipping_epsilon) * advantages
    )
    policy_loss = -jnp.mean(jnp.minimum(surrogate_loss1, surrogate_loss2))

    v_error = vs - baseline
    v_loss = jnp.mean(v_error * v_error) * 0.5 * 0.5

    entropy = jnp.mean(
        parametric_action_distribution.entropy(policy_logits, entropy_key)
    )
    entropy_loss = entropy_cost * -entropy

    kl_latent_loss = kl_weight * (
        -0.5
        * jnp.mean(
            1 + latent_logvar - jnp.square(latent_mean) - jnp.exp(latent_logvar)
        )
    )

    total_loss = policy_loss + v_loss + entropy_loss + kl_latent_loss
    return total_loss, {
        "total_loss": total_loss,
        "policy_loss": policy_loss,
        "v_loss": v_loss,
        "kl_latent_loss": kl_latent_loss,
        "entropy_loss": entropy_loss,
    }
