"""PPO loss for the MLP intention pipeline.

Behavioral parity with the reference loss (track_mjx/agent/mlp_ppo/losses.py):
- truncation-masked reverse-scan GAE (:39-100);
- clipped surrogate (:177-184), v_loss = 0.25 * MSE (:187-188), entropy bonus
  (:191-194);
- KL to an AR(1) latent prior p(z_t|z_{t-1}) = N(0.95 z_{t-1}, (1-0.95^2) I)
  with a standard-normal prior at t=0, sequence-length-weighted (:200-235);
- linear/cosine/sine KL ramp schedules (:248-290).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp

from track_mjx_tpu.agent import types


@flax.struct.dataclass
class PPONetworkParams:
    """Policy and value parameters."""

    policy: types.Params
    value: types.Params


def compute_gae(
    truncation: jnp.ndarray,
    termination: jnp.ndarray,
    rewards: jnp.ndarray,
    values: jnp.ndarray,
    bootstrap_value: jnp.ndarray,
    lambda_: float = 1.0,
    discount: float = 0.99,
):
    """Truncation-masked TD(lambda) GAE via reverse lax.scan."""
    truncation_mask = 1 - truncation
    values_t_plus_1 = jnp.concatenate(
        [values[1:], jnp.expand_dims(bootstrap_value, 0)], axis=0
    )
    deltas = rewards + discount * (1 - termination) * values_t_plus_1 - values
    deltas *= truncation_mask

    acc = jnp.zeros_like(bootstrap_value)

    def compute_vs_minus_v_xs(carry, target_t):
        lambda_, acc = carry
        truncation_mask, delta, termination = target_t
        acc = delta + discount * (1 - termination) * truncation_mask * lambda_ * acc
        return (lambda_, acc), acc

    (_, _), vs_minus_v_xs = jax.lax.scan(
        compute_vs_minus_v_xs,
        (lambda_, acc),
        (truncation_mask, deltas, termination),
        length=int(truncation_mask.shape[0]),
        reverse=True,
    )
    vs = jnp.add(vs_minus_v_xs, values)
    vs_t_plus_1 = jnp.concatenate(
        [vs[1:], jnp.expand_dims(bootstrap_value, 0)], axis=0
    )
    advantages = (
        rewards + discount * (1 - termination) * vs_t_plus_1 - values
    ) * truncation_mask
    return jax.lax.stop_gradient(vs), jax.lax.stop_gradient(advantages)


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
    """PPO surrogate + value + entropy + latent-prior KL."""
    _, policy_key, entropy_key = jax.random.split(rng, 3)
    parametric_action_distribution = ppo_network.parametric_action_distribution
    policy_apply = ppo_network.policy_network.apply
    value_apply = ppo_network.value_network.apply

    # time axis first
    data = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), data)
    policy_logits, latent_mean, latent_logvar = policy_apply(
        normalizer_params, params.policy, data.observation, policy_key
    )
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

    if kl_schedule is not None:
        kl_weight = kl_schedule(step)

    # AR(1) Gaussian latent prior (reference :200-235)
    alpha = 0.95
    prior_variance = 1 - alpha**2

    kl_0 = -0.5 * jnp.mean(
        1 + latent_logvar[0] - jnp.square(latent_mean[0]) - jnp.exp(latent_logvar[0])
    )
    if latent_mean.shape[0] > 1:
        z_prev = latent_mean[:-1]
        mu_curr = latent_mean[1:]
        logvar_curr = latent_logvar[1:]
        prior_mean = alpha * z_prev
        var_ratio = jnp.exp(logvar_curr) / prior_variance
        mean_diff_sq = jnp.square(prior_mean - mu_curr) / prior_variance
        log_var_ratio = jnp.log(prior_variance) - logvar_curr
        kl_t = 0.5 * jnp.mean(var_ratio + mean_diff_sq - 1 + log_var_ratio)
        total_timesteps = latent_mean.shape[0]
        kl_latent_loss = kl_weight * (
            (kl_0 + kl_t * (total_timesteps - 1)) / total_timesteps
        )
    else:
        kl_latent_loss = kl_weight * kl_0

    total_loss = policy_loss + v_loss + entropy_loss + kl_latent_loss
    return total_loss, {
        "total_loss": total_loss,
        "policy_loss": policy_loss,
        "v_loss": v_loss,
        "kl_latent_loss": kl_latent_loss,
        "entropy_loss": entropy_loss,
        "kl_weight": kl_weight,
    }


def create_ramp_schedule(
    max_value: float = 0.1,
    min_value: float = 0.0001,
    ramp_steps: int = 1000,
    warmup_steps: int = 0,
    schedule: str = "linear",
    period: int = 45,
):
    """Linear ramp or cyclic cosine/sine schedule for the KL weight."""

    def schedule_fn(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        if schedule == "linear":
            progress = jnp.clip((step - warmup_steps) / ramp_steps, min_value, 1)
            is_warmup = step < warmup_steps
            return jnp.where(is_warmup, min_value, progress * max_value)
        elif schedule == "cosine":
            angle = (2 * jnp.pi * step) / period
            amplitude = (max_value - min_value) / 2
            midpoint = (max_value + min_value) / 2
            return midpoint + min_value + amplitude * jnp.cos(angle)
        elif schedule == "sine":
            angle = (2 * jnp.pi * step) / period - jnp.pi / 2
            amplitude = (max_value - min_value) / 2
            midpoint = (max_value + min_value) / 2
            return midpoint + min_value + amplitude * jnp.sin(angle)
        else:
            raise ValueError(
                f"schedule must be 'linear', 'cosine', or 'sine', not {schedule}"
            )

    return schedule_fn
