"""PPO objective math shared by the MLP and LSTM intention pipelines.

One implementation of the pieces both trainers assemble: λ-return targets
with truncation masking, the clipped surrogate, the value and entropy terms,
the latent-prior KL variants (AR(1) for the MLP pipeline, standard normal for
the LSTM one), and the KL-weight schedules. The per-pipeline ``losses.py``
modules are thin adapters that supply their policy forward pass (direct apply
vs. BPTT re-unroll) and pick a KL variant.

Behavioral contract (pinned by tests/test_agent_math.py): matches the
reference loss semantics — track_mjx/agent/mlp_ppo/losses.py:39-235 and
track_mjx/agent/lstm_ppo/losses.py:151-264 — while the factoring here is our
own (single fused λ-weight scan, vectorized branch-free AR(1) KL).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp

from track_mjx_tpu.agent import types


@flax.struct.dataclass
class PPONetworkParams:
    """Policy and value parameter bundle (one optimizer state over both)."""

    policy: types.Params
    value: types.Params


# ---------------------------------------------------------------------------
# λ-return targets
# ---------------------------------------------------------------------------


def gae_targets(
    rewards: jnp.ndarray,
    values: jnp.ndarray,
    bootstrap_value: jnp.ndarray,
    *,
    continuation: jnp.ndarray,
    valid: jnp.ndarray,
    lambda_: float,
    discount: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TD(λ) value targets and one-step advantages against them.

    Args (all time-major, [T, ...]):
      continuation: 1 while the episode keeps running, 0 on true termination
        (the future carries no value through a terminal step).
      valid: 1 for ordinary steps, 0 where the unroll crossed a truncation
        boundary (no bootstrapping through it, no learning signal on it).

    The λ-recursion folds with a single precomputed per-step weight
    w_t = λ·γ·continuation_t·valid_t, so the scan body is one multiply-add.
    """
    future = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    carry = discount * continuation
    residual = (rewards + carry * future - values) * valid
    fold_w = lambda_ * carry * valid

    def fold(acc, rw):
        acc = rw[0] + rw[1] * acc
        return acc, acc

    _, gae = jax.lax.scan(
        fold, jnp.zeros_like(bootstrap_value), (residual, fold_w), reverse=True
    )
    targets = gae + values
    future_targets = jnp.concatenate(
        [targets[1:], bootstrap_value[None]], axis=0
    )
    advantages = (rewards + carry * future_targets - values) * valid
    return jax.lax.stop_gradient(targets), jax.lax.stop_gradient(advantages)


# ---------------------------------------------------------------------------
# loss terms
# ---------------------------------------------------------------------------


def clipped_surrogate(
    target_log_prob: jnp.ndarray,
    behavior_log_prob: jnp.ndarray,
    advantages: jnp.ndarray,
    epsilon: float,
) -> jnp.ndarray:
    """PPO-clip policy objective (negated: a loss)."""
    ratio = jnp.exp(target_log_prob - behavior_log_prob)
    clipped = jnp.clip(ratio, 1.0 - epsilon, 1.0 + epsilon)
    return -jnp.mean(jnp.minimum(ratio * advantages, clipped * advantages))


def value_objective(targets: jnp.ndarray, baseline: jnp.ndarray) -> jnp.ndarray:
    """0.25 · MSE — the reference's halved half-quadratic."""
    return 0.25 * jnp.mean(jnp.square(targets - baseline))


def gaussian_kl_ar1(
    mean: jnp.ndarray, logvar: jnp.ndarray, alpha: float = 0.95
) -> jnp.ndarray:
    """Mean KL(q_t ‖ p_t) under the AR(1) latent prior.

    p(z_0) = N(0, I); p(z_t | z_{t-1}) = N(α·z_{t-1}, (1-α²)·I) with the
    previous *posterior mean* standing in for z_{t-1}. Branch-free over the
    time axis: the t = 0 row simply uses prior mean 0 / variance 1, which
    makes the sequence-length weighting of the reference
    (mlp_ppo/losses.py:200-235) a plain global mean.
    """
    prior_mean = jnp.concatenate(
        [jnp.zeros_like(mean[:1]), alpha * mean[:-1]], axis=0
    )
    head_var = jnp.ones((1,) + (1,) * (mean.ndim - 1), mean.dtype)
    tail_var = jnp.full_like(head_var, 1.0 - alpha * alpha)
    prior_var = jnp.concatenate(
        [head_var, jnp.broadcast_to(tail_var, (mean.shape[0] - 1,) + tail_var.shape[1:])],
        axis=0,
    )
    kl = (
        jnp.exp(logvar) / prior_var
        + jnp.square(mean - prior_mean) / prior_var
        - 1.0
        + jnp.log(prior_var)
        - logvar
    )
    return 0.5 * jnp.mean(kl)


def gaussian_kl_standard(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Mean KL(q ‖ N(0, I))."""
    return 0.5 * jnp.mean(
        jnp.exp(logvar) + jnp.square(mean) - 1.0 - logvar
    )


# ---------------------------------------------------------------------------
# assembled loss
# ---------------------------------------------------------------------------

# Supplies (logits, latent_mean, latent_logvar) for the stored observations;
# pipelines differ only here (direct apply vs. carry-threaded BPTT re-unroll).
PolicyForward = Callable[
    [types.Params, Any, "types.Transition", jnp.ndarray],
    Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
]


def assemble_ppo_loss(
    params: PPONetworkParams,
    normalizer_params: Any,
    data: types.Transition,
    rng: jnp.ndarray,
    *,
    ppo_network,
    policy_forward: PolicyForward,
    latent_kl: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    kl_weight: jnp.ndarray,
    entropy_cost: float,
    discounting: float,
    reward_scaling: float,
    gae_lambda: float,
    clipping_epsilon: float,
    normalize_advantage: bool,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Shared PPO loss body over a batch-major Transition.

    ``data`` arrives batch-major [B, T, ...] from the minibatch pipeline and
    is transposed to time-major here, once, for every consumer (forward pass,
    targets, KL).
    """
    _, forward_key, entropy_key = jax.random.split(rng, 3)
    dist = ppo_network.parametric_action_distribution

    data = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), data)
    logits, latent_mean, latent_logvar = policy_forward(
        params.policy, normalizer_params, data, forward_key
    )
    value_apply = ppo_network.value_network.apply
    baseline = value_apply(normalizer_params, params.value, data.observation)
    bootstrap = value_apply(
        normalizer_params, params.value, data.next_observation[-1]
    )

    valid = 1.0 - data.extras["state_extras"]["truncation"]
    continuation = 1.0 - (1.0 - data.discount) * valid
    targets, advantages = gae_targets(
        data.reward * reward_scaling,
        baseline,
        bootstrap,
        continuation=continuation,
        valid=valid,
        lambda_=gae_lambda,
        discount=discounting,
    )
    if normalize_advantage:
        advantages = (advantages - advantages.mean()) / (
            advantages.std() + 1e-8
        )

    policy_loss = clipped_surrogate(
        dist.log_prob(logits, data.extras["policy_extras"]["raw_action"]),
        data.extras["policy_extras"]["log_prob"],
        advantages,
        clipping_epsilon,
    )
    v_loss = value_objective(targets, baseline)
    entropy_loss = -entropy_cost * jnp.mean(dist.entropy(logits, entropy_key))
    kl_latent_loss = kl_weight * latent_kl(latent_mean, latent_logvar)

    total = policy_loss + v_loss + entropy_loss + kl_latent_loss
    return total, {
        "total_loss": total,
        "policy_loss": policy_loss,
        "v_loss": v_loss,
        "kl_latent_loss": kl_latent_loss,
        "entropy_loss": entropy_loss,
    }


# ---------------------------------------------------------------------------
# KL-weight schedules
# ---------------------------------------------------------------------------


def create_ramp_schedule(
    max_value: float = 0.1,
    min_value: float = 0.0001,
    ramp_steps: int = 1000,
    warmup_steps: int = 0,
    schedule: str = "linear",
    period: int = 45,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """KL-weight schedule: a warmup-gated linear ramp, or a cyclic wave.

    The cyclic variants oscillate between min and max around the midpoint
    (offset by min_value, matching the reference's bounds test).
    """

    def linear(step):
        frac = jnp.clip((step - warmup_steps) / ramp_steps, min_value, 1.0)
        return jnp.where(step < warmup_steps, min_value, frac * max_value)

    def wave(step, phase):
        half_span = 0.5 * (max_value - min_value)
        center = 0.5 * (max_value + min_value) + min_value
        return center + half_span * jnp.cos(2.0 * jnp.pi * step / period + phase)

    shapes = {
        "linear": linear,
        "cosine": lambda step: wave(step, 0.0),
        "sine": lambda step: wave(step, -jnp.pi),  # sin(x - π/2) = cos(x - π)
    }
    if schedule not in shapes:
        raise ValueError(
            f"schedule must be 'linear', 'cosine', or 'sine', not {schedule}"
        )
    fn = shapes[schedule]
    return lambda step: fn(jnp.asarray(step, jnp.float32))
