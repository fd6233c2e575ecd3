"""PPO network bundle + inference factories for the LSTM intention pipeline
(behavioral parity: track_mjx/agent/lstm_ppo/ppo_networks.py — inference fns
return (action, extras, new_hidden_state) triples; factory takes
hidden_state_size / hidden_layer_num)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp

from track_mjx_tpu.agent import distribution, networks, running_statistics, types
from track_mjx_tpu.agent.lstm_ppo import intention_network


@flax.struct.dataclass
class PPOImitationNetworks:
    policy_network: intention_network.LSTMNetwork
    value_network: networks.FeedForwardNetwork
    parametric_action_distribution: distribution.ParametricDistribution


def make_inference_fn(ppo_networks: PPOImitationNetworks):
    """Policy factory: returned policies take (obs, key, hidden_state)."""

    def make_policy(
        params: types.PolicyParams,
        deterministic: bool = False,
        get_activation: bool = False,
        compute_dtype=None,
    ):
        policy_network = ppo_networks.policy_network
        parametric_action_distribution = ppo_networks.parametric_action_distribution

        def policy(
            observations: types.Observation,
            key_sample: types.PRNGKey,
            hidden_state: Tuple[jnp.ndarray, jnp.ndarray],
        ):
            key_sample, key_network = jax.random.split(key_sample)
            if get_activation:
                (
                    logits,
                    latent_mean,
                    latent_logvar,
                    new_hidden_state,
                    activations,
                ) = policy_network.apply(
                    *params,
                    observations,
                    key_network,
                    hidden_state,
                    get_activation=True,
                    compute_dtype=compute_dtype,
                )
            else:
                logits, latent_mean, latent_logvar, new_hidden_state = (
                    policy_network.apply(
                        *params,
                        observations,
                        key_network,
                        hidden_state,
                        get_activation=False,
                        compute_dtype=compute_dtype,
                    )
                )
                activations = None
            if deterministic:
                extras = {
                    "latent_mean": latent_mean,
                    "latent_logvar": latent_logvar,
                }
                if get_activation:
                    extras["activations"] = activations
                return (
                    jnp.array(parametric_action_distribution.mode(logits)),
                    extras,
                    new_hidden_state,
                )
            raw_actions = parametric_action_distribution.sample_no_postprocessing(
                logits, key_sample
            )
            log_prob = parametric_action_distribution.log_prob(logits, raw_actions)
            postprocessed_actions = parametric_action_distribution.postprocess(
                raw_actions
            )
            return (
                jnp.array(postprocessed_actions),
                {
                    "latent_mean": latent_mean,
                    "latent_logvar": latent_logvar,
                    "log_prob": log_prob,
                    "raw_action": raw_actions,
                    "logits": logits,
                    "activations": activations,
                },
                new_hidden_state,
            )

        return policy

    return make_policy


def make_logging_inference_fn(ppo_networks: PPOImitationNetworks):
    """Params-as-argument policy factory for rollout logging."""

    def make_logging_policy(deterministic: bool = False, get_activation: bool = True):
        policy_network = ppo_networks.policy_network
        parametric_action_distribution = ppo_networks.parametric_action_distribution

        def logging_policy(
            params: types.PolicyParams,
            observations: types.Observation,
            key_sample: types.PRNGKey,
            hidden_state: Tuple[jnp.ndarray, jnp.ndarray],
        ):
            key_sample, key_network = jax.random.split(key_sample)
            if get_activation:
                (
                    logits,
                    latent_mean,
                    latent_logvar,
                    new_hidden_state,
                    activations,
                ) = policy_network.apply(
                    *params,
                    observations,
                    key_network,
                    hidden_state,
                    get_activation=True,
                )
            else:
                logits, latent_mean, latent_logvar, new_hidden_state = (
                    policy_network.apply(
                        *params,
                        observations,
                        key_network,
                        hidden_state,
                        get_activation=False,
                    )
                )
                activations = None
            if deterministic:
                action = jnp.array(parametric_action_distribution.mode(logits))
                log_prob = raw_actions = None
            else:
                raw_actions = parametric_action_distribution.sample_no_postprocessing(
                    logits, key_sample
                )
                log_prob = parametric_action_distribution.log_prob(
                    logits, raw_actions
                )
                action = jnp.array(
                    parametric_action_distribution.postprocess(raw_actions)
                )
            return (
                action,
                {
                    "latent_mean": latent_mean,
                    "latent_logvar": latent_logvar,
                    "log_prob": log_prob,
                    "raw_action": raw_actions,
                    "logits": logits,
                    "activations": activations,
                },
                new_hidden_state,
            )

        return logging_policy

    return make_logging_policy


def make_intention_ppo_networks(
    observation_size: int,
    reference_obs_size: int,
    action_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    intention_latent_size: int = 60,
    hidden_state_size: int = 128,
    hidden_layer_num: int = 2,
    encoder_hidden_layer_sizes: Sequence[int] = (1024,) * 2,
    decoder_hidden_layer_sizes: Sequence[int] = (1024,) * 2,
    value_hidden_layer_sizes: Sequence[int] = (1024,) * 2,
) -> PPOImitationNetworks:
    """Builds the LSTM intention policy + value MLP + NormalTanh dist."""
    parametric_action_distribution = distribution.NormalTanhDistribution(
        event_size=action_size
    )
    policy_network = intention_network.make_intention_policy(
        parametric_action_distribution.param_size,
        latent_size=intention_latent_size,
        hidden_state_size=hidden_state_size,
        hidden_layer_num=hidden_layer_num,
        total_obs_size=observation_size,
        reference_obs_size=reference_obs_size,
        preprocess_observations_fn=preprocess_observations_fn,
        encoder_hidden_layer_sizes=encoder_hidden_layer_sizes,
        decoder_hidden_layer_sizes=decoder_hidden_layer_sizes,
    )
    value_network = networks.make_value_network(
        observation_size,
        preprocess_observations_fn=preprocess_observations_fn,
        hidden_layer_sizes=value_hidden_layer_sizes,
    )
    return PPOImitationNetworks(
        policy_network=policy_network,
        value_network=value_network,
        parametric_action_distribution=parametric_action_distribution,
    )
