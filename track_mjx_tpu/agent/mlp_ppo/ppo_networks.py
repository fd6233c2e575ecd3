"""PPO network bundle + inference factories for the MLP intention pipeline.

Behavioral parity with track_mjx/agent/mlp_ppo/ppo_networks.py:
- ``PPOImitationNetworks`` bundle (:27-31);
- ``make_inference_fn`` (:34-100): stochastic path returns action +
  extras{latent_mean, latent_logvar, log_prob, raw_action, logits,
  activations}; deterministic path uses the distribution mode;
- ``make_logging_inference_fn`` params-as-arg variant (:103-153);
- ``make_intention_ppo_networks`` factory (:157-190);
- ``make_decoder_policy_fn`` checkpoint-driven decoder-only policy (:193-238).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp

from track_mjx_tpu.agent import distribution, networks, running_statistics, types
from track_mjx_tpu.agent.mlp_ppo import intention_network


@flax.struct.dataclass
class PPOImitationNetworks:
    policy_network: networks.FeedForwardNetwork
    value_network: networks.FeedForwardNetwork
    parametric_action_distribution: distribution.ParametricDistribution


def make_inference_fn(ppo_networks: PPOImitationNetworks):
    """Creates the policy factory for acting/eval."""

    def make_policy(
        params: types.PolicyParams,
        deterministic: bool = False,
        get_activation: bool = False,
        compute_dtype=None,
    ) -> types.Policy:
        policy_network = ppo_networks.policy_network
        parametric_action_distribution = ppo_networks.parametric_action_distribution

        def policy(
            observations: types.Observation, key_sample: types.PRNGKey
        ) -> Tuple[types.Action, types.Extra]:
            key_sample, key_network = jax.random.split(key_sample)
            activations = None
            if get_activation:
                logits, latent_mean, latent_logvar, activations = (
                    policy_network.apply(
                        *params,
                        observations,
                        key_network,
                        deterministic=deterministic,
                        get_activation=True,
                        compute_dtype=compute_dtype,
                    )
                )
            else:
                logits, latent_mean, latent_logvar = policy_network.apply(
                    *params,
                    observations,
                    key_network,
                    deterministic=deterministic,
                    compute_dtype=compute_dtype,
                )
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
                )
            raw_actions = parametric_action_distribution.sample_no_postprocessing(
                logits, key_sample
            )
            log_prob = parametric_action_distribution.log_prob(logits, raw_actions)
            postprocessed_actions = parametric_action_distribution.postprocess(
                raw_actions
            )
            return jnp.array(postprocessed_actions), {
                "latent_mean": latent_mean,
                "latent_logvar": latent_logvar,
                "log_prob": log_prob,
                "raw_action": raw_actions,
                "logits": logits,
                "activations": activations,
            }

        return policy

    return make_policy


def make_logging_inference_fn(ppo_networks: PPOImitationNetworks):
    """Policy factory whose returned fn takes params as an argument — used by
    rollout logging so one jitted fn serves evolving params."""

    def make_logging_policy(deterministic: bool = False, get_activation: bool = True):
        policy_network = ppo_networks.policy_network
        parametric_action_distribution = ppo_networks.parametric_action_distribution

        def logging_policy(
            params: types.PolicyParams,
            observations: types.Observation,
            key_sample: types.PRNGKey,
        ) -> Tuple[types.Action, types.Extra]:
            key_sample, key_network = jax.random.split(key_sample)
            if get_activation:
                logits, latent_mean, latent_logvar, activations = (
                    policy_network.apply(
                        *params,
                        observations,
                        key_network,
                        deterministic=deterministic,
                        get_activation=True,
                    )
                )
            else:
                logits, latent_mean, latent_logvar = policy_network.apply(
                    *params, observations, key_network, deterministic=deterministic
                )
                activations = None
            if deterministic:
                action = jnp.array(parametric_action_distribution.mode(logits))
                log_prob = None
                raw_actions = None
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
            return action, {
                "latent_mean": latent_mean,
                "latent_logvar": latent_logvar,
                "log_prob": log_prob,
                "raw_action": raw_actions,
                "logits": logits,
                "activations": activations,
            }

        return logging_policy

    return make_logging_policy


def make_intention_ppo_networks(
    observation_size: int,
    reference_obs_size: int,
    action_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    intention_latent_size: int = 60,
    encoder_hidden_layer_sizes: Sequence[int] = (1024,) * 2,
    decoder_hidden_layer_sizes: Sequence[int] = (1024,) * 2,
    value_hidden_layer_sizes: Sequence[int] = (1024,) * 2,
) -> PPOImitationNetworks:
    """Builds the intention policy + value MLP + NormalTanh distribution."""
    parametric_action_distribution = distribution.NormalTanhDistribution(
        event_size=action_size
    )
    policy_network = intention_network.make_intention_policy(
        parametric_action_distribution.param_size,
        latent_size=intention_latent_size,
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


def make_decoder_policy_fn(ckpt_path, step: Optional[int] = None):
    """Loads a checkpoint and builds a decoder-only deterministic policy with
    the proprioceptive normalizer slice (reference :193-238)."""
    from track_mjx_tpu.agent import checkpointing

    def make_decoder_policy(params, policy_network, parametric_action_distribution):
        def policy(observations: types.Observation) -> Tuple[types.Action, types.Extra]:
            logits, extras = policy_network.apply(*params, observations)
            return parametric_action_distribution.mode(logits), extras

        return policy

    cfg = checkpointing.load_config_from_checkpoint(ckpt_path, step=step)
    observation_size = cfg["network_config"]["observation_size"]
    reference_obs_size = cfg["network_config"]["reference_obs_size"]
    action_size = cfg["network_config"]["action_size"]
    intention_latent_size = cfg["network_config"]["intention_size"]
    decoder_hidden_layer_sizes = cfg["network_config"]["decoder_layer_sizes"]

    intention_policy_params = checkpointing.load_policy(ckpt_path, cfg, step=step)

    parametric_action_distribution = distribution.NormalTanhDistribution(
        event_size=action_size
    )
    policy_network = intention_network.make_decoder_policy(
        parametric_action_distribution.param_size,
        decoder_obs_size=(observation_size - reference_obs_size)
        + intention_latent_size,
        preprocess_observations_fn=running_statistics.normalize,
        decoder_hidden_layer_sizes=decoder_hidden_layer_sizes,
    )
    decoder_normalizer_params = running_statistics.RunningStatisticsState(
        count=jnp.zeros(()),
        mean=intention_policy_params[0].mean[reference_obs_size:],
        summed_variance=intention_policy_params[0].summed_variance[
            reference_obs_size:
        ],
        std=intention_policy_params[0].std[reference_obs_size:],
    )
    decoder_params = (
        decoder_normalizer_params,
        {"params": intention_policy_params[1]["params"]["decoder"]},
    )
    return make_decoder_policy(
        decoder_params, policy_network, parametric_action_distribution
    )
