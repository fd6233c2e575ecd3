"""Shared PPO network bundle + inference factories for BOTH intention
pipelines (MLP and LSTM decoders).

This module is the single owned implementation behind
``agent/mlp_ppo/ppo_networks.py`` and ``agent/lstm_ppo/ppo_networks.py``
(which are thin bindings), finishing the de-duplication that
``agent/intention.py`` and ``agent/ppo_math.py`` started: one factory,
parameterized by whether the decoder is recurrent.

Behavioral contracts preserved (checkpoint/analysis code depends on them):
- the extras dict keys {latent_mean, latent_logvar, log_prob, raw_action,
  logits, activations} on the stochastic path and {latent_mean,
  latent_logvar[, activations]} on the deterministic acting path
  (reference track_mjx/agent/mlp_ppo/ppo_networks.py:34-100);
- recurrent policies take and return the hidden state as an extra
  positional (reference track_mjx/agent/lstm_ppo/ppo_networks.py:40-194);
- ``make_logging_inference_fn`` produces params-as-argument policies so one
  jitted fn serves evolving params (reference mlp_ppo/ppo_networks.py:103-153);
- the factory kwarg names mirror the reference config surface
  (mlp_ppo/ppo_networks.py:157-190, lstm_ppo/ppo_networks.py:198-237).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp

from track_mjx_tpu.agent import distribution, networks, running_statistics, types


@flax.struct.dataclass
class PPOImitationNetworks:
    policy_network: Any  # FeedForwardNetwork (MLP) or LSTMNetwork
    value_network: networks.FeedForwardNetwork
    parametric_action_distribution: distribution.ParametricDistribution


def _forward(
    policy_network,
    params,
    observations,
    key_network,
    hidden_state,
    *,
    recurrent: bool,
    deterministic: bool,
    get_activation: bool,
    compute_dtype,
):
    """Normalizes the two decoder call signatures into one shape:
    returns (logits, latent_mean, latent_logvar, new_hidden, activations),
    with new_hidden None for the feed-forward decoder."""
    if recurrent:
        # the LSTM network has no `deterministic` kwarg: z = latent_mean
        # always (reference lstm_ppo/intention_network.py:145-146)
        out = policy_network.apply(
            *params,
            observations,
            key_network,
            hidden_state,
            get_activation=get_activation,
            compute_dtype=compute_dtype,
        )
        if get_activation:
            logits, latent_mean, latent_logvar, new_hidden, activations = out
        else:
            logits, latent_mean, latent_logvar, new_hidden = out
            activations = None
        return logits, latent_mean, latent_logvar, new_hidden, activations
    if get_activation:
        logits, latent_mean, latent_logvar, activations = policy_network.apply(
            *params,
            observations,
            key_network,
            deterministic=deterministic,
            get_activation=True,
            compute_dtype=compute_dtype,
        )
    else:
        logits, latent_mean, latent_logvar = policy_network.apply(
            *params,
            observations,
            key_network,
            deterministic=deterministic,
            compute_dtype=compute_dtype,
        )
        activations = None
    return logits, latent_mean, latent_logvar, None, activations


def make_inference_fn(ppo_networks: PPOImitationNetworks, recurrent: bool = False):
    """Policy factory for acting/eval. Feed-forward policies are
    (obs, key) -> (action, extras); recurrent ones are
    (obs, key, hidden) -> (action, extras, new_hidden)."""

    def make_policy(
        params: types.PolicyParams,
        deterministic: bool = False,
        get_activation: bool = False,
        compute_dtype=None,
    ) -> types.Policy:
        policy_network = ppo_networks.policy_network
        dist = ppo_networks.parametric_action_distribution

        def run(observations, key_sample, hidden_state):
            key_sample, key_network = jax.random.split(key_sample)
            logits, latent_mean, latent_logvar, new_hidden, activations = _forward(
                policy_network,
                params,
                observations,
                key_network,
                hidden_state,
                recurrent=recurrent,
                deterministic=deterministic,
                get_activation=get_activation,
                compute_dtype=compute_dtype,
            )
            if deterministic:
                # acting-path contract: the deterministic extras dict carries
                # activations only when requested (mlp_ppo/ppo_networks.py:69-79)
                extras = {
                    "latent_mean": latent_mean,
                    "latent_logvar": latent_logvar,
                }
                if get_activation:
                    extras["activations"] = activations
                return jnp.array(dist.mode(logits)), extras, new_hidden
            raw_actions = dist.sample_no_postprocessing(logits, key_sample)
            log_prob = dist.log_prob(logits, raw_actions)
            extras = {
                "latent_mean": latent_mean,
                "latent_logvar": latent_logvar,
                "log_prob": log_prob,
                "raw_action": raw_actions,
                "logits": logits,
                "activations": activations,
            }
            return jnp.array(dist.postprocess(raw_actions)), extras, new_hidden

        if recurrent:

            def policy(observations, key_sample, hidden_state):
                action, extras, new_hidden = run(
                    observations, key_sample, hidden_state
                )
                return action, extras, new_hidden

        else:

            def policy(observations, key_sample):
                action, extras, _ = run(observations, key_sample, None)
                return action, extras

        return policy

    return make_policy


def make_logging_inference_fn(
    ppo_networks: PPOImitationNetworks, recurrent: bool = False
):
    """Params-as-argument policy factory for rollout logging. Unlike the
    acting path, the deterministic extras dict keeps the full key set (with
    None log_prob/raw_action), matching mlp_ppo/ppo_networks.py:103-153."""

    def make_logging_policy(deterministic: bool = False, get_activation: bool = True):
        policy_network = ppo_networks.policy_network
        dist = ppo_networks.parametric_action_distribution

        def run(params, observations, key_sample, hidden_state):
            key_sample, key_network = jax.random.split(key_sample)
            logits, latent_mean, latent_logvar, new_hidden, activations = _forward(
                policy_network,
                params,
                observations,
                key_network,
                hidden_state,
                recurrent=recurrent,
                deterministic=deterministic,
                get_activation=get_activation,
                compute_dtype=None,
            )
            if deterministic:
                action = jnp.array(dist.mode(logits))
                log_prob = raw_actions = None
            else:
                raw_actions = dist.sample_no_postprocessing(logits, key_sample)
                log_prob = dist.log_prob(logits, raw_actions)
                action = jnp.array(dist.postprocess(raw_actions))
            extras = {
                "latent_mean": latent_mean,
                "latent_logvar": latent_logvar,
                "log_prob": log_prob,
                "raw_action": raw_actions,
                "logits": logits,
                "activations": activations,
            }
            return action, extras, new_hidden

        if recurrent:

            def logging_policy(params, observations, key_sample, hidden_state):
                return run(params, observations, key_sample, hidden_state)

        else:

            def logging_policy(params, observations, key_sample):
                action, extras, _ = run(params, observations, key_sample, None)
                return action, extras

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
    *,
    recurrent_decoder: bool = False,
    hidden_state_size: int = 128,
    hidden_layer_num: int = 2,
) -> PPOImitationNetworks:
    """Builds the intention policy + value MLP + NormalTanh distribution,
    with either a feed-forward or an LSTM decoder."""
    parametric_action_distribution = distribution.NormalTanhDistribution(
        event_size=action_size
    )
    if recurrent_decoder:
        from track_mjx_tpu.agent.lstm_ppo import intention_network as lstm_net

        policy_network = lstm_net.make_intention_policy(
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
    else:
        from track_mjx_tpu.agent.mlp_ppo import intention_network as mlp_net

        policy_network = mlp_net.make_intention_policy(
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
    the proprioceptive normalizer slice (reference mlp_ppo/ppo_networks.py:
    193-238; MLP decoder only — the reference hard-disables the LSTM branch,
    checkpointing.py:169,224)."""
    from track_mjx_tpu.agent import checkpointing
    from track_mjx_tpu.agent.mlp_ppo import intention_network

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
