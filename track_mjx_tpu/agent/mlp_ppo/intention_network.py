"""CoMic-style variational intention encoder-decoder policy (MLP pipeline).

Behavioral parity with the reference network
(track_mjx/agent/mlp_ppo/intention_network.py):
- Encoder: Dense + silu + LayerNorm stack, then mean & logvar heads (:14-50).
- Decoder: Dense + silu + LayerNorm, no final activation (:53-81).
- reparameterize (:84-87); deterministic mode uses the latent mean (:110-114).
- Encoder sees only the reference obs slice; decoder sees [z, egocentric obs]
  (:104,115-116); optional activation capture for analysis (:106-131).
- make_intention_policy wraps with observation-normalizer preprocessing into a
  FeedForwardNetwork (:145-191); make_decoder_policy normalizes only the
  proprioceptive slice (:194-222).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import random

from track_mjx_tpu.agent import types
from track_mjx_tpu.agent.networks import ActivationFn, FeedForwardNetwork, Initializer


class Encoder(nn.Module):
    """Maps reference observations to a latent Gaussian (mean, logvar)."""

    layer_sizes: Sequence[int]
    latents: int
    activation: ActivationFn = nn.silu
    kernel_init: Initializer = jax.nn.initializers.lecun_uniform()
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, get_activation: bool = False):
        activations = {}
        for i, hidden_size in enumerate(self.layer_sizes):
            x = nn.Dense(
                hidden_size,
                name=f"hidden_{i}",
                kernel_init=self.kernel_init,
                use_bias=self.bias,
            )(x)
            x = self.activation(x)
            x = nn.LayerNorm()(x)
            if get_activation:
                activations[f"layer_{i}"] = x
        mean_x = nn.Dense(self.latents, name="fc2_mean")(x)
        logvar_x = nn.Dense(self.latents, name="fc2_logvar")(x)
        if get_activation:
            activations["mean"] = mean_x
            activations["logvar"] = logvar_x
            return (mean_x, logvar_x), activations
        return mean_x, logvar_x


class Decoder(nn.Module):
    """Maps [latent, egocentric obs] to action-distribution parameters."""

    layer_sizes: Sequence[int]
    activation: ActivationFn = nn.silu
    kernel_init: Initializer = jax.nn.initializers.lecun_uniform()
    activate_final: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, get_activation: bool = False):
        activations = {}
        for i, hidden_size in enumerate(self.layer_sizes):
            x = nn.Dense(
                hidden_size,
                name=f"hidden_{i}",
                kernel_init=self.kernel_init,
                use_bias=self.bias,
            )(x)
            if i != len(self.layer_sizes) - 1 or self.activate_final:
                x = self.activation(x)
                x = nn.LayerNorm()(x)
                if get_activation:
                    activations[f"layer_{i}"] = x
        if get_activation:
            return x, activations
        return x, {}


def reparameterize(rng, mean, logvar):
    """z = mean + eps * exp(logvar / 2)."""
    std = jnp.exp(0.5 * logvar)
    eps = random.normal(rng, logvar.shape)
    return mean + eps * std


class IntentionNetwork(nn.Module):
    """Encoder-decoder VAE policy with an intention bottleneck."""

    encoder_layers: Sequence[int]
    decoder_layers: Sequence[int]
    reference_obs_size: int
    latents: int = 60

    def setup(self):
        self.encoder = Encoder(layer_sizes=self.encoder_layers, latents=self.latents)
        self.decoder = Decoder(layer_sizes=self.decoder_layers)

    def __call__(
        self,
        obs: jnp.ndarray,
        key: jax.Array,
        deterministic: bool = False,
        get_activation: bool = False,
    ):
        _, encoder_rng = jax.random.split(key)
        traj = obs[..., : self.reference_obs_size]
        egocentric_obs = obs[..., self.reference_obs_size :]

        if get_activation:
            (latent_mean, latent_logvar), encoder_activations = self.encoder(
                traj, get_activation=True
            )
        else:
            latent_mean, latent_logvar = self.encoder(traj, get_activation=False)

        if deterministic:
            z = latent_mean
        else:
            z = reparameterize(encoder_rng, latent_mean, latent_logvar)

        concatenated = jnp.concatenate([z, egocentric_obs], axis=-1)
        if get_activation:
            action, decoder_activations = self.decoder(
                concatenated, get_activation=True
            )
            return (
                action,
                latent_mean,
                latent_logvar,
                {
                    "encoder": encoder_activations,
                    "decoder": decoder_activations,
                    "egocentric_obs": egocentric_obs,
                    "traj_obs": traj,
                    "intention": z,
                },
            )
        action, _ = self.decoder(concatenated)
        return action, latent_mean, latent_logvar


def make_intention_policy(
    action_param_size: int,
    latent_size: int,
    total_obs_size: int,
    reference_obs_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    encoder_hidden_layer_sizes: Sequence[int] = (1024, 1024),
    decoder_hidden_layer_sizes: Sequence[int] = (1024, 1024),
) -> FeedForwardNetwork:
    """Intention policy with observation-normalizer preprocessing."""
    policy_module = IntentionNetwork(
        encoder_layers=list(encoder_hidden_layer_sizes),
        decoder_layers=list(decoder_hidden_layer_sizes) + [action_param_size],
        reference_obs_size=reference_obs_size,
        latents=latent_size,
    )

    def apply(
        processor_params,
        policy_params,
        obs,
        key,
        deterministic: bool = False,
        get_activation: bool = False,
    ):
        obs = preprocess_observations_fn(obs, processor_params)
        return policy_module.apply(
            policy_params,
            obs=obs,
            key=key,
            deterministic=deterministic,
            get_activation=get_activation,
        )

    dummy_total_obs = jnp.zeros((1, total_obs_size))
    dummy_key = jax.random.PRNGKey(0)
    return FeedForwardNetwork(
        init=lambda key: policy_module.init(key, dummy_total_obs, dummy_key),
        apply=apply,
    )


def make_decoder_policy(
    param_size: int,
    decoder_obs_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    decoder_hidden_layer_sizes: Sequence[int] = (1024, 1024),
) -> FeedForwardNetwork:
    """Decoder-only policy; the normalizer applies only to the trailing
    proprioceptive slice of the input (reference :194-222)."""
    policy_module = Decoder(
        layer_sizes=list(decoder_hidden_layer_sizes) + [param_size]
    )

    def apply(processor_params, policy_params, obs):
        temp_obs = obs
        obs = preprocess_observations_fn(
            obs[..., -processor_params.mean.shape[-1] :], processor_params
        )
        obs = jnp.concatenate(
            [temp_obs[..., : -processor_params.mean.shape[-1]], obs], axis=-1
        )
        return policy_module.apply(policy_params, x=obs)

    dummy_total_obs = jnp.zeros((1, decoder_obs_size))
    return FeedForwardNetwork(
        init=lambda key: policy_module.init(key, dummy_total_obs),
        apply=apply,
    )
