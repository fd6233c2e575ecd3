"""LSTM intention encoder-decoder policy (behavioral parity:
track_mjx/agent/lstm_ppo/intention_network.py).

Encoder is the same Dense+silu+LayerNorm stack as the MLP pipeline; the
decoder is a stack of flax LSTMCells followed by a Dense projection (:61-110).
Note: z = latent_mean — the reference disables reparameterization in the LSTM
pipeline (:145-146,169) and we preserve that.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import random

from track_mjx_tpu.agent import types
from track_mjx_tpu.agent.networks import ActivationFn, Initializer
from track_mjx_tpu.agent.mlp_ppo.intention_network import Encoder


@dataclasses.dataclass
class LSTMNetwork:
    init: Callable[..., Any]
    apply: Callable[..., Any]


class LSTMDecoder(nn.Module):
    """Stacked LSTM cells + final Dense projection."""

    layer_sizes: Sequence[int]
    hidden_dim: int = 128
    hidden_layer_num: int = 2
    activation: ActivationFn = nn.relu
    kernel_init: Initializer = jax.nn.initializers.lecun_uniform()
    bias: bool = True

    @nn.compact
    def __call__(self, x, hidden_state, get_activation: bool = False):
        activations = {}
        h, c = hidden_state
        h_new, c_new = [], []
        for layer_idx in range(self.hidden_layer_num):
            lstm = nn.LSTMCell(
                features=self.hidden_dim,
                name=f"lstm_{layer_idx}",
                kernel_init=self.kernel_init,
            )
            h_i = h[:, layer_idx, :]
            c_i = c[:, layer_idx, :]
            (new_c_i, new_h_i), x = lstm((c_i, h_i), x)
            h_new.append(new_h_i)
            c_new.append(new_c_i)

        x = nn.Dense(
            self.layer_sizes[-1],
            name="lstm_projection",
            kernel_init=self.kernel_init,
            use_bias=self.bias,
        )(x)
        activations["lstm_projection"] = x

        stacked_h_new = jnp.stack(h_new, axis=1)
        stacked_c_new = jnp.stack(c_new, axis=1)
        if get_activation:
            return x, (stacked_h_new, stacked_c_new), activations
        return x, (stacked_h_new, stacked_c_new), {}


def reparameterize(rng, mean, logvar):
    """z = mean + eps * exp(logvar/2) (kept for API parity; unused since the
    LSTM pipeline feeds the mean directly)."""
    std = jnp.exp(0.5 * logvar)
    eps = random.normal(rng, logvar.shape)
    return mean + eps * std


class IntentionNetwork(nn.Module):
    """Encoder + LSTM decoder with intention bottleneck."""

    encoder_layers: Sequence[int]
    decoder_layers: Sequence[int]
    reference_obs_size: int
    latents: int = 60
    hidden_states: int = 128
    hidden_layer_num: int = 2

    def setup(self):
        self.encoder = Encoder(layer_sizes=self.encoder_layers, latents=self.latents)
        self.lstm_decoder = LSTMDecoder(
            layer_sizes=self.decoder_layers,
            hidden_dim=self.hidden_states,
            hidden_layer_num=self.hidden_layer_num,
        )

    def __call__(self, obs, key, hidden_state, get_activation: bool = False):
        _, encoder_rng = jax.random.split(key)
        traj = obs[..., : self.reference_obs_size]
        egocentric_obs = obs[..., self.reference_obs_size :]

        if get_activation:
            (latent_mean, latent_logvar), encoder_activations = self.encoder(
                traj, get_activation=True
            )
            z = latent_mean  # reparameterization disabled (reference parity)
            concatenated = jnp.concatenate([z, egocentric_obs], axis=-1)
            action, new_hidden_state, decoder_activations = self.lstm_decoder(
                concatenated, hidden_state, get_activation=True
            )
            return (
                action,
                latent_mean,
                latent_logvar,
                new_hidden_state,
                {
                    "encoder": encoder_activations,
                    "decoder": decoder_activations,
                    "intention": z,
                    "hidden_state": new_hidden_state,
                },
            )
        latent_mean, latent_logvar = self.encoder(traj, get_activation=False)
        z = latent_mean
        concatenated = jnp.concatenate([z, egocentric_obs], axis=-1)
        action, new_hidden_state, _ = self.lstm_decoder(concatenated, hidden_state)
        return action, latent_mean, latent_logvar, new_hidden_state


def make_intention_policy(
    action_param_size: int,
    latent_size: int,
    hidden_state_size: int,
    hidden_layer_num: int,
    total_obs_size: int,
    reference_obs_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    encoder_hidden_layer_sizes: Sequence[int] = (1024, 1024),
    decoder_hidden_layer_sizes: Sequence[int] = (1024, 1024),
    get_activation: bool = True,
) -> LSTMNetwork:
    """LSTM intention policy with observation-normalizer preprocessing."""
    policy_module = IntentionNetwork(
        encoder_layers=list(encoder_hidden_layer_sizes),
        decoder_layers=list(decoder_hidden_layer_sizes) + [action_param_size],
        reference_obs_size=reference_obs_size,
        latents=latent_size,
        hidden_states=hidden_state_size,
        hidden_layer_num=hidden_layer_num,
    )

    def apply(
        processor_params, policy_params, obs, key, hidden_state, get_activation
    ):
        obs = preprocess_observations_fn(obs, processor_params)
        return policy_module.apply(
            policy_params,
            obs=obs,
            key=key,
            hidden_state=hidden_state,
            get_activation=get_activation,
        )

    dummy_total_obs = jnp.zeros((1, total_obs_size))
    dummy_key = jax.random.PRNGKey(0)
    return LSTMNetwork(
        init=lambda key, hidden_state: policy_module.init(
            key, dummy_total_obs, dummy_key, hidden_state, get_activation
        ),
        apply=apply,
    )
