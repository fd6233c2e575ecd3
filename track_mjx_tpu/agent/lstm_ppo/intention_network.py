"""LSTM-pipeline bindings for the shared intention-policy architecture.

The implementation lives in agent/intention.py; this module packages the
recurrent variant behind the LSTM pipeline's public surface (LSTMNetwork
bundle whose init also takes the initial carry).

Behavioral parity: track_mjx/agent/lstm_ppo/intention_network.py — including
z = latent_mean (the reference disables reparameterization in the LSTM
pipeline and we preserve that).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

from track_mjx_tpu.agent import types
from track_mjx_tpu.agent.intention import (  # noqa: F401  (public API)
    Encoder,
    IntentionPolicy as IntentionNetwork,
    RecurrentDecoder as LSTMDecoder,
    make_recurrent_intention_policy,
    sample_latent as reparameterize,
)


@dataclasses.dataclass
class LSTMNetwork:
    init: Callable[..., Any]
    apply: Callable[..., Any]


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
    del get_activation  # taps are requested per-apply, not at build time
    _, init, apply = make_recurrent_intention_policy(
        action_param_size,
        latent_size=latent_size,
        hidden_state_size=hidden_state_size,
        hidden_layer_num=hidden_layer_num,
        total_obs_size=total_obs_size,
        reference_obs_size=reference_obs_size,
        preprocess_observations_fn=preprocess_observations_fn,
        encoder_hidden_layer_sizes=encoder_hidden_layer_sizes,
        decoder_hidden_layer_sizes=decoder_hidden_layer_sizes,
    )
    return LSTMNetwork(init=init, apply=apply)
