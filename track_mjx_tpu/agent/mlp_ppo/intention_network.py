"""MLP-pipeline bindings for the shared intention-policy architecture.

The implementation lives in agent/intention.py (one VAE architecture serving
both pipelines); this module keeps the MLP pipeline's public surface
(Encoder/Decoder classes, reparameterize, the make_* factories) stable for
trainers, analysis tooling, and tests.

Behavioral parity: track_mjx/agent/mlp_ppo/intention_network.py.
"""

from __future__ import annotations

from typing import Sequence

from track_mjx_tpu.agent import types
from track_mjx_tpu.agent.intention import (  # noqa: F401  (public API)
    Decoder,
    Encoder,
    IntentionPolicy as IntentionNetwork,
    make_decoder_only_policy as make_decoder_policy,
    make_feedforward_intention_policy as make_intention_policy,
    sample_latent as reparameterize,
)
from track_mjx_tpu.agent.networks import FeedForwardNetwork  # noqa: F401
