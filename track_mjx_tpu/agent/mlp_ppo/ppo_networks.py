"""MLP-pipeline binding over the shared PPO network factory.

The implementation lives in ``agent/ppo_factory.py`` (one owned factory for
both decoder types); this module pins the feed-forward decoder and keeps the
import surface that checkpoints, analysis, and the trainer rely on
(reference counterpart: track_mjx/agent/mlp_ppo/ppo_networks.py).
"""

from __future__ import annotations

import functools

from track_mjx_tpu.agent import ppo_factory

PPOImitationNetworks = ppo_factory.PPOImitationNetworks

make_inference_fn = functools.partial(ppo_factory.make_inference_fn, recurrent=False)
make_logging_inference_fn = functools.partial(
    ppo_factory.make_logging_inference_fn, recurrent=False
)
make_intention_ppo_networks = functools.partial(
    ppo_factory.make_intention_ppo_networks, recurrent_decoder=False
)
make_decoder_policy_fn = ppo_factory.make_decoder_policy_fn
