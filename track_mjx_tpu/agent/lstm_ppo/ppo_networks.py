"""LSTM-pipeline binding over the shared PPO network factory.

The implementation lives in ``agent/ppo_factory.py``; this module pins the
recurrent decoder — inference fns return (action, extras, new_hidden_state)
triples and the factory takes hidden_state_size / hidden_layer_num
(reference counterpart: track_mjx/agent/lstm_ppo/ppo_networks.py).
"""

from __future__ import annotations

import functools

from track_mjx_tpu.agent import ppo_factory

PPOImitationNetworks = ppo_factory.PPOImitationNetworks

make_inference_fn = functools.partial(ppo_factory.make_inference_fn, recurrent=True)
make_logging_inference_fn = functools.partial(
    ppo_factory.make_logging_inference_fn, recurrent=True
)
make_intention_ppo_networks = functools.partial(
    ppo_factory.make_intention_ppo_networks, recurrent_decoder=True
)
