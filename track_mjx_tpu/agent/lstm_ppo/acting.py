"""LSTM-pipeline adapters over the shared rollout/eval machinery.

The recurrent rollout logic lives in track_mjx_tpu.agent.acting
(recurrent_actor_step / recurrent_generate_unroll / Evaluator(recurrent=True))
— one implementation serves both pipelines, the way agent/ppo_math.py absorbs
the shared loss math. This module keeps the lstm_ppo package surface the
reference exposes (track_mjx/agent/lstm_ppo/acting.py: actor_step,
generate_unroll, Evaluator) mapped onto it.
"""

from __future__ import annotations

import functools

from track_mjx_tpu.agent.acting import (  # noqa: F401  (re-exported surface)
    recurrent_actor_step as actor_step,
    recurrent_generate_unroll as generate_unroll,
)
from track_mjx_tpu.agent.acting import Evaluator as _Evaluator

Evaluator = functools.partial(_Evaluator, recurrent=True)
