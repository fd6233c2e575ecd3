"""Shared agent-layer types (replaces brax.training.types, SURVEY.md 2b)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, NamedTuple, Tuple

import jax

Params = Any
PRNGKey = jax.Array
Metrics = Dict[str, jax.Array]
Observation = jax.Array
Action = jax.Array
Extra = Dict[str, Any]
PolicyParams = Any
PreprocessObservationFn = Callable[[Observation, Params], Observation]
Policy = Callable[[Observation, PRNGKey], Tuple[Action, Extra]]


def identity_observation_preprocessor(observation: Observation, params: Params):
    """No-op observation preprocessor."""
    del params
    return observation


class Transition(NamedTuple):
    """Rollout transition (brax layout: extras carries policy/state extras)."""

    observation: jax.Array
    action: jax.Array
    reward: jax.Array
    discount: jax.Array
    next_observation: jax.Array
    extras: Mapping[str, Any] = ()
