"""Environment core types: State pytree and the Env/Wrapper protocol.

TPU-first replacement for brax.envs.base (SURVEY.md section 2b): State is a
plain flax pytree; envs expose pure reset/step functions designed to be
vmapped and jitted as a whole; wrappers delegate attribute access like brax's
so the reference's wrapper-stack idioms keep working.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from flax import struct

from track_mjx_tpu.physics.model import Data


@struct.dataclass
class State:
    """Environment state carried through rollout scans."""

    pipeline_state: Data
    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    metrics: Dict[str, jax.Array] = struct.field(default_factory=dict)
    info: Dict[str, Any] = struct.field(default_factory=dict)


class Env:
    """Minimal env interface (single-env semantics; vectorize via wrappers)."""

    def reset(self, rng: jax.Array) -> State:
        raise NotImplementedError

    def step(self, state: State, action: jax.Array) -> State:
        raise NotImplementedError

    @property
    def observation_size(self) -> int:
        raise NotImplementedError

    @property
    def action_size(self) -> int:
        raise NotImplementedError

    @property
    def unwrapped(self) -> "Env":
        return self


class Wrapper(Env):
    """Delegating wrapper base (attribute fallthrough like brax Wrapper)."""

    def __init__(self, env: Env):
        self.env = env

    def reset(self, rng: jax.Array) -> State:
        return self.env.reset(rng)

    def step(self, state: State, action: jax.Array) -> State:
        return self.env.step(state, action)

    @property
    def observation_size(self) -> int:
        return self.env.observation_size

    @property
    def action_size(self) -> int:
        return self.env.action_size

    @property
    def unwrapped(self) -> Env:
        return self.env.unwrapped

    def __getattr__(self, name: str):
        if name == "__setstate__":
            raise AttributeError(name)
        return getattr(self.env, name)


_ENV_REGISTRY: Dict[str, Any] = {}


def register_environment(name: str, ctor) -> None:
    """Registers an env constructor under a name (mirrors brax envs.register;
    reference registers rodent_single_clip/rodent_multi_clip/fly_multi_clip in
    track_mjx/train.py:66-68)."""
    _ENV_REGISTRY[name] = ctor


def get_environment(name: str, **kwargs) -> Env:
    """Instantiates a registered environment."""
    if name not in _ENV_REGISTRY:
        raise KeyError(
            f"unknown env '{name}'; registered: {sorted(_ENV_REGISTRY)}"
        )
    return _ENV_REGISTRY[name](**kwargs)
