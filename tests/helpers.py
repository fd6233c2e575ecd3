"""Shared test helpers (re-exported from track_mjx_tpu.testing)."""

from track_mjx_tpu.testing import (  # noqa: F401
    TOY_WALKER_XML,
    ToyWalker,
    make_toy_env,
    toy_reward_config,
)
