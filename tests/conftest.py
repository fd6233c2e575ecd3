"""Test harness config: force CPU with an 8-device virtual mesh so sharding
tests run without TPU hardware (SURVEY.md section 4: multi-host correctness is
validated on a simulated CPU mesh)."""

import os

# force CPU: the ambient environment may pin JAX_PLATFORMS to a TPU plugin.
# NOTE: pytest plugins import jax BEFORE this conftest runs, so the env var
# alone is not enough — jax.config must be updated too (safe because no
# backend has been initialized yet at collection time).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax as _jax  # noqa: E402

_jax.config.update("jax_platforms", "cpu")
assert _jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(_jax.devices()) == 8, "tests expect the 8-device virtual CPU mesh"

# NOTE: do NOT enable the persistent compilation cache here — XLA:CPU AOT
# reload has a machine-feature mismatch on this host (prefer-no-scatter/
# prefer-no-gather) that silently corrupts numerics of cached executables.

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# trainer / end-to-end modules: whole-module `slow` marker so the fast tier
# (`pytest -m "not slow"`) stays interactive (~2 min); the full suite runs
# both tiers. Split per VERDICT round 1 ("What's weak" item 5).
_SLOW_MODULES = {
    "test_train",
    "test_transfer",
    "test_entrypoint",
    "test_analysis",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rodent_mj_model():
    import mujoco

    from track_mjx_tpu.envs.walker.base import DEFAULT_ASSET_ROOT

    path = os.path.join(DEFAULT_ASSET_ROOT, "rodent", "rodent.xml")
    return mujoco.MjModel.from_xml_path(path)


@pytest.fixture(scope="session")
def rodent_system(rodent_mj_model):
    from track_mjx_tpu.physics import model as pm

    return pm.put_model(rodent_mj_model)
