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

# Three tiers (VERDICT round 1, "What's weak" item 5):
#   quick  : -m "not slow and not oracle"   (~3 min — unit/env/agent logic)
#   oracle : -m oracle                      (MuJoCo-C physics comparisons;
#                                            each test jit-compiles a full
#                                            forward variant, minutes on CPU)
#   slow   : -m slow                        (trainer / end-to-end, minutes)
_SLOW_MODULES = {
    "test_train",
    "test_transfer",
    "test_entrypoint",
    "test_analysis",
}
_ORACLE_MODULES = {
    "test_physics_parity",
    "test_cg_kernel_parity",
    "test_equality",
    "test_integrators",
    "test_fly",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        if item.module.__name__ in _ORACLE_MODULES:
            item.add_marker(pytest.mark.oracle)


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
