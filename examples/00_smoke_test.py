"""Stack smoke test (script equivalent of notebooks/test_setup.ipynb):
devices, model compile, one env reset, optional render probe."""

import jax
import mujoco

from track_mjx_tpu.analysis.render import gl_available
from track_mjx_tpu.testing import make_toy_env

print("jax devices:", jax.devices())
print("default backend:", jax.default_backend())
print("mujoco version:", mujoco.__version__)
print("GL rendering available:", gl_available())

env = make_toy_env()
state = jax.jit(env.reset)(jax.random.PRNGKey(0))
print("env reset OK; obs size:", state.obs.shape[-1])
state = jax.jit(env.step)(state, jax.numpy.zeros(env.action_size))
print("env step OK; reward:", float(state.reward))
