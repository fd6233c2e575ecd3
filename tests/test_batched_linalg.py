"""Batched linear-algebra dispatch tests (CPU fallback path; the TPU Pallas
kernels are exercised by tools/profile_stages.py and the benchmark on real
hardware, where they agree with numpy to ~6e-7)."""

import jax
import jax.numpy as jnp
import numpy as np

from track_mjx_tpu.ops import batched_linalg as bl


def _spd(b, n, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(b, n, n).astype(np.float32)
    return a @ np.transpose(a, (0, 2, 1)) + 3 * np.eye(n, dtype=np.float32)


def test_cholesky_unbatched():
    m = _spd(1, 7)[0]
    l = bl.cholesky(jnp.asarray(m))
    np.testing.assert_allclose(
        np.asarray(l), np.linalg.cholesky(m), rtol=1e-4, atol=1e-5
    )


def test_cholesky_vmapped():
    m = _spd(9, 7)
    l = jax.jit(jax.vmap(bl.cholesky))(jnp.asarray(m))
    np.testing.assert_allclose(
        np.asarray(l), np.linalg.cholesky(m), rtol=1e-4, atol=1e-5
    )


def test_cho_solve_vmapped():
    m = _spd(5, 11)
    b = np.random.RandomState(1).randn(5, 11).astype(np.float32)
    l = np.linalg.cholesky(m)
    x = jax.jit(jax.vmap(bl.cho_solve))(jnp.asarray(l), jnp.asarray(b))
    expected = np.linalg.solve(m.astype(np.float64), b[..., None].astype(np.float64))[..., 0]
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-3, atol=1e-5)


def test_cho_solve_broadcast_l():
    """Unbatched factor with batched rhs broadcasts (custom_vmap rule)."""
    m = _spd(1, 6)[0]
    l = np.linalg.cholesky(m)
    b = np.random.RandomState(2).randn(4, 6).astype(np.float32)
    x = jax.vmap(bl.cho_solve, in_axes=(None, 0))(jnp.asarray(l), jnp.asarray(b))
    expected = np.linalg.solve(
        m.astype(np.float64), b.T.astype(np.float64)
    ).T
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-3, atol=1e-5)
