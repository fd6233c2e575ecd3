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


class _FakeRef:
    """Minimal VMEM-ref stand-in (numpy-backed read/write slicing) so the
    ref-style kernel helpers can be unit-tested without a Pallas trace."""

    def __init__(self, arr):
        self.arr = np.array(arr, np.float32)

    def __getitem__(self, idx):
        return jnp.asarray(self.arr[idx])

    def __setitem__(self, idx, val):
        self.arr[idx] = np.asarray(val)

    @property
    def shape(self):
        return self.arr.shape

    @property
    def dtype(self):
        return jnp.float32


def test_invert_diag_blocks_and_pinv_substitution():
    """invert_diag_blocks must produce exact panel-diagonal inverses and
    blocked_substitution_pinv must solve L L^T x = b at f32 roundoff for
    panel-aligned AND ragged n (round 5; the fused scalar CG kernel's
    chosolve path)."""
    for n in (8, 16, 42, 73):
        rng = np.random.RandomState(n)
        g = rng.randn(n, n).astype(np.float32)
        a = g @ g.T + n * np.eye(n, dtype=np.float32)
        L = np.linalg.cholesky(a).astype(np.float32)
        T = 4
        b = rng.randn(n, T).astype(np.float32)
        l_ref = _FakeRef(np.broadcast_to(L[:, :, None], (n, n, T)))
        lt_ref = _FakeRef(np.broadcast_to(L.T[:, :, None], (n, n, T)))
        dinv_ref = _FakeRef(np.zeros((n, 8, T)))
        bl.invert_diag_blocks(l_ref, dinv_ref)
        # each stored block is inv(L_pp)
        for p0 in range(0, n, 8):
            m = min(8, n - p0)
            blk = dinv_ref.arr[p0 : p0 + m, :m, 0]
            np.testing.assert_allclose(
                blk @ L[p0 : p0 + m, p0 : p0 + m], np.eye(m),
                rtol=1e-4, atol=1e-5,
            )
        y_ref = _FakeRef(np.zeros((n, T)))
        out_ref = _FakeRef(np.zeros((n, T)))
        x = bl.blocked_substitution_pinv(
            l_ref, lt_ref, dinv_ref, y_ref, out_ref, jnp.asarray(b)
        )
        expected = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
        err = np.abs(np.asarray(x, np.float64) - expected).max()
        scale = max(1.0, np.abs(expected).max())
        assert err / scale < 5e-6, f"n={n}: rel err {err/scale:.2e}"
