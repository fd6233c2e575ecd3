"""Kernel dispatch-routing regression tests (round 5).

The first J-in-VMEM landing silently fell back to the per-env XLA CG path
on EVERY production step: contact friction (jb_mu) is a model constant, so
under the env vmap it arrives UNBATCHED, and the dispatch gate required it
batched — a 2.5x throughput regression only a device trace caught. These
tests pin the routing itself: with the kernel declared available, the
custom_vmap ops must route to the fused kernel even when env-independent
operands (mu, hd, ll, static tables) trace unbatched, broadcasting them
rather than falling back.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from track_mjx_tpu.ops import cg_solver_kernel as ck
from track_mjx_tpu.physics import solver as sm

_N, _NL, _NC = 7, 2, 3
_E = _NL + 4 * _NC
_B = 4


def _operands():
    rng = np.random.RandomState(0)
    f32 = lambda *s: jnp.asarray(rng.randn(*s), jnp.float32)
    g = rng.randn(_B, _N, _N)
    qm = jnp.asarray(g @ np.swapaxes(g, 1, 2) + _N * np.eye(_N), jnp.float32)
    return dict(
        qm=qm,
        j=f32(_B, _E, _N),
        aref=f32(_B, _E),
        d=jnp.abs(f32(_B, _E)),
        qfrc=f32(_B, _N),
        warm=f32(_B, _N),
        buf=f32(_B, _N, 6),
        cdof=f32(_B, _N, 6),
        anc=jnp.ones((_N, _N), jnp.float32),
        arm=jnp.ones((_N,), jnp.float32),
        fq=f32(_B, _NC, 3, 6),
        sw=f32(_B, _N, 6),
        ll=f32(_B, _NL),
        mu=jnp.abs(f32(_B, _NC, 2)),
        dm=jnp.ones((_NC, _N), jnp.float32),
        lim1h=jnp.ones((_NL, _N), jnp.float32),
    )


def test_scalar_jb_op_routes_to_kernel_with_unbatched_mu(monkeypatch):
    """mu (and hd / the static tables) unbatched under vmap must still hit
    the kernel — broadcast, not fallback (the round-5 regression)."""
    calls = {}

    def fake_kernel(qm, j, aref, d, qfrc_smooth, warm, tol, hd=None,
                    crb=None, jb=None, jb_dims=None, **kw):
        calls["hit"] = True
        calls["jb_shapes"] = None if jb is None else [x.shape for x in jb]
        nout = 5 if hd is not None else 4
        z = jnp.zeros((qfrc_smooth.shape[0], qm.shape[-1]))
        f = jnp.zeros((qfrc_smooth.shape[0], aref.shape[-1]))
        return (z, z, f, z, z)[:nout]

    monkeypatch.setattr(ck, "kernel_available", lambda *a, **k: True)
    monkeypatch.setattr(ck, "_cg_solve_tpu", fake_kernel)
    sm._make_scalar_cg_op.cache_clear()

    op = sm._make_scalar_cg_op(2, 2, True, (_NL, _NC))
    o = _operands()
    tol = jnp.asarray(1e-8, jnp.float32)
    hd1 = jnp.ones((_N,), jnp.float32)  # UNBATCHED (model constant)
    mu1 = jnp.asarray(np.abs(np.random.RandomState(1).randn(_NC, 2)),
                      jnp.float32)  # UNBATCHED (model constant)

    out = jax.vmap(
        lambda qm, j, aref, d, qf, w, buf, cdof, fq, sw, ll: op(
            qm, j, aref, d, qf, w, tol, hd1, buf, cdof, o["anc"], o["arm"],
            fq, sw, ll, mu1, o["dm"], o["lim1h"]
        )
    )(o["qm"], o["j"], o["aref"], o["d"], o["qfrc"], o["warm"], o["buf"],
      o["cdof"], o["fq"], o["sw"], o["ll"])
    assert calls.get("hit"), (
        "unbatched mu/hd dropped the fused kernel (round-5 regression)"
    )
    # every jb operand must arrive batched (broadcast where needed)
    fq_s, sw_s, ll_s, mu_s, dm_s, lim1h_s = calls["jb_shapes"]
    assert mu_s == (_B, _NC, 2), mu_s
    assert ll_s == (_B, _NL), ll_s
    assert out[0].shape == (_B, _N)
    sm._make_scalar_cg_op.cache_clear()


def test_elliptic_jb_op_routes_to_kernel_with_unbatched_mu(monkeypatch):
    ncon_ell, ns = 3, 2
    e = ns + 3 * ncon_ell
    calls = {}

    def fake_kernel(qm, j, aref, d, mu, qfrc_smooth, warm, tol, hd=None,
                    crb=None, jb=None, jb_nl=None, **kw):
        calls["hit"] = True
        calls["mu_shape"] = mu.shape
        calls["jb_shapes"] = None if jb is None else [x.shape for x in jb]
        nout = 5 if hd is not None else 4
        z = jnp.zeros((qfrc_smooth.shape[0], qm.shape[-1]))
        f = jnp.zeros((qfrc_smooth.shape[0], aref.shape[-1]))
        return (z, z, f, z, z)[:nout]

    monkeypatch.setattr(ck, "ell_kernel_available", lambda *a, **k: True)
    monkeypatch.setattr(ck, "_ell_cg_solve_tpu", fake_kernel)
    sm._make_elliptic_cg_op.cache_clear()

    op = sm._make_elliptic_cg_op(2, 2, ncon_ell, True, ns)
    rng = np.random.RandomState(0)
    f32 = lambda *s: jnp.asarray(rng.randn(*s), jnp.float32)
    g = rng.randn(_B, _N, _N)
    qm = jnp.asarray(g @ np.swapaxes(g, 1, 2) + _N * np.eye(_N), jnp.float32)
    tol = jnp.asarray(1e-8, jnp.float32)
    mu1 = jnp.abs(f32(ncon_ell))  # UNBATCHED
    hd1 = jnp.ones((_N,), jnp.float32)  # UNBATCHED
    dm = jnp.ones((ncon_ell, _N), jnp.float32)
    lim1h = jnp.ones((ns, _N), jnp.float32)

    jax.vmap(
        lambda qm, j, aref, d, qf, w, buf, cdof, fq, sw, ll: op(
            qm, j, aref, d, mu1, qf, w, tol, hd1, buf, cdof,
            jnp.ones((_N, _N), jnp.float32), jnp.ones((_N,), jnp.float32),
            fq, sw, ll, dm, lim1h
        )
    )(qm, f32(_B, e, _N), f32(_B, e), jnp.abs(f32(_B, e)), f32(_B, _N),
      f32(_B, _N), f32(_B, _N, 6), f32(_B, _N, 6), f32(_B, ncon_ell, 3, 6),
      f32(_B, _N, 6), f32(_B, ns))
    assert calls.get("hit"), (
        "unbatched mu/hd dropped the fused elliptic kernel"
    )
    assert calls["mu_shape"] == (_B, ncon_ell)
    fq_s, sw_s, ll_s, dm_s, lim1h_s = calls["jb_shapes"]
    assert ll_s == (_B, ns)
    sm._make_elliptic_cg_op.cache_clear()
