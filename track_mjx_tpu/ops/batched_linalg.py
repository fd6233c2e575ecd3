"""Lane-batched small-matrix linear algebra (Pallas TPU kernels).

XLA's batched Cholesky/TriangularSolve on TPU lowers to per-column loops of
tiny ops — profiled at ~9 ms per call for 1024x(73x73) (0.1% of peak), and the
physics pipeline is dominated by them. These kernels flip the layout: the
BATCH rides the 128-wide lane axis ([n, n, B_tile] blocks resident in VMEM),
so each of the n sequential factorization steps is a full-width VPU op and the
whole factorization costs one HBM round trip.

Exposed as `cholesky(a)` / `cho_solve(l, b)` with jnp fallbacks, wrapped in
`jax.custom_batching.custom_vmap` so per-env physics code written for a single
[n, n] matrix dispatches to the lane-batched kernel under `jax.vmap` on TPU
and to jnp.linalg elsewhere (tests run the CPU fallback).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; import guarded so CPU-only envs still work
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

LANE_TILE = 128
# guard: VMEM footprint grows as n^2 * 128 * 4B; 128x128x128 = 8 MB is the cap
MAX_N = 128


def _use_tpu_kernel(n: int) -> bool:
    return (
        pltpu is not None
        and jax.default_backend() == "tpu"
        and n <= MAX_N
    )


# ---------------------------------------------------------------------------
# kernels (operate on [n, n, LANE_TILE] / [n, LANE_TILE] VMEM blocks)
# ---------------------------------------------------------------------------


def factor_in_place(l_ref, panel: int = 8):
    """In-place blocked right-looking Cholesky of an (n, n, lanes) VMEM ref.

    The original single-loop kernel rewrote the FULL (n, n, lanes) block on
    every one of the n steps (masked rank-1 update) — 3x the n^3/3 flops a
    Cholesky needs. Here a static Python loop over column panels gives each
    step a STATIC trailing-block bound [p0:, p0:], so step j only touches the
    submatrix the rank-1 update can actually change; per-entry arithmetic is
    bit-identical (the skipped region is exactly where the masked update
    subtracted 0.0). fori_loop within the panel keeps Mosaic compile time
    flat (a fully unrolled variant compiles for ~10 minutes). Column j is
    read as ROW j (the trailing submatrix stays symmetric and the
    sub-diagonal part of row j is masked out), so the per-step extraction is
    an O(n) dynamic slice instead of an O(n^2) reduction.

    Upper-triangle entries hold garbage afterwards; callers that expose L
    must mask with row >= col (the substitution helpers below never read
    the upper triangle)."""
    n = l_ref.shape[0]
    for p0 in range(0, n, panel):
        m = n - p0
        k_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        col_m = jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 1)

        def body(jj, _, p0=p0, k_m=k_m, col_m=col_m):
            row = l_ref[pl.ds(p0 + jj, 1), p0:, :][0]  # (m, lanes)
            diag = jnp.sum(jnp.where(k_m == jj, row, 0.0), axis=0)  # (lanes,)
            c = row * jax.lax.rsqrt(diag)[None, :]
            # rank-1 trailing update; zeroing entries <= jj of the column
            # makes the outer product self-masking (no (m, m, lanes) mask
            # temporary)
            colm = jnp.where(k_m > jj, c, 0.0)
            a = jnp.where(col_m == jj, c[:, None, :], l_ref[p0:, p0:, :])
            l_ref[p0:, p0:, :] = a - colm[:, None, :] * colm[None, :, :]
            return 0

        jax.lax.fori_loop(0, min(panel, m), body, 0)


def _cholesky_kernel(a_ref, l_ref):
    """Lower Cholesky, batch on lanes; works in-place in the output ref so
    the loop carries no (n, n, lanes) value (VMEM budget)."""
    n = a_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    l_ref[:] = a_ref[:]  # no-op copy when aliased; correctness otherwise
    factor_in_place(l_ref)
    l_ref[:] = jnp.where(row_ids >= col_ids, l_ref[:], 0.0)


def blocked_substitution(l_ref, lt_ref, y_ref, out_ref, b):
    """Solves L L^T x = b by BLOCKED (panel-8) right-looking forward/
    backward substitution; the result is returned AND left in out_ref.

    The per-row form this replaces serialized n steps each touching a full
    (n, lanes) row with three masked reductions — a kernel microbench
    (tools/kernel_microbench.py) attributed ~45% of the fused CG solve to
    it (-22% on the whole solve from this rewrite). Each 8-row panel does
    its triangular solve on (8, lanes) slabs (one vreg each) and then ONE
    (rest, 8, lanes) product updates the remaining right-hand side, so each
    L element is read exactly once (n^2/2 MACs, half the per-row scheme's
    traffic) and the serial chain is ~n/8 panels. All slices sit at
    8-aligned second-minor offsets (static Python loop). State round-trips
    through refs between panels (y_ref = solved fwd rows / bwd rhs, out_ref
    = fwd rhs / result) — value chains across panels trip Mosaic relayouts.
    Reads only the lower triangle of l_ref (upper garbage from
    factor_in_place is never touched: lt_ref must hold a CLEAN L^T,
    prepared by the caller)."""
    n = l_ref.shape[0]
    panel = 8

    # forward: L y = b; y accumulates in y_ref, rhs lives in out_ref
    out_ref[:] = b
    for p0 in range(0, n, panel):
        m = min(panel, n - p0)
        k_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        lpan = l_ref[p0 : p0 + m, p0 : p0 + m, :]  # (m, m, lanes)
        rp = out_ref[p0 : p0 + m, :]  # (m, lanes)
        yp = jnp.zeros_like(rp)
        for jj in range(m):
            row = lpan[jj]  # (m, lanes)
            s = jnp.sum(
                jnp.where(k_m < jj, row * yp, 0.0), axis=0, keepdims=True
            )
            d = jnp.sum(jnp.where(k_m == jj, row, 0.0), axis=0, keepdims=True)
            v = (rp[jj : jj + 1] - s) / d
            yp = jnp.where(k_m == jj, v, yp)
        y_ref[p0 : p0 + m, :] = yp
        if p0 + m < n:
            lrest = l_ref[p0 + m :, p0 : p0 + m, :]  # (rest, m, lanes)
            out_ref[p0 + m :, :] = out_ref[p0 + m :, :] - jnp.sum(
                lrest * yp[None, :, :], axis=1
            )

    # backward: L^T x = y; x accumulates in out_ref, rhs is y_ref
    for p0 in reversed(list(range(0, n, panel))):
        m = min(panel, n - p0)
        k_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        ltpan = lt_ref[p0 : p0 + m, p0 : p0 + m, :]  # (m, m, lanes)
        rp = y_ref[p0 : p0 + m, :]
        xp = jnp.zeros_like(rp)
        for jj in range(m - 1, -1, -1):
            row = ltpan[jj]
            s = jnp.sum(
                jnp.where(k_m > jj, row * xp, 0.0), axis=0, keepdims=True
            )
            d = jnp.sum(jnp.where(k_m == jj, row, 0.0), axis=0, keepdims=True)
            v = (rp[jj : jj + 1] - s) / d
            xp = jnp.where(k_m == jj, v, xp)
        out_ref[p0 : p0 + m, :] = xp
        if p0 > 0:
            ltrest = lt_ref[:p0, p0 : p0 + m, :]  # (p0, m, lanes)
            y_ref[:p0, :] = y_ref[:p0, :] - jnp.sum(
                ltrest * xp[None, :, :], axis=1
            )
    return out_ref[:]


def invert_diag_blocks(l_ref, dinv_ref, panel: int = 8):
    """dinv[p0:p0+m, :m] = inv(L[p0:p0+m, p0:p0+m]) for every 8-row panel of
    an (n, n, lanes) lower factor, via forward substitution on the identity
    (serial within the panel, but done ONCE per factor).

    Motivation (round 5): the fused CG solve performs ~7 (L L^T)^-1 applies
    per invocation (smooth, grad0, one per CG iteration, Euler), and
    blocked_substitution serializes each apply over n per-row solves — the
    dominant latency of the kernel's fixed part (microbench: 2.9 ms fixed vs
    0.2 ms/iteration at 4096 envs). With the panel-diagonal inverses
    precomputed, every panel solve in blocked_substitution_pinv is ONE
    (m, m, lanes) broadcast-reduce, shrinking an apply's serial chain from
    n row-solves to n/8 panel steps. Numerics: y_p = inv(L_pp) @ r_p
    reassociates the per-row divisions into an inner product — same
    f32-roundoff class as the substitution it replaces (pinned by the
    kernel parity suite)."""
    n = l_ref.shape[0]
    for p0 in range(0, n, panel):
        m = min(panel, n - p0)
        k_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        row_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)
        eye = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (m, m, 1), 1),
            1.0,
            0.0,
        )
        lpan = l_ref[p0 : p0 + m, p0 : p0 + m, :]  # (m, m, lanes)
        xp = jnp.zeros_like(lpan)
        for jj in range(m):
            lrow = lpan[jj]  # (m, lanes): L[jj, k]
            s = jnp.sum(
                jnp.where(k_m[:, :, None] < jj, lrow[:, None, :] * xp, 0.0),
                axis=0,
            )  # (m, lanes): sum_k L[jj,k] X[k, :]
            d = jnp.sum(
                jnp.where(k_m == jj, lrow, 0.0), axis=0, keepdims=True
            )  # (1, lanes)
            v = (eye[jj] - s) / d  # (m, lanes): row jj of inv
            xp = jnp.where(row_m == jj, v[None, :, :], xp)
        dinv_ref[p0 : p0 + m, :m, :] = xp


def blocked_substitution_pinv(l_ref, lt_ref, dinv_ref, y_ref, out_ref, b):
    """blocked_substitution with the panel-diagonal inverses precomputed
    (invert_diag_blocks): each panel's triangular solve is one
    (m, m, lanes) x (m, lanes) broadcast-reduce instead of m serial row
    solves, so one (L L^T)^-1 apply serializes over ~2n/8 panel steps
    instead of ~2n row steps. The backward sweep applies inv(L^T_pp) =
    inv(L_pp)^T by reducing over the OTHER index of the stored block — no
    transpose materialization."""
    n = l_ref.shape[0]
    panel = 8

    # forward: L y = b
    out_ref[:] = b
    for p0 in range(0, n, panel):
        m = min(panel, n - p0)
        dpan = dinv_ref[p0 : p0 + m, :m, :]  # inv(L_pp): (m, m, lanes)
        rp = out_ref[p0 : p0 + m, :]  # (m, lanes)
        yp = jnp.sum(dpan * rp[None, :, :], axis=1)  # inv(L_pp) @ r_p
        y_ref[p0 : p0 + m, :] = yp
        if p0 + m < n:
            lrest = l_ref[p0 + m :, p0 : p0 + m, :]  # (rest, m, lanes)
            out_ref[p0 + m :, :] = out_ref[p0 + m :, :] - jnp.sum(
                lrest * yp[None, :, :], axis=1
            )

    # backward: L^T x = y
    for p0 in reversed(list(range(0, n, panel))):
        m = min(panel, n - p0)
        dpan = dinv_ref[p0 : p0 + m, :m, :]
        rp = y_ref[p0 : p0 + m, :]
        xp = jnp.sum(dpan * rp[:, None, :], axis=0)  # inv(L_pp)^T @ r_p
        out_ref[p0 : p0 + m, :] = xp
        if p0 > 0:
            ltrest = lt_ref[:p0, p0 : p0 + m, :]  # (p0, m, lanes)
            y_ref[:p0, :] = y_ref[:p0, :] - jnp.sum(
                ltrest * xp[None, :, :], axis=1
            )
    return out_ref[:]


def _cho_solve_kernel(l_ref, b_ref, x_ref, lt_ref, y_ref):
    """Solves L L^T x = b for one lane-tile; b/x are (n, lanes).

    The lt fill masks the upper-triangle garbage factor_in_place leaves
    (the blocked substitution reads full aligned panels of L^T, unlike the
    old per-row form which masked at read time)."""
    n = l_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    lt_ref[:] = jnp.swapaxes(
        jnp.where(row_ids >= col_ids, l_ref[:], 0.0), 0, 1
    )
    x_ref[:] = blocked_substitution(l_ref, lt_ref, y_ref, x_ref, b_ref[:])


def _solve_spd_kernel(a_ref, b_ref, x_ref, l_ref, lt_ref, y_ref):
    """Solves A x = b (A SPD) in one kernel: factor A into VMEM scratch,
    then substitute — the factor never round-trips through HBM."""
    n = a_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    l_ref[:] = a_ref[:]
    factor_in_place(l_ref)
    l_ref[:] = jnp.where(row_ids >= col_ids, l_ref[:], 0.0)
    lt_ref[:] = jnp.swapaxes(l_ref[:], 0, 1)
    x_ref[:] = blocked_substitution(l_ref, lt_ref, y_ref, x_ref, b_ref[:])


def _pad_batch(x, tile):
    b = x.shape[-1]
    rem = (-b) % tile
    if rem:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, rem)]
        x = jnp.pad(x, pad)
    return x, b


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cholesky_tpu(a_bnn: jax.Array, *, interpret: bool = False) -> jax.Array:
    """[B, n, n] -> [B, n, n] lower Cholesky via the lane-batched kernel."""
    b, n, _ = a_bnn.shape
    a = jnp.moveaxis(a_bnn, 0, -1)  # (n, n, B)
    a, b_orig = _pad_batch(a, LANE_TILE)
    bp = a.shape[-1]
    out = pl.pallas_call(
        _cholesky_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n, bp), a.dtype),
        grid=(bp // LANE_TILE,),
        in_specs=[
            pl.BlockSpec(
                (n, n, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (n, n, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        # NOTE: no input_output_aliases — the kernel copies a_ref -> l_ref
        # itself, and custom-call aliasing interacted badly with the
        # trainer's donated buffers (TPU device faults mid-epoch)
        interpret=interpret,
    )(a)
    return jnp.moveaxis(out[..., :b_orig], -1, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cho_solve_tpu(
    l_bnn: jax.Array, b_bn: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Solves (L L^T) x = b for [B, n, n], [B, n] -> [B, n]."""
    b, n, _ = l_bnn.shape
    l = jnp.moveaxis(l_bnn, 0, -1)  # (n, n, B)
    rhs = jnp.moveaxis(b_bn, 0, -1)  # (n, B)
    l, b_orig = _pad_batch(l, LANE_TILE)
    rhs, _ = _pad_batch(rhs, LANE_TILE)
    bp = l.shape[-1]
    out = pl.pallas_call(
        _cho_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((n, bp), rhs.dtype),
        grid=(bp // LANE_TILE,),
        in_specs=[
            pl.BlockSpec(
                (n, n, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (n, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANE_TILE), rhs.dtype),  # L^T
            pltpu.VMEM((n, LANE_TILE), rhs.dtype),  # fwd solution
        ],
        interpret=interpret,
    )(l, rhs)
    return jnp.moveaxis(out[:, :b_orig], -1, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _solve_spd_tpu(
    a_bnn: jax.Array, b_bn: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Solves A x = b for [B, n, n] SPD A, [B, n] b -> [B, n]."""
    b, n, _ = a_bnn.shape
    a = jnp.moveaxis(a_bnn, 0, -1)  # (n, n, B)
    rhs = jnp.moveaxis(b_bn, 0, -1)  # (n, B)
    a, b_orig = _pad_batch(a, LANE_TILE)
    rhs, _ = _pad_batch(rhs, LANE_TILE)
    bp = a.shape[-1]
    out = pl.pallas_call(
        _solve_spd_kernel,
        out_shape=jax.ShapeDtypeStruct((n, bp), rhs.dtype),
        grid=(bp // LANE_TILE,),
        in_specs=[
            pl.BlockSpec(
                (n, n, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (n, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANE_TILE), rhs.dtype),  # L
            pltpu.VMEM((n, n, LANE_TILE), rhs.dtype),  # L^T
            pltpu.VMEM((n, LANE_TILE), rhs.dtype),  # fwd solution
        ],
        interpret=interpret,
    )(a, rhs)
    return jnp.moveaxis(out[:, :b_orig], -1, 0)


# ---------------------------------------------------------------------------
# public API with custom vmap dispatch
# ---------------------------------------------------------------------------


@jax.custom_batching.custom_vmap
def cholesky(a: jax.Array) -> jax.Array:
    """Lower Cholesky of an SPD [n, n] matrix (lane-batched under vmap)."""
    return jnp.linalg.cholesky(a)


@cholesky.def_vmap
def _cholesky_vmap(axis_size, in_batched, a):
    (a_batched,) = in_batched
    if not a_batched:
        return jnp.linalg.cholesky(a), False
    n = a.shape[-1]
    if _use_tpu_kernel(n):
        return _cholesky_tpu(a), True
    return jnp.linalg.cholesky(a), True


@jax.custom_batching.custom_vmap
def solve_spd(a: jax.Array, b: jax.Array) -> jax.Array:
    """Solves A x = b for SPD [n, n] A and [n] b (factor + substitution in
    ONE lane-batched kernel under vmap on TPU — the factor stays in VMEM).
    Numerics match cholesky() followed by cho_solve() on every backend."""
    l = jnp.linalg.cholesky(a)
    y = jax.scipy.linalg.solve_triangular(l, b, lower=True)
    return jax.scipy.linalg.solve_triangular(l.T, y, lower=False)


@solve_spd.def_vmap
def _solve_spd_vmap(axis_size, in_batched, a, b):
    a_batched, b_batched = in_batched
    if not a_batched:
        a = jnp.broadcast_to(a, (axis_size,) + a.shape)
    if not b_batched:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    n = a.shape[-1]
    if _use_tpu_kernel(n) and b.ndim == 2:
        return _solve_spd_tpu(a, b), True

    def base(a_, b_):
        l_ = jnp.linalg.cholesky(a_)
        y = jax.scipy.linalg.solve_triangular(l_, b_, lower=True)
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(l_, -1, -2), y, lower=False
        )

    return jax.vmap(base)(a, b), True


@jax.custom_batching.custom_vmap
def cho_solve(l: jax.Array, b: jax.Array) -> jax.Array:
    """Solves (L L^T) x = b given the lower factor L ([n, n], [n])."""
    y = jax.scipy.linalg.solve_triangular(l, b, lower=True)
    return jax.scipy.linalg.solve_triangular(l.T, y, lower=False)


@cho_solve.def_vmap
def _cho_solve_vmap(axis_size, in_batched, l, b):
    l_batched, b_batched = in_batched
    if not l_batched:
        l = jnp.broadcast_to(l, (axis_size,) + l.shape)
    if not b_batched:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    n = l.shape[-1]
    if _use_tpu_kernel(n) and b.ndim == 2:
        return _cho_solve_tpu(l, b), True

    def base(l_, b_):
        y = jax.scipy.linalg.solve_triangular(l_, b_, lower=True)
        return jax.scipy.linalg.solve_triangular(y_t(l_), y, lower=False)

    def y_t(l_):
        return jnp.swapaxes(l_, -1, -2)

    return jax.vmap(base)(l, b), True
