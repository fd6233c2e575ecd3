"""Whole smooth-acceleration + CG constraint solve as one Pallas TPU kernel.

Round-1 profiling showed the CG constraint solve dominating the batched
physics step (~3.8 ms of ~8 ms at 1024 envs): each of the ~8 Cholesky-solve /
cost-evaluation kernel dispatches per step pays an (n, n, B) layout transpose
and an HBM round trip for every intermediate. Round-2 profiling at the
reference workload scale then showed the remaining dispatch chain —
cholesky(qM) kernel -> L to HBM -> cho_solve(qacc_smooth) kernel -> L
transposed again into the whole-CG kernel — costing ~3s of a ~29s training
step in factor traffic and layout transposes alone. This kernel therefore
runs EVERYTHING from the mass matrix down in one Pallas invocation per
128-lane batch tile: Cholesky-factors qM in VMEM (blocked right-looking,
ops/batched_linalg.factor_in_place), solves qacc_smooth = M^-1 qfrc_smooth,
then the entire constraint solver — warmstart selection, `iterations`
preconditioned Polak-Ribiere CG steps each with a `ls_iterations` Newton
linesearch, and the final force extraction — with J, L, L^T and all iterates
resident in VMEM. The factor never exists in HBM.

Scope: unilateral scalar rows only (joint limits + pyramidal friction — the
rodent workload). Elliptic-cone models use the unfused path in
physics/solver.py. Dispatch is via jax.custom_batching.custom_vmap like
ops/batched_linalg.py: per-env solver code hits this kernel under vmap on
TPU and a pure-jnp fallback elsewhere.

VMEM at (n=73, nefc=187, 128 lanes): J 7 MB + qM 2.7 MB per block,
double-buffered by the pipeline (grid over 128-lane batch tiles), L and L^T
scratch (2.7 MB each, built in-kernel), plus ~2 (e, n, T) matvec temporaries
(7 MB each) on Mosaic's stack — ~43 MB total, over the 16 MB *default*
scoped limit but comfortably inside the v5e's 128 MB VMEM, so the limit is
raised via CompilerParams(vmem_limit_bytes).

Algorithm parity: mirrors physics/solver.py's scalar path op-for-op (same
fused where-sums in the linesearch derivatives, same freeze/beta logic).
M @ v is computed as L (L^T v) from the factor instead of carrying a second
copy of qM live; this is the only intentional numeric difference on the TPU
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from track_mjx_tpu.ops.batched_linalg import factor_in_place

try:  # TPU-only module; import guarded so CPU-only envs still work
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

LANE_TILE = 128
_EPS = 1e-12
# v5e VMEM is 128 MiB/core; the Mosaic *default* scoped limit is 16 MiB, which
# the (e, n, T) matvec temporaries alone exceed — raised via CompilerParams.
# The budget below gates dispatch: resident blocks (J/L/LT + vectors) plus two
# 3-D matvec temporaries must fit with headroom for Mosaic's stack.
_VMEM_LIMIT_BYTES = 100 * 2**20
_VMEM_BUDGET_BYTES = 64 * 2**20


def kernel_available(n: int, nefc: int) -> bool:
    if pltpu is None or jax.default_backend() != "tpu":
        return False
    blocks = 2 * (nefc * n + n * n) * LANE_TILE * 4  # double-buffered
    scratch = 2 * n * n * LANE_TILE * 4  # in-kernel L and L^T
    temps = 2 * nefc * n * LANE_TILE * 4  # 3-D matvec products
    small = (4 * nefc + 8 * n) * LANE_TILE * 4
    return nefc > 0 and blocks + scratch + temps + small <= _VMEM_BUDGET_BYTES


def _cg_kernel(
    iterations: int,
    ls_iterations: int,
    qm_ref,
    j_ref,
    aref_ref,
    d_ref,
    qfrc_smooth_ref,
    warm_ref,
    tolscale_ref,
    x_ref,
    force_ref,
    qfrc_ref,
    smooth_out_ref,
    jar_ref,
    grad_ref,
    mgrad_ref,
    p_ref,
    imp_ref,
    sol_ref,
    l_ref,
    lt_ref,
):
    n = qm_ref.shape[0]
    # factor qM in VMEM (blocked right-looking; upper garbage masked out so
    # the dense matv_m reads below see a clean lower factor), then L^T in a
    # second scratch (ref dynamic slicing needs the row-major form for the
    # backward substitution)
    row_n = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    col_n = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    l_ref[:] = qm_ref[:]
    factor_in_place(l_ref)
    l_ref[:] = jnp.where(row_n >= col_n, l_ref[:], 0.0)
    lt_ref[:] = jnp.swapaxes(l_ref[:], 0, 1)
    k_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    aref = aref_ref[:]
    d_rows = d_ref[:]

    def matv_j(x):  # J @ x -> (e, T)
        return jnp.sum(j_ref[:] * x[None, :, :], axis=1)

    def matv_jt(f):  # J^T f -> (n, T)
        return jnp.sum(j_ref[:] * f[:, None, :], axis=0)

    def matv_m(v):  # M v = L (L^T v)
        w = jnp.sum(l_ref[:] * v[:, None, :], axis=0)
        return jnp.sum(l_ref[:] * w[None, :, :], axis=1)

    def chosolve(b):
        """(L L^T)^-1 b via forward/backward substitution; the result is
        returned AND left in mgrad_ref. Substitution state lives in refs
        (sol_ref / mgrad_ref), not fori_loop carries: a vector loop-carry
        nested inside the outer iteration loop hits a Mosaic relayout
        failure for broadcast-produced (n, T) values (top-level carries,
        as in ops/batched_linalg.py, are fine — nested ones are not)."""

        def fwd(i, tok):
            y = sol_ref[:]
            r = l_ref[pl.ds(i, 1), :, :][0]  # (n, T) row i of L
            lii = jnp.sum(jnp.where(k_n == i, r, 0.0), axis=0)
            bi = jnp.sum(jnp.where(k_n == i, b, 0.0), axis=0)
            s = jnp.sum(jnp.where(k_n < i, r * y, 0.0), axis=0)
            v = (bi - s) / lii
            sol_ref[:] = jnp.where(k_n == i, v[None, :], y)
            return tok

        sol_ref[:] = jnp.zeros_like(b)
        jax.lax.fori_loop(0, n, fwd, 0)

        def bwd(t, tok):
            i = n - 1 - t
            x = mgrad_ref[:]
            c = lt_ref[pl.ds(i, 1), :, :][0]  # row i of L^T = column i of L
            lii = jnp.sum(jnp.where(k_n == i, c, 0.0), axis=0)
            yi = jnp.sum(jnp.where(k_n == i, sol_ref[:], 0.0), axis=0)
            s = jnp.sum(jnp.where(k_n > i, c * x, 0.0), axis=0)
            v = (yi - s) / lii
            mgrad_ref[:] = jnp.where(k_n == i, v[None, :], x)
            return tok

        mgrad_ref[:] = jnp.zeros_like(b)
        jax.lax.fori_loop(0, n, bwd, 0)
        return mgrad_ref[:]

    # qacc_smooth = M^-1 qfrc_smooth, solved in-kernel from the fresh factor
    # and exported (forward dynamics consumes it outside the solver too).
    # Read back through the output ref: the ref round-trip forces a
    # canonical layout before the value is captured by the loop closures
    # below (see the rank-2 note).
    smooth_out_ref[:] = chosolve(qfrc_smooth_ref[:])
    smooth = smooth_out_ref[:]

    # Per-lane scalars (cost, alpha, beta, ...) are kept RANK-2 (1, T)
    # throughout — reductions use keepdims=True and broadcasts are plain
    # (1, T) op (rows, T). Rank-1 (T,) intermediates get Mosaic's implicit
    # second-minor replicated layout, and chains of broadcast->reduce->
    # broadcast over them die in relayout ("non-singleton logical dimension
    # is replicated in destination but not in source") once the second CG
    # iteration consumes values produced by the first.
    def psum(x):  # reduce rows -> (1, T)
        return jnp.sum(x, axis=0, keepdims=True)

    def cost(x):  # (1, T)
        dx = x - smooth
        jar = matv_j(x) - aref
        quad = 0.5 * psum(dx * matv_m(dx))
        return quad + 0.5 * psum(
            jnp.where(jar < 0, d_rows * jar * jar, 0.0)
        )

    def force_of(jar):
        return jnp.where(jar < 0, -d_rows * jar, 0.0)

    def grad_of(x, jar):
        return matv_m(x - smooth) - matv_jt(force_of(jar))

    # warmstart vs smooth start: take the cheaper per lane
    warm, sm = warm_ref[:], smooth
    take_warm = cost(warm) < cost(sm)  # (1, T)
    x0 = jnp.where(take_warm, warm, sm)
    jar0 = matv_j(x0) - aref
    grad0 = grad_of(x0, jar0)
    mgrad0 = chosolve(grad0)

    # The convergence threshold tol * sum(diag M) is computed by XLA in the
    # host wrapper and passed in as a (1, T) block: computing the scale
    # in-kernel works at top level, but the l_ref*l_ref axis-1 reduce inside
    # the iteration loop body trips a Mosaic relayout failure, as does
    # capturing the reduced value across the fori_loop region boundary.

    def linesearch(x, p):
        mp = matv_m(p)
        pmp = psum(p * mp)
        dmx = psum(mp * (x - smooth))  # p^T M (x - smooth), M symmetric
        jp = matv_j(p)
        jarx = matv_j(x) - aref

        def phi_derivs(alpha):
            jar = jarx + alpha * jp
            active = jar < 0
            d1 = alpha * pmp + dmx + psum(
                jnp.where(active, d_rows * jar * jp, 0.0)
            )
            d2 = pmp + psum(jnp.where(active, d_rows * jp * jp, 0.0))
            return d1, jnp.maximum(d2, _EPS)

        # statically unrolled Newton (static ls_iterations; also keeps the
        # (1, T) alpha out of a fori_loop carry)
        d1, d2 = phi_derivs(jnp.zeros_like(pmp))
        alpha = -d1 / d2
        for _ in range(ls_iterations):
            d1, d2 = phi_derivs(alpha)
            alpha = alpha - d1 / d2
        return alpha

    # Main CG loop: state lives in SCRATCH REFS with a fori_loop over
    # iterations (batched_linalg's cholesky pattern). A Python-unrolled
    # dataflow version dies in Mosaic relayout the moment iteration 2
    # consumes iteration-1 values; the ref round-trip per iteration forces
    # canonical layouts (and keeps compile time flat). The convergence
    # freeze is expressed by MASKING THE STEP SIZE (alpha *= improved, a
    # float {0,1} (1, T) mask) instead of where-selecting every state
    # tensor as the unfused path does: a frozen lane takes zero-length
    # steps, so x/jar (the outputs) match the where-select form while i1
    # vectors never enter the dataflow (trunci i8->i1 is unsupported).
    x_ref[:] = x0
    jar_ref[:] = jar0
    grad_ref[:] = grad0
    mgrad_ref[:] = mgrad0
    p_ref[:] = -mgrad0
    imp_ref[:] = jnp.ones_like(imp_ref)

    def iteration(_, tok):
        x, p = x_ref[:], p_ref[:]
        grad, mgrad = grad_ref[:], mgrad_ref[:]
        alpha = linesearch(x, p) * imp_ref[:]
        x = x + alpha * p
        jar = matv_j(x) - aref
        gradn = grad_of(x, jar)
        mgradn = chosolve(gradn)
        num = psum(gradn * (mgradn - mgrad))
        den = jnp.maximum(psum(grad * mgrad), _EPS)
        beta = jnp.maximum(0.0, num / den)
        x_ref[:] = x
        jar_ref[:] = jar
        grad_ref[:] = gradn
        mgrad_ref[:] = mgradn
        p_ref[:] = -mgradn + beta * p
        imp_ref[:] = imp_ref[:] * jnp.where(
            jnp.sqrt(psum(gradn * gradn)) > tolscale_ref[:], 1.0, 0.0
        ).astype(gradn.dtype)
        return tok

    jax.lax.fori_loop(0, iterations, iteration, 0)

    force = force_of(jar_ref[:])
    force_ref[:] = force
    qfrc_ref[:] = matv_jt(force)


def _pad_tiles(x, tile):
    b = x.shape[-1]
    rem = (-b) % tile
    if rem:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, rem)])
    return x


@functools.partial(
    jax.jit, static_argnames=("iterations", "ls_iterations", "interpret")
)
def _cg_solve_tpu(
    qm, j, aref, d, qfrc_smooth, warm, tol, *, iterations, ls_iterations,
    interpret=False,
):
    """Batch-first [B, ...] inputs -> (qacc_smooth, x, force, qfrc).

    interpret=True runs the kernel through the Pallas interpreter (any
    backend): the CPU test suite uses it to pin kernel numerics against the
    unfused path (tests/test_cg_kernel_parity.py)."""
    bsz, n = qfrc_smooth.shape
    e = aref.shape[-1]
    dtype = qfrc_smooth.dtype
    # lane layout, padded to full tiles
    qm_nn = _pad_tiles(jnp.moveaxis(qm, 0, -1), LANE_TILE)
    j_en = _pad_tiles(jnp.moveaxis(j, 0, -1), LANE_TILE)
    aref_e = _pad_tiles(jnp.moveaxis(aref, 0, -1), LANE_TILE)
    d_e = _pad_tiles(jnp.moveaxis(d, 0, -1), LANE_TILE)
    qfrc_n = _pad_tiles(jnp.moveaxis(qfrc_smooth, 0, -1), LANE_TILE)
    warm_n = _pad_tiles(jnp.moveaxis(warm, 0, -1), LANE_TILE)
    # convergence threshold tol * sum(diag M) = tol * trace(M)
    # (see the in-kernel note on why this is precomputed)
    scale = jnp.maximum(
        jnp.sum(jnp.diagonal(qm, axis1=1, axis2=2), axis=-1), _EPS
    )
    tolscale = tol.astype(dtype) * scale
    tolscale_1 = _pad_tiles(tolscale[None, :].astype(dtype), LANE_TILE)
    tiles = qm_nn.shape[-1] // LANE_TILE

    kernel = functools.partial(_cg_kernel, iterations, ls_iterations)

    def lanes(rows):  # per-tile lane block of a (rows, B) operand
        return pl.BlockSpec(
            (rows, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    def lanes3(a, b):
        return pl.BlockSpec(
            (a, b, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    xs, fs, qs, sm = pl.pallas_call(
        kernel,
        grid=(tiles,),
        out_shape=(
            jax.ShapeDtypeStruct((n, tiles * LANE_TILE), dtype),
            jax.ShapeDtypeStruct((e, tiles * LANE_TILE), dtype),
            jax.ShapeDtypeStruct((n, tiles * LANE_TILE), dtype),
            jax.ShapeDtypeStruct((n, tiles * LANE_TILE), dtype),
        ),
        in_specs=[
            lanes3(n, n),  # qM
            lanes3(e, n),  # J
            lanes(e),  # aref
            lanes(e),  # D
            lanes(n),  # qfrc_smooth
            lanes(n),  # warmstart
            lanes(1),  # tol * scale
        ],
        out_specs=(lanes(n), lanes(e), lanes(n), lanes(n)),
        scratch_shapes=[
            pltpu.VMEM((e, LANE_TILE), dtype),  # jar
            pltpu.VMEM((n, LANE_TILE), dtype),  # grad
            pltpu.VMEM((n, LANE_TILE), dtype),  # mgrad
            pltpu.VMEM((n, LANE_TILE), dtype),  # p
            pltpu.VMEM((1, LANE_TILE), dtype),  # improved mask
            pltpu.VMEM((n, LANE_TILE), dtype),  # substitution state
            pltpu.VMEM((n, n, LANE_TILE), dtype),  # L
            pltpu.VMEM((n, n, LANE_TILE), dtype),  # L^T
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(qm_nn, j_en, aref_e, d_e, qfrc_n, warm_n, tolscale_1)

    def unlane(t):  # (rows, tiles*T) -> (B, rows)
        return jnp.moveaxis(t, 0, -1)[:bsz]

    return unlane(sm), unlane(xs), unlane(fs), unlane(qs)
