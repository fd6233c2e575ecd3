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

Scope: two kernel variants share the design. `_cg_solve_tpu` handles
unilateral scalar rows only (joint limits + pyramidal friction — the rodent
workload). `_ell_cg_solve_tpu` additionally handles elliptic-cone contact
blocks (cone="elliptic", condim 3 — the fly workload,
fruitfly_force_fast.xml): the host wrapper permutes constraint rows into
four 8-row-aligned sections [scalar | cone normals | tangent1 | tangent2]
so every per-block cone computation (zones, projection, curvature) is a
contiguous (ncon_ell, lanes) elementwise tile, and the safeguarded-Newton
linesearch (bracketed, non-increase-checked — elliptic phi' is genuinely
nonlinear between zone boundaries) is statically unrolled with float-mask
arithmetic for the (1, lanes) bracket scalars. Dispatch for both is via
jax.custom_batching.custom_vmap like ops/batched_linalg.py: per-env solver
code hits the kernel under vmap on TPU and a pure-jnp fallback elsewhere.

VMEM at (n=73, nefc=187, 128 lanes): J 7 MB + qM 2.7 MB per block,
double-buffered by the pipeline (grid over 128-lane batch tiles), L and L^T
scratch (2.7 MB each, built in-kernel), plus ~2 (e, n, T) matvec temporaries
(7 MB each) on Mosaic's stack — ~43 MB total, over the 16 MB *default*
scoped limit but comfortably inside the v5e's 128 MB VMEM, so the limit is
raised via CompilerParams(vmem_limit_bytes).

Algorithm parity: mirrors physics/solver.py's scalar path op-for-op (same
fused where-sums in the linesearch derivatives, same freeze/beta logic).
One intentional numeric difference on the TPU path: the SCALAR variant's
iterations advance jar = J x - aref and M (x - smooth) by incremental axpy
updates (jar += alpha J p, mdx += alpha M p) off the linesearch's own
products instead of fresh contractions — the same update order MuJoCo's CG
uses for Jaref/Ma (upstream MuJoCo 3.3.2 — the version the reference pins
via mujoco-mjx, track_mjx pyproject.toml — src/engine/engine_solver.c,
mj_solCG; the vendored reference contains no C sources, so the claim is
checked against that upstream release), pinned against the unfused
path at f32-roundoff tolerances by tests/test_cg_kernel_parity.py. The
ELLIPTIC variant keeps fresh per-iteration contractions: its safeguarded
linesearch's bracket decisions are discretely sensitive to the drift (a
measured 2.7x optimality-gap regression on a deep-penetration env).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from track_mjx_tpu.ops.batched_linalg import factor_in_place, invert_diag_blocks

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


def _blocked_chosolve(l_ref, lt_ref, sol_ref, mgrad_ref, b):
    """(L L^T)^-1 b; result returned AND left in mgrad_ref. Shared blocked
    (panel-8) right-looking substitution — see
    batched_linalg.blocked_substitution for the design notes (measured -22%
    on the whole fused solve vs the per-row fori form). Used by the ELLIPTIC
    kernel: its safeguarded linesearch's bracket decisions are discretely
    sensitive to chosolve reassociation (the same reason it keeps fresh
    per-iteration contractions), so it must compute the exact f32 apply the
    unfused path computes."""
    from track_mjx_tpu.ops.batched_linalg import blocked_substitution

    return blocked_substitution(l_ref, lt_ref, sol_ref, mgrad_ref, b)


def _blocked_chosolve_pinv(l_ref, lt_ref, dinv_ref, sol_ref, mgrad_ref, b):
    """(L L^T)^-1 b via precomputed panel-diagonal inverses — see
    batched_linalg.blocked_substitution_pinv (round 5: shrinks an apply's
    serial chain from ~2n row solves to ~2n/8 panel steps; the SCALAR
    kernel does ~7 applies per invocation, so this attacks both the fixed
    part and the per-iteration cost). Scalar-kernel only: its Newton
    linesearch has no discrete bracket decisions, so the reassociated
    apply stays within f32 roundoff of the unfused path (pinned by
    tests/test_cg_kernel_parity.py). dinv_ref holds
    invert_diag_blocks(l_ref)."""
    from track_mjx_tpu.ops.batched_linalg import blocked_substitution_pinv

    return blocked_substitution_pinv(
        l_ref, lt_ref, dinv_ref, sol_ref, mgrad_ref, b
    )


def _scalar_vmem_bytes(n: int, nefc: int, jb_dims=None) -> int:
    """Estimated per-invocation VMEM footprint of the scalar kernel (used by
    the dispatch gate; split out so the budget math is unit-testable off-TPU)."""
    if jb_dims is not None:
        # in-kernel J build: the dense (nefc, n) J input is replaced by the
        # compact fq/sw/ll/mu operands, but J itself becomes VMEM scratch at
        # the padded sectioned row count e_p, which also sizes jar and the
        # matvec temporaries
        nl, nc = jb_dims
        nl_p = _ceil_to(nl, _SUBLANE) if nl else 0
        e_p = nl_p + 4 * _ceil_to(nc, _SUBLANE)
        blocks = 2 * ((3 + 1) * _ceil_to(nc, _SUBLANE) * _SUBLANE
                      + n * _SUBLANE + n * n) * LANE_TILE * 4
        scratch = (2 * n * n + e_p * n) * LANE_TILE * 4  # L, L^T, built J
        temps = 2 * e_p * n * LANE_TILE * 4  # 3-D matvec products
        small = (4 * e_p + 8 * n) * LANE_TILE * 4
    else:
        e_p = nefc
        blocks = 2 * (nefc * n + n * n) * LANE_TILE * 4  # double-buffered
        scratch = 2 * n * n * LANE_TILE * 4  # in-kernel L and L^T
        temps = 2 * nefc * n * LANE_TILE * 4  # 3-D matvec products
        small = (4 * nefc + 8 * n) * LANE_TILE * 4
    return blocks + scratch + temps + small


def kernel_available(n: int, nefc: int, jb_dims=None) -> bool:
    if pltpu is None or jax.default_backend() != "tpu":
        return False
    return (
        nefc > 0
        and _scalar_vmem_bytes(n, nefc, jb_dims) <= _VMEM_BUDGET_BYTES
    )


def _cg_kernel(
    iterations: int,
    ls_iterations: int,
    with_euler: bool,
    with_qm_build: bool,
    jb_dims,
    *refs,
):
    # Input layouts: the classic one takes dense qM; the qm-build one
    # (round 4) takes the CRB factors buf/cdof (nv, 8-padded 6, T) plus the
    # static ancestry mask and armature, and assembles qM IN VMEM — 5.6x
    # less HBM traffic than the dense matrix, and the XLA-side dense
    # assembly (dot_general + transpose, ~2.5s/28s of a training step) gets
    # dead-code-eliminated on the scan-carried substeps. With jb_dims =
    # (nl_p, c_p) the J block is likewise ASSEMBLED IN VMEM (limit one-hot
    # rows + pyramid rows from the frame/point-jacobian operands, sectioned
    # [limits | +t1 | -t1 | +t2 | -t2]) from compact per-contact operands —
    # the dense (nefc, nv) J never exists in HBM and make_constraint's row
    # materialization DCEs away.
    refs = list(refs)
    take = lambda: refs.pop(0)
    if with_qm_build:
        buf_ref, cdof_ref, anc_ref, arm_ref = take(), take(), take(), take()
    else:
        qm_ref = take()
    if jb_dims is not None:
        fq_ref, sw_ref, dm_ref = take(), take(), take()
        if jb_dims[0]:  # limit rows present
            lim1h_ref, ll_ref = take(), take()
        mu_ref = take()
    else:
        j_ref = take()
    aref_ref, d_ref = take(), take()
    qfrc_smooth_ref, warm_ref, tolscale_ref, hd_ref = (
        take(), take(), take(), take()
    )
    x_ref, force_ref, qfrc_ref, smooth_out_ref, eff_ref = (
        take(), take(), take(), take(), take()
    )
    jar_ref, grad_ref, mgrad_ref, p_ref, imp_ref, sol_ref = (
        take(), take(), take(), take(), take(), take()
    )
    l_ref, lt_ref, mdx_ref, dinv_ref = take(), take(), take(), take()
    if with_qm_build:
        qm_ref = take()
    if jb_dims is not None:
        j_ref = take()
    assert not refs
    n = qfrc_smooth_ref.shape[0]
    # factor qM in VMEM (blocked right-looking; upper garbage masked out so
    # the dense matv_m reads below see a clean lower factor), then L^T in a
    # second scratch (ref dynamic slicing needs the row-major form for the
    # backward substitution)
    row_n = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    col_n = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    if with_qm_build:
        # full[i,j,t] = sum_k buf[i,k,t] cdof[j,k,t]; the k loop accumulates
        # (n,1,T)x(1,n,T) broadcast products (8 slabs incl. zero pads)
        full = buf_ref[:, 0, :][:, None, :] * cdof_ref[:, 0, :][None, :, :]
        for k in range(1, buf_ref.shape[1]):
            full = full + (
                buf_ref[:, k, :][:, None, :] * cdof_ref[:, k, :][None, :, :]
            )
        lower = full * anc_ref[:][:, :, None]
        qm = (
            lower
            + jnp.swapaxes(lower, 0, 1)
            - jnp.where(row_n == col_n, lower, 0.0)
        )
        qm_ref[:] = qm + jnp.where(row_n == col_n, arm_ref[:][:, None, :], 0.0)
    if jb_dims is not None:
        # Assemble J in VMEM. Limit rows: static one-hot tables scaled by
        # the per-env side*active factor. Contact rows: the frame-projected
        # point jacobian jfr[k] = (sum_j fq[k,:,j] sw[:,j]) * diff_mask is
        # built per direction k (normal/t1/t2) as 6 broadcast slab products
        # (the qM-from-CRB pattern), then the four pyramid sections are the
        # linear combinations jfr0 +/- mu_i jfr_i+1. fq is active-masked on
        # the host, so inactive contacts produce all-zero rows, matching
        # the unfused where-select.
        nl_p, c_p = jb_dims
        if nl_p:
            j_ref[:nl_p] = (
                lim1h_ref[:][:, :, None] * ll_ref[:][:, None, :]
            )
        jfr = []
        for k in range(3):
            acc = (
                fq_ref[k * c_p : (k + 1) * c_p, 0, :][:, None, :]
                * sw_ref[:, 0, :][None, :, :]
            )
            for jj in range(1, 6):
                acc = acc + (
                    fq_ref[k * c_p : (k + 1) * c_p, jj, :][:, None, :]
                    * sw_ref[:, jj, :][None, :, :]
                )
            jfr.append(acc * dm_ref[:][:, :, None])
        for i in range(2):
            mu_i = mu_ref[i * c_p : (i + 1) * c_p][:, None, :]
            s0 = nl_p + 2 * i * c_p
            j_ref[s0 : s0 + c_p] = jfr[0] + mu_i * jfr[1 + i]
            j_ref[s0 + c_p : s0 + 2 * c_p] = jfr[0] - mu_i * jfr[1 + i]
    l_ref[:] = qm_ref[:]
    factor_in_place(l_ref)
    l_ref[:] = jnp.where(row_n >= col_n, l_ref[:], 0.0)
    lt_ref[:] = jnp.swapaxes(l_ref[:], 0, 1)
    invert_diag_blocks(l_ref, dinv_ref)
    k_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    aref = aref_ref[:]
    d_rows = d_ref[:]

    def matv_j(x):  # J @ x -> (e, T)
        return jnp.sum(j_ref[:] * x[None, :, :], axis=1)

    def matv_jt(f):  # J^T f -> (n, T)
        return jnp.sum(j_ref[:] * f[:, None, :], axis=0)

    def matv_m(v):
        # M v from the live qM block: qm_ref is resident in BOTH layouts
        # (input ref, or the CRB-built scratch the Euler refactor reads at
        # the end), so reading it directly is ONE (n, n, T) contraction —
        # the former L (L^T v) form paid two and was the path's one
        # intentional numeric difference vs solver.py. Matches the
        # elliptic variant now.
        return jnp.sum(qm_ref[:] * v[None, :, :], axis=1)

    def chosolve(b):
        """(L L^T)^-1 b; result returned AND left in mgrad_ref (blocked
        substitution over pre-inverted panel diagonals — see
        _blocked_chosolve_pinv)."""
        return _blocked_chosolve_pinv(
            l_ref, lt_ref, dinv_ref, sol_ref, mgrad_ref, b
        )

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

    def force_of(jar):
        return jnp.where(jar < 0, -d_rows * jar, 0.0)

    def cost_rows(jar):  # (1, T)
        return 0.5 * psum(jnp.where(jar < 0, d_rows * jar * jar, 0.0))

    # Warmstart vs smooth start: take the cheaper per lane. cost(smooth)'s
    # quadratic term is identically zero (dx = 0 -> psum(0 * M 0) = 0.0
    # exactly), so only its constraint rows are evaluated; and both
    # candidates' jar is kept so jar0 is a where-select — bit-identical to
    # matv_j(x0) since x0 IS one of the candidates — instead of a third
    # (e, n, T) contraction. The cost eval's M dxw is likewise reused for
    # mdx0 = M (x0 - smooth). Saves two matv_m + one matv_j of fixed cost.
    warm, sm = warm_ref[:], smooth
    jar_warm = matv_j(warm) - aref
    dxw = warm - sm
    mdxw = matv_m(dxw)
    cost_warm = 0.5 * psum(dxw * mdxw) + cost_rows(jar_warm)
    jar_sm = matv_j(sm) - aref
    take_warm = cost_warm < cost_rows(jar_sm)  # (1, T)
    x0 = jnp.where(take_warm, warm, sm)
    jar0 = jnp.where(take_warm, jar_warm, jar_sm)
    mdx0 = jnp.where(take_warm, mdxw, jnp.zeros_like(mdxw))
    grad0 = mdx0 - matv_jt(force_of(jar0))
    mgrad0 = chosolve(grad0)

    # The convergence threshold tol * sum(diag M) is computed by XLA in the
    # host wrapper and passed in as a (1, T) block: computing the scale
    # in-kernel works at top level, but the l_ref*l_ref axis-1 reduce inside
    # the iteration loop body trips a Mosaic relayout failure, as does
    # capturing the reduced value across the fori_loop region boundary.

    def linesearch(x, p, jarx, mp, jp):
        # jarx = J x - aref comes from jar_ref (the stored value was
        # produced on the same x); mp = M p and jp = J p are computed by
        # the caller, which also needs them for the incremental post-step
        # updates jar += alpha jp, M dx += alpha mp (MuJoCo's own CG
        # updates Jaref/Ma the same way, engine_solver.c mj_solCG).
        pmp = psum(p * mp)
        dmx = psum(mp * (x - smooth))  # p^T M (x - smooth), M symmetric

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
    mdx_ref[:] = mdx0

    # Per-iteration contractions are the minimal set {M p, J p, J^T f} plus
    # the chosolve: jar and M (x - smooth) advance by axpy updates off the
    # linesearch's own mp/jp products instead of fresh (e, n, T)
    # contractions (documented numeric difference #2 vs the unfused path —
    # MuJoCo's CG advances Jaref/Ma identically, so this tracks the oracle,
    # and a frozen lane's alpha == 0.0 leaves both exactly unchanged).
    def iteration(_, tok):
        x, p = x_ref[:], p_ref[:]
        grad, mgrad = grad_ref[:], mgrad_ref[:]
        mp = matv_m(p)
        jp = matv_j(p)
        alpha = linesearch(x, p, jar_ref[:], mp, jp) * imp_ref[:]
        x = x + alpha * p
        jar = jar_ref[:] + alpha * jp
        mdx = mdx_ref[:] + alpha * mp
        gradn = mdx - matv_jt(force_of(jar))
        mgradn = chosolve(gradn)
        num = psum(gradn * (mgradn - mgrad))
        den = jnp.maximum(psum(grad * mgrad), _EPS)
        beta = jnp.maximum(0.0, num / den)
        x_ref[:] = x
        jar_ref[:] = jar
        mdx_ref[:] = mdx
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
    qfrc = matv_jt(force)
    qfrc_ref[:] = qfrc

    if with_euler:
        # Euler implicit-damping solve in the same invocation: refactor
        # (M + h diag(damping)) reusing the L/L^T scratch (the CG loop is
        # done with the M factor) and solve for qacc_eff. This removes the
        # integrator's separate solve-SPD dispatch, its re-read of qM from
        # HBM, and the XLA materialization of the shifted matrix (round-4
        # trace: 2.2s/28s of a training step in the `integrate` stage).
        l_ref[:] = qm_ref[:] + jnp.where(
            row_n == col_n, hd_ref[:][:, None, :], 0.0
        )
        factor_in_place(l_ref)
        l_ref[:] = jnp.where(row_n >= col_n, l_ref[:], 0.0)
        lt_ref[:] = jnp.swapaxes(l_ref[:], 0, 1)
        invert_diag_blocks(l_ref, dinv_ref)
        eff_ref[:] = chosolve(qfrc_smooth_ref[:] + qfrc)
    else:
        eff_ref[:] = jnp.zeros_like(qfrc)


def _pad_tiles(x, tile):
    b = x.shape[-1]
    rem = (-b) % tile
    if rem:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, rem)])
    return x


@functools.lru_cache(maxsize=None)
def _jb_layout(nl: int, nc: int):
    """Static row maps for the in-kernel J build (scalar/pyramid models).

    efc order (constraint.py): [limits x nl | contact-major pyramid rows
    (+t1, -t1, +t2, -t2) x nc]. Kernel order: [limits pad nl_p | +t1 sec
    c_p | -t1 | +t2 | -t2], every section 8-row aligned. `gather` indexes
    efc rows per kernel row (padding rows point at 0 and are zeroed by the
    host mask), `scatter` maps efc rows to kernel slots (force return)."""
    import numpy as np

    nl_p = _ceil_to(nl, _SUBLANE) if nl else 0
    c_p = _ceil_to(nc, _SUBLANE)
    e_p = nl_p + 4 * c_p
    gather = np.zeros(e_p, dtype=np.int32)
    pad_mask = np.ones(e_p, dtype=bool)
    gather[:nl] = np.arange(nl, dtype=np.int32)
    pad_mask[:nl] = False
    ci = np.arange(nc, dtype=np.int32)
    for m in range(4):
        s = nl_p + m * c_p
        gather[s : s + nc] = nl + 4 * ci + m
        pad_mask[s : s + nc] = False
    scatter = np.zeros(nl + 4 * nc, dtype=np.int32)
    scatter[gather[~pad_mask]] = np.nonzero(~pad_mask)[0].astype(np.int32)
    return nl_p, c_p, e_p, gather, pad_mask, scatter


@functools.partial(
    jax.jit,
    static_argnames=("jb_dims", "iterations", "ls_iterations", "interpret"),
)
def _cg_solve_tpu(
    qm, j, aref, d, qfrc_smooth, warm, tol, hd=None, crb=None, jb=None, *,
    jb_dims=None, iterations, ls_iterations, interpret=False,
):
    """Batch-first [B, ...] inputs -> (qacc_smooth, x, force, qfrc[, qacc_eff]).

    With `hd` (B, n) = timestep * dof_damping, the kernel additionally
    returns qacc_eff = (M + diag(hd))^-1 (qfrc_smooth + qfrc) — the Euler
    integrator's implicit-damping solve, fused so qM never re-enters HBM.

    With `crb` = (buf (B, n, 6), cdof (B, n, 6), anc (n, n), armature (n,)),
    the kernel ASSEMBLES qM in VMEM from the CRB factors (qM = anc-masked
    buf @ cdof^T symmetrized + diag(armature)) and `qm` is ignored — the
    caller's dense assembly dead-codes away on the hot path.

    With `jb` = (fq (B, nc, 3, 6), sw (B, n, 6), ll (B, nl), mu (B, nc, 2),
    dm (nc, n), lim1h (nl, n)) and static `jb_dims` = (nl, nc), the kernel
    ASSEMBLES J in VMEM too (limit one-hot rows + condim-3 pyramid rows —
    see constraint.py EfcData.jb_*) and `j` is ignored; aref/d/force are
    host-permuted between efc order and the kernel's sectioned row order.

    interpret=True runs the kernel through the Pallas interpreter (any
    backend): the CPU test suite uses it to pin kernel numerics against the
    unfused path (tests/test_cg_kernel_parity.py)."""
    bsz, n = qfrc_smooth.shape
    e = aref.shape[-1]
    dtype = qfrc_smooth.dtype
    with_qm_build = crb is not None
    with_j_build = jb is not None
    if with_j_build:
        nl, nc = jb_dims
        nl_p, c_p, e_p, gather, pad_mask, scatter = _jb_layout(nl, nc)
        keep = jnp.asarray(~pad_mask, dtype)
        # aref/D move from efc row order to the kernel's sectioned order;
        # padding slots get keep == 0 so their D zeroes force/cost exactly
        aref = aref[:, jnp.asarray(gather)] * keep[None, :]
        d = d[:, jnp.asarray(gather)] * keep[None, :]
        e_k = e_p  # kernel row count (sectioned + 8-aligned)
        j_en = None
    else:
        e_k = e
        j_en = _pad_tiles(jnp.moveaxis(j, 0, -1), LANE_TILE)
    # lane layout, padded to full tiles
    aref_e = _pad_tiles(jnp.moveaxis(aref, 0, -1), LANE_TILE)
    d_e = _pad_tiles(jnp.moveaxis(d, 0, -1), LANE_TILE)
    qfrc_n = _pad_tiles(jnp.moveaxis(qfrc_smooth, 0, -1), LANE_TILE)
    warm_n = _pad_tiles(jnp.moveaxis(warm, 0, -1), LANE_TILE)
    if with_qm_build:
        buf, cdof, anc, arm = crb
        kpad = (-buf.shape[-1]) % _SUBLANE
        buf = jnp.pad(buf, ((0, 0), (0, 0), (0, kpad)))
        cdof = jnp.pad(cdof, ((0, 0), (0, 0), (0, kpad)))
        buf_nk = _pad_tiles(jnp.moveaxis(buf, 0, -1), LANE_TILE)
        cdof_nk = _pad_tiles(jnp.moveaxis(cdof, 0, -1), LANE_TILE)
        anc_nn = jnp.asarray(anc, dtype)
        arm_n = _pad_tiles(
            jnp.broadcast_to(arm.astype(dtype)[:, None], (n, bsz)), LANE_TILE
        )
        # trace(M) from the factors: diag M_i = buf_i . cdof_i + armature_i
        scale = jnp.maximum(
            jnp.sum(buf * cdof, axis=(-2, -1)) + jnp.sum(arm), _EPS
        )
        qm_nn = None
    else:
        qm_nn = _pad_tiles(jnp.moveaxis(qm, 0, -1), LANE_TILE)
        # convergence threshold tol * sum(diag M) = tol * trace(M)
        # (see the in-kernel note on why this is precomputed)
        scale = jnp.maximum(
            jnp.sum(jnp.diagonal(qm, axis1=1, axis2=2), axis=-1), _EPS
        )
    tolscale = tol.astype(dtype) * scale
    tolscale_1 = _pad_tiles(tolscale[None, :].astype(dtype), LANE_TILE)
    tiles = qfrc_n.shape[-1] // LANE_TILE

    if with_j_build:
        # Marshal the compact J-build operands into kernel layouts:
        #   fq (B, nc, 3, 6)  -> direction-major (3*c_p, 8, tiles*T)
        #   sw (B, n, 6)      -> (n, 8, tiles*T)
        #   ll (B, nl)        -> (nl_p, tiles*T)
        #   mu (B, nc, 2)     -> direction-major (2*c_p, tiles*T)
        #   dm (nc, n), lim1h (nl, n) -> static, row-padded
        fq, sw, ll, mu, dm, lim1h = jb
        fq_d = jnp.swapaxes(jnp.moveaxis(fq.astype(dtype), 0, -1), 0, 1)
        fq_d = jnp.pad(fq_d, ((0, 0), (0, c_p - nc), (0, _SUBLANE - 6), (0, 0)))
        fq_kb = _pad_tiles(fq_d.reshape(3 * c_p, _SUBLANE, bsz), LANE_TILE)
        sw_d = jnp.pad(sw.astype(dtype), ((0, 0), (0, 0), (0, _SUBLANE - 6)))
        sw_kb = _pad_tiles(jnp.moveaxis(sw_d, 0, -1), LANE_TILE)
        mu_d = jnp.swapaxes(jnp.moveaxis(mu.astype(dtype), 0, -1), 0, 1)
        mu_d = jnp.pad(mu_d, ((0, 0), (0, c_p - nc), (0, 0)))
        mu_kb = _pad_tiles(mu_d.reshape(2 * c_p, bsz), LANE_TILE)
        dm_cn = jnp.pad(jnp.asarray(dm, dtype), ((0, c_p - nc), (0, 0)))
        if nl_p:
            ll_kb = _pad_tiles(
                jnp.moveaxis(
                    jnp.pad(ll.astype(dtype), ((0, 0), (0, nl_p - nl))), 0, -1
                ),
                LANE_TILE,
            )
            lim1h_nn = jnp.pad(jnp.asarray(lim1h, dtype), ((0, nl_p - nl), (0, 0)))

    with_euler = hd is not None
    hd_n = _pad_tiles(
        jnp.moveaxis(
            hd if with_euler else jnp.zeros_like(qfrc_smooth), 0, -1
        ),
        LANE_TILE,
    )

    kernel = functools.partial(
        _cg_kernel,
        iterations,
        ls_iterations,
        with_euler,
        with_qm_build,
        (nl_p, c_p) if with_j_build else None,
    )

    def lanes(rows):  # per-tile lane block of a (rows, B) operand
        return pl.BlockSpec(
            (rows, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    def lanes3(a, b):
        return pl.BlockSpec(
            (a, b, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    def whole(a, b):  # grid-invariant static table
        return pl.BlockSpec((a, b), lambda i: (0, 0), memory_space=pltpu.VMEM)

    if with_qm_build:
        kk = buf_nk.shape[1]
        in_specs = [
            lanes3(n, kk),  # crb buf
            lanes3(n, kk),  # cdof
            whole(n, n),  # ancestry mask
            lanes(n),  # armature
        ]
        inputs = (buf_nk, cdof_nk, anc_nn, arm_n)
        extra_scratch = [pltpu.VMEM((n, n, LANE_TILE), dtype)]  # built qM
    else:
        in_specs = [lanes3(n, n)]  # dense qM
        inputs = (qm_nn,)
        extra_scratch = []
    if with_j_build:
        in_specs += [
            lanes3(3 * c_p, _SUBLANE),  # fq (frame | pos x frame)
            lanes3(n, _SUBLANE),  # sw (s | w)
            whole(c_p, n),  # diff mask
        ]
        inputs += (fq_kb, sw_kb, dm_cn)
        if nl_p:
            in_specs += [whole(nl_p, n), lanes(nl_p)]  # limit one-hots, side
            inputs += (lim1h_nn, ll_kb)
        in_specs += [lanes(2 * c_p)]  # mu
        inputs += (mu_kb,)
        extra_scratch.append(pltpu.VMEM((e_k, n, LANE_TILE), dtype))  # built J
    else:
        in_specs += [lanes3(e_k, n)]  # dense J
        inputs += (j_en,)
    in_specs += [
        lanes(e_k),  # aref
        lanes(e_k),  # D
        lanes(n),  # qfrc_smooth
        lanes(n),  # warmstart
        lanes(1),  # tol * scale
        lanes(n),  # h * dof_damping (euler shift)
    ]
    inputs += (aref_e, d_e, qfrc_n, warm_n, tolscale_1, hd_n)

    xs, fs, qs, sm, eff = pl.pallas_call(
        kernel,
        grid=(tiles,),
        out_shape=(
            jax.ShapeDtypeStruct((n, tiles * LANE_TILE), dtype),
            jax.ShapeDtypeStruct((e_k, tiles * LANE_TILE), dtype),
            jax.ShapeDtypeStruct((n, tiles * LANE_TILE), dtype),
            jax.ShapeDtypeStruct((n, tiles * LANE_TILE), dtype),
            jax.ShapeDtypeStruct((n, tiles * LANE_TILE), dtype),
        ),
        in_specs=in_specs,
        out_specs=(lanes(n), lanes(e_k), lanes(n), lanes(n), lanes(n)),
        scratch_shapes=[
            pltpu.VMEM((e_k, LANE_TILE), dtype),  # jar
            pltpu.VMEM((n, LANE_TILE), dtype),  # grad
            pltpu.VMEM((n, LANE_TILE), dtype),  # mgrad
            pltpu.VMEM((n, LANE_TILE), dtype),  # p
            pltpu.VMEM((1, LANE_TILE), dtype),  # improved mask
            pltpu.VMEM((n, LANE_TILE), dtype),  # substitution state
            pltpu.VMEM((n, n, LANE_TILE), dtype),  # L
            pltpu.VMEM((n, n, LANE_TILE), dtype),  # L^T
            pltpu.VMEM((n, LANE_TILE), dtype),  # M (x - smooth)
            pltpu.VMEM((n, _SUBLANE, LANE_TILE), dtype),  # panel-diag inverses
        ]
        + extra_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*inputs)

    def unlane(t):  # (rows, tiles*T) -> (B, rows)
        return jnp.moveaxis(t, 0, -1)[:bsz]

    force = unlane(fs)
    if with_j_build:
        force = force[:, jnp.asarray(scatter)]  # back to efc row order
    if with_euler:
        return unlane(sm), unlane(xs), force, unlane(qs), unlane(eff)
    return unlane(sm), unlane(xs), force, unlane(qs)


# ---------------------------------------------------------------------------
# Elliptic-cone variant (scalar rows + condim-3 cone blocks — the fly).
# ---------------------------------------------------------------------------

_SUBLANE = 8  # f32 sublane tile; row sections are padded to this so every
# static slice below is tile-aligned (unaligned second-minor slices force
# Mosaic relayouts)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _ell_vmem_bytes(n: int, ns: int, ncon_ell: int, with_jb: bool = False) -> int:
    """Estimated per-invocation VMEM footprint of the elliptic kernel
    (split out for off-TPU unit testing, like _scalar_vmem_bytes)."""
    e = _ceil_to(max(ns, 1), _SUBLANE) + 3 * _ceil_to(ncon_ell, _SUBLANE)
    if with_jb:
        c_p = _ceil_to(ncon_ell, _SUBLANE)
        blocks = 2 * (
            3 * c_p * _SUBLANE + n * _SUBLANE + n * n
        ) * LANE_TILE * 4
        scratch = (2 * n * n + e * n) * LANE_TILE * 4  # L, L^T, built J
    else:
        blocks = 2 * (e * n + n * n) * LANE_TILE * 4  # double-buffered
        scratch = 2 * n * n * LANE_TILE * 4  # in-kernel L and L^T
    temps = 2 * e * n * LANE_TILE * 4  # 3-D matvec products
    small = (8 * e + 8 * n) * LANE_TILE * 4  # cone temporaries are (c, T)
    return blocks + scratch + temps + small


def ell_kernel_available(
    n: int, ns: int, ncon_ell: int, with_jb: bool = False
) -> bool:
    if pltpu is None or jax.default_backend() != "tpu":
        return False
    return (
        ncon_ell > 0
        and _ell_vmem_bytes(n, ns, ncon_ell, with_jb) <= _VMEM_BUDGET_BYTES
    )


def _ell_cg_kernel(
    iterations: int,
    ls_iterations: int,
    ns: int,  # padded scalar-row count (multiple of 8)
    c: int,  # padded cone-block count (multiple of 8)
    with_euler: bool,
    with_qm_build: bool,
    jb_nl,  # None, or the REAL limit-row count for the in-kernel J build
    *refs,
):
    """Row layout (host-permuted, see _ell_cg_solve_tpu): rows [0:ns] are
    unilateral scalar rows, then three c-row sections holding every cone
    block's normal / tangent1 / tangent2 row. Padding rows carry D == 0 (and
    mu == 1), which zeroes their force, cost, and curvature contributions in
    every zone, so the padded solve equals the unpadded one exactly.

    Like the scalar kernel, with_qm_build swaps the dense qM input for the
    CRB factors and assembles qM in VMEM (the dense matrix stays live in a
    scratch — matv_m reads it directly in this variant). With jb_nl set the
    J block is ASSEMBLED IN VMEM too: limit one-hot rows in the scalar
    section, and each cone section k is the frame-projected row
    jfr[k] = (sum_j fq[k,:,j] sw[:,j]) * diff_mask directly — the cone rows
    ARE the projected jacobian, no pyramid combination."""
    refs = list(refs)
    take = lambda: refs.pop(0)
    if with_qm_build:
        buf_ref, cdof_ref, anc_ref, arm_ref = take(), take(), take(), take()
    else:
        qm_ref = take()
    if jb_nl is not None:
        fq_ref, sw_ref, dm_ref = take(), take(), take()
        if jb_nl:
            lim1h_ref, ll_ref = take(), take()
    else:
        j_ref = take()
    aref_ref, d_ref, mu_ref = take(), take(), take()
    qfrc_smooth_ref, warm_ref, tolscale_ref, hd_ref = (
        take(), take(), take(), take()
    )
    x_ref, force_ref, qfrc_ref, smooth_out_ref, eff_ref = (
        take(), take(), take(), take(), take()
    )
    jar_ref, grad_ref, mgrad_ref, p_ref, imp_ref, sol_ref = (
        take(), take(), take(), take(), take(), take()
    )
    l_ref, lt_ref = take(), take()
    if with_qm_build:
        qm_ref = take()
    if jb_nl is not None:
        j_ref = take()
    assert not refs
    n = qfrc_smooth_ref.shape[0]
    row_n = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    col_n = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    if with_qm_build:
        full = buf_ref[:, 0, :][:, None, :] * cdof_ref[:, 0, :][None, :, :]
        for k in range(1, buf_ref.shape[1]):
            full = full + (
                buf_ref[:, k, :][:, None, :] * cdof_ref[:, k, :][None, :, :]
            )
        lower = full * anc_ref[:][:, :, None]
        qm = (
            lower
            + jnp.swapaxes(lower, 0, 1)
            - jnp.where(row_n == col_n, lower, 0.0)
        )
        qm_ref[:] = qm + jnp.where(row_n == col_n, arm_ref[:][:, None, :], 0.0)
    if jb_nl is not None:
        # Assemble J in VMEM (see the scalar kernel's jb block): limit
        # one-hot rows scaled by the per-env side*active factor, then each
        # cone section is the 6-slab frame projection masked by diff_mask.
        if jb_nl:
            j_ref[:ns] = lim1h_ref[:][:, :, None] * ll_ref[:][:, None, :]
        else:
            # the padded scalar section still exists (ns_p >= 8): zero it so
            # matv_jt's garbage * 0.0-force products can't produce NaN
            j_ref[:ns] = jnp.zeros(
                (ns, n, j_ref.shape[-1]), j_ref.dtype
            )
        for k in range(3):
            acc = (
                fq_ref[k * c : (k + 1) * c, 0, :][:, None, :]
                * sw_ref[:, 0, :][None, :, :]
            )
            for jj in range(1, 6):
                acc = acc + (
                    fq_ref[k * c : (k + 1) * c, jj, :][:, None, :]
                    * sw_ref[:, jj, :][None, :, :]
                )
            j_ref[ns + k * c : ns + (k + 1) * c] = acc * dm_ref[:][:, :, None]
    l_ref[:] = qm_ref[:]
    factor_in_place(l_ref)
    l_ref[:] = jnp.where(row_n >= col_n, l_ref[:], 0.0)
    lt_ref[:] = jnp.swapaxes(l_ref[:], 0, 1)
    k_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    aref = aref_ref[:]
    d_rows = d_ref[:]
    d_s = d_rows[:ns]
    d_n, d_t1, d_t2 = d_rows[ns : ns + c], d_rows[ns + c : ns + 2 * c], d_rows[ns + 2 * c :]
    sq_n, sq_t1, sq_t2 = jnp.sqrt(d_n), jnp.sqrt(d_t1), jnp.sqrt(d_t2)
    mu = mu_ref[:]  # (c, T) effective cone coefficient mu_1 / sqrt(impratio)
    mu2p1 = 1.0 + mu * mu

    def matv_j(x):  # J @ x -> (e, T)
        return jnp.sum(j_ref[:] * x[None, :, :], axis=1)

    def matv_jt(f_s, f_n, f_t1, f_t2):  # J^T f -> (n, T), sectioned
        return (
            jnp.sum(j_ref[:ns] * f_s[:, None, :], axis=0)
            + jnp.sum(j_ref[ns : ns + c] * f_n[:, None, :], axis=0)
            + jnp.sum(j_ref[ns + c : ns + 2 * c] * f_t1[:, None, :], axis=0)
            + jnp.sum(j_ref[ns + 2 * c :] * f_t2[:, None, :], axis=0)
        )

    def matv_m(v):  # M v, from the live qM block
        # unlike the scalar kernel (which recomputes M v = L (L^T v) to keep
        # qM out of VMEM), the elliptic variant keeps qM live: the fly's
        # (n, n, T) block is <1 MB, and the direct product removes the one
        # intentional numeric difference — the safeguarded linesearch's
        # bracket branches (d1 < 0) are discretely sensitive to it
        return jnp.sum(qm_ref[:] * v[None, :, :], axis=1)

    def chosolve(b):
        """(L L^T)^-1 b; result returned AND left in mgrad_ref (blocked
        substitution — see _blocked_chosolve; the elliptic kernel keeps the
        parity-exact apply, see the pinv note there)."""
        return _blocked_chosolve(l_ref, lt_ref, sol_ref, mgrad_ref, b)

    smooth_out_ref[:] = chosolve(qfrc_smooth_ref[:])
    smooth = smooth_out_ref[:]

    def psum(x):  # reduce rows -> (1, T)
        return jnp.sum(x, axis=0, keepdims=True)

    def split(jar):
        return jar[:ns], jar[ns : ns + c], jar[ns + c : ns + 2 * c], jar[ns + 2 * c :]

    def zones(u_n, u_t1, u_t2):
        """Cone zone geometry for block slices (each (c, T)). Mirrors
        physics/solver.py _ell_zones in the sectioned layout."""
        p_n = -sq_n * u_n
        p_t1 = -sq_t1 * u_t1
        p_t2 = -sq_t2 * u_t2
        tt = p_t1 * p_t1 + p_t2 * p_t2
        t = jnp.sqrt(jnp.maximum(tt, _EPS * _EPS))
        bottom = mu * p_n >= t
        top = p_n <= -mu * t
        s_star = (p_n + mu * t) / mu2p1
        return p_n, p_t1, p_t2, t, bottom, top, s_star

    def force_blocks(u_n, u_t1, u_t2):
        """Cone projection force per section (solver.py _force_blocks)."""
        p_n, p_t1, p_t2, t, bottom, top, s_star = zones(u_n, u_t1, u_t2)
        coef = mu * s_star / t
        zero = jnp.zeros_like(u_n)
        f_n = jnp.where(bottom, -d_n * u_n, jnp.where(top, zero, sq_n * s_star))
        f_t1 = jnp.where(
            bottom, -d_t1 * u_t1, jnp.where(top, zero, sq_t1 * coef * p_t1)
        )
        f_t2 = jnp.where(
            bottom, -d_t2 * u_t2, jnp.where(top, zero, sq_t2 * coef * p_t2)
        )
        return f_n, f_t1, f_t2

    def cost_rows(jar):  # constraint cost s(jar) -> (1, T)
        jar_s, u_n, u_t1, u_t2 = split(jar)
        cs = 0.5 * psum(jnp.where(jar_s < 0, d_s * jar_s * jar_s, 0.0))
        p_n, p_t1, p_t2, t, bottom, top, s_star = zones(u_n, u_t1, u_t2)
        quad = 0.5 * (p_n * p_n + p_t1 * p_t1 + p_t2 * p_t2)
        mid = quad - 0.5 * (t - mu * p_n) ** 2 / mu2p1
        zero = jnp.zeros_like(quad)
        c_blk = jnp.where(bottom, quad, jnp.where(top, zero, mid))
        return cs + psum(c_blk)

    def grad_from(mdx, jar):
        jar_s, u_n, u_t1, u_t2 = split(jar)
        f_s = jnp.where(jar_s < 0, -d_s * jar_s, 0.0)
        f_n, f_t1, f_t2 = force_blocks(u_n, u_t1, u_t2)
        return mdx - matv_jt(f_s, f_n, f_t1, f_t2)

    # Warmstart vs smooth start (see the scalar kernel): cost(smooth)'s
    # quadratic term is identically zero, so only its constraint rows are
    # evaluated; jar0 and mdx0 = M (x0 - smooth) are where-selects of the
    # cost eval's own products — two fewer fixed contractions. Unlike the
    # scalar kernel the ITERATIONS keep fresh jar/M dx contractions: the
    # safeguarded linesearch's bracket decisions are discretely sensitive
    # to incremental-update drift (an A/B run converged 2.7x worse on a
    # deep-penetration env, caught by the objective-parity test).
    warm = warm_ref[:]
    jar_warm = matv_j(warm) - aref
    dxw = warm - smooth
    mdxw = matv_m(dxw)
    cost_warm = 0.5 * psum(dxw * mdxw) + cost_rows(jar_warm)
    jar_sm = matv_j(smooth) - aref
    take_warm = cost_warm < cost_rows(jar_sm)  # (1, T)
    x0 = jnp.where(take_warm, warm, smooth)
    jar0 = jnp.where(take_warm, jar_warm, jar_sm)
    mdx0 = jnp.where(take_warm, mdxw, jnp.zeros_like(mdxw))
    grad0 = grad_from(mdx0, jar0)
    mgrad0 = chosolve(grad0)

    big = jnp.asarray(jnp.finfo(aref.dtype).max, aref.dtype)

    def linesearch(x, p, jarx):
        """Safeguarded Newton on phi(alpha) (solver.py _linesearch, elliptic
        branch): bracket [lo, hi] with phi'(lo) < 0 <= phi'(hi); Newton
        candidates outside fall back to bisection (or geometric expansion
        while no upper end is known); never accept a non-decreasing step.
        Bracket state is (1, T) float-mask arithmetic, statically unrolled.
        jarx = J x - aref is passed in from jar_ref (bit-identical to
        recomputing it) — one less (e, n, T) contraction per iteration."""
        mp = matv_m(p)
        pmp = psum(p * mp)
        dmx = psum(mp * (x - smooth))
        jp = matv_j(p)
        jp_s, jp_n, jp_t1, jp_t2 = split(jp)
        q_n = -sq_n * jp_n
        q_t1 = -sq_t1 * jp_t1
        q_t2 = -sq_t2 * jp_t2
        qq = q_n * q_n + q_t1 * q_t1 + q_t2 * q_t2
        qq_t = q_t1 * q_t1 + q_t2 * q_t2

        def phi_derivs(alpha):
            jar = jarx + alpha * jp
            jar_s, u_n, u_t1, u_t2 = split(jar)
            active = jar_s < 0
            d1 = alpha * pmp + dmx + psum(
                jnp.where(active, d_s * jar_s * jp_s, 0.0)
            )
            d2 = pmp + psum(jnp.where(active, d_s * jp_s * jp_s, 0.0))
            f_n, f_t1, f_t2 = force_blocks(u_n, u_t1, u_t2)
            d1 = d1 - psum(jp_n * f_n + jp_t1 * f_t1 + jp_t2 * f_t2)
            p_n, p_t1, p_t2, t, bottom, top, s_star = zones(u_n, u_t1, u_t2)
            t_p = (p_t1 * q_t1 + p_t2 * q_t2) / t
            t_pp = jnp.maximum(qq_t - t_p * t_p, 0.0) / t
            h_mid = qq - ((t_p - mu * q_n) ** 2 + (t - mu * p_n) * t_pp) / mu2p1
            h_bot = d_n * jp_n * jp_n + d_t1 * jp_t1 * jp_t1 + d_t2 * jp_t2 * jp_t2
            zero = jnp.zeros_like(h_mid)
            d2 = d2 + psum(jnp.where(bottom, h_bot, jnp.where(top, zero, h_mid)))
            return d1, jnp.maximum(d2, _EPS)

        zero_s = jnp.zeros_like(pmp)
        one_s = jnp.ones_like(pmp)
        d1_0, d2_0 = phi_derivs(zero_s)
        alpha = jnp.maximum(-d1_0 / d2_0, 0.0)
        lo, hi = zero_s, jnp.full_like(pmp, big)
        for _ in range(ls_iterations):
            d1a, d2a = phi_derivs(alpha)
            neg = jnp.where(d1a < 0, one_s, zero_s)
            lo = neg * jnp.maximum(lo, alpha) + (1.0 - neg) * lo
            hi = neg * hi + (1.0 - neg) * jnp.minimum(hi, alpha)
            newton = alpha - d1a / d2a
            bounded = jnp.where(hi < big, one_s, zero_s)
            fallback = bounded * 0.5 * (lo + hi) + (1.0 - bounded) * (
                2.0 * alpha + 1e-9
            )
            inside = jnp.where(newton > lo, one_s, zero_s) * jnp.where(
                newton < hi, one_s, zero_s
            )
            alpha = inside * newton + (1.0 - inside) * fallback
        dphi = (
            0.5 * alpha * alpha * pmp
            + alpha * dmx
            + cost_rows(jarx + alpha * jp)
            - cost_rows(jarx)
        )
        return jnp.where(dphi < 0, alpha, 0.0)

    x_ref[:] = x0
    jar_ref[:] = jar0
    grad_ref[:] = grad0
    mgrad_ref[:] = mgrad0
    p_ref[:] = -mgrad0
    imp_ref[:] = jnp.ones_like(imp_ref)

    def iteration(_, tok):
        x, p = x_ref[:], p_ref[:]
        grad, mgrad = grad_ref[:], mgrad_ref[:]
        alpha = linesearch(x, p, jar_ref[:]) * imp_ref[:]
        x = x + alpha * p
        jar = matv_j(x) - aref
        gradn = grad_from(matv_m(x - smooth), jar)
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

    jar_s, u_n, u_t1, u_t2 = split(jar_ref[:])
    f_s = jnp.where(jar_s < 0, -d_s * jar_s, 0.0)
    f_n, f_t1, f_t2 = force_blocks(u_n, u_t1, u_t2)
    force_ref[:ns] = f_s
    force_ref[ns : ns + c] = f_n
    force_ref[ns + c : ns + 2 * c] = f_t1
    force_ref[ns + 2 * c :] = f_t2
    qfrc = matv_jt(f_s, f_n, f_t1, f_t2)
    qfrc_ref[:] = qfrc

    if with_euler:
        # Euler implicit-damping solve in the same invocation (see the
        # scalar kernel): refactor (M + h diag(damping)) into the L scratch
        # — qM stays live in this variant, so no rebuild is needed
        l_ref[:] = qm_ref[:] + jnp.where(
            row_n == col_n, hd_ref[:][:, None, :], 0.0
        )
        factor_in_place(l_ref)
        l_ref[:] = jnp.where(row_n >= col_n, l_ref[:], 0.0)
        lt_ref[:] = jnp.swapaxes(l_ref[:], 0, 1)
        eff_ref[:] = chosolve(qfrc_smooth_ref[:] + qfrc)
    else:
        eff_ref[:] = jnp.zeros_like(qfrc)


@functools.lru_cache(maxsize=None)
def _ell_layout(ns: int, ncon_ell: int):
    """Static row permutation interleaved -> sectioned (+ padded sizes).

    Input rows: [scalar x ns | cone blocks x ncon_ell of (normal, t1, t2)].
    Output rows: [scalar pad ns_p | normals pad c_p | t1 pad c_p | t2 pad c_p]
    with each section 8-row aligned; `gather` indexes input rows for each
    output row (padding rows point at row 0 — their D is zeroed on the host
    so they are inert), `scatter` maps each input row to its output slot."""
    import numpy as np

    ns_p = _ceil_to(max(ns, 1), _SUBLANE)
    c_p = _ceil_to(ncon_ell, _SUBLANE)
    e_p = ns_p + 3 * c_p
    gather = np.zeros(e_p, dtype=np.int32)
    pad_mask = np.ones(e_p, dtype=bool)
    blocks = np.arange(ncon_ell, dtype=np.int32)
    gather[:ns] = np.arange(ns, dtype=np.int32)
    pad_mask[:ns] = False
    for k in range(3):
        s = ns_p + k * c_p
        gather[s : s + ncon_ell] = ns + 3 * blocks + k
        pad_mask[s : s + ncon_ell] = False
    scatter = np.zeros(ns + 3 * ncon_ell, dtype=np.int32)
    scatter[gather[~pad_mask]] = np.nonzero(~pad_mask)[0].astype(np.int32)
    return ns_p, c_p, e_p, gather, pad_mask, scatter


@functools.partial(
    jax.jit,
    static_argnames=(
        "ns", "ncon_ell", "jb_nl", "iterations", "ls_iterations", "interpret"
    ),
)
def _ell_cg_solve_tpu(
    qm, j, aref, d, mu, qfrc_smooth, warm, tol, hd=None, crb=None, jb=None, *,
    ns, ncon_ell, jb_nl=None, iterations, ls_iterations, interpret=False,
):
    """Batch-first [B, ...] inputs (interleaved row order, as assembled by
    physics/constraint.py) -> (qacc_smooth, x, force, qfrc[, qacc_eff]);
    `force` is returned in the interleaved order. mu is (B, ncon_ell) — each
    block's mu_1 / sqrt(impratio). With `hd` (B, n) the kernel additionally
    returns the Euler implicit-damping solve (see _cg_solve_tpu).

    With `jb` = (fq (B, nc, 3, 6), sw (B, n, 6), ll (B, nl), dm (nc, n),
    lim1h (nl, n)) and static `jb_nl` = nl (the limit-row count; the gate
    requires scalar rows == limits), the kernel ASSEMBLES J in VMEM —
    cone sections are the frame-projected rows directly — and `j` is
    ignored (its XLA-side assembly DCEs away).

    interpret=True runs through the Pallas interpreter for the CPU parity
    suite."""
    bsz, n = qfrc_smooth.shape
    dtype = qfrc_smooth.dtype
    ns_p, c_p, e_p, gather, pad_mask, scatter = _ell_layout(ns, ncon_ell)
    gather = jnp.asarray(gather)
    keep = jnp.asarray(~pad_mask, dtype)  # (e_p,) 0 on padding rows

    with_j_build = jb is not None
    aref_p = aref[:, gather] * keep[None, :]
    d_p = d[:, gather] * keep[None, :]  # D == 0 makes padding rows inert
    mu_sec = jnp.pad(mu, ((0, 0), (0, c_p - ncon_ell)), constant_values=1.0)

    with_qm_build = crb is not None
    if with_j_build:
        j_en = None
    else:
        j_p = j[:, gather] * keep[None, :, None]
        j_en = _pad_tiles(jnp.moveaxis(j_p, 0, -1), LANE_TILE)
    aref_e = _pad_tiles(jnp.moveaxis(aref_p, 0, -1), LANE_TILE)
    d_e = _pad_tiles(jnp.moveaxis(d_p, 0, -1), LANE_TILE)
    mu_c = _pad_tiles(jnp.moveaxis(mu_sec, 0, -1), LANE_TILE)
    qfrc_n = _pad_tiles(jnp.moveaxis(qfrc_smooth, 0, -1), LANE_TILE)
    warm_n = _pad_tiles(jnp.moveaxis(warm, 0, -1), LANE_TILE)
    if with_qm_build:
        buf, cdof, anc, arm = crb
        kpad = (-buf.shape[-1]) % _SUBLANE
        buf = jnp.pad(buf, ((0, 0), (0, 0), (0, kpad)))
        cdof = jnp.pad(cdof, ((0, 0), (0, 0), (0, kpad)))
        buf_nk = _pad_tiles(jnp.moveaxis(buf, 0, -1), LANE_TILE)
        cdof_nk = _pad_tiles(jnp.moveaxis(cdof, 0, -1), LANE_TILE)
        anc_nn = jnp.asarray(anc, dtype)
        arm_n = _pad_tiles(
            jnp.broadcast_to(arm.astype(dtype)[:, None], (n, bsz)), LANE_TILE
        )
        scale = jnp.maximum(
            jnp.sum(buf * cdof, axis=(-2, -1)) + jnp.sum(arm), _EPS
        )
        qm_nn = None
    else:
        qm_nn = _pad_tiles(jnp.moveaxis(qm, 0, -1), LANE_TILE)
        scale = jnp.maximum(
            jnp.sum(jnp.diagonal(qm, axis1=1, axis2=2), axis=-1), _EPS
        )
    tolscale_1 = _pad_tiles((tol.astype(dtype) * scale)[None, :], LANE_TILE)
    tiles = qfrc_n.shape[-1] // LANE_TILE

    if with_j_build:
        # marshal the compact J-build operands (see _cg_solve_tpu): fq to
        # direction-major (3*c_p, 8, tiles*T), sw (n, 8, tiles*T), ll
        # (ns_p, tiles*T), static dm/lim1h row-padded
        fq, sw, ll, dm, lim1h = jb
        fq_d = jnp.swapaxes(jnp.moveaxis(fq.astype(dtype), 0, -1), 0, 1)
        fq_d = jnp.pad(
            fq_d, ((0, 0), (0, c_p - ncon_ell), (0, _SUBLANE - 6), (0, 0))
        )
        fq_kb = _pad_tiles(fq_d.reshape(3 * c_p, _SUBLANE, bsz), LANE_TILE)
        sw_d = jnp.pad(sw.astype(dtype), ((0, 0), (0, 0), (0, _SUBLANE - 6)))
        sw_kb = _pad_tiles(jnp.moveaxis(sw_d, 0, -1), LANE_TILE)
        dm_cn = jnp.pad(jnp.asarray(dm, dtype), ((0, c_p - ncon_ell), (0, 0)))
        if jb_nl:
            ll_kb = _pad_tiles(
                jnp.moveaxis(
                    jnp.pad(ll.astype(dtype), ((0, 0), (0, ns_p - jb_nl))),
                    0,
                    -1,
                ),
                LANE_TILE,
            )
            lim1h_nn = jnp.pad(
                jnp.asarray(lim1h, dtype), ((0, ns_p - jb_nl), (0, 0))
            )

    with_euler = hd is not None
    hd_n = _pad_tiles(
        jnp.moveaxis(
            hd if with_euler else jnp.zeros_like(qfrc_smooth), 0, -1
        ),
        LANE_TILE,
    )

    kernel = functools.partial(
        _ell_cg_kernel, iterations, ls_iterations, ns_p, c_p, with_euler,
        with_qm_build, (jb_nl or 0) if with_j_build else None,
    )

    def lanes(rows):
        return pl.BlockSpec(
            (rows, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    def lanes3(a, b):
        return pl.BlockSpec(
            (a, b, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    def whole(a, b):
        return pl.BlockSpec((a, b), lambda i: (0, 0), memory_space=pltpu.VMEM)

    if with_qm_build:
        kk = buf_nk.shape[1]
        in_specs = [
            lanes3(n, kk),  # crb buf
            lanes3(n, kk),  # cdof
            whole(n, n),  # ancestry mask
            lanes(n),  # armature
        ]
        inputs = (buf_nk, cdof_nk, anc_nn, arm_n)
        extra_scratch = [pltpu.VMEM((n, n, LANE_TILE), dtype)]  # built qM
    else:
        in_specs = [lanes3(n, n)]  # dense qM
        inputs = (qm_nn,)
        extra_scratch = []
    if with_j_build:
        in_specs += [
            lanes3(3 * c_p, _SUBLANE),  # fq
            lanes3(n, _SUBLANE),  # sw
            whole(c_p, n),  # diff mask
        ]
        inputs += (fq_kb, sw_kb, dm_cn)
        if jb_nl:
            in_specs += [whole(ns_p, n), lanes(ns_p)]  # limit one-hots, side
            inputs += (lim1h_nn, ll_kb)
        extra_scratch.append(pltpu.VMEM((e_p, n, LANE_TILE), dtype))  # built J
    else:
        in_specs += [lanes3(e_p, n)]  # dense J (sectioned)
        inputs += (j_en,)
    in_specs += [
        lanes(e_p),  # aref
        lanes(e_p),  # D
        lanes(c_p),  # mu
        lanes(n),  # qfrc_smooth
        lanes(n),  # warmstart
        lanes(1),  # tol * scale
        lanes(n),  # h * dof_damping (euler shift)
    ]
    inputs += (aref_e, d_e, mu_c, qfrc_n, warm_n, tolscale_1, hd_n)

    xs, fs, qs, sm, eff = pl.pallas_call(
        kernel,
        grid=(tiles,),
        out_shape=(
            jax.ShapeDtypeStruct((n, tiles * LANE_TILE), dtype),
            jax.ShapeDtypeStruct((e_p, tiles * LANE_TILE), dtype),
            jax.ShapeDtypeStruct((n, tiles * LANE_TILE), dtype),
            jax.ShapeDtypeStruct((n, tiles * LANE_TILE), dtype),
            jax.ShapeDtypeStruct((n, tiles * LANE_TILE), dtype),
        ),
        in_specs=in_specs,
        out_specs=(lanes(n), lanes(e_p), lanes(n), lanes(n), lanes(n)),
        scratch_shapes=[
            pltpu.VMEM((e_p, LANE_TILE), dtype),  # jar
            pltpu.VMEM((n, LANE_TILE), dtype),  # grad
            pltpu.VMEM((n, LANE_TILE), dtype),  # mgrad
            pltpu.VMEM((n, LANE_TILE), dtype),  # p
            pltpu.VMEM((1, LANE_TILE), dtype),  # improved mask
            pltpu.VMEM((n, LANE_TILE), dtype),  # substitution state
            pltpu.VMEM((n, n, LANE_TILE), dtype),  # L
            pltpu.VMEM((n, n, LANE_TILE), dtype),  # L^T
        ]
        + extra_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*inputs)

    def unlane(t):  # (rows, tiles*T) -> (B, rows)
        return jnp.moveaxis(t, 0, -1)[:bsz]

    force = unlane(fs)[:, jnp.asarray(scatter)]  # back to interleaved order
    if with_euler:
        return unlane(sm), unlane(xs), force, unlane(qs), unlane(eff)
    return unlane(sm), unlane(xs), force, unlane(qs)
