"""Pallas leaf Cholesky: factor a (b, b) SPD block AND its inverse in
ONE kernel call — the latency kernel under the blocked p x p factor.

Why this exists: XLA:TPU lowers `cholesky` to a blocked expansion whose
128-wide diagonal panels are unblocked loops — the factor's critical
path is ~p sequential rank-1 steps, each paying per-step HLO dispatch.
At flagship p = 5120 that is the measured ~34 ms forward (~2 Tf/s
effective, docs/BENCHMARKS.md r2h), and the trsm-based VJP pays it
again. ops/block_chol.py already moves all O(p^3) work into GEMMs, but
its per-block-step diagonal chol + triangular inverse still route
through the same sequential XLA expansions.

This kernel runs the entire b-row elimination INSIDE one Pallas call —
VMEM-resident state, zero per-row dispatch — and carries the block
inverse along for free:

    per row j (fori_loop, all ops full-width VPU/MXU):
      row_j  = A[j, :]                      (dynamic sublane slice)
      L[:,j] = masked(row_j) * rsqrt(A_jj)  (placed by a one-hot outer)
      A     -= L[:,j] L[:,j]^T              (rank-1, keeps A symmetric)
      Linv[j,:] = (e_j - L[j,:] Linv) * rsqrt(A_jj)   (forward subst.)

Two kernels share that elimination: `_leaf_kernel` runs it on the full
(b, b) block (b <= 128), and `_panel_kernel` (the default for
128 | b, b > 128) runs it on (128, 128) diagonal panels with the
O(b^3) panel/trailing/inverse work as static-sliced MXU GEMMs —
shrinking the sequential chain's VPU footprint 16x at b=512. The panel
leaf won the interleaved p=5120 blocked-factor shootout on a v5e core
(17.8 ms fwd+grad vs 18.5 xla-leaf vs 35.9 builtin, BENCHMARKS r3g)
and is the on-TPU default (RPAGP_PALLAS_CHOL=0 opts out).

Returning Linv makes the whole blocked factorization chol/trsm-free:
block_chol's panel step needs exactly L_kk^{-1}, and the closed-form
VJP (see `chol_linv`) needs only GEMMs against the saved L^{-1} — no
triangular solve anywhere, forward or backward.

Failure semantics: a non-positive pivot flips the returned ok flag and
substitutes a unit pivot so every primal stays FINITE (the
`blocked_cholesky_safe` contract — a zero cotangent times a finite
garbage primal stays zero; NaN-propagating callers re-impose NaNs on
ok=False at the XLA level).

Numerics: all f32; the rank-1 updates are exactly the textbook
right-looking elimination, so the factor matches `jnp.linalg.cholesky`
to f32 roundoff (tests/test_pallas_chol.py).

Reference analog: none (the reference inherits MAGMA/cuSOLVER potrf
through torch — SURVEY.md §2.3). This kernel exists for the TPU-first
exact grid solver's p x p factor (ops/grid_solve.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST

# dot_general helper: outer = u^T v for row vectors u, v of shape (1, b)
_OUTER = (((0,), (0,)), ((), ()))


def _leaf_kernel(a_ref, l_ref, linv_ref, ok_ref, *, b):
    A0 = a_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    # Mosaic constraints learned on hardware (2026-08-18):
    #   - no lax.dynamic_slice on VMEM values (interpret mode accepts
    #     it, the TPU lowering raises) — rows/columns are extracted by
    #     masked VPU reductions instead;
    #   - one-hot outer products via dot_general are MXU latency traps
    #     (6 HIGHEST dots/row measured ~20 ms per 256-leaf) — every
    #     rank-1 / placement op below is a (b,1)*(1,b) VPU broadcast;
    #     only the forward-substitution matvec uses the MXU.
    # A stays exactly symmetric: row/col are exact transposes of each
    # other (masked reads of a symmetric A), so lcol*lrow is an exactly
    # symmetric downdate.
    _ROW = (((1,), (0,)), ((), ()))

    def body(j, carry):
        A, L, Linv, ok = carry
        ohl = (lane == j).astype(A.dtype)  # (1, b) one-hot e_j (lanes)
        ohc = (sub == j).astype(A.dtype)   # (b, 1) one-hot e_j (sublanes)
        row = jnp.sum(A * ohc, axis=0, keepdims=True)  # A[j, :]  (1, b)
        col = jnp.sum(A * ohl, axis=1, keepdims=True)  # A[:, j]  (b, 1)
        dj = jnp.sum(row * ohl)
        okj = dj > 0.0
        rsd = jax.lax.rsqrt(jnp.where(okj, dj, 1.0))
        # column j of L: L[i, j] = A[i, j] / sqrt(A_jj), i >= j
        lrow = jnp.where(lane >= j, row * rsd, 0.0)
        lrow = jnp.where(okj, lrow, ohl)  # unit pivot on failure (finite)
        lcol = jnp.where(sub >= j, col * rsd, 0.0)
        lcol = jnp.where(okj, lcol, ohc)
        L = L + lcol * ohl          # place column j
        A = A - lcol * lrow         # rank-1 downdate (exactly symmetric)
        # forward substitution row of the inverse:
        # Linv[j, :] = (e_j - L[j, :] @ Linv) / L[j, j]
        lj = jnp.sum(L * ohc, axis=0, keepdims=True)  # L[j, :]  (1, b)
        v = jax.lax.dot_general(lj, Linv, _ROW, precision=_HI,
                                preferred_element_type=A.dtype)
        linv_row = (ohl - v) * rsd
        Linv = Linv + ohc * linv_row  # place row j
        return A, L, Linv, ok & okj

    Z = jnp.zeros_like(A0)
    _, L, Linv, ok = jax.lax.fori_loop(
        0, b, body, (A0, Z, Z, jnp.asarray(True)))
    l_ref[:] = L
    linv_ref[:] = Linv
    # full-ref store: Mosaic cannot store a scalar to VMEM (verified on
    # hardware 2026-08-18; interpret mode accepts ok_ref[0, 0] = ...).
    ok_ref[:] = jnp.full((1, 1), ok.astype(jnp.float32))


# panel width of the blocked leaf: 128 keeps every static ref slice
# lane-tile-aligned (Mosaic constraint) and shrinks the per-step VPU
# footprint of the sequential elimination chain from (b, b) to
# (128, 128) — the rank-1 kernel's cost is ~b * (per-step time on a
# (b, b) block); the panel kernel's is ~b * (per-step time on a
# (128, 128) block) + MXU panel/trailing GEMMs.
_PANEL = 128

# in-panel elimination unroll factor (must divide _PANEL); see
# _rank1_block for why
_UNROLL = 16

# dot_general helpers for the panel GEMMs (avoid explicit .T transposes
# inside the kernel — contract on the matching dimension instead)
_NT = (((1,), (1,)), ((), ()))   # A @ B^T
_NN = (((1,), (0,)), ((), ()))   # A @ B


def _rank1_block(A0, pb, dtype):
    """The (pb, pb) unblocked elimination: returns (L, Linv, ok).

    MXU-free variant of the original _leaf_kernel loop: the forward-
    substitution matvec L[j, :] @ Linv is a VPU broadcast-multiply +
    sublane reduction against a carried L^T (a HIGHEST-precision MXU
    dot inside the row loop costs ~7 us of pipeline latency per row —
    measured 2026-08-19, it made the 512-leaf 2.4 ms; the VPU form is
    exact f32 and latency-flat)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, pb), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (pb, 1), 0)

    def step(j, carry):
        A, L, Lt, Linv, ok = carry
        ohl = (lane == j).astype(dtype)
        ohc = (sub == j).astype(dtype)
        row = jnp.sum(A * ohc, axis=0, keepdims=True)
        col = jnp.sum(A * ohl, axis=1, keepdims=True)
        dj = jnp.sum(row * ohl)
        okj = dj > 0.0
        rsd = jax.lax.rsqrt(jnp.where(okj, dj, 1.0))
        lrow = jnp.where(lane >= j, row * rsd, 0.0)  # col j of L, as a row
        lrow = jnp.where(okj, lrow, ohl)
        lcol = jnp.where(sub >= j, col * rsd, 0.0)
        lcol = jnp.where(okj, lcol, ohc)
        L = L + lcol * ohl          # place column j
        Lt = Lt + ohc * lrow        # the same column as row j of L^T
        A = A - lcol * lrow         # rank-1 downdate (exactly symmetric)
        # forward substitution row: Linv[j, :] = (e_j - L[j, :] Linv) / Ljj
        # L[j, :] as a column vector is Lt[:, j] (masked lane read);
        # Linv[j, :] is still zero, so the j-term contributes nothing.
        ljcol = jnp.sum(Lt * ohl, axis=1, keepdims=True)   # (pb, 1)
        v = jnp.sum(ljcol * Linv, axis=0, keepdims=True)   # (1, pb) VPU
        linv_row = (ohl - v) * rsd
        Linv = Linv + ohc * linv_row
        return A, L, Lt, Linv, ok & okj

    # unrolled sub-steps per fori iteration: the Mosaic loop carries
    # ~5-10 us of per-iteration overhead that dwarfs the VPU body at
    # pb=128 (measured 2026-08-19: a 256-row leaf was ~2 ms flat
    # regardless of body cost); unrolling amortizes it
    def body(i, carry):
        j0 = i * _UNROLL
        for t in range(_UNROLL):
            carry = step(j0 + t, carry)
        return carry

    Z = jnp.zeros_like(A0)
    _, L, _, Linv, ok = jax.lax.fori_loop(
        0, pb // _UNROLL, body, (A0, Z, Z, Z, jnp.asarray(True)))
    return L, Linv, ok


def _panel_kernel(a_ref, l_ref, linv_ref, ok_ref, s_ref, *, b):
    """Panel-blocked leaf: the b-row elimination as b/_PANEL panel
    steps. The sequential scalar chain runs on (128, 128) panels (VPU)
    while the O(b^3) column/trailing/inverse work is static-sliced MXU
    GEMMs — same outputs and failure semantics as the rank-1 kernel,
    measured ~5x faster at b=512 (docs/BENCHMARKS.md r3g)."""
    pb = _PANEL
    npan = b // pb
    dtype = a_ref.dtype
    s_ref[:] = a_ref[:]
    l_ref[:] = jnp.zeros((b, b), dtype)
    linv_ref[:] = jnp.zeros((b, b), dtype)
    ok = jnp.asarray(True)
    for k in range(npan):  # python-unrolled: every slice below is static
        o = k * pb
        Lkk, Lkk_inv, ok_k = _rank1_block(s_ref[o:o + pb, o:o + pb],
                                          pb, dtype)
        ok = ok & ok_k
        l_ref[o:o + pb, o:o + pb] = Lkk
        linv_ref[o:o + pb, o:o + pb] = Lkk_inv
        if k > 0:
            # inverse rows: Linv[k, :o] = -Lkk^{-1} (L[k, :o] @ Linv[:o, :o])
            prod = jax.lax.dot_general(
                l_ref[o:o + pb, 0:o], linv_ref[0:o, 0:o], _NN,
                precision=_HI, preferred_element_type=dtype)
            linv_ref[o:o + pb, 0:o] = -jax.lax.dot_general(
                Lkk_inv, prod, _NN, precision=_HI,
                preferred_element_type=dtype)
        if k < npan - 1:
            # column panel + live-region trailing update (shrinking
            # static shapes — no full-matrix masking)
            Lcol = jax.lax.dot_general(
                s_ref[o + pb:b, o:o + pb], Lkk_inv, _NT,
                precision=_HI, preferred_element_type=dtype)
            l_ref[o + pb:b, o:o + pb] = Lcol
            s_ref[o + pb:b, o + pb:b] = (
                s_ref[o + pb:b, o + pb:b]
                - jax.lax.dot_general(Lcol, Lcol, _NT, precision=_HI,
                                      preferred_element_type=dtype))
    ok_ref[:] = jnp.full((1, 1), ok.astype(jnp.float32))


def _leaf_call(A, interpret: bool = False):
    b = A.shape[-1]
    if A.shape != (b, b) or b % 8 != 0:
        raise ValueError(f"leaf chol expects (b, b) with 8 | b, got {A.shape}")
    if b % _PANEL == 0 and b > _PANEL:
        kernel = functools.partial(_panel_kernel, b=b)
        scratch = [pltpu.VMEM((b, b), A.dtype)]
    else:
        kernel = functools.partial(_leaf_kernel, b=b)
        scratch = []
    L, Linv, okf = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, b), A.dtype),
            jax.ShapeDtypeStruct((b, b), A.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(A)
    return L, Linv, okf[0, 0]


def _phi(M):
    """phi(M) = tril(M, -1) + diag(M)/2 — the Cholesky-VJP projector."""
    return jnp.tril(M, -1) + 0.5 * jnp.diag(jnp.diagonal(M))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def chol_linv(A, interpret: bool = False):
    """(L, Linv, ok) for a SYMMETRIC (b, b) block — one Pallas call.

    L = chol(A) lower, Linv = L^{-1}, ok = scalar f32 1.0/0.0 (0.0 when
    a pivot was non-positive; L/Linv are then finite garbage — the
    blocked_cholesky_safe contract).

    Differentiable with a GEMM-only closed-form VJP (no trsm): the
    adjoint of L uses Abar = 0.5 Linv^T (phi + phi^T) Linv with
    phi = phi(L^T Lbar), and the Linv cotangent folds in through
    d(L^{-1}) = -Linv dL Linv. The returned Abar is SYMMETRIC — callers
    must reach this through symmetric inputs (block_chol requires a
    symmetric A; the grid solver symmetrizes C), where the symmetric
    cotangent convention is exact.
    """
    return _leaf_call(A, interpret=interpret)


def _chol_linv_fwd(A, interpret):
    L, Linv, okf = _leaf_call(A, interpret=interpret)
    return (L, Linv, okf), (L, Linv)


def _chol_linv_bwd(interpret, res, cts):
    L, Linv = res
    Lbar, Linvbar, _ = cts
    # d(Linv) = -Linv dL Linv  =>  Lbar += -(Linv^T Linvbar Linv^T)|_tril
    corr = jnp.matmul(
        jnp.matmul(Linv.T, Linvbar, precision=_HI), Linv.T, precision=_HI)
    Lb = jnp.tril(Lbar - corr)
    M = jnp.matmul(L.T, Lb, precision=_HI)
    P = _phi(M)
    S = P + P.T
    Abar = 0.5 * jnp.matmul(
        jnp.matmul(Linv.T, S, precision=_HI), Linv, precision=_HI)
    return (Abar,)


chol_linv.defvjp(_chol_linv_fwd, _chol_linv_bwd)


# batched-path size cap: each grid program holds 5 (m, m) f32 VMEM
# buffers (A, L, Linv, scratch, +headroom) — 5 MB at m=512 against the
# ~16 MB/core VMEM budget; beyond that fall back to XLA's batched chol
_BATCH_MAX_B = 512


# ---------------------------------------------------------------------------
# Fused batched elimination: ALL J blocks advance together in one
# program.
#
# The vmap form below (chol_linv_batched) lifts the batch axis to a
# Pallas grid — J programs execute SEQUENTIALLY on the single
# TensorCore, so the 128-row elimination chain is paid J times
# end-to-end while XLA's batched chol pays it once for the whole batch
# (each of its column steps operates on all J blocks at once). That is
# why the two-call vmap ladder lost its A/B (docs/BENCHMARKS.md r4b).
# The fused kernel restores the good iteration order: ONE row loop
# whose every step is a (Jb, pb, pb) VPU op advancing every block's
# elimination simultaneously, with the O(b^3) panel/trailing/inverse
# GEMMs as per-block MXU dots (python-unrolled — Mosaic has no batched
# dot). Jb blocks ride in VMEM per program (budgeted in _pick_jb);
# J/Jb grid programs cover the batch.


def _rank1_panel_batched(A0, pb, dtype):
    """(Jb, pb, pb) batched unblocked elimination:
    returns (L, Linv, ok) with ok (Jb, 1, 1) f32 1.0/0.0 (L^T is an
    internal fori_loop carry only, consumed by the substitution row).

    The same MXU-free row loop as _rank1_block with a leading batch
    axis: every mask/reduction carries (Jb, ., .) shapes, so one row
    step advances ALL Jb eliminations (the fused kernel's whole point).
    """
    Jb = A0.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, pb), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, pb, 1), 1)

    def step(j, carry):
        A, L, Lt, Linv, ok = carry
        ohl = (lane == j).astype(dtype)   # (1, 1, pb)
        ohc = (sub == j).astype(dtype)    # (1, pb, 1)
        row = jnp.sum(A * ohc, axis=1, keepdims=True)    # (Jb, 1, pb)
        col = jnp.sum(A * ohl, axis=2, keepdims=True)    # (Jb, pb, 1)
        dj = jnp.sum(row * ohl, axis=2, keepdims=True)   # (Jb, 1, 1)
        okj = dj > 0.0
        rsd = jax.lax.rsqrt(jnp.where(okj, dj, 1.0))
        lrow = jnp.where(lane >= j, row * rsd, 0.0)
        lrow = jnp.where(okj, lrow, ohl)  # unit pivot on failure (finite)
        lcol = jnp.where(sub >= j, col * rsd, 0.0)
        lcol = jnp.where(okj, lcol, ohc)
        L = L + lcol * ohl           # place column j (every block)
        Lt = Lt + ohc * lrow         # the same column as row j of L^T
        A = A - lcol * lrow          # rank-1 downdate (exactly symmetric)
        # forward substitution row: Linv[j, :] = (e_j - L[j, :] Linv)/Ljj
        ljcol = jnp.sum(Lt * ohl, axis=2, keepdims=True)  # (Jb, pb, 1)
        v = jnp.sum(ljcol * Linv, axis=1, keepdims=True)  # (Jb, 1, pb)
        linv_row = (ohl - v) * rsd
        Linv = Linv + ohc * linv_row
        return A, L, Lt, Linv, ok * okj.astype(dtype)

    def body(i, carry):
        j0 = i * _UNROLL
        for t in range(_UNROLL):
            carry = step(j0 + t, carry)
        return carry

    Z = jnp.zeros_like(A0)
    ok0 = jnp.ones((Jb, 1, 1), dtype)
    _, L, _, Linv, ok = jax.lax.fori_loop(
        0, pb // _UNROLL, body, (A0, Z, Z, Z, ok0))
    return L, Linv, ok


def _fused_panel_kernel(t_ref, l_ref, linv_ref, ok_ref, *, b, Jb):
    """Panel-blocked elimination of Jb blocks at once (see module note
    above). l_ref doubles as the in-place working matrix: its trailing
    region holds the current Schur complement until the corresponding
    L panels overwrite it — the classic in-place chol layout, which
    keeps VMEM at 3 block buffers instead of 4."""
    pb = min(_PANEL, b)
    npan = b // pb
    dtype = t_ref.dtype
    l_ref[:] = t_ref[:]
    linv_ref[:] = jnp.zeros((Jb, b, b), dtype)
    ok = jnp.ones((Jb, 1, 1), dtype)
    for k in range(npan):  # python-unrolled: every slice is static
        o = k * pb
        Lk, Lk_inv, okk = _rank1_panel_batched(
            l_ref[:, o:o + pb, o:o + pb], pb, dtype)
        ok = ok * okk
        l_ref[:, o:o + pb, o:o + pb] = Lk
        linv_ref[:, o:o + pb, o:o + pb] = Lk_inv
        for j in range(Jb):  # per-block MXU work (no batched dot)
            if k > 0:
                # Linv[k, :o] = -Lkk^{-1} (L[k, :o] @ Linv[:o, :o])
                prod = jax.lax.dot_general(
                    l_ref[j, o:o + pb, 0:o], linv_ref[j, 0:o, 0:o], _NN,
                    precision=_HI, preferred_element_type=dtype)
                linv_ref[j, o:o + pb, 0:o] = -jax.lax.dot_general(
                    Lk_inv[j], prod, _NN, precision=_HI,
                    preferred_element_type=dtype)
            if k < npan - 1:
                # column panel + live-region trailing update
                Lcol = jax.lax.dot_general(
                    l_ref[j, o + pb:b, o:o + pb], Lk_inv[j], _NT,
                    precision=_HI, preferred_element_type=dtype)
                l_ref[j, o + pb:b, o:o + pb] = Lcol
                l_ref[j, o + pb:b, o + pb:b] = (
                    l_ref[j, o + pb:b, o + pb:b]
                    - jax.lax.dot_general(Lcol, Lcol, _NT, precision=_HI,
                                          preferred_element_type=dtype))
    # the in-place layout leaves stale symmetric-copy values ABOVE the
    # diagonal (regions [o:o+pb, o+pb:] are never rewritten); mask to
    # exactly-lower-triangular so the output matches jnp.linalg.cholesky
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)
    sub_b = jax.lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    l_ref[:] = l_ref[:] * (sub_b >= lane_b).astype(dtype)
    ok_ref[:] = ok


def _pick_jb(J: int, b: int) -> int | None:
    """Largest divisor of J whose per-program VMEM footprint fits:
    3 (Jb, b, b) block buffers, double-buffered across grid steps by
    the Mosaic pipeline, plus 5 (Jb, pb, pb) elimination carries
    (A, L, Lt, Linv and temporaries; the ok carry is (Jb, 1, 1) —
    negligible), against a conservative ~12 MB budget. None = no
    divisor fits."""
    pb = min(_PANEL, b)
    per_block = 2 * 3 * b * b * 4 + 5 * pb * pb * 4
    best = None
    for jb in range(1, J + 1):
        if J % jb == 0 and jb * per_block <= 12_000_000:
            best = jb
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def chol_linv_batched_fused(T, interpret: bool = False):
    """(L, Linv, ok) for a batch of symmetric blocks T (J, b, b) via the
    fused batched kernel — one row loop advancing every block (J/Jb
    sequential grid programs of Jb blocks each). Same contract as
    chol_linv_batched: finite primals always, ok (J,) f32 flags, and a
    GEMM-only closed-form VJP (batched over J at the XLA level).

    Requires pb | b (pb = min(128, b)) and a feasible Jb split — check
    `fused_supported` first; fall back to chol_linv_batched otherwise.
    """
    return _fused_call(T, interpret)


def fused_supported(J: int, b: int) -> bool:
    """Whether chol_linv_batched_fused can run a (J, b, b) batch."""
    pb = min(_PANEL, b)
    return (b % pb == 0 and pb % _UNROLL == 0 and b <= _BATCH_MAX_B
            and _pick_jb(J, b) is not None)


def _fused_call(T, interpret):
    J, b = T.shape[0], T.shape[-1]
    if T.ndim != 3 or not fused_supported(J, b):
        raise ValueError(f"fused batched chol cannot run {T.shape}; "
                         "check fused_supported first")
    Jb = _pick_jb(J, b)
    L, Linv, okf = pl.pallas_call(
        functools.partial(_fused_panel_kernel, b=b, Jb=Jb),
        grid=(J // Jb,),
        in_specs=[pl.BlockSpec((Jb, b, b), lambda i: (i, 0, 0))],
        out_specs=(
            pl.BlockSpec((Jb, b, b), lambda i: (i, 0, 0)),
            pl.BlockSpec((Jb, b, b), lambda i: (i, 0, 0)),
            pl.BlockSpec((Jb, 1, 1), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((J, b, b), T.dtype),
            jax.ShapeDtypeStruct((J, b, b), T.dtype),
            jax.ShapeDtypeStruct((J, 1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(T)
    return L, Linv, okf[:, 0, 0]


def _fused_fwd(T, interpret):
    L, Linv, okf = _fused_call(T, interpret)
    return (L, Linv, okf), (L, Linv)


def _fused_bwd(interpret, res, cts):
    # batched closed-form chol VJP (see chol_linv): all O(J b^3) work is
    # XLA batched GEMMs; the symmetric-cotangent convention applies —
    # callers must reach this through symmetric inputs.
    L, Linv = res
    Lbar, Linvbar, _ = cts
    LinvT = jnp.swapaxes(Linv, -1, -2)
    corr = jnp.matmul(jnp.matmul(LinvT, Linvbar, precision=_HI),
                      LinvT, precision=_HI)
    Lb = jnp.tril(Lbar - corr)
    M = jnp.matmul(jnp.swapaxes(L, -1, -2), Lb, precision=_HI)
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    P = jnp.tril(M, -1) + 0.5 * M * eye
    S = P + jnp.swapaxes(P, -1, -2)
    Abar = 0.5 * jnp.matmul(jnp.matmul(LinvT, S, precision=_HI),
                            Linv, precision=_HI)
    return (Abar,)


chol_linv_batched_fused.defvjp(_fused_fwd, _fused_bwd)


def batch_supported(b: int) -> bool:
    """Whether chol_linv_batched can run blocks of size b."""
    return b % 8 == 0 and b <= _BATCH_MAX_B


def chol_linv_batched(T, interpret: bool = False):
    """(L, Linv, ok) for a BATCH of symmetric blocks T (J, b, b).

    vmap over the single-block kernel: Pallas lifts the batch axis to a
    grid dimension, so all J eliminations run as J programs of ONE
    kernel dispatch, and the closed-form VJP replaces the batched trsm
    pair of XLA's chol gradient. ok is (J,) f32 per-block flags —
    exactly the jitter ladder's per-block escalation signal
    (ops/grid_solve._chol_ladder).

    Measured on chip at the flagship ladder shape (20, 256, 256): this
    LOSES to XLA's batched chol — fwd 5.07 vs 4.24 ms, f+g 8.46 vs
    7.61 ms, interleaved medians (docs/BENCHMARKS.md r4b; the panel
    kernel's per-program chain doesn't amortize across a batch the way
    it does inside the p x p factor). The ladder's factor-first fast
    path (default-on on TPU, r4e) therefore uses the FUSED kernel
    (chol_linv_batched_fused, r4f); this vmap form is only reached
    with RPAGP_LADDER_FUSED=0, kept as a tested vehicle and for its
    per-block ok flags.
    """
    if T.ndim != 3 or not batch_supported(T.shape[-1]):
        raise ValueError(f"chol_linv_batched expects (J, b, b) with 8 | b "
                         f"<= {_BATCH_MAX_B}, got {T.shape}")
    return jax.vmap(lambda A: chol_linv(A, interpret))(T)
