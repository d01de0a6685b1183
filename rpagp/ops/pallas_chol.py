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


def _leaf_call(A, interpret: bool = False):
    b = A.shape[-1]
    if A.shape != (b, b) or b % 8 != 0:
        raise ValueError(f"leaf chol expects (b, b) with 8 | b, got {A.shape}")
    kernel = functools.partial(_leaf_kernel, b=b)
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
