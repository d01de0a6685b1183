"""Blocked Cholesky as MXU GEMMs: the p x p grid factor off XLA's chol.

XLA:TPU's native `jnp.linalg.cholesky` runs the flagship p = 5120
factor at ~2 Tf/s effective (34 ms of the 42 ms `_factor` forward,
docs/BENCHMARKS.md r2h), and its VJP is a pair of p x p-RHS triangular
solves that cost another ~45 ms — together ~85% of the whole training
step.  Neither op maps onto the MXU: XLA lowers chol/trsm on TPU to a
mostly-sequential schedule.

This module re-expresses the factorization so that every O(p^3) term is
a plain matmul, which XLA:TPU executes at full MXU rate:

  right-looking blocked Cholesky, PYTHON-UNROLLED over the p/b block
  steps (static, shrinking shapes — the lax.scan formulation was
  measured SLOWER than the builtin because static shapes force
  full-matrix masked updates, ~3x flops; see BENCHMARKS.md r2h):

    for k = 0 .. nb-1, on the trailing matrix T (r x r, r = p - k*b):
      L_kk  = chol(T[:b, :b])              # b x b, XLA builtin (small)
      Linv  = L_kk^{-1}                    # b x b trsm vs I (small)
      P     = T[b:, :b] @ Linv^T           # (r-b, b) GEMM  <- MXU
      T    <- T[b:, b:] - P @ P^T          # (r-b)^2 GEMM   <- MXU

  The panel triangular solve becomes a GEMM against the explicitly
  inverted b x b diagonal block (the standard GPU-potrf trick; the
  inverse of a *well-conditioned jittered block* is benign — the
  overall factor is still backward-stable in practice, and the grid
  solver's jitter ladders guarantee the blocks it factors are SPD).
  The full-square trailing update does 2x the syrk flops but runs at
  MXU rate with zero masking; total flops stay ~p^3/3 because the
  trailing matrix SHRINKS (this is exactly what the scan version
  could not do).

Differentiation is PLAIN AUTODIFF through the unrolled graph: the VJP
is automatically the blocked algorithm's adjoint — GEMM VJPs (MXU) plus
b-sized chol/trsm VJPs — replacing XLA's p x p trsm-pair chol VJP.

All GEMMs use HIGHEST precision: the factor feeds logdet/inv-quad
values whose conditioning already sits at the f32 edge at flagship
scale (the C-indefiniteness wall, BENCHMARKS.md r2h); bf16-class
accumulation here breaks silently (CLAUDE.md).

Failure semantics match `jnp.linalg.cholesky`: an indefinite input
yields NaNs in the factor (an indefinite trailing diagonal block NaNs
its L_kk, and the NaNs propagate through every later panel/update), so
`jnp.all(jnp.isfinite(L))` remains the ladder probes' failure test.

Reference analog: none — the reference/GPyTorch never factor a p x p
grid matrix (SURVEY.md §3.2 runs BBMM CG instead). This kernel exists
for the TPU-first exact grid solver (ops/grid_solve.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

# default block size: 10 steps at flagship p=5120. Chosen to balance the
# sequential latency chain of nb small chols/trsms against GEMM size;
# re-measure with scripts/bench_chol.py when touching this.
_BLOCK = 512


def _resolve_tri() -> int:
    """Leaf size (in block units) of the triangular trailing update;
    0 disables it (full-square P @ P^T updates, the r2h..r3g behavior).

    The elimination loop never READS the trailing matrix's upper
    triangle (blk and the panel are lower-triangle slices), so the
    full-square update wastes ~2x the syrk flops. `_syrk_tril`
    recursively row-splits the update and computes only the block
    lower triangle (leaves of `tri` x block rows stay full-square GEMMs
    to keep the MXU fed): at flagship p=5120/b=512 the executed update
    flops drop ~35% (sum over the shrinking trailing chain), and the
    autodiff VJP inherits the same saving. RPAGP_TRI_UPDATE sets the
    leaf size; 0/off restores full-square updates."""
    env = os.environ.get("RPAGP_TRI_UPDATE", "2")
    if env.lower() in ("off", "false", "no"):
        return 0
    try:
        return max(0, int(env))
    except ValueError:
        import warnings

        warnings.warn(
            f"RPAGP_TRI_UPDATE={env!r} is not an integer or off/false/no;"
            " using the default leaf size 2", stacklevel=2)
        return 2


def _syrk_tril(T22, P, block, min_blocks):
    """T22 - P @ P^T with only the block LOWER triangle guaranteed
    (strictly-upper blocks above the split points are zero-filled).
    Every output element that IS computed is the same b-length dot
    product as in the full-square update, so values match it exactly
    elementwise; only the upper-triangle garbage differs."""
    r = T22.shape[0]
    nb = r // block
    if nb <= min_blocks:
        return T22 - jnp.matmul(P, P.T, precision=_HI,
                                preferred_element_type=T22.dtype)
    h = (nb // 2) * block
    top = _syrk_tril(T22[:h, :h], P[:h], block, min_blocks)
    bl = T22[h:, :h] - jnp.matmul(P[h:], P[:h].T, precision=_HI,
                                  preferred_element_type=T22.dtype)
    bot = _syrk_tril(T22[h:, h:], P[h:], block, min_blocks)
    z = jnp.zeros((h, r - h), T22.dtype)
    return jnp.concatenate([
        jnp.concatenate([top, z], axis=1),
        jnp.concatenate([bl, bot], axis=1),
    ], axis=0)


def _resolve_leaf(leaf: str) -> str:
    """Diagonal-block factor implementation: "xla" (builtin chol +
    triangular solve) or "pallas" (ops/pallas_chol.py — the whole
    b-row elimination AND the block inverse in one kernel call, no
    sequential XLA expansions; "interpret" is its CPU-test mode).

    "auto" resolves at trace time: pallas (the panel-blocked leaf) on a
    real TPU backend — it won the interleaved p=5120 shootout
    (17.8 ms fwd+grad vs 18.5 xla-leaf vs 35.9 builtin,
    docs/BENCHMARKS.md r3g) — else xla. RPAGP_PALLAS_CHOL=0 opts out;
    RPAGP_PALLAS_CHOL=interpret forces the interpreted kernel on any
    backend — CPU integration testing of the full solver stack."""
    if leaf != "auto":
        return leaf
    env = os.environ.get("RPAGP_PALLAS_CHOL", "1")
    if env == "interpret":
        return "interpret"
    if env in ("0", "off"):
        return "xla"
    from .pallas_interp import on_tpu

    return "pallas" if on_tpu() else "xla"


def _diag_factor(blk, sanitize, leaf, need_linv):
    """(L_kk, Linv_kk, ok) for one diagonal block.

    sanitize=True guarantees FINITE primals (failure -> ok=False and
    garbage-but-finite outputs); sanitize=False keeps the builtin
    NaN-propagation contract. Linv_kk is None when need_linv=False on
    the xla path (the last block step never uses it)."""
    b = blk.shape[0]
    eye_b = jnp.eye(b, dtype=blk.dtype)
    if leaf in ("pallas", "interpret"):
        from .pallas_chol import chol_linv

        L, Linv, okf = chol_linv(blk, leaf == "interpret")
        ok = okf > 0.5
        if not sanitize:
            # re-impose the NaN failure signal of jnp.linalg.cholesky
            L = jnp.where(ok, L, jnp.nan)
        return L, Linv, ok
    ok = jnp.asarray(True)
    if sanitize:
        Ldet = jnp.linalg.cholesky(jax.lax.stop_gradient(blk))
        ok = jnp.all(jnp.isfinite(Ldet))
        blk = jnp.where(ok, blk, eye_b)
    L = jnp.linalg.cholesky(blk)
    Linv = None
    if need_linv:
        Linv = jax.scipy.linalg.solve_triangular(L, eye_b, lower=True)
    return L, Linv, ok


def _elimination(A, block, sanitize, leaf="xla"):
    """Shared blocked-elimination loop over a block-multiple-sized A.

    sanitize=False: NaN-propagating (an indefinite diagonal block NaNs
    its L_kk and everything after it) — the jitter probes' failure
    signal, but its VJP is POISONED on failure (zero cotangents times
    NaN primals), so only differentiate it on inputs known to factor.

    sanitize=True: every diagonal block is first test-factored on
    stop_gradient values; a failing block's input is replaced by I
    before the differentiable chol, so ALL primals stay finite and the
    VJP is clean even when the factor is garbage — failure comes back
    as the `ok` flag instead of NaNs. This is what lets a lax.cond
    fast path differentiate L only when ok without 0*NaN poisoning
    (the cotangent of the not-taken branch is zero, and zero times a
    FINITE primal is zero)."""
    nb = A.shape[0] // block
    tri = _resolve_tri()
    cols = []
    T = A
    ok = jnp.asarray(True)
    for k in range(nb):
        blk = T[:block, :block]
        if tri and k > 0:
            # Defensive invariant guarantee, not a correction: diagonal
            # blocks are always computed full-square inside a _syrk_tril
            # leaf (the zero-filled rectangles are strictly block-upper
            # and never land on a future diagonal), so blk's upper
            # triangle is already valid. The tril+tril.T pins the
            # "both-triangles-readable" contract for leaves that read
            # the full block (pallas), independent of future _syrk_tril
            # edits. b x b — negligible next to the GEMMs.
            blk = jnp.tril(blk) + jnp.tril(blk, -1).T
        Lkk, Linv, okk = _diag_factor(blk, sanitize, leaf,
                                      need_linv=k < nb - 1)
        ok = ok & okk
        if k < nb - 1:
            P = jnp.matmul(T[block:, :block], Linv.T, precision=_HI,
                           preferred_element_type=A.dtype)
            colk = jnp.concatenate([Lkk, P], axis=0)
            T22 = T[block:, block:]
            if tri:
                T = _syrk_tril(T22, P, block, tri)
            else:
                T = T22 - jnp.matmul(
                    P, P.T, precision=_HI, preferred_element_type=A.dtype)
        else:
            colk = Lkk
        # zeros above the diagonal block keep L exactly lower-triangular
        cols.append(jnp.pad(colk, ((k * block, 0), (0, 0))))
    return jnp.concatenate(cols, axis=1), ok


def _pad_to_blocks(A, block):
    """Embed A in a block-multiple identity-tailed matrix:
    chol(blockdiag(A, I)) = blockdiag(chol(A), I), so slicing back to
    (p, p) is exact (and the pad can never fail a probe)."""
    p = A.shape[-1]
    pad = -(-p // block) * block - p
    if pad == 0:
        return A
    return jnp.block([
        [A, jnp.zeros((p, pad), A.dtype)],
        [jnp.zeros((pad, p), A.dtype), jnp.eye(pad, dtype=A.dtype)],
    ])


def blocked_cholesky(A, block: int = _BLOCK, leaf: str = "auto"):
    """Lower Cholesky factor of symmetric PD A ((p, p), f32) via
    MXU-friendly blocked elimination. Matches `jnp.linalg.cholesky`
    to f32 roundoff; NaN-propagates on indefinite input (the jitter
    probes' failure test); differentiable by plain autodiff — but ONLY
    on inputs that factor (a NaN factor's VJP is poisoned; use
    blocked_cholesky_safe for conditionally-used factors).

    A must be SYMMETRIC (both triangles valid): the trailing update
    reads the full square. Callers in grid_solve symmetrize first.
    leaf: diagonal-block implementation, see _resolve_leaf.
    """
    p = A.shape[-1]
    if A.ndim != 2:
        raise ValueError("blocked_cholesky expects a single (p, p) matrix")
    if p <= block:
        return jnp.linalg.cholesky(A)
    L, _ = _elimination(_pad_to_blocks(A, block), block, sanitize=False,
                        leaf=_resolve_leaf(leaf))
    return L[:p, :p]


def blocked_solve_triangular(L, B, block: int = _BLOCK):
    """X = L^{-1} B for lower-triangular L (p, p) and B (p, c), via
    block forward substitution — the O(p^2 c) work becomes GEMMs
    (XLA:TPU's native trsm runs wide-RHS solves at ~1 Tf/s; this is the
    posterior-chunk companion of blocked_cholesky).

      X_k = L_kk^{-1} (B_k - L[k, :k] @ X[:k])

    with the nb diagonal-block inverses computed once as a BATCHED
    small trsm. Differentiable by plain autodiff (GEMM VJPs + small
    solves). Exact for well-conditioned diagonal blocks — the grid
    solver's factors are jitter-laddered SPD, so L's diagonal blocks
    are benign."""
    p = L.shape[0]
    if B.ndim != 2 or L.shape != (p, p) or B.shape[0] != p:
        raise ValueError("blocked_solve_triangular expects L (p,p), B (p,c)")
    if p <= block:
        return jax.scipy.linalg.solve_triangular(L, B, lower=True)
    b = block
    nb = -(-p // b)
    pp = nb * b
    if pp != p:
        # identity-tail pad: the padded rows solve to B's zero-padding
        L = _pad_to_blocks(L, block)
        B = jnp.pad(B, ((0, pp - p), (0, 0)))
    eye_b = jnp.eye(b, dtype=L.dtype)
    diags = jnp.stack([L[k * b:(k + 1) * b, k * b:(k + 1) * b]
                       for k in range(nb)])
    Linvs = jax.vmap(
        lambda d: jax.scipy.linalg.solve_triangular(d, eye_b, lower=True)
    )(diags)
    xs = []
    for k in range(nb):
        rhs = B[k * b:(k + 1) * b]
        if k > 0:
            Xtop = jnp.concatenate(xs, axis=0)  # (k*b, c)
            rhs = rhs - jnp.matmul(L[k * b:(k + 1) * b, :k * b], Xtop,
                                   precision=_HI,
                                   preferred_element_type=L.dtype)
        xs.append(jnp.matmul(Linvs[k], rhs, precision=_HI,
                             preferred_element_type=L.dtype))
    X = jnp.concatenate(xs, axis=0)
    return X[:p] if pp != p else X


def blocked_cholesky_safe(A, block: int = _BLOCK, leaf: str = "auto"):
    """(L, ok): like blocked_cholesky, but with FINITE primals always.

    ok=True  -> L is the exact factor (identical to blocked_cholesky).
    ok=False -> A (or a Schur complement of it) is indefinite; L is
                finite garbage and the caller must discard it — but its
                VJP stays finite, so it is safe to compute L eagerly
                and select it with lax.cond (the grid solver's
                fallback fast path).

    Costs one extra stop-gradient detect-chol per diagonal block over
    the raw version; the O(p^3) GEMM work is identical."""
    p = A.shape[-1]
    if A.ndim != 2:
        raise ValueError("blocked_cholesky_safe expects a (p, p) matrix")
    if p <= block:
        Ldet = jnp.linalg.cholesky(jax.lax.stop_gradient(A))
        ok = jnp.all(jnp.isfinite(Ldet))
        A_safe = jnp.where(ok, A, jnp.eye(p, dtype=A.dtype))
        return jnp.linalg.cholesky(A_safe), ok
    L, ok = _elimination(_pad_to_blocks(A, block), block, sanitize=True,
                         leaf=_resolve_leaf(leaf))
    return L[:p, :p], ok
