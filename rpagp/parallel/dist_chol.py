"""Distributed blocked Cholesky: the p x p grid factor across the mesh.

The exact grid-space solver's p x p factor (ops/grid_solve.py) is the
one piece of the distributed training step that REPLICATES on every
device (parallel/sharding.distributed_grid_mll) — it caps strong
scaling once the n-proportional interpolation work is sharded, and at
p >~ 10k (e.g. protein at m=512, p = J*512) the replicated O(p^3)
dominates the step outright.

This module runs ops/block_chol.py's blocked elimination with the
trailing-update GEMMs ROW-BANDED over the mesh's data axis:

  - every device owns a contiguous (p/ndev, p) row band of the working
    matrix (sliced from the replicated C at entry);
  - per block step k (python-unrolled, static): the owning device's
    b x b diagonal block is shared by a masked psum (b^2 traffic), every
    device factors it redundantly (ops/block_chol._diag_factor — XLA or
    the Pallas leaf), computes its band's panel rows as one GEMM against
    L_kk^{-1}, and the column block is assembled replicated by ONE
    (p, b) psum;
  - each device then downdates only its OWN band's live columns:
    per-device trailing flops are p^3/(2*ndev) vs p^3/3 replicated,
    and ICI traffic totals p^2 * 4 B per factorization (~100 MB at
    p = 5120 — about 1 ms of ICI; n-independent).

The per-row arithmetic is IDENTICAL to the single-chip blocked factor
(same block order, same GEMM contractions; the psums merge disjoint
zero-padded bands, which is exact), so the distributed factor matches
blocked_cholesky digit-for-digit — the same trajectory-parity stance as
distributed_grid_mll.

Layout constraint: block must divide the per-device band (p is padded
to a multiple of ndev*block with an identity tail), so every diagonal
block has exactly ONE owner and all slice offsets are static.

Differentiation is plain autodiff through the shard_map'd graph (GEMM
VJPs, psum transposes); callers keep the pmean-over-data-axis gradient
contract of distributed_grid_mll.

Reference analog: none — the reference never factors a p x p grid
matrix (SURVEY.md §3.2 runs BBMM CG); distributing the factor is the
TPU-first answer to its absence of any distributed linear algebra.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.block_chol import _diag_factor, _resolve_leaf

_HI = jax.lax.Precision.HIGHEST


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _grad_pmean(x, axis):
    """Identity forward; pmean over `axis` backward — gradient hygiene
    for the banded factor's REPLICATED input.

    Without it each device's C-cotangent is ~ndev x its own band
    (the band slices/psum transposes scatter the adjoint), so every
    downstream parameter gradient is a mesh-mean of O(ndev)-larger
    device-varying terms — measured +-40 per-device lengthscale grads
    cancelling to a mean of ~1.5, i.e. ~1e-3 relative f32 cancellation
    noise in every step's gradient. The backward pmean re-replicates
    the TRUE cotangent on every device (one (p, p) collective per
    factor), restoring the grid solver's exact-gradient story."""
    return x


def _grad_pmean_fwd(x, axis):
    return x, None


def _grad_pmean_bwd(axis, _, ct):
    return (jax.lax.pmean(ct, axis),)


_grad_pmean.defvjp(_grad_pmean_fwd, _grad_pmean_bwd)


def _pad_replicated(C, p_pad):
    """Identity-tail pad of the replicated (p, p) matrix (exact:
    chol(blockdiag(C, I)) = blockdiag(chol(C), I))."""
    p = C.shape[-1]
    pad = p_pad - p
    if pad == 0:
        return C
    return jnp.block([
        [C, jnp.zeros((p, pad), C.dtype)],
        [jnp.zeros((pad, p), C.dtype), jnp.eye(pad, dtype=C.dtype)],
    ])


def distributed_blocked_cholesky(C, axis: str, block: int = 128,
                                 leaf: str = "auto", sanitize: bool = False):
    """(L, ok) — replicated lower Cholesky factor of the REPLICATED
    symmetric (p, p) matrix C, with the O(p^3) work row-banded over
    `axis`. Runs INSIDE shard_map.

    sanitize=False: NaN-propagating on indefinite input, ok stays True
    (the jitter probes test isfinite(L), exactly as blocked_cholesky).
    sanitize=True: finite primals always; failure returns ok=False
    (the blocked_cholesky_safe contract).

    Gradient-noise note (measured on the 8-CPU mesh): the factor's
    VALUE is digit-exact vs blocked_cholesky, and the _grad_pmean
    barrier makes the dominant C-level cotangent exact, but cotangent
    paths through the per-band panel consumption of L_kk^{-1} cross TWO
    psum transposes (check_vma=False re-psums at each), leaving
    ~2.5e-4 relative noise in upstream parameter gradients when the
    banded factor is engaged — vs 1e-5 for the replicated factor and
    ~1e-2 for the BBMM probe estimator. Negligible for Adam at the
    p >= 8192 scales where banding auto-engages; a closed-form
    distributed chol-VJP (banded trsm pair) would remove it if exact
    banded gradients are ever needed.
    """
    p = C.shape[-1]
    if C.ndim != 2:
        raise ValueError("expected a replicated (p, p) matrix")
    C = _grad_pmean(C, axis)  # see _grad_pmean: uniform exact cotangent
    ndev = jax.lax.axis_size(axis)
    d = jax.lax.axis_index(axis)
    step = ndev * block
    p_pad = -(-p // step) * step
    nb = p_pad // block
    p_loc = p_pad // ndev
    bpd = p_loc // block  # blocks per device
    leaf = _resolve_leaf(leaf)

    Cp = _pad_replicated(C, p_pad)
    # my row band: (p_loc, p_pad)
    T = jax.lax.dynamic_slice(Cp, (d * p_loc, 0), (p_loc, p_pad))
    grow = d * p_loc + jnp.arange(p_loc)  # global row index of my band

    cols = []
    ok = jnp.asarray(True)
    for k in range(nb):
        kb = k * block
        owner = k // bpd  # static: the one device whose band holds block k
        off = kb - owner * p_loc  # static offset inside the owner's band
        mine = (d == owner).astype(C.dtype)
        # share the diagonal block: masked contribution, b^2 psum
        cand = jax.lax.dynamic_slice(T, (off, kb), (block, block))
        Dblk = jax.lax.psum(mine * cand, axis)
        Lkk, Linv, okk = _diag_factor(Dblk, sanitize, leaf,
                                      need_linv=True)
        ok = ok & okk
        # my band's panel rows (only rows strictly below the block live)
        live = (grow >= kb + block).astype(C.dtype)[:, None]  # (p_loc, 1)
        colsk = jax.lax.dynamic_slice(T, (0, kb), (p_loc, block))
        P = live * jnp.matmul(colsk, Linv.T, precision=_HI,
                              preferred_element_type=C.dtype)
        # assemble the replicated column block: band placement + diag rows
        place = jnp.zeros((p_pad, block), C.dtype)
        aug = P + mine * jax.lax.dynamic_update_slice(
            jnp.zeros_like(P), Lkk, (off, 0))
        place = jax.lax.dynamic_update_slice(place, aug, (d * p_loc, 0))
        Lcol = jax.lax.psum(place, axis)  # (p_pad, block)
        cols.append(Lcol)
        if k < nb - 1:
            # downdate my band's live columns with one GEMM
            Pfull = jax.lax.dynamic_slice(
                Lcol, (kb + block, 0), (p_pad - kb - block, block))
            upd = jnp.matmul(P, Pfull.T, precision=_HI,
                             preferred_element_type=C.dtype)
            T = jax.lax.dynamic_update_slice(
                T,
                jax.lax.dynamic_slice(T, (0, kb + block),
                                      (p_loc, p_pad - kb - block)) - upd,
                (0, kb + block))
    # column blocks already carry zeros above/below; exact lower triangle
    L = jnp.concatenate(cols, axis=1)
    L = jnp.tril(L)
    return L[:p, :p], ok


# C-chol fallback ladder, distributed: mirrors grid_solve's
# _chol_with_fallback_eps with the banded factor. Levels shared with the
# single-chip solver so escalation behavior is identical across scales.
def distributed_chol_with_fallback_eps(C, noise, axis: str,
                                       block: int = 128):
    """Minimal-jitter chol(C + c*noise I) with the DISTRIBUTED blocked
    factor; returns (L, eps_chosen). Runs INSIDE shard_map.

    Same stop-gradient ladder contract as grid_solve
    ._chol_with_fallback_eps: the fast path is one sanitize=True factor
    (finite primals, clean VJP under lax.cond); escalation probes
    stop-gradient values through a while_loop (one lowering), then
    re-factors differentiably at the chosen level."""
    from ..ops.grid_solve import _C_LEVELS

    p = C.shape[-1]
    eye = jnp.eye(p, dtype=C.dtype)
    Cs = jax.lax.stop_gradient(C)
    ns = jax.lax.stop_gradient(noise)
    levels = jnp.asarray(_C_LEVELS, C.dtype)
    nlev = len(_C_LEVELS)

    L0, ok0 = distributed_blocked_cholesky(C, axis, block=block,
                                           sanitize=True)

    def ladder(_):
        def cond(c):
            k, chosen, done = c
            return (k < nlev) & ~done

        def body(c):
            k, chosen, done = c
            e = ns * levels[k]
            L, _ = distributed_blocked_cholesky(Cs + e * eye, axis,
                                                block=block)
            okl = jnp.all(jnp.isfinite(L))
            chosen = jnp.where(okl & ~done, e, chosen)
            return k + 1, chosen, done | okl

        init = (jnp.asarray(1), ns * levels[-1], jnp.asarray(False))
        _, chosen, _ = jax.lax.while_loop(cond, body, init)
        Lf, _ = distributed_blocked_cholesky(C + chosen * eye, axis,
                                             block=block, sanitize=True)
        return Lf, chosen

    zero = jnp.zeros((), C.dtype)
    return jax.lax.cond(ok0, lambda _: (L0, zero), ladder, None)


def use_distributed_factor(p: int, ndev: int) -> bool:
    """Trace-time policy for banding the p x p grid factor.

    Default ("auto"): only when the mesh is real (ndev > 1) and p is in
    the regime where the REPLICATED O(p^3) factor dominates the step —
    the measured cliff is p ~ 10240 (protein at m=512: 8.5 s/iter
    replicated vs 1.5 s BBMM, docs/BENCHMARKS.md), so the threshold sits
    at 8192. Below it the replicated blocked factor is faster than the
    per-block psums. RPAGP_DIST_CHOL=1 forces on (tests/dryrun),
    =0 forces off."""
    import os

    env = os.environ.get("RPAGP_DIST_CHOL", "auto")
    if env == "0":
        return False
    if env == "1":
        return ndev > 1
    return ndev > 1 and p >= 8192
