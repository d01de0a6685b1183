"""BBMM-style batched preconditioned conjugate gradients.

TPU-native rebuild of GPyTorch's mBCG ([G] gpytorch/utils/linear_cg.py —
unverified, SURVEY.md §2.2; algorithm from arXiv:1809.11165): ONE batched
CG run solves A X = B for all right-hand sides at once (y plus all probe
vectors), and the modified-CG recurrences simultaneously emit the Lanczos
tridiagonal coefficients that stochastic Lanczos quadrature turns into a
logdet estimate.

Two variants:
  * batched_pcg       — fixed iteration count via lax.scan, collects
                        (alpha, beta) per column for the tridiagonals.
                        This is the MLL path: fixed shapes, zero host sync,
                        fully differentiable-free (wrapped in custom_vjp
                        upstream).
  * batched_pcg_while — lax.while_loop with residual-norm early exit and
                        NO tridiag collection: the posterior-solve path,
                        where convergence usually lands well before
                        max_iters.

Numerical guards: converged columns get their updates frozen by a mask
(alpha/beta forced to 0) — division guards use a tiny epsilon, and the
tridiagonal entries for frozen iterations are patched to extend T with
decoupled unit eigenvalues (offdiag 0), which contribute nothing to
e1^T log(T) e1.

BEST-ITERATE TRACKING: at condition numbers ~1e8 (noise trained to its
floor at large n — the near-interpolation regime) f32 CG does not just
stall, it DIVERGES (measured relres 119 after 80 iters at n=20k; the
returned "solution" exploded the posterior mean by 1e3 on z-scored
targets). Both variants therefore return the iterate with the SMALLEST
relative residual seen per column — identical to the final iterate
whenever CG behaves, and a bounded best-effort solve when it doesn't.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

_EPS = 1e-20


class CGResult(NamedTuple):
    solution: jax.Array  # (n, t)
    alphas: jax.Array  # (iters, t) CG step sizes
    betas: jax.Array  # (iters, t) CG direction updates
    residual_norm: jax.Array  # (t,) final relative residual norms
    iterations: jax.Array  # () iterations actually useful (while variant)


def batched_pcg(
    A_mvm: Callable,
    B,
    M_inv: Optional[Callable] = None,
    max_iters: int = 100,
    tol: float = 1e-2,
):
    """Fixed-shape batched PCG via lax.scan; returns solves + (alpha, beta).

    A_mvm: (n, t) -> (n, t) linear operator (ONE batched kernel MVM per
    iteration — the hot loop of the whole framework, SURVEY.md §3.2).
    M_inv: preconditioner application (identity if None).
    tol: relative residual threshold used only for the convergence MASK
    (frozen columns stop updating; the scan itself runs max_iters — static
    shape, no host sync).
    """
    if M_inv is None:
        M_inv = lambda r: r

    b_norm = jnp.linalg.norm(B, axis=0)
    b_norm = jnp.where(b_norm < _EPS, 1.0, b_norm)

    X0 = jnp.zeros_like(B)
    R0 = B
    Z0 = M_inv(R0)
    P0 = Z0
    rz0 = jnp.sum(R0 * Z0, axis=0)

    def step(carry, _):
        X, R, Z, P, rz, resid, X_best, r_best = carry
        active = resid > tol  # (t,) columns still converging

        V = A_mvm(P)  # (n, t)  <-- the one kernel MVM
        pv = jnp.sum(P * V, axis=0)
        alpha = rz / jnp.where(jnp.abs(pv) < _EPS, _EPS, pv)
        alpha = jnp.where(active, alpha, 0.0)

        X = X + alpha * P
        R_new = R - alpha * V
        Z_new = M_inv(R_new)
        rz_new = jnp.sum(R_new * Z_new, axis=0)
        beta = rz_new / jnp.where(jnp.abs(rz) < _EPS, _EPS, rz)
        beta = jnp.where(active, beta, 0.0)
        P = Z_new + beta * P
        # best-iterate tracking (see module docstring); the carried resid
        # doubles as next step's convergence mask (one norm per iter)
        resid_new = jnp.linalg.norm(R_new, axis=0) / b_norm
        better = resid_new < r_best
        X_best = jnp.where(better[None, :], X, X_best)
        r_best = jnp.where(better, resid_new, r_best)
        return (X, R_new, Z_new, P, rz_new, resid_new, X_best, r_best), (alpha, beta)

    ones = jnp.ones((B.shape[1],), B.dtype)
    (_, _, _, _, _, _, X_best, r_best), (alphas, betas) = jax.lax.scan(
        step, (X0, R0, Z0, P0, rz0, ones, X0, ones), None, length=max_iters
    )
    return CGResult(
        solution=X_best,
        alphas=alphas,
        betas=betas,
        residual_norm=r_best,
        iterations=jnp.asarray(max_iters),
    )


def batched_pcg_while(
    A_mvm: Callable,
    B,
    M_inv: Optional[Callable] = None,
    max_iters: int = 200,
    tol: float = 1e-2,
):
    """Early-exit batched PCG (lax.while_loop) for posterior solves.

    Stops when every column's relative residual is below tol. State is
    fixed-shape; only the iteration count is dynamic — XLA-friendly.
    """
    if M_inv is None:
        M_inv = lambda r: r

    b_norm = jnp.linalg.norm(B, axis=0)
    b_norm = jnp.where(b_norm < _EPS, 1.0, b_norm)

    X0 = jnp.zeros_like(B)
    R0 = B
    Z0 = M_inv(R0)
    rz0 = jnp.sum(R0 * Z0, axis=0)

    def cond(state):
        i, X, R, Z, P, rz, resid, X_best, r_best = state
        return jnp.logical_and(i < max_iters, jnp.max(resid) > tol)

    def body(state):
        i, X, R, Z, P, rz, _, X_best, r_best = state
        V = A_mvm(P)
        pv = jnp.sum(P * V, axis=0)
        alpha = rz / jnp.where(jnp.abs(pv) < _EPS, _EPS, pv)
        X = X + alpha * P
        R = R - alpha * V
        Z = M_inv(R)
        rz_new = jnp.sum(R * Z, axis=0)
        beta = rz_new / jnp.where(jnp.abs(rz) < _EPS, _EPS, rz)
        P = Z + beta * P
        resid = jnp.linalg.norm(R, axis=0) / b_norm
        better = resid < r_best
        X_best = jnp.where(better[None, :], X, X_best)
        r_best = jnp.where(better, resid, r_best)
        return (i + 1, X, R, Z, P, rz_new, resid, X_best, r_best)

    ones = jnp.ones((B.shape[1],), B.dtype)
    i, _, _, _, _, _, _, X_best, r_best = jax.lax.while_loop(
        cond, body, (0, X0, R0, Z0, Z0, rz0, ones, X0, ones)
    )
    return CGResult(
        solution=X_best,
        alphas=jnp.zeros((0, B.shape[1]), B.dtype),
        betas=jnp.zeros((0, B.shape[1]), B.dtype),
        residual_norm=r_best,
        iterations=i,
    )


def lanczos_tridiags_from_cg(alphas, betas):
    """CG (alpha, beta) recurrences -> symmetric Lanczos tridiagonals.

    T[j]: diag_i  = 1/alpha_i + beta_{i-1}/alpha_{i-1}
          offd_i  = sqrt(beta_i) / alpha_i
    (arXiv:1809.11165 eq. 5 / [G] gpytorch/utils/linear_cg.py's
    "tridiagonalization from CG coefficients").

    Frozen iterations (alpha == 0 from the convergence mask) are patched to
    diag = 1, offdiag = 0: the appended rows are decoupled unit eigenvalues
    with zero weight in e1^T f(T) e1, leaving the quadrature unchanged.

    alphas/betas: (m, t). Returns (t, m, m) dense tridiagonal batch (m is
    small — cg_max_iters — so dense + eigh is the TPU-friendly move).
    """
    m, t = alphas.shape
    frozen = alphas == 0.0
    safe_alpha = jnp.where(frozen, 1.0, alphas)
    inv_alpha = 1.0 / safe_alpha  # (m, t)

    prev_frozen = jnp.concatenate([jnp.ones((1, t), bool), frozen[:-1]], axis=0)
    prev_ratio = jnp.concatenate(
        [jnp.zeros((1, t), alphas.dtype), (betas / safe_alpha)[:-1]], axis=0
    )
    prev_ratio = jnp.where(prev_frozen, 0.0, prev_ratio)

    diag = jnp.where(frozen, 1.0, inv_alpha + prev_ratio)  # (m, t)
    offd = jnp.where(
        frozen[:-1] | frozen[1:],
        0.0,
        jnp.sqrt(jnp.maximum(betas[:-1], 0.0)) * inv_alpha[:-1],
    )  # (m-1, t)

    T = jnp.zeros((t, m, m), alphas.dtype)
    ii = jnp.arange(m)
    T = T.at[:, ii, ii].set(diag.T)
    jj = jnp.arange(m - 1)
    T = T.at[:, jj, jj + 1].set(offd.T)
    T = T.at[:, jj + 1, jj].set(offd.T)
    return T
