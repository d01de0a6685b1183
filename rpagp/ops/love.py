"""LOVE-style cached predictive (co)variances via a Lanczos cache.

TPU-native rebuild of GPyTorch's LOVE fast predictive variances
([G] gpytorch/models/exact_prediction_strategies.py +
gpytorch/utils/lanczos.py — unverified, SURVEY.md §2.2; algorithm from
Pleiss et al. 2018, "Constant-Time Predictive Distributions for GPs"):

Cache once after training:  A = K + s^2 I  ~=  Q T Q^T  from r Lanczos
iterations (Q (n, r) orthonormal, T (r, r) tridiagonal). Then every test
batch costs one cross-kernel MVM instead of a CG solve per test point:

  var*(X*)  ~=  k**_diag  -  rowsum( (K* Q) T^{-1} (K* Q)^T )

Lanczos runs as a lax.scan with FULL reorthogonalization (r is small,
n x r matmuls are MXU food; numerically this is what keeps Q^T Q = I in
f32). The start vector is y-centered — the Krylov space that matters for
the posterior is exactly the one CG explores for the mean solve.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


class LoveCache(NamedTuple):
    Q: jax.Array  # (n, r) orthonormal Lanczos basis of A
    T_chol: jax.Array  # (r, r) Cholesky of the (SPD) tridiagonal T
    alpha: jax.Array  # (n,) mean cache A^{-1} y_c
    noise: jax.Array  # ()


def lanczos(A_mvm: Callable, v0, rank: int, restart_key=None, rsum=None,
            fresh=None):
    """Lanczos tridiagonalization of the SPD operator A with full
    reorthogonalization and BREAKDOWN RESTARTS. Returns (Q (n, r), T (r, r)).

    Kernel matrices have fast-decaying spectra, so in f32 the Krylov space
    frequently exhausts (beta -> 0) well before `rank` iterations. On
    breakdown the next direction restarts from a fresh pseudo-random
    vector orthogonalized against everything built — block-Lanczos
    behavior; the connecting beta is set to 0 so T stays faithful.

    SPMD support (parallel/sharding.distributed_posterior): when v0 holds
    only the LOCAL rows of a row-sharded vector, pass `rsum` (the psum
    over the data axis) so every row-space contraction (Q^T v, q·v,
    norms) reduces globally, and pass `fresh` as the (rank, n_local)
    local slice of a GLOBALLY CONSISTENT random table (each device must
    see the same global restart vectors). Q comes back row-local; T is
    replicated (built from reduced scalars only).
    """
    n = v0.shape[0]
    if rsum is None:
        rsum = lambda s: s
    nrm = lambda v: jnp.sqrt(rsum(jnp.sum(v * v)))
    q0 = v0 / nrm(v0)
    if fresh is None:
        if restart_key is None:
            restart_key = jax.random.key(0)
        fresh = jax.random.normal(restart_key, (rank, n), v0.dtype)

    def orth(Q, v):
        v = v - Q @ rsum(Q.T @ v)
        return v - Q @ rsum(Q.T @ v)  # twice is enough (Parlett)

    def step(carry, i):
        Q, q, beta_prev, q_prev = carry
        v = A_mvm(q[:, None])[:, 0]
        alpha = rsum(q @ v)
        v = v - alpha * q - beta_prev * q_prev
        # full reorth against everything built so far (cols >= i are zero,
        # so using all of Q is shape-static AND correct)
        Qi = Q.at[:, i].set(q)
        v = orth(Qi, v)
        beta = nrm(v)
        broke = beta < 1e-6
        # restart direction: fresh vector orthogonal to the whole basis
        r = orth(Qi, fresh[i])
        r = r / jnp.maximum(nrm(r), 1e-20)
        q_next = jnp.where(broke, r, v / jnp.where(broke, 1.0, beta))
        beta_out = jnp.where(broke, 0.0, beta)
        return (Qi, q_next, beta_out, q), (alpha, beta_out)

    Q0 = jnp.zeros((n, rank), v0.dtype)
    (Q, _, _, _), (alphas, betas) = jax.lax.scan(
        step, (Q0, q0, jnp.asarray(0.0, v0.dtype), jnp.zeros_like(q0)),
        jnp.arange(rank),
    )
    T = (
        jnp.diag(alphas)
        + jnp.diag(betas[:-1], 1)
        + jnp.diag(betas[:-1], -1)
    )
    return Q, T


def build_love_cache(A_mvm: Callable, y_centered, noise, rank: int,
                     alpha=None, rsum=None, fresh=None) -> LoveCache:
    """Lanczos cache + mean cache. `alpha` (A^{-1} y_c) may be passed in
    if already computed by the CG mean solve. rsum/fresh: see `lanczos`
    (SPMD row-sharded mode; Q and alpha come back row-local)."""
    Q, T = lanczos(A_mvm, y_centered, rank, rsum=rsum, fresh=fresh)
    # T is similar to A restricted to the Krylov space — SPD; jitter for f32
    T = T + 1e-6 * jnp.eye(T.shape[0], dtype=T.dtype)
    T_chol = jax.lax.linalg.cholesky(T)
    if alpha is None:
        # A^{-1} y ~= Q T^{-1} Q^T y (exact when Lanczos ran to grade)
        qty = Q.T @ y_centered if rsum is None else rsum(Q.T @ y_centered)
        alpha = Q @ jax.scipy.linalg.cho_solve((T_chol, True), qty)
    return LoveCache(Q=Q, T_chol=T_chol, alpha=alpha, noise=noise)


def love_covariance(cache: LoveCache, K_star_Q, K_star_star):
    """FULL posterior covariance of a test batch from the cache:

        cov ~= K** - (K* Q) T^{-1} (K* Q)^T = K** - w^T w,
        w = T_chol^{-1} (K* Q)^T

    (Pleiss et al. 2018 §3.2; [G] exact_prediction_strategies.py LOVE
    covar). K_star_Q: (n_test, r); K_star_star: (n_test, n_test) prior
    test block. Latent covariance (no observation noise)."""
    w = jax.lax.linalg.triangular_solve(
        cache.T_chol, K_star_Q.T, left_side=True, lower=True
    )  # (r, n_test)
    cov = K_star_star - jnp.matmul(w.T, w, precision=_HI)
    return 0.5 * (cov + cov.T)


def love_variance(cache: LoveCache, K_star_Q, k_diag_star,
                  observation_noise: bool = True):
    """Predictive variance from the cache.

    K_star_Q: (n_test, r) = K(x_test, x_train) @ Q — ONE cross-kernel MVM
    per test batch; k_diag_star: (n_test,) prior diagonal.
    """
    w = jax.lax.linalg.triangular_solve(
        cache.T_chol, K_star_Q.T, left_side=True, lower=True
    )  # (r, n_test)
    var = k_diag_star - jnp.sum(w * w, axis=0)
    var = jnp.maximum(var, 1e-10)
    if observation_noise:
        var = var + cache.noise
    return var
