"""Exact GP inference: Cholesky marginal log-likelihood and posterior.

TPU-native rebuild of the reference's small/medium-N path
([G] gpytorch/distributions/multivariate_normal.py log_prob +
[G] gpytorch/models/exact_prediction_strategies.py — unverified, SURVEY.md).
GPyTorch dispatches MVN.log_prob to a dense Cholesky below
`max_cholesky_size`; here that is the MXU-blocked Cholesky / blocked
triangular solve (ops/block_chol.py — XLA's native chol/trsm run at
~2 Tf/s on TPU; the blocked forms are pure GEMMs) above the block size
and `jax.lax.linalg.cholesky` below it, differentiated by plain
`jax.grad` — no custom autograd Function needed on this path.

All functions are pure; everything jits and grads end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .block_chol import blocked_cholesky, blocked_solve_triangular


LOG_2PI = 1.8378770664093453


def add_jitter(K, noise, jitter: float = 1e-6):
    """K + (noise + jitter) I — the likelihood's heteroskedastic-free case."""
    n = K.shape[-1]
    return K + (noise + jitter) * jnp.eye(n, dtype=K.dtype)


def cholesky_mll(K, y_centered, noise, jitter: float = 1e-6):
    """Exact marginal log-likelihood via Cholesky.

    mll = -1/2 [ y^T (K + s^2 I)^{-1} y + logdet(K + s^2 I) + n log 2pi ]

    Matches [G] gpytorch/mlls/exact_marginal_log_likelihood.py semantics but
    WITHOUT GPyTorch's division by n (we return the total, the trainer
    normalizes — same optimum either way).
    """
    n = y_centered.shape[0]
    Khat = add_jitter(K, noise, jitter)
    L = blocked_cholesky(Khat)
    alpha = jax.scipy.linalg.cho_solve((L, True), y_centered)
    inv_quad = y_centered @ alpha
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return -0.5 * (inv_quad + logdet + n * LOG_2PI)


def cholesky_posterior_cache(K_train, y_centered, noise, jitter: float = 1e-6):
    """Precompute (L, alpha) once per eval — the reference's mean cache
    ([G] exact_prediction_strategies.py caches K^{-1}(y - mu))."""
    Khat = add_jitter(K_train, noise, jitter)
    L = blocked_cholesky(Khat)
    alpha = jax.scipy.linalg.cho_solve((L, True), y_centered)
    return L, alpha


def posterior_from_cache(K_star, k_diag_star, L, alpha, noise=None):
    """Posterior mean/variance at test points from the (L, alpha) cache.

    K_star: (n_test, n_train) cross-covariance; k_diag_star: (n_test,) prior
    diagonal. Returns (mean_delta, var): mean_delta excludes the mean
    function's contribution (added by the model layer); var is the LATENT
    posterior variance — pass `noise` to add the likelihood's observation
    noise ([G] gpytorch/likelihoods/gaussian_likelihood.py marginal()).
    """
    mean = jnp.matmul(K_star, alpha, precision=jax.lax.Precision.HIGHEST)
    # v = L^{-1} K_star^T; var = k** - sum(v^2) — wide-RHS solve as GEMMs
    v = blocked_solve_triangular(L, K_star.T)
    var = k_diag_star - jnp.sum(v * v, axis=0)
    var = jnp.maximum(var, 1e-10)
    if noise is not None:
        var = var + noise
    return mean, var


def posterior_cov_from_cache(K_star, K_star_star, L, noise=None):
    """FULL posterior covariance at a test batch from the Cholesky cache:

        cov = K** - K* (K + s^2 I)^{-1} K*^T = K** - v^T v,  v = L^{-1} K*^T

    ([G] exact_prediction_strategies.py exact_predictive_covar —
    unverified, SURVEY.md §3.3). Returns the LATENT covariance;
    `noise` adds the likelihood's observation noise on the diagonal.
    """
    v = blocked_solve_triangular(L, K_star.T)
    cov = K_star_star - jnp.matmul(
        v.T, v, precision=jax.lax.Precision.HIGHEST
    )
    cov = 0.5 * (cov + cov.T)  # symmetrize f32 roundoff
    if noise is not None:
        cov = cov + noise * jnp.eye(cov.shape[0], dtype=cov.dtype)
    return cov


def mvn_sample(key, mean, cov, num_samples: int, jitter: float = 1e-6):
    """Draw (num_samples, n) from N(mean, cov) via a jittered Cholesky."""
    n = mean.shape[0]
    L = jax.lax.linalg.cholesky(
        cov + jitter * jnp.eye(n, dtype=cov.dtype)
    )
    eps = jax.random.normal(key, (num_samples, n), mean.dtype)
    return mean[None, :] + jnp.matmul(
        eps, L.T, precision=jax.lax.Precision.HIGHEST
    )


def gaussian_nll(y_true, mean, var):
    """Average predictive negative log-likelihood (the reference's NLL
    metric column — [U] gp_experiment_runner.py CSV)."""
    return 0.5 * jnp.mean(jnp.log(2.0 * jnp.pi * var) + (y_true - mean) ** 2 / var)
