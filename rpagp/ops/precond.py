"""Pivoted-Cholesky preconditioner (rank-k) + Woodbury application.

TPU-native rebuild of GPyTorch's preconditioner
([G] gpytorch/utils/pivoted_cholesky.py — unverified, SURVEY.md §2.2;
algorithm from "Preconditioning Kernel Matrices", arXiv:1602.06693).

The preconditioner is M = L_k L_k^T + noise*I where L_k is a rank-k
partial pivoted Cholesky of the kernel matrix K. Greedy diagonal pivoting
is inherently sequential, but k is small (~15) and each step is O(n*J)
work, so a `lax.fori_loop` with dynamic slicing is cheap; the kernel row
at the pivot is ONE row-Gram evaluation (no n x n materialization ever).

Application M^{-1} r uses the Woodbury identity through a k x k Cholesky:
  M^{-1} r = (r - L (noise I_k + L^T L)^{-1} L^T r) / noise
and logdet(M) comes from the matrix determinant lemma — both exact.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import kernels
from .kernels import KernelSpec

_HI = jax.lax.Precision.HIGHEST


class Preconditioner(NamedTuple):
    """Rank-k pivoted-Cholesky preconditioner M = L L^T + noise I."""

    L: jax.Array  # (n, k) partial Cholesky factor
    noise: jax.Array  # () likelihood noise
    chol_small: jax.Array  # (k, k) chol(noise I_k + L^T L), lower
    logdet: jax.Array  # () logdet(M), exact


def pivoted_cholesky(spec: KernelSpec, kparams, kbuffers, x, rank: int,
                     jitter: float = 1e-8):
    """Greedy rank-`rank` pivoted Cholesky of K(x, x) without forming K.

    Returns L (n, rank) with K ~= L L^T (best greedy rank-k approximation
    under the trace norm). Data-dependent pivoting runs in a fori_loop
    with fixed shapes: the pivot is argmax of the residual diagonal, the
    pivot row of K is one (1, n) Gram evaluation.
    """
    n = x.shape[0]
    d0 = kernels.gram_diag(spec, kparams, kbuffers, x)  # (n,)
    L0 = jnp.zeros((n, rank), x.dtype)

    def body(i, carry):
        L, d = carry
        p = jnp.argmax(d)
        xp = jax.lax.dynamic_slice_in_dim(x, p, 1, axis=0)  # (1, D)
        row = kernels.gram(spec, kparams, kbuffers, xp, x)[0]  # (n,)
        # Schur complement against the columns already built (cols >= i are
        # zero, so using the full L is shape-static AND correct).
        lp = jax.lax.dynamic_slice_in_dim(L, p, 1, axis=0)[0]  # (rank,)
        row = row - jnp.matmul(L, lp, precision=_HI)
        dp = jnp.maximum(d[p], jitter)
        li = row / jnp.sqrt(dp)
        # exact value at the pivot so d[p] -> 0 after the update
        li = li.at[p].set(jnp.sqrt(dp))
        d = jnp.maximum(d - li * li, 0.0)
        d = d.at[p].set(0.0)
        L = L.at[:, i].set(li)
        return L, d

    L, _ = jax.lax.fori_loop(0, rank, body, (L0, d0))
    return L


def build_preconditioner(spec: KernelSpec, kparams, kbuffers, x, noise,
                         rank: int) -> Preconditioner:
    """Pivoted Cholesky + the small-system factorization for Woodbury."""
    n = x.shape[0]
    L = pivoted_cholesky(spec, kparams, kbuffers, x, rank)
    k = L.shape[1]
    small = noise * jnp.eye(k, dtype=L.dtype) + jnp.matmul(L.T, L, precision=_HI)
    C = jax.lax.linalg.cholesky(small)
    # logdet(LL^T + noise I_n) = logdet(noise I_k + L^T L) - k log noise
    #                            + n log noise        (determinant lemma)
    logdet = (
        2.0 * jnp.sum(jnp.log(jnp.diagonal(C)))
        - k * jnp.log(noise)
        + n * jnp.log(noise)
    )
    return Preconditioner(L=L, noise=noise, chol_small=C, logdet=logdet)


def apply_inverse(pre: Preconditioner, R):
    """M^{-1} R for R (n, t) — Woodbury through the k x k Cholesky."""
    u = jnp.matmul(pre.L.T, R, precision=_HI)  # (k, t)
    w = jax.scipy.linalg.cho_solve((pre.chol_small, True), u)
    return (R - jnp.matmul(pre.L, w, precision=_HI)) / pre.noise


def sample_probes(pre: Preconditioner, key, n: int, num_probes: int, dtype):
    """Probes z ~ N(0, M): z = L e1 + sqrt(noise) e2 (BBMM/SLQ convention —
    probes carry the preconditioner's covariance so the SLQ estimate
    telescopes: logdet(A) = logdet(M) + E_z[. ] — arXiv:1809.11165 §3.2)."""
    k1, k2 = jax.random.split(key)
    e1 = jax.random.normal(k1, (pre.L.shape[1], num_probes), dtype)
    e2 = jax.random.normal(k2, (n, num_probes), dtype)
    return jnp.matmul(pre.L, e1, precision=_HI) + jnp.sqrt(pre.noise) * e2
