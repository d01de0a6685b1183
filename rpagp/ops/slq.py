"""Stochastic Lanczos quadrature log-determinant.

TPU-native rebuild of GPyTorch's SLQ ([G] gpytorch/utils/stochastic_lq.py,
lanczos.py — unverified, SURVEY.md §2.2; algorithm from "Scalable Log
Determinants for Gaussian Process Kernel Learning", arXiv:1711.03481):

  logdet(A) ~= logdet(M) + (1/t) sum_i (z_i^T M^{-1} z_i) * e1^T log(T_i) e1

where z_i ~ N(0, M) are the probe vectors, T_i are the Lanczos
tridiagonals emitted by preconditioned CG on A z = z_i, and M is the
pivoted-Cholesky preconditioner. The tridiagonals are tiny
(num_probes x max_iters x max_iters), so a batched `jnp.linalg.eigh` on
device is the right TPU move — no host round-trip, no custom
tridiagonal eigensolver.
"""

from __future__ import annotations

import jax.numpy as jnp


def slq_logdet_from_tridiags(T, probe_sq_norms, precond_logdet=0.0,
                             eig_floor: float = 1e-10):
    """Quadrature the tridiagonal batch into a logdet estimate.

    T: (t, m, m) symmetric tridiagonals from cg.lanczos_tridiags_from_cg.
    probe_sq_norms: (t,) values z_i^T M^{-1} z_i (== ||z_tilde||^2, the
    norm of the whitened probe the Lanczos process implicitly starts from).
    precond_logdet: exact logdet(M) from the determinant lemma.
    """
    evals, evecs = jnp.linalg.eigh(T)  # (t, m), (t, m, m)
    evals = jnp.maximum(evals, eig_floor)  # T is similar to an SPD matrix
    w = evecs[:, 0, :] ** 2  # e1-weights per eigenpair, (t, m)
    quad = jnp.sum(w * jnp.log(evals), axis=-1)  # (t,)
    return precond_logdet + jnp.mean(probe_sq_norms * quad)
