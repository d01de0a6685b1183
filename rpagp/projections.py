"""Random projection generation for RPA-GP.

TPU-native rebuild of the reference's projection sampler
(reference: [U] rp.py — `gen_rp(D, k, dist)`; unverified path, see SURVEY.md
provenance note). Distributions follow the RPA-GP paper (arXiv:1912.12834):
Gaussian entries scaled so E||Px||^2 = ||x||^2 / D-style normalization,
rows uniform on the unit sphere, Rademacher (+-1)/sqrt(D), and uniform.

Uses jax.random (threefry) with explicit keys — the TPU-native replacement
for the reference's numpy/torch RNG; the same key always reproduces the same
projections, and the projection matrix is checkpointed with the model (the
projections *define* the kernel; they are fixed buffers, not trained,
unless `learn_proj` is set on the kernel config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DISTRIBUTIONS = ("gaussian", "sphere", "rademacher", "bernoulli", "uniform",
                 "axes")


def gen_rp(key, D: int, M: int, dist: str = "gaussian", dtype=jnp.float32):
    """Sample a random projection matrix P of shape (D, M).

    Columns of P are the individual 1-D projections (the reference stacks
    J*d of them); `x @ P` maps (n, D) -> (n, M) projected coordinates.

    dist:
      gaussian   — i.i.d. N(0, 1/D): E[||P_j||^2] = 1.
      sphere     — columns uniform on the unit sphere S^{D-1}.
      rademacher — +-1 / sqrt(D) (a.k.a. bernoulli in the reference).
      uniform    — U(-sqrt(3/D), sqrt(3/D)) (unit expected column norm).
      axes       — DETERMINISTIC standard basis vectors e_{j mod D}: the
                   classic axis-aligned additive GP (the paper's additive
                   baseline, arXiv:1912.12834 §5) as a projection choice;
                   with M = D every input dimension gets its own 1-D
                   component. key is unused.
    """
    if dist not in DISTRIBUTIONS:
        raise ValueError(f"unknown projection distribution {dist!r}; one of {DISTRIBUTIONS}")
    if dist == "gaussian":
        return jax.random.normal(key, (D, M), dtype) / jnp.sqrt(jnp.asarray(D, dtype))
    if dist == "sphere":
        g = jax.random.normal(key, (D, M), dtype)
        return g / jnp.linalg.norm(g, axis=0, keepdims=True)
    if dist == "axes":
        return jnp.eye(D, dtype=dtype)[:, jnp.arange(M) % D]
    if dist in ("rademacher", "bernoulli"):
        r = jax.random.rademacher(key, (D, M), dtype=jnp.int32).astype(dtype)
        return r / jnp.sqrt(jnp.asarray(D, dtype))
    # uniform
    lim = jnp.sqrt(jnp.asarray(3.0 / D, dtype))
    return jax.random.uniform(key, (D, M), dtype, minval=-lim, maxval=lim)


def space_equally(P, lr: float = 0.1, niter: int = 500):
    """Push projection directions apart to be (near-)equally spaced.

    Rebuild of the reference's `space_equally` ([U] rp.py): gradient descent
    on sum_{i<j} (p_i . p_j)^2 over unit-norm columns — minimizing pairwise
    coherence. Runs under jit via lax.fori_loop (fixed iteration count —
    XLA-friendly control flow instead of a Python convergence loop).

    Returns (P_spaced, final_coherence_loss).
    """
    P = P / jnp.linalg.norm(P, axis=0, keepdims=True)
    M = P.shape[1]
    eye = jnp.eye(M, dtype=P.dtype)

    def loss_fn(Q):
        G = Q.T @ Q
        off = G - eye * jnp.diagonal(G)
        return jnp.sum(off**2)

    grad_fn = jax.grad(loss_fn)

    def body(_, Q):
        Q = Q - lr * grad_fn(Q)
        return Q / jnp.linalg.norm(Q, axis=0, keepdims=True)

    Q = jax.lax.fori_loop(0, niter, body, P)
    return Q, loss_fn(Q)
