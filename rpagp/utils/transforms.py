"""Raw <-> constrained hyperparameter transforms.

TPU-native replacement for GPyTorch's constraint machinery
(reference dep: [G] gpytorch/constraints/constraints.py — Positive/softplus).
GPyTorch stores every positive hyperparameter (lengthscale, outputscale,
noise) as an unconstrained "raw" value and maps it through softplus; raw
init 0.0 gives the familiar 0.6931 default. We keep the same convention so
hyperparameter values round-trip 1:1 with the reference.

All functions are elementwise jnp ops — they fuse into adjacent kernels
under XLA, so there is no reason for anything fancier.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Softplus with the same saturation behavior torch uses (linear above ~20)
# to avoid overflow in exp for large raw values.
_THRESHOLD = 20.0


def softplus(raw):
    """Numerically stable softplus: log(1 + exp(x)), linear for x > 20."""
    return jnp.where(
        raw > _THRESHOLD,
        raw,
        jnp.log1p(jnp.exp(jnp.minimum(raw, _THRESHOLD))),
    )


def inv_softplus(value):
    """Inverse of softplus: x = log(exp(y) - 1), identity for y > 20."""
    value = jnp.asarray(value)
    return jnp.where(
        value > _THRESHOLD,
        value,
        jnp.log(jnp.expm1(jnp.minimum(value, _THRESHOLD))),
    )


def inv_softplus_np(value):
    """Numpy version for parameter initialization (host-side)."""
    value = np.asarray(value, dtype=np.float64)
    out = np.where(value > _THRESHOLD, value, np.log(np.expm1(np.minimum(value, _THRESHOLD))))
    return out


def constrain(raw):
    """Raw -> positive constrained value (softplus)."""
    return softplus(raw)


def unconstrain(value):
    """Positive constrained value -> raw (inverse softplus)."""
    return inv_softplus(value)
