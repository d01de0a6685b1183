"""Distributional sanity of the projection sampler (reference analog:
[U] tests for rp.gen_rp — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpagp.projections import gen_rp, space_equally, DISTRIBUTIONS


@pytest.mark.parametrize("dist", DISTRIBUTIONS)
def test_shapes(dist):
    P = gen_rp(jax.random.key(0), 7, 13, dist)
    assert P.shape == (7, 13)
    assert jnp.all(jnp.isfinite(P))


def test_gaussian_unit_expected_norm():
    P = gen_rp(jax.random.key(1), 50, 2000, "gaussian")
    norms = jnp.sum(P**2, axis=0)
    assert abs(float(norms.mean()) - 1.0) < 0.05


def test_sphere_exact_unit_norm():
    P = gen_rp(jax.random.key(2), 9, 64, "sphere")
    np.testing.assert_allclose(np.linalg.norm(P, axis=0), 1.0, rtol=1e-5)


def test_rademacher_values():
    D = 16
    P = gen_rp(jax.random.key(3), D, 32, "rademacher")
    vals = np.unique(np.round(np.abs(np.asarray(P)) * np.sqrt(D), 5))
    np.testing.assert_allclose(vals, [1.0], atol=1e-5)


def test_uniform_bounds():
    D = 8
    P = gen_rp(jax.random.key(4), D, 100, "uniform")
    lim = np.sqrt(3.0 / D) + 1e-6
    assert float(jnp.max(jnp.abs(P))) <= lim


def test_reproducible():
    a = gen_rp(jax.random.key(7), 5, 6, "gaussian")
    b = gen_rp(jax.random.key(7), 5, 6, "gaussian")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_space_equally_reduces_coherence():
    P = gen_rp(jax.random.key(5), 4, 6, "gaussian")
    Pn = P / jnp.linalg.norm(P, axis=0, keepdims=True)
    G0 = Pn.T @ Pn
    before = float(jnp.sum((G0 - jnp.eye(6) * jnp.diagonal(G0)) ** 2))
    Q, after = space_equally(P)
    np.testing.assert_allclose(np.linalg.norm(Q, axis=0), 1.0, rtol=1e-4)
    assert float(after) < before


def test_axes_identity_cycling():
    """axes = deterministic standard basis vectors, cycling past M > D —
    the classic additive-GP baseline (paper §5) as a projection dist."""
    P = gen_rp(jax.random.key(0), 4, 6, "axes")
    want = np.eye(4)[:, [0, 1, 2, 3, 0, 1]]
    np.testing.assert_array_equal(np.asarray(P), want)
    # key-independent
    P2 = gen_rp(jax.random.key(99), 4, 6, "axes")
    np.testing.assert_array_equal(np.asarray(P), np.asarray(P2))
