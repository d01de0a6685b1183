"""Full posterior covariance + sampling vs dense oracles
(reference analog: [G] exact_prediction_strategies.py predictive covar
and MultivariateNormal.rsample — SURVEY.md §3.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from rpagp import (KernelSpec, ModelSpec, init_model, posterior_cov,
                   sample_posterior)
from rpagp.models.exact_gp import noise_value, mean_fn, predict_cov
from rpagp.ops import iterative, kernels

KEY = jax.random.key(0)


def _setup(n=150, D=3, n_test=24, seed=6, **kw):
    kx, ky, kt = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(kx, (n, D))
    y = jnp.sin(2 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,))
    xt = jax.random.normal(kt, (n_test, D))
    kw.setdefault("kernel", KernelSpec.polynomial(J=5, d=1))
    spec = ModelSpec(**kw)
    params, buffers = init_model(KEY, spec, D)
    return spec, params, buffers, x, y, xt


def _dense_oracle(spec, params, buffers, x, y, xt):
    kp, kb = params["kernel"], buffers["kernel"]
    K = np.asarray(kernels.gram(spec.kernel, kp, kb, x, x), np.float64)
    Ks = np.asarray(kernels.gram(spec.kernel, kp, kb, xt, x), np.float64)
    Kss = np.asarray(kernels.gram(spec.kernel, kp, kb, xt, xt), np.float64)
    noise = float(noise_value(params))
    A = K + (noise + spec.jitter) * np.eye(K.shape[0])
    yc = np.asarray(y - mean_fn(spec, params, x), np.float64)
    Ainv = np.linalg.inv(A)
    mu = Ks @ Ainv @ yc + float(mean_fn(spec, params, xt)[0])
    cov = Kss - Ks @ Ainv @ Ks.T
    return mu, cov


def test_exact_predict_cov_matches_dense_oracle():
    spec, params, buffers, x, y, xt = _setup()
    mu, cov = predict_cov(spec, params, buffers, x, y, xt)
    mu_o, cov_o = _dense_oracle(spec, params, buffers, x, y, xt)
    np.testing.assert_allclose(np.asarray(mu), mu_o, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cov), cov_o, atol=3e-4)


def test_iterative_cov_love_matches_exact():
    spec, params, buffers, x, y, xt = _setup(
        n=200, cg_max_iters=100, cg_tol=1e-8, precond_rank=10,
        love_rank=100,
    )
    mu_o, cov_o = _dense_oracle(spec, params, buffers, x, y, xt)
    mu, cov = iterative.iterative_posterior_cov(spec, params, buffers,
                                                x, y, xt)
    np.testing.assert_allclose(np.asarray(mu), mu_o, atol=3e-3)
    np.testing.assert_allclose(np.asarray(cov), cov_o, atol=5e-3)


def test_iterative_cov_cg_matches_exact():
    spec, params, buffers, x, y, xt = _setup(
        n=160, n_test=16, cg_max_iters=80, cg_tol=1e-8, precond_rank=0,
        love_rank=0,
    )
    mu_o, cov_o = _dense_oracle(spec, params, buffers, x, y, xt)
    mu, cov = iterative.iterative_posterior_cov(spec, params, buffers,
                                                x, y, xt)
    np.testing.assert_allclose(np.asarray(mu), mu_o, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cov), cov_o, atol=3e-3)


def test_ski_cov_diag_consistent_with_posterior_var():
    spec, params, buffers, x, y, xt = _setup(
        n=160, n_test=16,
        kernel=KernelSpec.polynomial(J=4, d=1, ski=True, grid_size=64),
        cg_max_iters=80, cg_tol=1e-8, precond_rank=0, love_rank=0,
        max_cholesky_size=16,
    )
    from rpagp.models import exact_gp

    bufs = exact_gp.prepare_buffers(spec, params, buffers, x)
    mu_v, var_v = iterative.iterative_posterior(
        spec, params, bufs, x, y, xt, observation_noise=False,
        var_chunk=16, var_tol=1e-4)
    mu_c, cov = iterative.iterative_posterior_cov(spec, params, bufs,
                                                  x, y, xt)
    np.testing.assert_allclose(np.asarray(mu_c), np.asarray(mu_v), atol=2e-3)
    # the cov path uses the EXACT prior test block (documented); the var
    # path interpolates it — agreement within the SKI approximation
    np.testing.assert_allclose(np.diag(np.asarray(cov)), np.asarray(var_v),
                               rtol=5e-2, atol=5e-3)


def test_sample_posterior_moments():
    spec, params, buffers, x, y, xt = _setup(n=120, n_test=10)
    mu, cov = posterior_cov(spec, params, buffers, x, y, xt)
    S = sample_posterior(spec, params, buffers, x, y, xt,
                         jax.random.key(7), num_samples=4000)
    assert S.shape == (4000, 10)
    emp_mu = np.mean(np.asarray(S), axis=0)
    emp_cov = np.cov(np.asarray(S).T)
    np.testing.assert_allclose(emp_mu, np.asarray(mu), atol=4 * np.sqrt(
        np.max(np.asarray(cov).diagonal()) / 4000) + 1e-3)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=5e-2)


def test_make_predictor_exact_matches_predict():
    from rpagp import make_predictor, predict

    spec, params, buffers, x, y, xt = _setup(n=140, n_test=20)
    pred = make_predictor(spec, params, buffers, x, y)
    mu_c, var_c = pred(xt)
    mu_e, var_e = predict(spec, params, buffers, x, y, xt)
    np.testing.assert_allclose(np.asarray(mu_c), np.asarray(mu_e), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_c), np.asarray(var_e),
                               atol=1e-5)
    # a SECOND batch through the same cache
    xt2 = jax.random.normal(jax.random.key(99), (9, x.shape[1]))
    mu2, var2 = pred(xt2)
    mu2_e, var2_e = predict(spec, params, buffers, x, y, xt2)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu2_e), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var2), np.asarray(var2_e),
                               atol=1e-5)


def test_make_predictor_love_matches_posterior():
    from rpagp import make_predictor

    spec, params, buffers, x, y, xt = _setup(
        n=220, n_test=24, cg_max_iters=100, cg_tol=1e-8, precond_rank=10,
        love_rank=110, max_cholesky_size=16,
    )
    pred = make_predictor(spec, params, buffers, x, y)
    mu_c, var_c = pred(xt)
    mu_i, var_i = iterative.iterative_posterior(spec, params, buffers,
                                                x, y, xt)
    np.testing.assert_allclose(np.asarray(mu_c), np.asarray(mu_i), atol=2e-3)
    np.testing.assert_allclose(np.asarray(var_c), np.asarray(var_i),
                               rtol=3e-2, atol=3e-3)


def test_make_predictor_ski_with_margin_batches():
    """Cached SKI predictor: the grid is built once with a margin; test
    batches inside the margin (incl. mild extrapolation) match the
    fresh-grid posterior."""
    from rpagp import make_predictor

    spec, params, buffers, x, y, _ = _setup(
        n=160, kernel=KernelSpec.polynomial(J=4, d=1, ski=True,
                                            grid_size=128),
        cg_max_iters=80, cg_tol=1e-8, precond_rank=0, love_rank=80,
        max_cholesky_size=16,
    )
    pred = make_predictor(spec, params, buffers, x, y)
    # mild extrapolation: ~1.3x the train radius, inside the 0.5 margin
    xt = 1.3 * jax.random.normal(jax.random.key(77), (16, x.shape[1]))
    mu_c, var_c = pred(xt)
    mu_i, var_i = iterative.iterative_posterior(spec, params, buffers,
                                                x, y, xt)
    np.testing.assert_allclose(np.asarray(mu_c), np.asarray(mu_i), atol=5e-3)
    np.testing.assert_allclose(np.asarray(var_c), np.asarray(var_i),
                               rtol=5e-2, atol=5e-3)


def test_make_predictor_requires_love_for_iterative():
    import pytest as _pytest

    spec, params, buffers, x, y, _ = _setup(
        n=150, love_rank=0, max_cholesky_size=16)
    with _pytest.raises(ValueError):
        iterative.make_predictor(spec, params, buffers, x, y)
