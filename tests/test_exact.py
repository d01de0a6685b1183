"""Exact-path oracle tests: Cholesky MLL vs scipy MVN logpdf, gradient
checks vs finite differences, posterior sanity (SURVEY.md §4 items 1-2)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from rpagp import KernelSpec, ModelSpec, init_model, exact_mll, predict
from rpagp.models.exact_gp import noise_value, mean_fn
from rpagp.ops import kernels
from rpagp.ops.exact import cholesky_mll, gaussian_nll

KEY = jax.random.key(0)


def _problem(n=12, D=3, seed=1):
    kx, ky = jax.random.split(jax.random.key(seed))
    x = jax.random.normal(kx, (n, D))
    y = jnp.sin(x[:, 0]) + 0.1 * jax.random.normal(ky, (n,))
    return x, y


def test_mll_vs_scipy_mvn_logpdf():
    x, y = _problem()
    spec = ModelSpec(kernel=KernelSpec(family="rbf"), jitter=0.0)
    params, buffers = init_model(KEY, spec, x.shape[1])
    got = float(exact_mll(spec, params, buffers, x, y))

    K = np.asarray(
        kernels.gram(spec.kernel, params["kernel"], buffers["kernel"], x, x),
        np.float64,
    )
    noise = float(noise_value(params))
    mu = np.asarray(mean_fn(spec, params, x), np.float64)
    want = scipy.stats.multivariate_normal.logpdf(
        np.asarray(y, np.float64), mean=mu, cov=K + noise * np.eye(len(y))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mll_gradients_vs_finite_differences():
    x, y = _problem(n=10)
    spec = ModelSpec(kernel=KernelSpec.polynomial(J=4, d=1), jitter=1e-6)
    params, buffers = init_model(KEY, spec, x.shape[1])

    f = lambda p: exact_mll(spec, p, buffers, x, y)
    grads = jax.grad(f)(params)

    eps = 1e-3
    flat, unravel = jax.flatten_util.ravel_pytree(params)
    gflat, _ = jax.flatten_util.ravel_pytree(grads)
    for i in range(flat.shape[0]):
        e = jnp.zeros_like(flat).at[i].set(eps)
        fd = (f(unravel(flat + e)) - f(unravel(flat - e))) / (2 * eps)
        np.testing.assert_allclose(float(gflat[i]), float(fd), rtol=0.05, atol=1e-3)


def test_posterior_interpolates_and_variance_grows_off_data():
    # 1-D noiseless-ish function: posterior mean must track it closely at
    # train points; predictive variance must be larger far from data.
    n = 40
    x = jnp.linspace(-2, 2, n)[:, None]
    y = jnp.sin(2 * x[:, 0])
    spec = ModelSpec(kernel=KernelSpec(family="rbf"))
    params, buffers = init_model(KEY, spec, 1)
    from rpagp.train import train_to_convergence

    loss = lambda p: -exact_mll(spec, p, buffers, x, y) / n
    res = train_to_convergence(loss, params, lr=0.1, max_iters=400, patience=30)
    mu_tr, var_tr = predict(spec, res.params, buffers, x, y, x)
    assert float(jnp.sqrt(jnp.mean((mu_tr - y) ** 2))) < 0.05

    far = jnp.array([[8.0]])
    _, var_far = predict(spec, res.params, buffers, x, y, far)
    assert float(var_far[0]) > 2 * float(var_tr.mean())
    assert float(var_far[0]) > 0


def test_rpa_training_beats_constant_predictor():
    x, y = _problem(n=60, D=4, seed=3)
    xt, yt = _problem(n=30, D=4, seed=4)
    spec = ModelSpec(kernel=KernelSpec.polynomial(J=8, d=1))
    params, buffers = init_model(KEY, spec, 4)
    from rpagp.train import train_to_convergence

    loss = lambda p: -exact_mll(spec, p, buffers, x, y) / x.shape[0]
    res = train_to_convergence(loss, params, lr=0.1, max_iters=300, patience=30)
    assert res.losses[-1] < res.losses[0]
    mu, var = predict(spec, res.params, buffers, x, y, xt)
    rmse = float(jnp.sqrt(jnp.mean((mu - yt) ** 2)))
    const_rmse = float(jnp.sqrt(jnp.mean((yt - y.mean()) ** 2)))
    assert rmse < const_rmse
    nll = float(gaussian_nll(yt, mu, var))
    assert np.isfinite(nll)


def test_nll_metric_matches_closed_form():
    y = jnp.array([0.0, 1.0])
    mu = jnp.array([0.0, 0.0])
    var = jnp.array([1.0, 1.0])
    want = 0.5 * (np.log(2 * np.pi) + 0.0 + np.log(2 * np.pi) + 1.0) / 2
    np.testing.assert_allclose(float(gaussian_nll(y, mu, var)), want, rtol=1e-4)
