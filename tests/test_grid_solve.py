"""Exact grid-space (Woodbury) SKI solver vs dense oracles.

The grid solver computes the EXACT MLL/posterior of the SKI model
(ops/grid_solve.py), so its oracle is the explicitly materialized
A = noise I + sum_j scale_j W_j T_j W_j^T — the same dense-oracle
pattern as the rest of the suite (SURVEY.md §4). The key claims under
test: value parity, GRADIENT parity via plain autodiff (the whole point
over the CG+SLQ estimator), posterior parity, dispatch policy, and
robustness near the noise floor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpagp.models import exact_gp
from rpagp.models.exact_gp import ModelSpec
from rpagp.ops import grid_solve, ski
from rpagp.ops.kernels import KernelSpec, _component_scales
from rpagp.utils.transforms import inv_softplus

HI = jax.lax.Precision.HIGHEST


def _setup(n=500, D=4, J=4, m=32, seed=0, **model_kw):
    kspec = KernelSpec.polynomial(J=J, d=1, base="rbf",
                                  proj_dist="gaussian", ski=True,
                                  grid_size=m)
    spec = ModelSpec(kernel=kspec, max_cholesky_size=64, **model_kw)
    kx, ky = jax.random.split(jax.random.key(seed))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.3 * jax.random.normal(
        ky, (n,), jnp.float32)
    params, buffers = exact_gp.init_model(jax.random.key(seed + 1), spec, D)
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x)
    return spec, params, buffers, x, y


def _dense_ski_operator(spec, params, buffers, state, eps=0.0):
    """Materialize A = noise I + sum_j s_j W_j (T_j + eps I) W_j^T."""
    W = ski._cubic_kernel(state.tfrac[:, :, None] - state.cells)  # (J,n,m)
    col = ski.toeplitz_columns(spec.kernel, params["kernel"], state)
    m = state.m
    idx = jnp.abs(jnp.arange(m)[:, None] - jnp.arange(m)[None, :])
    T = col[:, idx] + eps * jnp.eye(m)
    scales = _component_scales(spec.kernel, params["kernel"], W.dtype)
    K = jnp.einsum("jnm,jmk,jlk->nl", W, T,
                   W * scales[:, None, None], precision=HI)
    n = W.shape[1]
    return K + exact_gp.noise_value(params) * jnp.eye(n)


def _oracle_mll(spec, params, buffers, x, y, eps=0.0):
    state = buffers["ski_state"]
    A = _dense_ski_operator(spec, params, buffers, state, eps=eps)
    yc = y - exact_gp.mean_fn(spec, params, x)
    L = jnp.linalg.cholesky(A)
    alpha = jax.scipy.linalg.cho_solve((L, True), yc)
    ld = 2.0 * jnp.sum(jnp.log(jnp.diag(L)))
    n = x.shape[0]
    return -0.5 * (yc @ alpha + ld + n * jnp.log(2.0 * jnp.pi))


def _grad_relerr(ga, gb):
    la, lb = jax.tree.leaves(ga), jax.tree.leaves(gb)
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(la, lb))
    den = sum(float(jnp.sum(b**2)) for b in lb)
    return (num / max(den, 1e-30)) ** 0.5


def test_grid_mll_matches_dense_ski_oracle():
    """Value AND gradient parity with the materialized SKI operator —
    the eps-jittered oracle isolates the (documented, O(eps)) T-jitter
    so the remaining error is pure floating point."""
    spec, params, buffers, x, y = _setup()
    v, g = jax.value_and_grad(
        lambda p: grid_solve.grid_mll(spec, p, buffers, x, y))(params)
    vo, go = jax.value_and_grad(
        lambda p: _oracle_mll(spec, p, buffers, x, y,
                              eps=spec.grid_jitter))(params)
    assert abs(float(v - vo)) / abs(float(vo)) < 1e-4
    assert _grad_relerr(g, go) < 1e-3


def test_gsg_dot_form_parity(monkeypatch):
    """The explicit batched-GEMM G^T S G layout (default since the r5c
    A/B: 33.4 -> 27.7 ms/step) must match the einsum form's MLL value
    and gradient to f32 reduction-order roundoff (RPAGP_GSG_DOT=0 is
    the einsum fallback)."""
    spec, params, buffers, x, y = _setup()
    monkeypatch.setenv("RPAGP_GSG_DOT", "0")
    v0, g0 = jax.value_and_grad(
        lambda p: grid_solve.grid_mll(spec, p, buffers, x, y))(params)
    monkeypatch.setenv("RPAGP_GSG_DOT", "1")
    v1, g1 = jax.value_and_grad(
        lambda p: grid_solve.grid_mll(spec, p, buffers, x, y))(params)
    assert abs(float(v0 - v1)) / abs(float(v0)) < 1e-5
    assert _grad_relerr(g1, g0) < 1e-4


def test_grid_mll_jitter_bias_is_small():
    """Against the UNjittered oracle the bias is O(eps) — far below the
    SKI interpolation error."""
    spec, params, buffers, x, y = _setup()
    v = grid_solve.grid_mll(spec, params, buffers, x, y)
    vo = _oracle_mll(spec, params, buffers, x, y, eps=0.0)
    n = x.shape[0]
    assert abs(float(v - vo)) / n < 1e-4


def test_grid_mll_beats_cg_slq_gradient_accuracy():
    """The headline claim: plain-autodiff grid gradients are far closer
    to the oracle than the CG+SLQ probe estimator at typical knobs."""
    from rpagp.ops import iterative

    spec, params, buffers, x, y = _setup(n=600, J=5, m=32)
    go = jax.grad(
        lambda p: _oracle_mll(spec, p, buffers, x, y))(params)
    gg = jax.grad(
        lambda p: grid_solve.grid_mll(spec, p, buffers, x, y))(params)
    gi = jax.grad(
        lambda p: iterative.iterative_mll(spec, p, buffers, x, y,
                                          jax.random.key(3)))(params)
    err_grid = _grad_relerr(gg, go)
    err_iter = _grad_relerr(gi, go)
    assert err_grid < 1e-3
    assert err_grid < 0.1 * err_iter


def test_grid_mll_near_noise_floor_finite_and_close():
    """Near-interpolation regime (the r2f failure mode): the factor
    stays finite and tracks the oracle."""
    spec, params, buffers, x, y = _setup(n=400, J=3, m=24)
    params = dict(params)
    params["raw_noise"] = jnp.asarray(inv_softplus(2e-4), jnp.float32)
    v, g = jax.value_and_grad(
        lambda p: grid_solve.grid_mll(spec, p, buffers, x, y))(params)
    assert np.isfinite(float(v))
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(g))
    vo = _oracle_mll(spec, params, buffers, x, y, eps=spec.grid_jitter)
    # f32 at kappa ~ 1e7: loose band, but the same quantity
    assert abs(float(v - vo)) / abs(float(vo)) < 5e-3


def test_grid_posterior_matches_dense_ski_oracle():
    spec, params, buffers, x, y = _setup(n=400, J=4, m=32)
    kx = jax.random.key(9)
    xt = jax.random.normal(kx, (64, x.shape[1]), jnp.float32)

    mu, var = grid_solve.grid_posterior(spec, params, buffers, x, y, xt,
                                        observation_noise=True)
    # oracle on the SAME union grid the posterior builds
    from rpagp.ops.kernels import gram_diag

    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    z_tr = ski.project(kspec, kp, kb, x)
    z_te = ski.project(kspec, kp, kb, xt)
    lo = jnp.minimum(jnp.min(z_tr, axis=1), jnp.min(z_te, axis=1))
    hi = jnp.maximum(jnp.max(z_tr, axis=1), jnp.max(z_te, axis=1))
    st_tr = ski.build_ski(kspec, kp, kb, x, kspec.grid_size,
                          z_bounds=(lo, hi))
    st_te = ski.build_ski(kspec, kp, kb, xt, kspec.grid_size,
                          z_bounds=(lo, hi))
    A = _dense_ski_operator(spec, params, buffers, st_tr,
                            eps=spec.grid_jitter)
    Wt = ski._cubic_kernel(st_te.tfrac[:, :, None] - st_te.cells)
    Wtr = ski._cubic_kernel(st_tr.tfrac[:, :, None] - st_tr.cells)
    col = ski.toeplitz_columns(kspec, kp, st_tr)
    m = st_tr.m
    idx = jnp.abs(jnp.arange(m)[:, None] - jnp.arange(m)[None, :])
    T = col[:, idx] + spec.grid_jitter * jnp.eye(m)
    scales = _component_scales(kspec, kp, jnp.float32)
    Kcross = jnp.einsum("jtm,jmk,jnk->tn", Wt, T,
                        Wtr * scales[:, None, None], precision=HI)
    yc = y - exact_gp.mean_fn(spec, params, x)
    L = jnp.linalg.cholesky(A)
    alpha = jax.scipy.linalg.cho_solve((L, True), yc)
    mu_o = Kcross @ alpha + exact_gp.mean_fn(spec, params, xt)
    sol = jax.scipy.linalg.cho_solve((L, True), Kcross.T)
    kd = gram_diag(kspec, kp, kb, xt)
    var_o = kd - jnp.sum(Kcross.T * sol, axis=0) \
        + exact_gp.noise_value(params)

    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_o),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_o),
                               atol=5e-3, rtol=5e-2)


def test_grid_posterior_mean_stable_under_jit():
    """Regression: the mean cache must be the DIRECT q = G C^-1 b form.

    The old route went through the n-space residual (q = G G^T U^T
    (yc - Vw) / noise), which amplifies the f32 yc - Vw cancellation by
    1/noise: at protein scale (n=41k, trained hyperparameters) a ~1e-4
    eager-vs-jit fusion difference in the factor swung the posterior
    mean from rmse 0.35 to 2.8. The direct form is algebraically
    identical and conditioning-limited only by kappa(C). Guard: jitted
    and eager posteriors agree tightly at a size where the residual
    route already showed 1e-1-scale drift."""
    spec, params, buffers, x, y = _setup(n=4096, J=8, m=64, seed=3)
    xt = jax.random.normal(jax.random.key(11), (256, x.shape[1]),
                           jnp.float32)
    mu_e, var_e = grid_solve.grid_posterior(spec, params, buffers, x, y, xt)
    post_j = jax.jit(lambda p, b, xx, yy, xte: grid_solve.grid_posterior(
        spec, p, b, xx, yy, xte))
    mu_j, var_j = post_j(params, buffers, x, y, xt)
    scale = float(jnp.max(jnp.abs(mu_e))) + 1e-6
    assert float(jnp.max(jnp.abs(mu_e - mu_j))) / scale < 1e-3
    np.testing.assert_allclose(np.asarray(var_e), np.asarray(var_j),
                               atol=1e-4, rtol=1e-3)


def test_grid_predictor_matches_posterior():
    """Cached predictor parity for in-range test batches."""
    spec, params, buffers, x, y = _setup(n=300, J=3, m=24)
    xt = x[:50] + 0.01  # safely inside the margin grid
    predict = grid_solve.make_grid_predictor(spec, params, buffers, x, y)
    mu_p, var_p = predict(xt)
    mu, var = grid_solve.grid_posterior(spec, params, buffers, x, y, xt)
    # different grids (margin vs union) -> interpolation-level agreement
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var),
                               atol=2e-2, rtol=0.1)


def test_dispatch_policy_and_mll_routing():
    from rpagp.mll import mll as mll_fn

    spec, params, buffers, x, y = _setup(n=500, J=4, m=32)
    # p = 128 <= n//2: auto -> grid
    assert grid_solve.use_grid_solver(spec, 500)
    assert not grid_solve.use_grid_solver(spec, 200)  # p > n//2
    import dataclasses

    bbmm = dataclasses.replace(spec, solver="bbmm")
    assert not grid_solve.use_grid_solver(bbmm, 500)
    forced = dataclasses.replace(spec, solver="grid")
    assert grid_solve.use_grid_solver(forced, 200)
    assert "ski_uu" in buffers  # prepare_buffers built the Gram
    v = mll_fn(spec, params, buffers, x, y)
    vg = grid_solve.grid_mll(spec, params, buffers, x, y)
    assert float(v) == pytest.approx(float(vg), rel=1e-6)


def test_mll_unprepared_buffers_still_routes_to_grid():
    """mll() must dispatch on spec/size alone, like posterior(): with
    UNPREPARED buffers it builds the hyperparameter-free grid caches
    inline (with a warning) rather than silently substituting the
    stochastic BBMM estimator for the exact solver."""
    from rpagp.mll import mll as mll_fn

    spec, params, buffers, x, y = _setup(n=500, J=4, m=32)
    raw = {"kernel": buffers["kernel"]}  # as if prepare_buffers was skipped
    with pytest.warns(UserWarning, match="prepare_buffers"):
        v_raw = mll_fn(spec, params, raw, x, y)
    v_prep = mll_fn(spec, params, buffers, x, y)
    # same solver, same deterministic answer (identical geometry/Gram)
    assert float(v_raw) == pytest.approx(float(v_prep), rel=1e-6)
    # and it must be differentiable through the inline build
    g = jax.grad(lambda p: mll_fn(spec, p, raw, x, y))(params)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(g))


def test_grid_mll_anchored_value_near_noise_floor():
    """The anchored (zero-n-pass) value cache in the regime it exists
    for: near interpolation, where the un-anchored grid-space form
    cancels at O(n) magnitudes. With the full cache the MLL value and
    gradient must still track the dense oracle."""
    spec, params, buffers, x, y = _setup(n=400, J=3, m=24)
    params = {**params, "mean_const": jnp.asarray(0.25, jnp.float32),
              "raw_noise": jnp.asarray(inv_softplus(2e-4), jnp.float32)}
    bufc = exact_gp.prepare_buffers(
        spec, params, dict(kernel=buffers["kernel"]), x, y_train=y)
    assert "ski_vc" in bufc
    v, g = jax.value_and_grad(
        lambda p: grid_solve.grid_mll(spec, p, bufc, x, y))(params)
    assert np.isfinite(float(v))
    vo = _oracle_mll(spec, params, buffers, x, y, eps=spec.grid_jitter)
    assert abs(float(v - vo)) / abs(float(vo)) < 5e-3
    go = jax.grad(
        lambda p: _oracle_mll(spec, p, buffers, x, y,
                              eps=spec.grid_jitter))(params)
    assert _grad_relerr(g, go) < 5e-3


def test_grid_mll_mixed_base_matches_explicit_oracle():
    """Mixed-BASE degree-1 SKI (the generalized-kernel family) through
    the exact grid solver. The oracle computes every T_j column with
    explicit per-base closed forms (not ski.toeplitz_columns, which now
    contains the code under test)."""
    kspec = KernelSpec.generalized(
        degrees=(1, 1, 1, 1),
        bases=("rbf", "matern32", "rbf", "matern12"),
        proj_dist="gaussian", ski=True, grid_size=32)
    spec = ModelSpec(kernel=kspec, max_cholesky_size=64)
    n, D = 500, 5
    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.3 * jax.random.normal(
        ky, (n,), jnp.float32)
    params, buffers = exact_gp.init_model(jax.random.key(1), spec, D)
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x)
    assert grid_solve.use_grid_solver(spec, n)  # no longer locked out

    def explicit_cols(kparams, state):
        from rpagp.utils.transforms import softplus as sp

        ls = sp(kparams["raw_lengthscale"])
        t = state.cells[None, :] * state.h[:, None] / ls[:, None]
        rows = [jnp.exp(-0.5 * t[0] ** 2),
                (1.0 + jnp.sqrt(3.0) * jnp.abs(t[1]))
                * jnp.exp(-jnp.sqrt(3.0) * jnp.abs(t[1])),
                jnp.exp(-0.5 * t[2] ** 2),
                jnp.exp(-jnp.abs(t[3]))]
        return jnp.stack(rows)

    def oracle(p):
        state = buffers["ski_state"]
        W = ski._cubic_kernel(state.tfrac[:, :, None] - state.cells)
        col = explicit_cols(p["kernel"], state)
        m = state.m
        idx = jnp.abs(jnp.arange(m)[:, None] - jnp.arange(m)[None, :])
        T = col[:, idx] + spec.grid_jitter * jnp.eye(m)
        scales = _component_scales(spec.kernel, p["kernel"], W.dtype)
        K = jnp.einsum("jnm,jmk,jlk->nl", W, T,
                       W * scales[:, None, None], precision=HI)
        A = K + exact_gp.noise_value(p) * jnp.eye(n)
        yc = y - exact_gp.mean_fn(spec, p, x)
        L = jnp.linalg.cholesky(A)
        alpha = jax.scipy.linalg.cho_solve((L, True), yc)
        ld = 2.0 * jnp.sum(jnp.log(jnp.diag(L)))
        return -0.5 * (yc @ alpha + ld + n * jnp.log(2.0 * jnp.pi))

    v, g = jax.value_and_grad(
        lambda p: grid_solve.grid_mll(spec, p, buffers, x, y))(params)
    vo, go = jax.value_and_grad(oracle)(params)
    assert abs(float(v - vo)) / abs(float(vo)) < 1e-4
    assert _grad_relerr(g, go) < 1e-3


def test_grid_posterior_extrapolating_test_points():
    """Test points projecting OUTSIDE the train range: the union grid
    covers them; variances stay positive and means finite."""
    spec, params, buffers, x, y = _setup(n=300, J=3, m=24)
    xt = 3.0 * jax.random.normal(jax.random.key(11), (40, x.shape[1]))
    mu, var = grid_solve.grid_posterior(spec, params, buffers, x, y, xt)
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.asarray(var) > 0)


def test_chol_ladder_handles_flagship_grid_conditioning():
    """m=256 (the flagship grid) makes the RBF grid Toeplitz so
    ill-conditioned that chol(T + 1e-6 I) produces NaN — the failure
    that NaN'd the first n=1.8M grid-solver run. The jitter ladder
    (stop_gradient probe, then one differentiable chol at the chosen
    per-block level) must keep value AND gradient finite, and the
    chosen jitter should stay small relative to the diagonal."""
    import dataclasses

    spec, params, buffers, x, y = _setup(n=2000, D=6, J=4, m=256,
                                         solver="grid")
    state = buffers["ski_state"]
    T = grid_solve._toeplitz_blocks(spec.kernel, params["kernel"], state)
    L_fixed = jnp.linalg.cholesky(T + 1e-6 * jnp.eye(state.m))
    assert not bool(jnp.all(jnp.isfinite(L_fixed)))  # repro: fixed fails

    v, g = jax.value_and_grad(
        lambda p: grid_solve.grid_mll(spec, p, buffers, x, y))(params)
    assert np.isfinite(float(v))
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(g))
    _, eps = grid_solve._chol_ladder(T, spec.grid_jitter * T[:, 0, 0])
    assert float(jnp.max(eps / T[:, 0, 0])) <= 1e-3  # bias stays small


def test_chol_with_fallback_handles_rounding_indefiniteness():
    """The p x p C = noise I + G^T S G is PSD in real arithmetic but f32
    rounding in the einsums can push it indefinite at scale (measured at
    HouseElectric n=1.8M: the un-jittered chol went NaN at training
    iter 15). The fallback ladder must (a) add NO jitter to a healthy
    matrix, (b) recover a finite, accurate factor from a
    rounding-indefinite one with minimal noise inflation."""
    key = jax.random.key(0)
    p, noise = 256, 0.2
    A = jax.random.normal(key, (p, 32), jnp.float32)
    C = A @ A.T + noise * jnp.eye(p)

    # (a) healthy: identical to the plain chol (level 0 chosen)
    L0 = grid_solve._chol_with_fallback(C, jnp.asarray(noise))
    np.testing.assert_array_equal(np.asarray(L0),
                                  np.asarray(jnp.linalg.cholesky(C)))

    # (b) rounding-indefinite: subtract slightly more than noise so the
    # smallest eigenvalue is ~ -0.1 * noise (plain chol -> NaN)
    Cbad = C - 1.1 * noise * jnp.eye(p)
    assert not bool(jnp.all(jnp.isfinite(jnp.linalg.cholesky(Cbad))))
    Lf = grid_solve._chol_with_fallback(Cbad, jnp.asarray(noise))
    assert bool(jnp.all(jnp.isfinite(Lf)))
    # the factor reproduces Cbad up to the (bounded) chosen jitter
    err = jnp.max(jnp.abs(Lf @ Lf.T - Cbad))
    assert float(err) <= grid_solve._C_LEVELS[-1] * noise + 1e-4


def test_interp_gram_matches_dense():
    spec, params, buffers, x, y = _setup(n=350, J=3, m=24)
    state = buffers["ski_state"]
    S = grid_solve.build_interp_gram(state, block=128)
    W = ski._cubic_kernel(state.tfrac[:, :, None] - state.cells)
    S_o = jnp.einsum("inm,jnk->imjk", W, W, precision=HI)
    np.testing.assert_allclose(np.asarray(S), np.asarray(S_o),
                               atol=1e-4, rtol=1e-5)


def test_grid_mll_uy_cache_parity():
    """The per-dataset U^T y / U^T 1 cache (prepare_buffers(y_train=...))
    must reproduce the uncached MLL value and gradient: U^T yc assembled
    as uy - mean_const * u1 is the same linear map as interp_T(y - mu),
    so any difference is one f32 rounding. The nonzero mean_const makes
    the u1 leg (and its mean gradient) load-bearing."""
    spec, params, buffers, x, y = _setup()
    params = {**params, "mean_const": jnp.asarray(0.37, jnp.float32)}
    bufc = exact_gp.prepare_buffers(spec, params, dict(kernel=buffers["kernel"]),
                                    x, y_train=y)
    assert "ski_uy" in bufc and "ski_u1" in bufc

    v0, g0 = jax.value_and_grad(
        lambda p: grid_solve.grid_mll(spec, p, buffers, x, y))(params)
    v1, g1 = jax.value_and_grad(
        lambda p: grid_solve.grid_mll(spec, p, bufc, x, y))(params)
    assert abs(float(v1 - v0)) / abs(float(v0)) < 1e-5
    assert _grad_relerr(g1, g0) < 1e-4


def test_grid_posterior_cov_matches_dense_ski_oracle():
    """grid_posterior_cov vs the materialized SKI operator (r3 verdict
    weak #3: grid-dispatched specs previously got a LOVE-estimated full
    covariance; now the covariance comes from the same exact grid
    factor as the mean/variance)."""
    from rpagp.ops.kernels import gram as kgram

    spec, params, buffers, x, y = _setup(n=400, J=4, m=32)
    xt = jax.random.normal(jax.random.key(9), (48, x.shape[1]),
                           jnp.float32)
    mu, cov = grid_solve.grid_posterior_cov(spec, params, buffers, x, y,
                                            xt, observation_noise=False)

    # oracle on the SAME union grid the posterior builds
    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    z_tr = ski.project(kspec, kp, kb, x)
    z_te = ski.project(kspec, kp, kb, xt)
    lo = jnp.minimum(jnp.min(z_tr, axis=1), jnp.min(z_te, axis=1))
    hi = jnp.maximum(jnp.max(z_tr, axis=1), jnp.max(z_te, axis=1))
    st_tr = ski.build_ski(kspec, kp, kb, x, kspec.grid_size,
                          z_bounds=(lo, hi))
    st_te = ski.build_ski(kspec, kp, kb, xt, kspec.grid_size,
                          z_bounds=(lo, hi))
    A = _dense_ski_operator(spec, params, buffers, st_tr,
                            eps=spec.grid_jitter)
    Wt = ski._cubic_kernel(st_te.tfrac[:, :, None] - st_te.cells)
    Wtr = ski._cubic_kernel(st_tr.tfrac[:, :, None] - st_tr.cells)
    col = ski.toeplitz_columns(kspec, kp, st_tr)
    m = st_tr.m
    idx = jnp.abs(jnp.arange(m)[:, None] - jnp.arange(m)[None, :])
    T = col[:, idx] + spec.grid_jitter * jnp.eye(m)
    scales = _component_scales(kspec, kp, jnp.float32)
    Kcross = jnp.einsum("jtm,jmk,jnk->tn", Wt, T,
                        Wtr * scales[:, None, None], precision=HI)
    yc = y - exact_gp.mean_fn(spec, params, x)
    L = jnp.linalg.cholesky(A)
    alpha = jax.scipy.linalg.cho_solve((L, True), yc)
    mu_o = Kcross @ alpha + exact_gp.mean_fn(spec, params, xt)
    sol = jax.scipy.linalg.cho_solve((L, True), Kcross.T)
    # prior test block is the EXACT kernel Gram (documented stance,
    # consistent with iterative_posterior_cov)
    Kss = kgram(kspec, kp, kb, xt, xt)
    cov_o = Kss - Kcross @ sol

    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_o),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_o),
                               atol=5e-3)
    # diag consistency with grid_posterior's variance (same kd, same
    # explained quadratic form -> rounding-level agreement, modulo the
    # 1e-10 clamp grid_posterior applies)
    _, var = grid_solve.grid_posterior(spec, params, buffers, x, y, xt,
                                       observation_noise=False)
    np.testing.assert_allclose(np.diag(np.asarray(cov)), np.asarray(var),
                               atol=1e-4, rtol=1e-3)


def test_posterior_cov_and_sampling_dispatch_to_grid():
    """mll.posterior_cov / sample_posterior route grid-dispatched specs
    through the exact grid covariance (dispatch consistent with
    posterior())."""
    from rpagp import posterior_cov, sample_posterior

    spec, params, buffers, x, y = _setup(n=400, J=4, m=32)
    assert grid_solve.use_grid_solver(spec, x.shape[0])
    xt = jax.random.normal(jax.random.key(13), (20, x.shape[1]),
                           jnp.float32)
    mu_d, cov_d = posterior_cov(spec, params, buffers, x, y, xt)
    mu_g, cov_g = grid_solve.grid_posterior_cov(
        spec, params, buffers, x, y, xt, observation_noise=False)
    np.testing.assert_allclose(np.asarray(mu_d), np.asarray(mu_g),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov_d), np.asarray(cov_g),
                               atol=1e-5)
    S = sample_posterior(spec, params, buffers, x, y, xt,
                         jax.random.key(7), num_samples=512)
    assert S.shape == (512, 20)
    assert bool(jnp.all(jnp.isfinite(S)))
    emp_mu = np.mean(np.asarray(S), axis=0)
    sd = np.sqrt(np.maximum(np.diag(np.asarray(cov_g)), 1e-10))
    assert np.all(np.abs(emp_mu - np.asarray(mu_g)) < 5 * sd / np.sqrt(512)
                  + 1e-3)


def test_product_grid_rank_guard():
    """r3 verdict weak #2: a plausible product spec (d=2, m=128, J=10
    -> p = J*m^F = 163,840) must ERROR at dispatch instead of silently
    attempting a 163k x 163k replicated Cholesky; solver='grid' still
    forces, with a warning."""
    import dataclasses
    import warnings as _warnings

    big = ModelSpec(kernel=KernelSpec.polynomial(J=10, d=2, ski=True,
                                                 grid_size=128))
    with pytest.raises(ValueError, match="grid rank"):
        grid_solve.use_grid_solver(big, 10**6)
    forced = dataclasses.replace(big, solver="grid")
    with pytest.warns(UserWarning, match="grid rank"):
        assert grid_solve.use_grid_solver(forced, 10**6)
    # a within-budget product spec auto-dispatches silently
    small = ModelSpec(kernel=KernelSpec.polynomial(J=3, d=2, ski=True,
                                                   grid_size=16))
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        assert grid_solve.use_grid_solver(small, 10**6)  # p = 768
