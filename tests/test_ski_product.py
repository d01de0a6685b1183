"""Product-grid SKI (degree/sub_dim > 1) vs dense oracles.

ops/ski_product.py lifts the reference's degree-1 SKI restriction via
the Hadamard-product identity: per component, Khatri-Rao interpolation
rows on the product grid x Kronecker Toeplitz factors, lowered to the
exact grid-space Woodbury solver. Oracles here MATERIALIZE that
operator (KR rows, Kron blocks) — same dense-oracle pattern as
tests/test_grid_solve.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpagp.models import exact_gp
from rpagp.models.exact_gp import ModelSpec
from rpagp.ops import grid_solve, ski, ski_product
from rpagp.ops.kernels import KernelSpec, _component_scales

HI = jax.lax.Precision.HIGHEST


def _setup(n=400, D=6, J=3, d=2, k=1, m=16, seed=0, **model_kw):
    kspec = KernelSpec.polynomial(J=J, d=d, k=k, base="rbf",
                                  proj_dist="gaussian", ski=True,
                                  grid_size=m)
    spec = ModelSpec(kernel=kspec, max_cholesky_size=64, **model_kw)
    kx, ky = jax.random.split(jax.random.key(seed))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0] - x[:, 1]) + 0.3 * jax.random.normal(
        ky, (n,), jnp.float32)
    params, buffers = exact_gp.init_model(jax.random.key(seed + 1), spec, D)
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x)
    return spec, params, buffers, x, y


def _kr_rows(spec, state):
    """Materialized Khatri-Rao interpolation rows: (J, n, M)."""
    W = ski._cubic_kernel(state.tfrac[:, :, None] - state.cells)  # (Jf,n,m)
    F = ski_product.factors_per_component(spec.kernel)
    J, m = spec.kernel.J, state.m
    n = W.shape[1]
    Wj = W.reshape(J, F, n, m)
    out = Wj[:, 0]
    for f in range(1, F):
        a = out.shape[-1]
        out = (out[:, :, :, None] * Wj[:, f][:, :, None, :]).reshape(
            J, n, a * m)
    return out  # (J, n, m^F)


def _kron_T(spec, params, state, eps):
    """Materialized product-grid kernels: (J, M, M) Kron of jittered
    factor Toeplitz blocks."""
    Tf = ski_product.toeplitz_blocks_factors(spec.kernel,
                                             params["kernel"], state)
    Tf = Tf + eps * jnp.eye(state.m)
    F = ski_product.factors_per_component(spec.kernel)
    J, m = spec.kernel.J, state.m
    return ski_product.kron_fold(Tf.reshape(J, F, m, m))


def _dense_operator(spec, params, state, eps):
    """A = noise I + sum_j s_j Wkr_j (Kron T_j) Wkr_j^T."""
    Wkr = _kr_rows(spec, state)  # (J, n, M)
    Tk = _kron_T(spec, params, state, eps)  # (J, M, M)
    scales = _component_scales(spec.kernel, params["kernel"], Wkr.dtype)
    K = jnp.einsum("jna,jab,jlb,j->nl", Wkr, Tk, Wkr, scales,
                   precision=HI)
    n = Wkr.shape[1]
    return K + exact_gp.noise_value(params) * jnp.eye(n)


def _oracle_mll(spec, params, buffers, x, y, eps):
    state = buffers["ski_state"]
    A = _dense_operator(spec, params, state, eps)
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


def test_kron_fold_matches_numpy_kron():
    key = jax.random.key(0)
    mats = jax.random.normal(key, (2, 3, 4, 4), jnp.float32)
    out = ski_product.kron_fold(mats)
    for j in range(2):
        ref = np.kron(np.kron(np.asarray(mats[j, 0]),
                              np.asarray(mats[j, 1])),
                      np.asarray(mats[j, 2]))
        np.testing.assert_allclose(np.asarray(out[j]), ref, rtol=2e-6,
                                   atol=1e-6)


def test_product_interp_matches_materialized_rows():
    spec, params, buffers, x, y = _setup(n=150, J=2, d=2, m=12)
    state = buffers["ski_state"]
    Wkr = _kr_rows(spec, state)  # (J, n, M)
    V = jax.random.normal(jax.random.key(3), (x.shape[0], 2), jnp.float32)
    U = ski_product.interp_transpose(spec.kernel, state, V)  # (J, 2, M)
    U_ref = jnp.einsum("jnM,nt->jtM", Wkr, V, precision=HI)
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref),
                               rtol=1e-4, atol=1e-5)
    G = jax.random.normal(jax.random.key(4),
                          (spec.kernel.J, 2, U.shape[-1]), jnp.float32)
    out = ski_product.interp_apply_sum(spec.kernel, state, G)  # (n, 2)
    out_ref = jnp.einsum("jnM,jtM->nt", Wkr, G, precision=HI)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)


def test_product_interp_directions_are_adjoint():
    """<U, W^T V> == <W U, V>: the custom_vjp pair must stay a true
    adjoint pair (gradient correctness depends on it)."""
    spec, params, buffers, x, y = _setup(n=200, J=2, d=2, m=12)
    state = buffers["ski_state"]
    M = state.m ** 2
    V = jax.random.normal(jax.random.key(5), (x.shape[0], 3), jnp.float32)
    U = jax.random.normal(jax.random.key(6), (spec.kernel.J, 3, M),
                          jnp.float32)
    lhs = jnp.vdot(U, ski_product.interp_transpose(spec.kernel, state, V))
    rhs = jnp.vdot(ski_product.interp_apply_sum(spec.kernel, state, U), V)
    assert abs(float(lhs - rhs)) < 1e-3 * max(1.0, abs(float(lhs)))


def test_interp_gram_matches_materialized():
    spec, params, buffers, x, y = _setup(n=150, J=2, d=2, m=12)
    state = buffers["ski_state"]
    S = ski_product.build_interp_gram(spec.kernel, state)
    Wkr = _kr_rows(spec, state)
    S_ref = jnp.einsum("inM,jnN->iMjN", Wkr, Wkr, precision=HI)
    np.testing.assert_allclose(np.asarray(S), np.asarray(S_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("d,k,m", [(2, 1, 16), (1, 2, 16), (3, 1, 8)])
def test_grid_mll_matches_dense_product_oracle(d, k, m):
    """Value AND gradient parity with the materialized product-SKI
    operator — degree-2, sub_dim-2, and degree-3 (F=3 exercises the
    general Khatri-Rao/Kronecker folds)."""
    spec, params, buffers, x, y = _setup(n=400, J=3, d=d, k=k, m=m)
    assert grid_solve.use_grid_solver(spec, x.shape[0])
    v, g = jax.value_and_grad(
        lambda p: grid_solve.grid_mll(spec, p, buffers, x, y))(params)
    vo, go = jax.value_and_grad(
        lambda p: _oracle_mll(spec, p, buffers, x, y,
                              eps=spec.grid_jitter))(params)
    assert abs(float(v - vo)) / abs(float(vo)) < 2e-4
    assert _grad_relerr(g, go) < 2e-3


def test_grid_mll_product_tracks_exact_kernel():
    """Sanity: the product-SKI MLL approximates the EXACT dense RPA
    kernel MLL (interpolation error only)."""
    spec, params, buffers, x, y = _setup(n=300, J=3, d=2, m=24)
    v = grid_solve.grid_mll(spec, params, buffers, x, y)
    ve = exact_gp.exact_mll(spec, params, buffers, x, y)
    n = x.shape[0]
    assert abs(float(v - ve)) / n < 2e-3


def test_grid_posterior_product_matches_dense_oracle():
    spec, params, buffers, x, y = _setup(n=300, J=3, d=2, m=16)
    xt = jax.random.normal(jax.random.key(9), (48, x.shape[1]),
                           jnp.float32)
    mu, var = grid_solve.grid_posterior(spec, params, buffers, x, y, xt,
                                        observation_noise=True)
    # oracle on the SAME union grid the posterior builds
    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    z_tr = ski.project(kspec, kp, kb, x)
    z_te = ski.project(kspec, kp, kb, xt)
    lo = jnp.minimum(jnp.min(z_tr, axis=1), jnp.min(z_te, axis=1))
    hi = jnp.maximum(jnp.max(z_tr, axis=1), jnp.max(z_te, axis=1))
    n, nt = x.shape[0], xt.shape[0]
    xa = jnp.concatenate([x, xt], axis=0)
    st_all = ski.build_ski_factors(kspec, kp, kb, xa, kspec.grid_size,
                                   z_bounds=(lo, hi))
    A = _dense_operator(spec, params, st_all, spec.grid_jitter)
    noise = exact_gp.noise_value(params)
    K_all = A - noise * jnp.eye(n + nt)
    Ktr = K_all[:n, :n] + noise * jnp.eye(n)
    Kxt = K_all[:n, n:]
    L = jnp.linalg.cholesky(Ktr)
    yc = y - exact_gp.mean_fn(spec, params, x)
    alpha = jax.scipy.linalg.cho_solve((L, True), yc)
    mu_o = Kxt.T @ alpha + exact_gp.mean_fn(spec, params, xt)
    from rpagp.ops.kernels import gram_diag

    kd = gram_diag(kspec, kp, kb, xt)
    Vs = jax.scipy.linalg.solve_triangular(L, Kxt, lower=True)
    var_o = kd - jnp.sum(Vs * Vs, axis=0) + noise
    scale = float(jnp.std(y))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_o),
                               atol=5e-3 * scale)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_o),
                               rtol=2e-2, atol=5e-3)


def test_product_mixed_base_tracks_exact_kernel():
    """Mixed-BASE product SKI (uniform degree 2, rbf + matern32
    components): the grid MLL must track the EXACT dense kernel MLL —
    an oracle (kernels._projection_gram via _component_groups) that
    shares none of the factor-Toeplitz code under test."""
    kspec = KernelSpec.generalized(
        degrees=(2, 2, 2), bases=("rbf", "matern32", "rbf"),
        proj_dist="gaussian", ski=True, grid_size=24)
    spec = ModelSpec(kernel=kspec, max_cholesky_size=64)
    n, D = 300, 5
    kx, ky = jax.random.split(jax.random.key(2))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0] - x[:, 1]) + 0.3 * jax.random.normal(
        ky, (n,), jnp.float32)
    params, buffers = exact_gp.init_model(jax.random.key(3), spec, D)
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x)
    v = grid_solve.grid_mll(spec, params, buffers, x, y)
    ve = exact_gp.exact_mll(spec, params, buffers, x, y)
    # matern32 is C^1 (vs rbf's C^inf): cubic-interp error is larger at
    # the same grid — measured 2.5e-3/point at m=24 (rbf-only: <2e-3)
    assert abs(float(v - ve)) / n < 4e-3
    # and the factor columns match explicit per-base closed forms
    state = buffers["ski_state"]
    col = ski_product.toeplitz_columns_factors(kspec, params["kernel"],
                                               state)
    from rpagp.utils.transforms import softplus as sp

    ls = jnp.repeat(sp(params["kernel"]["raw_lengthscale"]),
                    kspec.sub_dim)
    t = np.asarray(state.cells[None, :] * state.h[:, None] / ls[:, None])
    expect = np.empty_like(t)
    fbases = [b for b in kspec.bases for _ in range(2)]
    for i, b in enumerate(fbases):
        if b == "rbf":
            expect[i] = np.exp(-0.5 * t[i] ** 2)
        else:
            s = np.sqrt(3.0) * np.abs(t[i])
            expect[i] = (1.0 + s) * np.exp(-s)
    np.testing.assert_allclose(np.asarray(col), expect, rtol=1e-5,
                               atol=1e-6)


def test_product_validation_errors():
    with pytest.raises(ValueError, match="bbmm"):
        spec, params, buffers, x, y = _setup(n=100, J=2, d=2, m=8,
                                             solver="bbmm")
    kspec = KernelSpec.generalized(degrees=(1, 2), bases=("rbf", "rbf"),
                                   ski=True, grid_size=8)
    with pytest.raises(ValueError, match="uniform"):
        ski_product.factors_per_component(kspec)


def test_grid_rank():
    kspec = KernelSpec.polynomial(J=3, d=2, k=2, base="rbf", ski=True,
                                  grid_size=8)
    assert ski_product.grid_rank(kspec) == 3 * 8 ** 4
    kspec1 = KernelSpec.polynomial(J=3, d=1, base="rbf", ski=True,
                                   grid_size=8)
    assert ski_product.grid_rank(kspec1) == 24


def test_grid_posterior_cov_product_diag_consistent():
    """grid_posterior_cov on a PRODUCT spec (the dispatch helpers carry
    it through _posterior_factor/_test_interp_rows): the covariance
    diagonal must match grid_posterior's variance (same factor, same
    exact-kernel diag), and the matrix must be symmetric with bounded
    off-diagonal (PSD up to f32 rounding)."""
    spec, params, buffers, x, y = _setup(n=300, J=2, d=2, m=12)
    xt = x[:24] + 0.01
    mu_c, cov = grid_solve.grid_posterior_cov(
        spec, params, buffers, x, y, xt, observation_noise=False)
    mu_v, var = grid_solve.grid_posterior(
        spec, params, buffers, x, y, xt, observation_noise=False)
    np.testing.assert_allclose(np.asarray(mu_c), np.asarray(mu_v),
                               atol=1e-5)
    np.testing.assert_allclose(np.diag(np.asarray(cov)), np.asarray(var),
                               atol=1e-4, rtol=1e-3)
    c = np.asarray(cov)
    np.testing.assert_allclose(c, c.T, atol=1e-6)
    w = np.linalg.eigvalsh(c.astype(np.float64))
    assert w.min() > -1e-4, w.min()
