"""Kernel dense-oracle parity tests.

The reference's key test pattern (SURVEY.md §4): every structured kernel
evaluation is checked against an explicitly hand-summed dense oracle on
tiny inputs; plus PSD/shape/symmetry sanity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpagp.ops import kernels
from rpagp.ops.kernels import KernelSpec, gram, gram_diag, init_kernel_params, mvm
from rpagp.utils.transforms import softplus

KEY = jax.random.key(0)


def _rand(key, n, d):
    return jax.random.normal(key, (n, d))


def _k1d_np(base, t):
    t = np.abs(np.asarray(t, np.float64))
    if base == "rbf":
        return np.exp(-0.5 * t * t)
    if base == "matern12":
        return np.exp(-t)
    if base == "matern32":
        s = np.sqrt(3) * t
        return (1 + s) * np.exp(-s)
    if base == "matern52":
        s = np.sqrt(5) * t
        return (1 + s + s * s / 3) * np.exp(-s)
    raise ValueError(base)


# ---------------------------------------------------------------- full-D


@pytest.mark.parametrize("family", ["rbf", "matern12", "matern32", "matern52"])
def test_full_d_gram_vs_loop_oracle(family):
    n, m, D = 7, 5, 3
    x1 = _rand(jax.random.key(1), n, D)
    x2 = _rand(jax.random.key(2), m, D)
    spec = KernelSpec(family=family, ard=True)
    params, buf = init_kernel_params(KEY, spec, D)
    params = {**params, "raw_lengthscale": jnp.array([0.1, -0.2, 0.4])}
    K = np.asarray(gram(spec, params, buf, x1, x2))

    ls = np.asarray(softplus(params["raw_lengthscale"]))
    os_ = float(softplus(params["raw_outputscale"]))
    oracle = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            r = np.linalg.norm((np.asarray(x1[i]) - np.asarray(x2[j])) / ls)
            oracle[i, j] = os_ * _k1d_np(family, r)
    np.testing.assert_allclose(K, oracle, rtol=2e-4, atol=2e-5)


def test_full_d_gram_psd_and_symmetric():
    x = _rand(jax.random.key(3), 20, 4)
    spec = KernelSpec(family="rbf")
    params, buf = init_kernel_params(KEY, spec, 4)
    K = np.asarray(gram(spec, params, buf, x, x))
    np.testing.assert_allclose(K, K.T, atol=1e-6)
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-5


# ------------------------------------------------------------- projection


def _projection_oracle(spec, params, buf, x1, x2):
    """Hand-summed dense RPA kernel: the parity oracle."""
    P = np.asarray(buf.get("proj", params.get("proj")))
    ls = np.asarray(softplus(params["raw_lengthscale"]), np.float64)
    os_raw = np.asarray(softplus(params["raw_outputscale"]), np.float64)
    z1 = np.asarray(x1, np.float64) @ P
    z2 = np.asarray(x2, np.float64) @ P
    n, m = z1.shape[0], z2.shape[0]
    out = np.zeros((n, m))
    flat = 0
    for j, (d, base) in enumerate(zip(spec.degrees, spec.bases)):
        comp = np.ones((n, m))
        for i in range(d):
            t = (z1[:, flat + i, None] - z2[None, :, flat + i]) / ls[flat + i]
            comp *= _k1d_np(base, t)
        w = (os_raw[j] if spec.per_component_scale else float(os_raw)) / spec.J
        out += w * comp
        flat += d
    return out


@pytest.mark.parametrize("d", [1, 2, 3])
def test_projection_gram_vs_oracle(d):
    n, m, D, J = 9, 6, 5, 4
    x1 = _rand(jax.random.key(4), n, D)
    x2 = _rand(jax.random.key(5), m, D)
    spec = KernelSpec.polynomial(J=J, d=d, base="rbf")
    params, buf = init_kernel_params(KEY, spec, D)
    params = {
        **params,
        "raw_lengthscale": jax.random.normal(jax.random.key(6), (J * d,)) * 0.3,
    }
    K = np.asarray(gram(spec, params, buf, x1, x2))
    oracle = _projection_oracle(spec, params, buf, x1, x2)
    np.testing.assert_allclose(K, oracle, rtol=1e-4, atol=1e-5)


def test_generalized_heterogeneous_vs_oracle():
    n, D = 8, 4
    x = _rand(jax.random.key(7), n, D)
    spec = KernelSpec.generalized(
        degrees=(1, 2, 1, 3), bases=("rbf", "matern32", "matern52", "rbf")
    )
    params, buf = init_kernel_params(KEY, spec, D)
    params = {
        **params,
        "raw_lengthscale": jax.random.normal(jax.random.key(8), (7,)) * 0.2,
    }
    K = np.asarray(gram(spec, params, buf, x, x))
    oracle = _projection_oracle(spec, params, buf, x, x)
    np.testing.assert_allclose(K, oracle, rtol=1e-4, atol=1e-5)
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-5  # PSD


def test_per_component_scale_vs_oracle():
    n, D, J = 6, 3, 5
    x = _rand(jax.random.key(9), n, D)
    spec = KernelSpec.polynomial(J=J, d=1, per_component_scale=True)
    params, buf = init_kernel_params(KEY, spec, D)
    params = {
        **params,
        "raw_outputscale": jax.random.normal(jax.random.key(10), (J,)) * 0.5,
    }
    K = np.asarray(gram(spec, params, buf, x, x))
    oracle = _projection_oracle(spec, params, buf, x, x)
    np.testing.assert_allclose(K, oracle, rtol=1e-4, atol=1e-5)


def test_learn_proj_places_proj_in_params():
    spec = KernelSpec.polynomial(J=3, d=1, learn_proj=True)
    params, buf = init_kernel_params(KEY, spec, 4)
    assert "proj" in params and "proj" not in buf
    spec2 = KernelSpec.polynomial(J=3, d=1)
    params2, buf2 = init_kernel_params(KEY, spec2, 4)
    assert "proj" in buf2 and "proj" not in params2


def test_gram_diag_matches_dense_diag():
    x = _rand(jax.random.key(11), 10, 4)
    for spec in [KernelSpec(family="rbf"), KernelSpec.polynomial(J=6, d=2)]:
        params, buf = init_kernel_params(KEY, spec, 4)
        K = np.asarray(gram(spec, params, buf, x, x))
        dg = np.asarray(gram_diag(spec, params, buf, x))
        np.testing.assert_allclose(dg, np.diagonal(K), rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------------ MVM


@pytest.mark.parametrize("block", [3, 64])
def test_blocked_mvm_matches_dense(block):
    n, m, D, t = 17, 11, 4, 3
    x1 = _rand(jax.random.key(12), n, D)
    x2 = _rand(jax.random.key(13), m, D)
    V = _rand(jax.random.key(14), m, t)
    for spec in [KernelSpec(family="rbf"), KernelSpec.polynomial(J=5, d=2)]:
        params, buf = init_kernel_params(KEY, spec, D)
        dense = np.asarray(gram(spec, params, buf, x1, x2)) @ np.asarray(V)
        out = np.asarray(mvm(spec, params, buf, x1, x2, V, block_rows=block))
        np.testing.assert_allclose(out, dense, rtol=1e-4, atol=1e-5)


def test_kernel_convergence_to_limit():
    """RPA kernel -> limiting kernel as J grows (arXiv:1912.12834 Thm):
    variance of the estimate decays ~ 1/J. Checked via agreement between
    two independent J-sample kernels tightening as J grows."""
    D, n = 6, 12
    x = _rand(jax.random.key(15), n, D)

    def k_at(J, seed):
        spec = KernelSpec.polynomial(J=J, d=1, base="rbf", proj_dist="gaussian")
        params, buf = init_kernel_params(jax.random.key(seed), spec, D)
        return np.asarray(gram(spec, params, buf, x, x))

    d_small = np.abs(k_at(5, 1) - k_at(5, 2)).mean()
    d_large = np.abs(k_at(500, 3) - k_at(500, 4)).mean()
    assert d_large < d_small / 3


def test_kernel_converges_to_closed_form_limit():
    """Gaussian projections + RBF base have a CLOSED-FORM limit kernel:
    p^T(x-x') ~ N(0, ||x-x'||^2/D) so E[k1d] = os/sqrt(1+||x-x'||^2/(D l^2))
    (arXiv:1912.12834 Thm 1). Checks convergence AND the O(1/J) variance
    rate (rmse ~ 1/sqrt(J)). Full table: scripts/j_convergence.py ->
    docs/CONVERGENCE.md (the reference's notebooks analog)."""
    from rpagp.utils.transforms import softplus

    n, D = 24, 8
    x = _rand(jax.random.key(30), n, D)
    ls = float(softplus(0.0))
    os_ = float(softplus(0.0))
    d2 = np.sum(
        (np.asarray(x)[:, None, :] - np.asarray(x)[None, :, :]) ** 2, -1
    )
    K_inf = os_ / np.sqrt(1.0 + d2 / (D * ls**2))

    def rmse_at(J, n_seeds=4):
        errs = []
        for s in range(n_seeds):
            spec = KernelSpec.polynomial(J=J, d=1, base="rbf",
                                         proj_dist="gaussian")
            params, buf = init_kernel_params(jax.random.key(70 + s), spec, D)
            K = np.asarray(gram(spec, params, buf, x, x), np.float64)
            errs.append(np.sqrt(np.mean((K - K_inf) ** 2)))
        return float(np.mean(errs))

    r10, r640, r_big = rmse_at(10), rmse_at(640), rmse_at(1500, n_seeds=1)
    # converges to the closed form, not merely to agreement between draws
    assert r_big < 0.01, r_big
    # O(1/J) variance: rmse ratio for 64x the components should be ~8
    ratio = r10 / r640
    assert 4.0 < ratio < 16.0, (r10, r640, ratio)


def test_limit_kernel_family_matches_closed_form():
    """The RUNNABLE limit model (family="rp_limit_rbf"): its gram is the
    closed form, its diagonal is the outputscale, and it is PSD."""
    from rpagp.ops.kernels import gram_diag
    from rpagp.utils.transforms import softplus

    n, D = 32, 8
    x = _rand(jax.random.key(31), n, D)
    spec = KernelSpec(family="rp_limit_rbf")
    params, buf = init_kernel_params(jax.random.key(0), spec, D)
    params = {"raw_lengthscale": jnp.asarray([0.4], jnp.float32),
              "raw_outputscale": jnp.asarray(-0.2, jnp.float32)}
    K = np.asarray(gram(spec, params, buf, x, x), np.float64)
    ls = float(softplus(0.4))
    os_ = float(softplus(-0.2))
    d2 = np.sum(
        (np.asarray(x)[:, None, :] - np.asarray(x)[None, :, :]) ** 2, -1)
    K_ref = os_ / np.sqrt(1.0 + d2 / (D * ls**2))
    np.testing.assert_allclose(K, K_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gram_diag(spec, params, buf, x)),
                               os_, rtol=1e-6)
    evals = np.linalg.eigvalsh(K)
    assert evals.min() > -1e-5  # PSD (inverse multiquadric class)


def test_finite_j_gap_vs_limit_model_end_to_end():
    """The accuracy-story separator (round-2 verdict item 3): train
    rp_poly at J=5 and J=20 and the closed-form LIMIT model on the SAME
    split. The finite-J models must approach the limit model's test RMSE
    monotonically in J — if rp_poly trails exact_rbf on some data but
    matches its own limit, the gap is the kernel FAMILY on that data
    (benign, the paper's regime), not the finite-J spec. Full sweep
    table: docs/SWEEP_r3.md."""
    import optax

    from rpagp.mll import mll as mll_fn, posterior as posterior_fn
    from rpagp.models import exact_gp
    from rpagp.models.exact_gp import ModelSpec
    from rpagp.train import train_to_convergence

    n, n_test, D = 256, 64, 8
    kx, ky = jax.random.split(jax.random.key(7))
    xa = jax.random.normal(kx, (n + n_test, D), jnp.float32)
    ya = jnp.sin(2.0 * xa[:, 0]) + 0.5 * xa[:, 1] \
        + 0.1 * jax.random.normal(ky, (n + n_test,), jnp.float32)
    x, y, xt, yt = xa[:n], ya[:n], xa[n:], ya[n:]

    def run(kspec, seed=0):
        spec = ModelSpec(kernel=kspec, max_cholesky_size=4096)
        params, buffers = exact_gp.init_model(jax.random.key(seed), spec, D)
        loss = lambda p, b, xx, yy: -mll_fn(spec, p, b, xx, yy) / n
        res = train_to_convergence(loss, params, max_iters=150,
                                   patience=20, rel_tol=1e-6,
                                   optimizer=optax.adam(0.1),
                                   loss_args=(buffers, x, y))
        mu, _ = posterior_fn(spec, res.params, buffers, x, y, xt)
        return float(jnp.sqrt(jnp.mean((mu - yt) ** 2)))

    r_limit = run(KernelSpec(family="rp_limit_rbf"))
    r_j5 = np.mean([run(KernelSpec.polynomial(J=5, d=1), seed=s)
                    for s in range(2)])
    r_j20 = np.mean([run(KernelSpec.polynomial(J=20, d=1), seed=s)
                     for s in range(2)])
    # J=20 sits closer to the limit than J=5, and within a finite-J band
    assert abs(r_j20 - r_limit) < abs(r_j5 - r_limit) + 0.02, \
        (r_j5, r_j20, r_limit)
    assert abs(r_j20 - r_limit) < 0.15, (r_j20, r_limit)


def test_sub_dim_k_equals_kdim_rbf_oracle():
    """PolynomialProjectionKernel's k parameter: a k-dim isotropic RBF
    sub-kernel == the tied product of its k 1-D factors. Oracle: explicit
    exp(-||P_j x - P_j x'||^2 / (2 l_j^2)) with (D, k) blocks of P."""
    n, m, D, J, k = 8, 6, 5, 3, 2
    x1 = _rand(jax.random.key(20), n, D)
    x2 = _rand(jax.random.key(21), m, D)
    spec = KernelSpec.polynomial(J=J, d=1, k=k, base="rbf")
    params, buf = init_kernel_params(KEY, spec, D)
    params = {
        **params,
        "raw_lengthscale": jax.random.normal(jax.random.key(22), (J,)) * 0.3,
    }
    K = np.asarray(gram(spec, params, buf, x1, x2))

    P = np.asarray(buf["proj"], np.float64)  # (D, J*k)
    ls = np.asarray(softplus(params["raw_lengthscale"]), np.float64)
    os_ = float(softplus(params["raw_outputscale"]))
    oracle = np.zeros((n, m))
    z1 = np.asarray(x1, np.float64) @ P
    z2 = np.asarray(x2, np.float64) @ P
    for j in range(J):
        blk = slice(j * k, (j + 1) * k)
        d2 = ((z1[:, None, blk] - z2[None, :, blk]) ** 2).sum(-1)
        oracle += (os_ / J) * np.exp(-0.5 * d2 / ls[j] ** 2)
    np.testing.assert_allclose(K, oracle, rtol=1e-4, atol=1e-5)
