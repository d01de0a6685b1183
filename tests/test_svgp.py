"""SVGP oracle tests: ELBO is a valid lower bound on the exact MLL; the
variational posterior approaches the exact posterior with M = n inducing
points; minibatch training learns (SURVEY.md §4 pattern)."""

import jax
import jax.numpy as jnp
import numpy as np

from rpagp import KernelSpec, ModelSpec, exact_mll, init_model, predict
from rpagp.models import svgp
from rpagp.models.exact_gp import noise_value

KEY = jax.random.key(0)


def _problem(n=120, D=3, seed=5):
    kx, ky = jax.random.split(jax.random.key(seed))
    x = jax.random.normal(kx, (n, D))
    y = jnp.sin(2 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,))
    return x, y


def test_elbo_lower_bounds_exact_mll():
    x, y = _problem()
    spec = ModelSpec(kernel=KernelSpec(family="rbf"))
    params, buffers = svgp.init_svgp_params(KEY, spec, x, num_inducing=40)
    bound = float(svgp.elbo(spec, params, buffers, x, y, x.shape[0]))
    # exact MLL with the SAME kernel hyperparameters (shared raw init)
    eparams, ebuffers = init_model(KEY, spec, x.shape[1])
    mll = float(exact_mll(spec, eparams, ebuffers, x, y))
    assert bound < mll + 1e-3, (bound, mll)


def test_trained_full_inducing_svgp_approaches_exact_posterior():
    x, y = _problem(n=80)
    spec = ModelSpec(kernel=KernelSpec(family="rbf"))
    params, buffers = svgp.init_svgp_params(KEY, spec, x, num_inducing=80)
    res = svgp.train_svgp(
        spec, params, buffers, x, y, jax.random.key(1),
        batch_size=80, num_epochs=400, lr=0.02,
    )
    xt = jax.random.normal(jax.random.key(2), (30, x.shape[1]))
    mu_v, var_v = svgp.svgp_predict(spec, res.params, buffers, xt)

    # exact GP trained on the same data as the oracle
    from rpagp.train import train_to_convergence

    eparams, ebuffers = init_model(KEY, spec, x.shape[1])
    er = train_to_convergence(
        lambda p: -exact_mll(spec, p, ebuffers, x, y) / x.shape[0],
        eparams, lr=0.05, max_iters=400, patience=30,
    )
    mu_e, var_e = predict(spec, er.params, ebuffers, x, y, xt)
    # variational posterior with M=n should track the exact one closely
    np.testing.assert_allclose(np.asarray(mu_v), np.asarray(mu_e), atol=0.15)
    corr = np.corrcoef(np.asarray(var_v), np.asarray(var_e))[0, 1]
    assert corr > 0.9, corr


def test_minibatch_training_learns():
    x, y = _problem(n=400)
    spec = ModelSpec(kernel=KernelSpec.polynomial(J=6, d=1))
    params, buffers = svgp.init_svgp_params(KEY, spec, x, num_inducing=64)
    res = svgp.train_svgp(
        spec, params, buffers, x, y, jax.random.key(3),
        batch_size=100, num_epochs=60, lr=0.02,
    )
    assert res.losses[-1] < res.losses[0]
    xt, yt = _problem(n=100, seed=6)
    mu, var = svgp.svgp_predict(spec, res.params, buffers, xt)
    rmse = float(jnp.sqrt(jnp.mean((mu - yt) ** 2)))
    const = float(jnp.sqrt(jnp.mean((yt - y.mean()) ** 2)))
    assert rmse < const, (rmse, const)
    assert np.isfinite(var).all() and (np.asarray(var) > 0).all()


def test_var_chol_is_valid_lower_triangular():
    x, _ = _problem(n=50)
    spec = ModelSpec(kernel=KernelSpec(family="rbf"))
    params, _ = svgp.init_svgp_params(KEY, spec, x, num_inducing=16)
    C = np.asarray(svgp._var_chol(params))
    assert np.allclose(C, np.tril(C))
    assert (np.diagonal(C) > 0).all()
    np.testing.assert_allclose(np.diagonal(C), 1.0, atol=1e-5)  # init scale


def _mesh8():
    from rpagp.parallel import sharding
    return sharding.make_mesh(jax.devices("cpu"))


def test_distributed_elbo_matches_single_device():
    """Value AND gradient parity of the SPMD minibatch ELBO vs
    models.svgp.elbo on an 8-CPU mesh (pmean gradient contract)."""
    import functools

    from jax.sharding import PartitionSpec as P

    from rpagp.parallel import sharding

    x, y = _problem(n=160)
    spec = ModelSpec(kernel=KernelSpec.polynomial(J=4, d=1, base="rbf"))
    params, buffers = svgp.init_svgp_params(KEY, spec, x, num_inducing=24)
    mesh = _mesh8()

    def loss_ref(p):
        return -svgp.elbo(spec, p, buffers, x, y, x.shape[0]) / x.shape[0]

    v_ref, g_ref = jax.value_and_grad(loss_ref)(params)

    def local(p, bufs, xl, yl):
        loss, g = jax.value_and_grad(
            lambda q: -sharding.distributed_elbo(
                spec, q, bufs, xl, yl, x.shape[0]) / x.shape[0])(p)
        return loss, jax.lax.pmean(g, sharding.AXIS)

    smapped = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(sharding.AXIS), P(sharding.AXIS)),
        out_specs=(P(), P()), check_vma=False))
    v_d, g_d = smapped(params, buffers, x, y)
    np.testing.assert_allclose(float(v_d), float(v_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_d)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)


def test_distributed_svgp_training_matches_single_device():
    """Full distributed training (2 epochs) reproduces the single-device
    trajectory: same key -> same permutations -> losses and final params
    agree to reduction-order roundoff."""
    x, y = _problem(n=256)
    spec = ModelSpec(kernel=KernelSpec(family="rbf"))
    params, buffers = svgp.init_svgp_params(KEY, spec, x, num_inducing=16)
    kt = jax.random.key(7)
    res1 = svgp.train_svgp(spec, params, buffers, x, y, kt,
                           batch_size=64, num_epochs=2, lr=0.05)
    res2 = svgp.train_svgp_distributed(
        spec, params, buffers, x, y, kt, mesh=_mesh8(),
        batch_size=64, num_epochs=2, lr=0.05)
    np.testing.assert_allclose(res2.losses, res1.losses, rtol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(res1.params),
                    jax.tree_util.tree_leaves(res2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)
