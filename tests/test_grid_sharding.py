"""Distributed exact grid-space solver vs the single-chip oracle.

The SPMD grid MLL (parallel/sharding.distributed_grid_mll) must match
ops.grid_solve.grid_mll exactly — same grid geometry, same factor, the
only differences are WHERE sums happen (psum over the data axis). Value
AND gradient parity on the virtual 8-CPU mesh, 1-D and 2-D (data x
comp) — the 2-D case exercises the replicated-comp gradient contract
(psum over data + pmean over comp counts each term exactly once)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rpagp.models import exact_gp
from rpagp.models.exact_gp import ModelSpec
from rpagp.ops import grid_solve
from rpagp.ops.kernels import KernelSpec
from rpagp.parallel import sharding


def _setup(n=512, D=4, J=4, m=32, seed=0, d=1, k=1):
    kspec = KernelSpec.polynomial(J=J, d=d, k=k, base="rbf",
                                  proj_dist="gaussian", ski=True,
                                  grid_size=m)
    spec = ModelSpec(kernel=kspec, max_cholesky_size=64)
    kx, ky = jax.random.split(jax.random.key(seed))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.3 * jax.random.normal(
        ky, (n,), jnp.float32)
    params, buffers = exact_gp.init_model(jax.random.key(seed + 1), spec, D)
    assert grid_solve.use_grid_solver(spec, n)
    return spec, params, buffers, x, y


def _single_chip(spec, params, buffers, x, y):
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x)
    v, g = jax.value_and_grad(
        lambda p: grid_solve.grid_mll(spec, p, buffers, x, y))(params)
    return float(v), g


def _distributed(spec, params, buffers, x, y, mesh):
    xs = sharding.shard_rows(x, mesh)
    ys = sharding.shard_rows(y, mesh)
    params_r = sharding.replicate(params, mesh)
    buffers_r = sharding.replicate(buffers, mesh)
    state, S4 = sharding.prepare_distributed_grid(
        spec, params_r, buffers_r, xs, mesh)
    assert state is not None and S4 is not None
    comp_axis = (sharding.COMP_AXIS
                 if sharding.COMP_AXIS in mesh.axis_names else None)

    def vg(p, xl, yl, sst, S):
        loss, g = jax.value_and_grad(
            lambda pp: sharding.distributed_grid_mll(
                spec, pp, xl, yl, sst, S))(p)
        # pmean: see distributed_grid_mll's gradient-assembly contract
        g = jax.lax.pmean(g, sharding.AXIS)
        if comp_axis is not None:
            g = jax.lax.pmean(g, comp_axis)
        return loss, g

    from jax.sharding import PartitionSpec as P

    smapped = jax.jit(jax.shard_map(
        vg, mesh=mesh,
        in_specs=(P(), P(sharding.AXIS), P(sharding.AXIS),
                  sharding._ski_state_in_specs(None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    loss, g = smapped(params_r, xs, ys, state, S4)
    return float(loss), g, (state, S4)


def _grad_relerr(ga, gb):
    la, lb = jax.tree.leaves(ga), jax.tree.leaves(gb)
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(la, lb))
    den = sum(float(jnp.sum(b**2)) for b in lb)
    return (num / max(den, 1e-30)) ** 0.5


def test_distributed_grid_mll_matches_single_chip_1d():
    spec, params, buffers, x, y = _setup()
    v1, g1 = _single_chip(spec, params, buffers, x, y)
    mesh = sharding.make_mesh(jax.devices("cpu"))
    v8, g8, _ = _distributed(spec, params, buffers, x, y, mesh)
    assert abs(v8 - v1) / abs(v1) < 1e-5
    assert _grad_relerr(g8, g1) < 1e-4


def test_distributed_grid_mll_matches_single_chip_2d_mesh():
    """data x comp mesh: comp replicates the grid computation; the
    psum+pmean assembly must not double count."""
    spec, params, buffers, x, y = _setup()
    v1, g1 = _single_chip(spec, params, buffers, x, y)
    mesh = sharding.make_mesh(jax.devices("cpu"), comp=2)
    v, g, _ = _distributed(spec, params, buffers, x, y, mesh)
    assert abs(v - v1) / abs(v1) < 1e-5
    assert _grad_relerr(g, g1) < 1e-4


def test_distributed_grid_train_step_runs_and_descends():
    """make_distributed_train_step with (ski_state, grid_gram): a few
    deterministic Adam steps must strictly decrease the exact loss."""
    spec, params, buffers, x, y = _setup(n=512)
    mesh = sharding.make_mesh(jax.devices("cpu"))
    xs = sharding.shard_rows(x, mesh)
    ys = sharding.shard_rows(y, mesh)
    params = sharding.replicate(params, mesh)
    buffers = sharding.replicate(buffers, mesh)
    state, S4 = sharding.prepare_distributed_grid(
        spec, params, buffers, xs, mesh)
    opt = optax.adam(0.1)
    step = sharding.make_distributed_train_step(spec, mesh, opt,
                                                n_global=x.shape[0])
    opt_state = opt.init(params)
    losses = []
    for i in range(5):
        params, opt_state, loss = step(params, buffers, opt_state, xs, ys,
                                       jax.random.key(i), state, S4)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_distributed_grid_posterior_matches_single_chip():
    """make_distributed_posterior dispatches grid specs to the exact
    sharded grid posterior; mean/var must match ops.grid_solve's
    single-chip grid_posterior (same union-bounds grid, same factor —
    only the psum locations differ). Includes extrapolating test points
    (x scaled 1.5x beyond the train range)."""
    spec, params, buffers, x, y = _setup()
    kt = jax.random.key(7)
    xt = 1.5 * jax.random.normal(kt, (64, x.shape[1]), jnp.float32)

    b1 = exact_gp.prepare_buffers(spec, params, buffers, x)
    mu1, var1 = grid_solve.grid_posterior(spec, params, b1, x, y, xt)

    mesh = sharding.make_mesh(jax.devices("cpu"))
    xs = sharding.shard_rows(x, mesh)
    ys = sharding.shard_rows(y, mesh)
    params_r = sharding.replicate(params, mesh)
    buffers_r = sharding.replicate(buffers, mesh)
    predict = sharding.make_distributed_posterior(spec, mesh,
                                                  n_global=x.shape[0])
    mu8, var8 = predict(params_r, buffers_r, xs, ys, xt, jax.random.key(9))

    np.testing.assert_allclose(np.asarray(mu8), np.asarray(mu1),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(var8), np.asarray(var1),
                               atol=1e-4, rtol=1e-4)
    assert np.all(np.asarray(var8) > 0)


def test_prepare_distributed_grid_gram_matches_single_chip():
    spec, params, buffers, x, y = _setup()
    mesh = sharding.make_mesh(jax.devices("cpu"))
    xs = sharding.shard_rows(x, mesh)
    params_r = sharding.replicate(params, mesh)
    buffers_r = sharding.replicate(buffers, mesh)
    state, S4 = sharding.prepare_distributed_grid(
        spec, params_r, buffers_r, xs, mesh)
    b1 = exact_gp.prepare_buffers(spec, params, buffers, x)
    np.testing.assert_allclose(np.asarray(S4), np.asarray(b1["ski_uu"]),
                               atol=1e-3, rtol=1e-5)


def test_distributed_grid_mll_product_matches_single_chip():
    """Product (degree-2) SKI through the SPMD mirror: the dispatchers
    (_build_geometry/_build_gram/_interp_T/_interp_A) must route the
    sharded path onto ops/ski_product.py identically to single-chip."""
    spec, params, buffers, x, y = _setup(n=512, J=3, m=12, d=2)
    v1, g1 = _single_chip(spec, params, buffers, x, y)
    mesh = sharding.make_mesh(jax.devices("cpu"))
    v8, g8, _ = _distributed(spec, params, buffers, x, y, mesh)
    assert abs(v8 - v1) / abs(v1) < 1e-5
    assert _grad_relerr(g8, g1) < 1e-4


def test_distributed_grid_posterior_product_matches_single_chip():
    spec, params, buffers, x, y = _setup(n=512, J=3, m=12, d=2)
    xt = 1.2 * jax.random.normal(jax.random.key(7), (48, x.shape[1]),
                                 jnp.float32)
    b1 = exact_gp.prepare_buffers(spec, params, buffers, x)
    mu1, var1 = grid_solve.grid_posterior(spec, params, b1, x, y, xt)

    mesh = sharding.make_mesh(jax.devices("cpu"))
    xs = sharding.shard_rows(x, mesh)
    ys = sharding.shard_rows(y, mesh)
    params_r = sharding.replicate(params, mesh)
    buffers_r = sharding.replicate(buffers, mesh)
    predict = sharding.make_distributed_posterior(spec, mesh,
                                                  n_global=x.shape[0])
    mu8, var8 = predict(params_r, buffers_r, xs, ys, xt, jax.random.key(9))
    np.testing.assert_allclose(np.asarray(mu8), np.asarray(mu1),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(var8), np.asarray(var1),
                               atol=1e-4, rtol=1e-4)


def test_distributed_grid_mll_with_banded_factor(monkeypatch):
    """RPAGP_DIST_CHOL=1 routes the p x p factor through the row-banded
    distributed Cholesky (parallel/dist_chol.py); MLL value and gradient
    must still match the single-chip oracle.

    VALUE parity stays exact (1e-5, same factor bits). The GRADIENT
    carries the banded factor's measured ~2.5e-4 relative noise (see
    dist_chol.distributed_blocked_cholesky's gradient-noise note:
    depth-2 psum-transpose paths through the per-band panel cotangents;
    the _grad_pmean barrier removes the dominant C-level scatter —
    without it this measured 1e-3). 2.5e-4 is ~40x tighter than the
    probe estimator the BBMM path trains with."""
    spec, params, buffers, x, y = _setup()
    v1, g1 = _single_chip(spec, params, buffers, x, y)
    monkeypatch.setenv("RPAGP_DIST_CHOL", "1")
    mesh = sharding.make_mesh(jax.devices("cpu"))
    v8, g8, _ = _distributed(spec, params, buffers, x, y, mesh)
    assert abs(v8 - v1) / abs(v1) < 1e-5
    assert _grad_relerr(g8, g1) < 1e-3


def test_distributed_grid_posterior_with_banded_factor(monkeypatch):
    """Posterior parity with the banded factor engaged."""
    spec, params, buffers, x, y = _setup()
    xt = 1.2 * jax.random.normal(jax.random.key(11), (48, x.shape[1]),
                                 jnp.float32)
    b1 = exact_gp.prepare_buffers(spec, params, buffers, x)
    mu1, var1 = grid_solve.grid_posterior(spec, params, b1, x, y, xt)

    monkeypatch.setenv("RPAGP_DIST_CHOL", "1")
    mesh = sharding.make_mesh(jax.devices("cpu"))
    xs = sharding.shard_rows(x, mesh)
    ys = sharding.shard_rows(y, mesh)
    params_r = sharding.replicate(params, mesh)
    buffers_r = sharding.replicate(buffers, mesh)
    predict = sharding.make_distributed_posterior(spec, mesh,
                                                  n_global=x.shape[0])
    mu8, var8 = predict(params_r, buffers_r, xs, ys, xt, jax.random.key(9))
    np.testing.assert_allclose(np.asarray(mu8), np.asarray(mu1),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(var8), np.asarray(var1),
                               atol=1e-4, rtol=1e-4)


def test_distributed_grid_uy_cache_parity():
    """prepare_distributed_grid(y_sharded=...) returns the replicated
    U^T y / U^T 1 caches; threading them through the train step must
    reproduce the uncached distributed step's loss and parameters (the
    cached U^T yc is the same linear algebra, assembled in grid space)."""
    spec, params, buffers, x, y = _setup(n=512)
    params = {**params, "mean_const": jnp.asarray(0.25, jnp.float32)}
    mesh = sharding.make_mesh(jax.devices("cpu"))
    xs = sharding.shard_rows(x, mesh)
    ys = sharding.shard_rows(y, mesh)
    params_r = sharding.replicate(params, mesh)
    buffers_r = sharding.replicate(buffers, mesh)
    state, S4, uy, u1, vc = sharding.prepare_distributed_grid(
        spec, params_r, buffers_r, xs, mesh, y_sharded=ys)
    assert uy is not None and u1 is not None and vc is not None

    opt = optax.adam(0.05)
    step = sharding.make_distributed_train_step(spec, mesh, opt,
                                                n_global=x.shape[0])

    def run(*cache):
        p, o = params_r, opt.init(params_r)
        losses = []
        for i in range(3):
            p, o, loss = step(p, buffers_r, o, xs, ys,
                              jax.random.key(9), state, S4, *cache)
            losses.append(float(loss))
        return p, losses

    p0, l0 = run()
    p1, l1 = run(uy, u1, vc)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    # params: one f32 rounding in U^T yc, amplified by Adam's
    # grad/sqrt(v) rescaling over 3 steps — roundoff, not bias
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
