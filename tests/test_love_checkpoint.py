"""LOVE Lanczos-cache variance vs exact oracle; checkpoint round-trips."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from rpagp import KernelSpec, ModelSpec, init_model, predict
from rpagp.models.exact_gp import noise_value, mean_fn
from rpagp.ops import iterative, kernels, love
from rpagp.utils import checkpoint as ckpt

KEY = jax.random.key(0)
_HI = jax.lax.Precision.HIGHEST


def _setup(n=200, D=3, seed=4, **kw):
    kx, ky = jax.random.split(jax.random.key(seed))
    x = jax.random.normal(kx, (n, D))
    y = jnp.sin(2 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,))
    spec = ModelSpec(kernel=KernelSpec.polynomial(J=5, d=1), **kw)
    params, buffers = init_model(KEY, spec, D)
    return spec, params, buffers, x, y


def test_lanczos_basis_and_solve_quality():
    spec, params, buffers, x, y = _setup(n=60)
    A = kernels.gram(spec.kernel, params["kernel"], buffers["kernel"], x, x)
    A = A + noise_value(params) * jnp.eye(60)
    Q, T = love.lanczos(lambda V: jnp.matmul(A, V, precision=_HI), y, 60)
    Qn, Tn = np.asarray(Q, np.float64), np.asarray(T, np.float64)
    An = np.asarray(A, np.float64)
    # orthonormal basis even through breakdown restarts
    np.testing.assert_allclose(Qn.T @ Qn, np.eye(60), atol=5e-3)
    # T's spectrum lives inside A's
    wA, wT = np.linalg.eigvalsh(An), np.linalg.eigvalsh(Tn)
    assert wT.min() > wA.min() - 1e-3 and wT.max() < wA.max() + 1e-3
    # the thing LOVE consumes: A^{-1} y through the cache matches dense
    cache = love.build_love_cache(
        lambda V: jnp.matmul(A, V, precision=_HI),
        y, noise_value(params), 60,
    )
    want = np.linalg.solve(An, np.asarray(y, np.float64))
    np.testing.assert_allclose(np.asarray(cache.alpha), want, atol=5e-3)


def test_love_posterior_matches_exact():
    spec, params, buffers, x, y = _setup(
        n=250, cg_max_iters=100, cg_tol=1e-8, precond_rank=10,
        num_probes=8, love_rank=120,
    )
    xt = jax.random.normal(jax.random.key(9), (40, x.shape[1]))
    mu_e, var_e = predict(spec, params, buffers, x, y, xt)
    mu_l, var_l = iterative.iterative_posterior(
        spec, params, buffers, x, y, xt
    )
    np.testing.assert_allclose(np.asarray(mu_l), np.asarray(mu_e), atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(var_l), np.asarray(var_e), rtol=3e-2, atol=3e-3
    )


def test_love_variance_never_below_noise():
    spec, params, buffers, x, y = _setup(
        n=150, love_rank=30, precond_rank=0, cg_max_iters=50
    )
    xt = jax.random.normal(jax.random.key(10), (25, x.shape[1]))
    _, var = iterative.iterative_posterior(spec, params, buffers, x, y, xt)
    assert float(var.min()) >= float(noise_value(params)) - 1e-6


def test_checkpoint_roundtrip_and_rotation():
    spec, params, buffers, x, y = _setup(n=30)
    import optax

    opt = optax.adam(0.1)
    state = {
        "params": params,
        "buffers": buffers,
        "opt_state": opt.init(params),
        "key": jax.random.key(7),
        "step": jnp.asarray(123),
    }
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt_test")
        ckpt.save_checkpoint(path, state)
        loaded = ckpt.load_checkpoint(path, state)
        def as_np(v):
            if isinstance(v, jax.Array) and jnp.issubdtype(
                v.dtype, jax.dtypes.prng_key
            ):
                return np.asarray(jax.random.key_data(v))
            return np.asarray(v)

        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(state),
            jax.tree_util.tree_leaves_with_path(loaded),
        ):
            assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
            np.testing.assert_array_equal(as_np(a), as_np(b))
        # the projections (model-defining buffers) really round-tripped
        np.testing.assert_array_equal(
            np.asarray(loaded["buffers"]["kernel"]["proj"]),
            np.asarray(buffers["kernel"]["proj"]),
        )

        cp = ckpt.Checkpointer(d, every=10, keep=2)
        for step in range(0, 50, 10):
            cp.maybe_save(step, state)
        files = [f for f in os.listdir(d) if f.endswith(".npz")]
        assert len(files) == 2 + 1  # keep=2 rotating + the manual one
        assert cp.latest() is not None


def test_checkpoint_rejects_structure_mismatch():
    import pytest

    state = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt_mismatch")
        ckpt.save_checkpoint(path, state)
        # same leaf COUNT, different structure: must raise, not scramble
        wrong = {"a": jnp.ones(3), "x": {"y": jnp.zeros(2)}}
        with pytest.raises(ValueError, match="treedef"):
            ckpt.load_checkpoint(path, wrong)
        # different leaf count: must raise the count error
        fewer = {"a": jnp.ones(3)}
        with pytest.raises(ValueError, match="leaves|structure"):
            ckpt.load_checkpoint(path, fewer)
