"""Distributed blocked Cholesky vs the single-chip factor (8-CPU mesh).

The banded factor performs the SAME per-row arithmetic as
ops/block_chol.blocked_cholesky (psums merge disjoint zero-padded
bands), so parity is tight — the distributed_grid_mll trajectory-parity
stance."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from rpagp.ops import block_chol, grid_solve
from rpagp.parallel import dist_chol, sharding


def _mesh8():
    return sharding.make_mesh(jax.devices("cpu"))


def _spd(p, seed=0, jitter=0.5):
    B = jax.random.normal(jax.random.key(seed), (p, p), jnp.float32)
    A = B @ B.T / p + jitter * jnp.eye(p, dtype=jnp.float32)
    return 0.5 * (A + A.T)


def _smap(fn, mesh, n_out=1):
    out = P() if n_out == 1 else (P(),) * n_out
    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(P(),), out_specs=out,
        check_vma=False))


@pytest.mark.parametrize("p", [256, 320, 1024])
def test_distributed_factor_matches_single_chip(p):
    """Value parity with blocked_cholesky at matching block size,
    including ragged p (identity-tail pad across the band layout)."""
    C = _spd(p, seed=p)
    mesh = _mesh8()

    fn = _smap(lambda c: dist_chol.distributed_blocked_cholesky(
        c, sharding.AXIS, block=128)[0], mesh)
    L = fn(C)
    want = block_chol.blocked_cholesky(C, block=128, leaf="xla")
    np.testing.assert_allclose(np.asarray(L), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_distributed_factor_gradient_matches(pmean_tol=2e-4):
    """Gradient parity through a symmetrized loss: per-device grads
    pmean'd over the data axis equal the single-chip gradient (the
    distributed_grid_mll contract)."""
    p = 320
    C = _spd(p, seed=3)
    R = jax.random.normal(jax.random.key(4), (p, p), jnp.float32)
    mesh = _mesh8()

    def loss_dist(c):
        cs = 0.5 * (c + c.T)
        L, _ = dist_chol.distributed_blocked_cholesky(
            cs, sharding.AXIS, block=128)
        val = jnp.vdot(L, R) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        return val

    def vg(c):
        v, g = jax.value_and_grad(loss_dist)(c)
        return v, jax.lax.pmean(g, sharding.AXIS)

    smapped = jax.jit(jax.shard_map(
        vg, mesh=mesh, in_specs=(P(),), out_specs=(P(), P()),
        check_vma=False))
    v_d, g_d = smapped(C)

    def loss_ref(c):
        cs = 0.5 * (c + c.T)
        L = block_chol.blocked_cholesky(cs, block=128, leaf="xla")
        return jnp.vdot(L, R) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

    v_r, g_r = jax.value_and_grad(loss_ref)(C)
    np.testing.assert_allclose(float(v_d), float(v_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_r),
                               rtol=pmean_tol, atol=1e-6)


def test_distributed_factor_nan_on_indefinite():
    """Non-sanitizing factor NaN-propagates (ladder probe contract)."""
    p = 256
    C = _spd(p, seed=6) - 10.0 * jnp.eye(p, dtype=jnp.float32)
    mesh = _mesh8()
    fn = _smap(lambda c: dist_chol.distributed_blocked_cholesky(
        c, sharding.AXIS, block=128)[0], mesh)
    assert not bool(jnp.all(jnp.isfinite(fn(C))))


def test_distributed_fallback_exact_level_and_escalation():
    """Fast path: PD input -> eps 0, factor == single-chip fallback.
    Escalation: indefinite C (min eig ~ -0.05 vs noise 1) engages the
    shared _C_LEVELS ladder at the same level as grid_solve's."""
    p = 256
    mesh = _mesh8()
    noise = jnp.asarray(1.0, jnp.float32)

    Cpd = _spd(p, seed=7)
    fn = _smap(lambda c: dist_chol.distributed_chol_with_fallback_eps(
        c, noise, sharding.AXIS, block=128), mesh, n_out=2)
    L, eps = fn(Cpd)
    assert float(eps) == 0.0
    want = jnp.linalg.cholesky(Cpd)
    np.testing.assert_allclose(np.asarray(L), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # controlled indefiniteness: eigenvalues in [-0.05, 1], noise = 1
    Q, _ = jnp.linalg.qr(jax.random.normal(jax.random.key(8), (p, p)))
    vals = jnp.linspace(-0.05, 1.0, p).astype(jnp.float32)
    Cbad = (Q * vals) @ Q.T
    Cbad = 0.5 * (Cbad + Cbad.T)
    Lb, epsb = fn(Cbad)
    assert float(epsb) > 0.0
    assert bool(jnp.all(jnp.isfinite(Lb)))
    # same level the single-chip ladder picks
    _, eps_ref = grid_solve._chol_with_fallback_eps(Cbad, noise)
    np.testing.assert_allclose(float(epsb), float(eps_ref), rtol=1e-6)
