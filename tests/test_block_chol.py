"""Blocked (MXU-GEMM) Cholesky vs the builtin oracle.

ops/block_chol.py re-expresses the p x p grid-factor Cholesky as
python-unrolled block elimination whose O(p^3) terms are plain matmuls.
Claims under test: value parity with `jnp.linalg.cholesky`, GRADIENT
parity under plain autodiff (the blocked VJP replaces XLA's trsm-pair
chol VJP), exact passthrough below the block size, the identity-padding
path for p not a block multiple, and NaN propagation on indefinite
input (the failure signal the grid solver's jitter ladders rely on)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpagp.ops import grid_solve
from rpagp.ops.block_chol import blocked_cholesky, blocked_cholesky_safe


def _spd(p, seed=0, shift=0.5):
    """Well-conditioned symmetric PD (p, p) f32 test matrix."""
    B = jax.random.normal(jax.random.key(seed), (p, p), jnp.float32)
    A = B @ B.T / p + shift * jnp.eye(p, dtype=jnp.float32)
    return 0.5 * (A + A.T)


@pytest.mark.parametrize("p,block", [(768, 256), (1024, 256), (600, 256)])
def test_matches_builtin(p, block):
    A = _spd(p)
    L = blocked_cholesky(A, block=block)
    L_ref = jnp.linalg.cholesky(A)
    # strictly lower-triangular output
    assert float(jnp.max(jnp.abs(jnp.triu(L, 1)))) == 0.0
    scale = float(jnp.max(jnp.abs(L_ref)))
    assert float(jnp.max(jnp.abs(L - L_ref))) < 5e-4 * scale
    # reconstruction: L L^T = A to f32 roundoff
    R = L @ L.T - A
    assert float(jnp.max(jnp.abs(R))) < 5e-4 * float(jnp.max(jnp.abs(A)))


def test_small_passthrough_is_builtin():
    A = _spd(100, seed=1)
    L = blocked_cholesky(A, block=256)
    np.testing.assert_array_equal(np.asarray(L),
                                  np.asarray(jnp.linalg.cholesky(A)))


def test_gradient_matches_builtin():
    """Plain autodiff through the blocked graph must agree with the
    builtin chol VJP. Parametrize by an arbitrary M and symmetrize
    inside f, so both paths see the same (convention-free) gradient."""
    p, block = 384, 128
    M = jax.random.normal(jax.random.key(2), (p, p), jnp.float32)
    R = jax.random.normal(jax.random.key(3), (p, p), jnp.float32)

    def f(chol_fn, M):
        A = 0.5 * (M + M.T) / p + 2.0 * jnp.eye(p, dtype=M.dtype)
        return jnp.vdot(chol_fn(A), R)

    g_blk = jax.grad(lambda M: f(lambda A: blocked_cholesky(A, block),
                                 M))(M)
    g_ref = jax.grad(lambda M: f(jnp.linalg.cholesky, M))(M)
    scale = float(jnp.max(jnp.abs(g_ref)))
    assert float(jnp.max(jnp.abs(g_blk - g_ref))) < 1e-3 * scale


@pytest.mark.parametrize("tri", ["0", "1", "2"])
def test_gradient_matches_builtin_tri_variants(tri, monkeypatch):
    """Gradient parity across RPAGP_TRI_UPDATE settings, at a shape
    (nb=5 > tri+2) where tri=1/2 exercise _syrk_tril's recursive
    split AND its zero-fill path under autodiff — the dropped
    upper-triangle cotangents must not perturb the symmetrized-input
    gradient (ADVICE r3: the default-suite shapes hit only the
    full-square leaf)."""
    monkeypatch.setenv("RPAGP_TRI_UPDATE", tri)
    p, block = 1280, 256
    M = jax.random.normal(jax.random.key(12), (p, p), jnp.float32)
    R = jax.random.normal(jax.random.key(13), (p, p), jnp.float32)

    def f(chol_fn, M):
        A = 0.5 * (M + M.T) / p + 2.0 * jnp.eye(p, dtype=M.dtype)
        return jnp.vdot(chol_fn(A), R)

    g_blk = jax.grad(lambda M: f(lambda A: blocked_cholesky(A, block),
                                 M))(M)
    g_ref = jax.grad(lambda M: f(jnp.linalg.cholesky, M))(M)
    scale = float(jnp.max(jnp.abs(g_ref)))
    assert float(jnp.max(jnp.abs(g_blk - g_ref))) < 1e-3 * scale


def test_resolve_tri_tolerant_parsing(monkeypatch):
    """Non-integer env values fall back to the default with a warning
    instead of crashing at trace time (ADVICE r3)."""
    from rpagp.ops import block_chol

    for v in ("off", "false", "no", "OFF"):
        monkeypatch.setenv("RPAGP_TRI_UPDATE", v)
        assert block_chol._resolve_tri() == 0
    monkeypatch.setenv("RPAGP_TRI_UPDATE", "4")
    assert block_chol._resolve_tri() == 4
    for bad in ("true", "1.5", ""):
        monkeypatch.setenv("RPAGP_TRI_UPDATE", bad)
        with pytest.warns(UserWarning, match="RPAGP_TRI_UPDATE"):
            assert block_chol._resolve_tri() == 2


@pytest.mark.parametrize("bad_block", [0, 2])
def test_nan_propagates_on_indefinite(bad_block):
    """An indefinite direction confined to an early OR late block must
    surface as NaNs in the factor — `all(isfinite(L))` is the jitter
    ladders' failure test."""
    p, block = 768, 256
    A = _spd(p, seed=4)
    v = jnp.zeros((p,), jnp.float32)
    v = v.at[bad_block * block + 7].set(1.0)
    Abad = A - (float(jnp.max(jnp.abs(A))) + 1.0) * jnp.outer(v, v)
    L = blocked_cholesky(Abad, block=block)
    assert not bool(jnp.all(jnp.isfinite(L)))


@pytest.mark.parametrize("p,c,block", [(768, 50, 256), (600, 33, 256)])
def test_blocked_solve_triangular_matches_builtin(p, c, block):
    from rpagp.ops.block_chol import blocked_solve_triangular

    L = jnp.linalg.cholesky(_spd(p, seed=9))
    B = jax.random.normal(jax.random.key(10), (p, c), jnp.float32)
    X = blocked_solve_triangular(L, B, block=block)
    X_ref = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    scale = float(jnp.max(jnp.abs(X_ref)))
    assert float(jnp.max(jnp.abs(X - X_ref))) < 5e-4 * scale
    # and it genuinely solves: L X = B
    R = L @ X - B
    assert float(jnp.max(jnp.abs(R))) < 5e-4 * float(jnp.max(jnp.abs(B)))


def test_safe_variant_matches_raw_when_spd():
    A = _spd(768, seed=7)
    L, ok = blocked_cholesky_safe(A, block=256)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(L),
                                  np.asarray(blocked_cholesky(A, block=256)))


def test_safe_variant_flags_and_stays_finite_on_indefinite():
    """The whole point of the safe variant: finite primal + ok=False on
    an indefinite input, and a finite VJP even with a nonzero cotangent
    (the cond fast path only ever sends it zeros, but finiteness must
    not depend on that)."""
    p, block = 768, 256
    A = _spd(p, seed=8)
    v = jnp.zeros((p,), jnp.float32).at[500].set(1.0)
    Abad = A - (float(A[500, 500]) + 1.0) * jnp.outer(v, v)
    Abad = 0.5 * (Abad + Abad.T)
    L, ok = blocked_cholesky_safe(Abad, block=block)
    assert not bool(ok)
    assert bool(jnp.all(jnp.isfinite(L)))
    g = jax.grad(lambda M: jnp.sum(
        blocked_cholesky_safe(M, block=block)[0]))(Abad)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_fallback_fast_path_is_level_zero():
    """Healthy C above the block size: _chol_with_fallback returns the
    exact (no-jitter) BLOCKED factor, and reports level 0."""
    C = _spd(640, seed=5, shift=1.0)
    L, eps = grid_solve._chol_with_fallback_eps(
        C, jnp.asarray(0.1, jnp.float32))
    assert float(eps) == 0.0
    np.testing.assert_array_equal(np.asarray(L),
                                  np.asarray(blocked_cholesky(C)))


def test_fallback_escalates_and_stays_differentiable():
    """Indefinite C above the block size (the f32 einsum-rounding
    wall): escalation must produce a finite factor AND a finite
    gradient (cond must not route cotangents through the NaN fast-path
    factor)."""
    p, noise = 640, 1.0
    # rank-deficient + noise I: min eig of C is EXACTLY noise, so the
    # shifted Cbad has min eig exactly -0.1 * noise (level 3e-1 fixes)
    A = jax.random.normal(jax.random.key(6), (p, 32), jnp.float32)
    C = A @ A.T + noise * jnp.eye(p, dtype=jnp.float32)
    Cbad = 0.5 * (C + C.T) - 1.1 * noise * jnp.eye(p, dtype=jnp.float32)

    def loss(Cb):
        L = grid_solve._chol_with_fallback(Cb, jnp.asarray(noise))
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

    val, g = jax.value_and_grad(loss)(Cbad)
    assert bool(jnp.isfinite(val))
    assert bool(jnp.all(jnp.isfinite(g)))
    # the factor reproduces Cbad up to the (bounded) chosen jitter
    L = grid_solve._chol_with_fallback(Cbad, jnp.asarray(noise))
    rec = L @ L.T - Cbad
    assert float(jnp.max(jnp.abs(rec))) <= grid_solve._C_LEVELS[-1] * noise + 1e-3
