"""Pallas leaf Cholesky (L + L^{-1} in one kernel) vs dense oracles.

Runs in interpret mode (CPU image); on TPU the same code compiles to
Mosaic and ops/block_chol.py dispatches to it when enabled."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpagp.ops import block_chol, pallas_chol


def _spd(b, seed=0, jitter=0.5):
    B = jax.random.normal(jax.random.key(seed), (b, b), jnp.float32)
    A = B @ B.T / b + jitter * jnp.eye(b, dtype=jnp.float32)
    return 0.5 * (A + A.T)


@pytest.mark.parametrize("b", [8, 128, 256, 512])
def test_leaf_matches_builtin(b):
    A = _spd(b)
    L, Linv, ok = pallas_chol.chol_linv(A, True)
    want = jnp.linalg.cholesky(A)
    assert float(ok) == 1.0
    np.testing.assert_allclose(np.asarray(L), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # Linv is the exact inverse of the computed factor
    np.testing.assert_allclose(np.asarray(L @ Linv), np.eye(b),
                               rtol=0, atol=5e-5)
    # strictly lower-triangular outputs
    assert float(jnp.max(jnp.abs(jnp.triu(L, 1)))) == 0.0
    assert float(jnp.max(jnp.abs(jnp.triu(Linv, 1)))) == 0.0


def test_leaf_indefinite_flags_not_nans():
    """Non-positive pivot: ok=0 and every primal stays finite (the
    blocked_cholesky_safe contract)."""
    A = _spd(128)
    A = A - 10.0 * jnp.eye(128, dtype=jnp.float32)  # indefinite
    L, Linv, ok = pallas_chol.chol_linv(A, True)
    assert float(ok) == 0.0
    assert bool(jnp.all(jnp.isfinite(L)))
    assert bool(jnp.all(jnp.isfinite(Linv)))


def test_leaf_gradient_matches_builtin_composition():
    """VJP parity with autodiff through (cholesky, triangular-solve
    inverse) on a loss that reaches BOTH outputs. The leaf's closed-form
    VJP returns the symmetric-convention cotangent, so compare through a
    symmetrized input map (the only way callers reach it)."""
    b = 64
    A0 = _spd(b, seed=3)
    R1 = jax.random.normal(jax.random.key(1), (b, b), jnp.float32)
    R2 = jax.random.normal(jax.random.key(2), (b, b), jnp.float32)

    def loss_leaf(A):
        As = 0.5 * (A + A.T)
        L, Linv, _ = pallas_chol.chol_linv(As, True)
        return (jnp.vdot(L, R1) + jnp.vdot(Linv, R2)
                + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L))))

    def loss_ref(A):
        As = 0.5 * (A + A.T)
        L = jnp.linalg.cholesky(As)
        Linv = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(b, dtype=A.dtype), lower=True)
        return (jnp.vdot(L, R1) + jnp.vdot(Linv, R2)
                + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L))))

    v1, g1 = jax.value_and_grad(loss_leaf)(A0)
    v2, g2 = jax.value_and_grad(loss_ref)(A0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


def test_blocked_cholesky_with_pallas_leaf():
    """The full blocked factor with the Pallas diagonal leaf matches the
    XLA-leaf version (value and gradient), including the ragged-p pad."""
    p = 320  # 2.5 blocks of 128 -> exercises the identity-tail pad
    A = _spd(p, seed=5)
    R = jax.random.normal(jax.random.key(6), (p, p), jnp.float32)

    def loss(A, leaf):
        As = 0.5 * (A + A.T)
        L = block_chol.blocked_cholesky(As, block=128, leaf=leaf)
        return jnp.vdot(L, R) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

    v1, g1 = jax.value_and_grad(lambda A: loss(A, "interpret"))(A)
    v2, g2 = jax.value_and_grad(lambda A: loss(A, "xla"))(A)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


def test_blocked_cholesky_safe_with_pallas_leaf():
    """safe variant: ok flag + finite primals through the Pallas leaf,
    on both a PD and an indefinite input."""
    p = 256
    A = _spd(p, seed=7)
    L, ok = block_chol.blocked_cholesky_safe(A, block=128, leaf="interpret")
    assert bool(ok)
    want = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    Abad = A - 10.0 * jnp.eye(p, dtype=jnp.float32)
    Lb, okb = block_chol.blocked_cholesky_safe(Abad, block=128,
                                               leaf="interpret")
    assert not bool(okb)
    assert bool(jnp.all(jnp.isfinite(Lb)))


def test_blocked_cholesky_nan_contract_with_pallas_leaf():
    """Raw (non-safe) variant must still fail the isfinite probe on an
    indefinite input when the Pallas leaf is active."""
    p = 256
    A = _spd(p, seed=8) - 10.0 * jnp.eye(p, dtype=jnp.float32)
    L = block_chol.blocked_cholesky(A, block=128, leaf="interpret")
    assert not bool(jnp.all(jnp.isfinite(L)))


def test_batched_leaf_matches_builtin():
    """chol_linv_batched: values vs the builtin batched chol, per-block
    ok flags (one indefinite block must flag WITHOUT poisoning the
    others), finite primals throughout."""
    J, b = 4, 128
    T = jnp.stack([_spd(b, seed=s) for s in range(J)])
    T = T.at[2].add(-10.0 * jnp.eye(b))  # block 2 indefinite
    L, Linv, okf = pallas_chol.chol_linv_batched(T, True)
    ok = np.asarray(okf) > 0.5
    np.testing.assert_array_equal(ok, [True, True, False, True])
    assert bool(jnp.all(jnp.isfinite(L))) and bool(jnp.all(jnp.isfinite(Linv)))
    want = jnp.linalg.cholesky(T)
    for j in (0, 1, 3):
        np.testing.assert_allclose(np.asarray(L[j]), np.asarray(want[j]),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(L[j] @ Linv[j]), np.eye(b),
                                   rtol=0, atol=5e-5)


def test_batched_leaf_gradient_matches_builtin():
    """Batched VJP parity with autodiff through builtin chol, reached
    through a symmetrized input map (the symmetric-cotangent convention,
    see chol_linv docstring)."""
    J, b = 3, 64
    T0 = jnp.stack([_spd(b, seed=10 + s) for s in range(J)])
    R = jax.random.normal(jax.random.key(9), (J, b, b), jnp.float32)

    def sym(T):
        return 0.5 * (T + jnp.swapaxes(T, -1, -2))

    def loss_pallas(T):
        L, _, _ = pallas_chol.chol_linv_batched(sym(T), True)
        return jnp.vdot(L, R) + 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

    def loss_ref(T):
        L = jnp.linalg.cholesky(sym(T))
        return jnp.vdot(L, R) + 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

    v1, g1 = jax.value_and_grad(loss_pallas)(T0)
    v2, g2 = jax.value_and_grad(loss_ref)(T0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


def test_fused_batched_leaf_matches_builtin():
    """chol_linv_batched_fused: values vs builtin batched chol, exact
    L @ Linv, per-block ok flags with one indefinite block (finite
    primals), across a multi-panel block size."""
    J, b = 4, 256
    T = jnp.stack([_spd(b, seed=40 + s, jitter=0.5) for s in range(J)])
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    assert pallas_chol.fused_supported(J, b)
    L, Linv, okf = pallas_chol.chol_linv_batched_fused(T, True)
    want = jnp.linalg.cholesky(T)
    np.testing.assert_array_equal(np.asarray(okf) > 0.5, [True] * J)
    np.testing.assert_allclose(np.asarray(L), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    for j in range(J):
        np.testing.assert_allclose(np.asarray(L[j] @ Linv[j]), np.eye(b),
                                   rtol=0, atol=5e-5)
    # upper triangle must be EXACTLY zero (the in-place layout's mask)
    assert float(jnp.max(jnp.abs(jnp.triu(L, 1)))) == 0.0

    Tbad = T.at[2].add(-10.0 * jnp.eye(b))
    L2, Linv2, ok2 = pallas_chol.chol_linv_batched_fused(Tbad, True)
    np.testing.assert_array_equal(np.asarray(ok2) > 0.5,
                                  [True, True, False, True])
    assert bool(jnp.all(jnp.isfinite(L2)) and jnp.all(jnp.isfinite(Linv2)))


def test_fused_batched_leaf_gradient_matches_builtin():
    """Fused batched VJP parity with autodiff through builtin chol,
    through the symmetrized input map (symmetric-cotangent convention),
    including the Linv cotangent fold-in."""
    J, b = 3, 128
    T0 = jnp.stack([_spd(b, seed=50 + s, jitter=0.5) for s in range(J)])
    R = jax.random.normal(jax.random.key(13), (J, b, b), jnp.float32)
    Q = jax.random.normal(jax.random.key(14), (J, b, b), jnp.float32)

    def sym(T):
        return 0.5 * (T + jnp.swapaxes(T, -1, -2))

    def loss_fused(T):
        L, Linv, _ = pallas_chol.chol_linv_batched_fused(sym(T), True)
        return (jnp.vdot(L, R) + 0.1 * jnp.vdot(Linv, Q)
                + 2.0 * jnp.sum(jnp.log(
                    jnp.diagonal(L, axis1=-2, axis2=-1))))

    def loss_ref(T):
        L = jnp.linalg.cholesky(sym(T))
        Linv = jax.vmap(lambda Lj: jax.scipy.linalg.solve_triangular(
            Lj, jnp.eye(b, dtype=Lj.dtype), lower=True))(L)
        return (jnp.vdot(L, R) + 0.1 * jnp.vdot(Linv, Q)
                + 2.0 * jnp.sum(jnp.log(
                    jnp.diagonal(L, axis1=-2, axis2=-1))))

    v1, g1 = jax.value_and_grad(loss_fused)(T0)
    v2, g2 = jax.value_and_grad(loss_ref)(T0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


def test_chol_ladder_fused_vs_vmap_paths(monkeypatch):
    """The ladder fast path produces the same factor through the fused
    and vmap batched kernels (RPAGP_LADDER_FUSED toggle)."""
    from rpagp.ops import grid_solve

    J, m = 4, 128
    T = jnp.stack([_spd(m, seed=60 + s, jitter=0.5) for s in range(J)])
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    eps0 = 1e-4 * T[:, 0, 0]

    monkeypatch.setenv("RPAGP_PALLAS_LADDER", "interpret")
    monkeypatch.setenv("RPAGP_LADDER_FUSED", "0")
    L_v, eps_v = grid_solve._chol_ladder(T, eps0)
    monkeypatch.setenv("RPAGP_LADDER_FUSED", "1")
    L_f, eps_f = grid_solve._chol_ladder(T, eps0)

    np.testing.assert_allclose(np.asarray(eps_f), np.asarray(eps_v),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(L_f), np.asarray(L_v),
                               rtol=2e-5, atol=2e-5)


def test_chol_ladder_fast_path_escalation_falls_back(monkeypatch):
    """_chol_ladder's factor-first fast path with a block that fails at
    the base jitter: lax.cond must discard the Pallas factor and the
    XLA probe ladder must produce EXACTLY its usual choice/factor."""
    from rpagp.ops import grid_solve

    J, m = 3, 128
    T = jnp.stack([_spd(m, seed=20 + s, jitter=0.5) for s in range(J)])
    # block 1 barely indefinite: forces at least one ladder escalation
    w, V = jnp.linalg.eigh(T[1])
    w = w.at[0].set(-1e-3)
    T = T.at[1].set(V @ jnp.diag(w) @ V.T)
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    eps0 = 1e-4 * T[:, 0, 0]

    monkeypatch.setenv("RPAGP_PALLAS_LADDER", "0")
    L_x, eps_x = grid_solve._chol_ladder(T, eps0)
    monkeypatch.setenv("RPAGP_PALLAS_LADDER", "interpret")
    L_p, eps_p = grid_solve._chol_ladder(T, eps0)

    np.testing.assert_allclose(np.asarray(eps_p), np.asarray(eps_x),
                               rtol=1e-6)
    assert float(eps_p[1]) > float(eps0[1])  # escalation engaged
    # same branch, same implementation: digit-exact
    np.testing.assert_array_equal(np.asarray(L_p), np.asarray(L_x))


def test_chol_ladder_fast_path_engaged_matches_xla(monkeypatch):
    """All blocks factor at the base jitter: the fast path must engage
    (one Pallas call, eps stays eps0) and its factor must match the XLA
    ladder's level-0 factor to f32 roundoff — value AND gradient (the
    closed-form symmetric-cotangent VJP vs autodiff through XLA chol,
    reached through the symmetric Toeplitz-style map the grid solver
    uses)."""
    from rpagp.ops import grid_solve

    J, m = 3, 128
    T0 = jnp.stack([_spd(m, seed=30 + s, jitter=0.5) for s in range(J)])
    T0 = 0.5 * (T0 + jnp.swapaxes(T0, -1, -2))
    eps0 = 1e-4 * T0[:, 0, 0]
    R = jax.random.normal(jax.random.key(11), (J, m, m), jnp.float32)

    def loss(T):
        Tsym = 0.5 * (T + jnp.swapaxes(T, -1, -2))
        L, eps = grid_solve._chol_ladder(Tsym, eps0)
        return (jnp.vdot(L, R) + 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1))), eps)

    monkeypatch.setenv("RPAGP_PALLAS_LADDER", "0")
    (v_x, eps_x), g_x = jax.value_and_grad(loss, has_aux=True)(T0)
    monkeypatch.setenv("RPAGP_PALLAS_LADDER", "interpret")
    (v_p, eps_p), g_p = jax.value_and_grad(loss, has_aux=True)(T0)

    np.testing.assert_allclose(np.asarray(eps_p), np.asarray(eps0),
                               rtol=1e-6)  # fast path: level 0 exactly
    np.testing.assert_allclose(np.asarray(eps_x), np.asarray(eps0),
                               rtol=1e-6)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=2e-4, atol=2e-4)


def test_grid_mll_with_pallas_leaf_integration(monkeypatch):
    """End-to-end: the exact grid-space MLL (value AND gradient) with
    the Pallas leaf engaged through _chol_with_fallback's auto path
    (RPAGP_PALLAS_CHOL=interpret) matches the default XLA-leaf result."""
    from rpagp.models import exact_gp
    from rpagp.models.exact_gp import ModelSpec
    from rpagp.ops import grid_solve
    from rpagp.ops.kernels import KernelSpec

    spec = ModelSpec(
        kernel=KernelSpec.polynomial(J=10, d=1, base="rbf", ski=True,
                                     grid_size=64),
        max_cholesky_size=16, solver="grid",
    )
    D = 4
    x = jax.random.normal(jax.random.key(0), (400, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(
        jax.random.key(1), (400,), jnp.float32)
    params, buffers = exact_gp.init_model(jax.random.key(2), spec, D)
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x)
    assert grid_solve.use_grid_solver(spec, 400)  # p=640 > block

    fn = lambda p: grid_solve.grid_mll(spec, p, buffers, x, y)
    v_ref, g_ref = jax.value_and_grad(fn)(params)

    monkeypatch.setenv("RPAGP_PALLAS_CHOL", "interpret")
    v_pal, g_pal = jax.value_and_grad(fn)(params)

    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-5)
