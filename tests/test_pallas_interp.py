"""Pallas one-hot interpolation kernels vs the XLA dense plan (oracle).

Runs the kernels in interpret mode (CPU image); on TPU the same code
compiles to Mosaic and ops/ski.py dispatches to it automatically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpagp.ops import kernels, ski
from rpagp.ops import pallas_interp as pi
from rpagp.ops.kernels import KernelSpec

KEY = jax.random.key(0)


def _setup(J=3, n=1000, m=64, t=5, D=4, seed=0):
    kx = jax.random.key(seed)
    x = jax.random.normal(kx, (n, D))
    spec = KernelSpec.polynomial(J=J, d=1, ski=True, grid_size=m)
    kp, kb = kernels.init_kernel_params(KEY, spec, D)
    state = ski.build_ski(spec, kp, kb, x, m)  # dense plan (no sort fields)
    assert state.i0 is None
    V = jax.random.normal(jax.random.key(seed + 1), (n, t))
    G = jax.random.normal(jax.random.key(seed + 2), (J, t, m))
    return state, V, G


def _pad(state, V):
    n = state.tfrac.shape[1]
    n_pad = -(-n // pi.BN) * pi.BN
    tf = jnp.pad(state.tfrac, ((0, 0), (0, n_pad - n)),
                 constant_values=-100.0)
    VT = jnp.pad(V.T, ((0, 0), (0, n_pad - n)))
    return tf, VT, n


def test_transpose_matches_xla_dense():
    state, V, _ = _setup()
    want = ski._dense_interp_transpose_impl(state, V)
    tf, VT, _ = _pad(state, V)
    got = pi.transpose_call(tf, VT, state.m, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=5e-5)


def test_apply_sum_matches_xla_dense():
    state, V, G = _setup()
    want = ski._dense_interp_apply_sum_impl(state, G)
    tf, _, n = _pad(state, V)
    got = pi.apply_sum_call(tf, G, interpret=True)[:, :n].T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=5e-5)


def test_directions_are_exact_adjoints():
    """<W^T V, G> == <V, sum_j W_j G_j> — the duality the custom_vjp
    relies on (ops/ski.py 'keep that duality when touching either')."""
    state, V, G = _setup(seed=3)
    tf, VT, n = _pad(state, V)
    U = pi.transpose_call(tf, VT, state.m, interpret=True)
    out = pi.apply_sum_call(tf, G, interpret=True)[:, :n].T
    lhs = float(jnp.sum(U * G))
    rhs = float(jnp.sum(V * out))
    assert abs(lhs - rhs) < 1e-4 * max(1.0, abs(lhs)), (lhs, rhs)


def test_odd_t_and_t1():
    """t=1 (mean-solve shape) and non-padded t hit the same path."""
    for t in (1, 3):
        state, V, G = _setup(t=t, seed=4 + t)
        want = ski._dense_interp_transpose_impl(state, V)
        tf, VT, n = _pad(state, V)
        got = pi.transpose_call(tf, VT, state.m, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=5e-5)


def test_pad_slots_contribute_zero():
    """-100 pad slots must contribute exact zeros (their one-hot column
    never matches a cell), and pad output rows must be exact zeros."""
    state, V, G = _setup(n=500, seed=9)  # heavy padding: 500 -> BN
    tf, VT, n = _pad(state, V)
    U = pi.transpose_call(tf, VT, state.m, interpret=True)
    want = ski._dense_interp_transpose_impl(state, V)
    np.testing.assert_allclose(np.asarray(U), np.asarray(want),
                               rtol=2e-5, atol=5e-5)
    out = pi.apply_sum_call(tf, G, interpret=True)
    assert float(jnp.max(jnp.abs(out[:, n:]))) == 0.0


def test_edge_taps_match_xla():
    """Points in the first/last interior cells (i0 = 0 / m-2): taps that
    would land off-grid are dropped identically to the XLA plan's
    cubic-at-existing-cells semantics."""
    m = 32
    # hand-build a dense-plan state with edge-hugging fractional coords
    tfrac = jnp.array([[0.3, 0.7, 1.2, float(m) - 1.5, float(m) - 1.1,
                        15.5, 2.0, 28.9]])
    state = ski.SKIState(
        grid_lo=jnp.zeros(1), h=jnp.ones(1),
        cells=jnp.arange(m, dtype=jnp.float32), tfrac=tfrac,
        i0=None, w4=None, order=None, w4_sorted=None, bounds=None,
    )
    V = jax.random.normal(jax.random.key(11), (tfrac.shape[1], 4))
    want = ski._dense_interp_transpose_impl(state, V)
    n = tfrac.shape[1]
    n_pad = pi.BN
    tf = jnp.pad(tfrac, ((0, 0), (0, n_pad - n)), constant_values=-100.0)
    VT = jnp.pad(V.T, ((0, 0), (0, n_pad - n)))
    got = pi.transpose_call(tf, VT, m, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=5e-5)
    G = jax.random.normal(jax.random.key(12), (1, 4, m))
    want_a = ski._dense_interp_apply_sum_impl(state, G)
    got_a = pi.apply_sum_call(tf, G, interpret=True)[:, :n].T
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               rtol=2e-5, atol=5e-5)


def test_wide_t_chunking_matches_xla(monkeypatch):
    """t > _PALLAS_T_MAX (e.g. the LOVE cache's t = love_rank) is chunked
    into column slices at the ski dispatch level — required to stay
    inside the 16 MB VMEM scratch budget. Parity vs the XLA plan with
    the pallas path forced on (interpret mode)."""
    import functools

    state, _, _ = _setup(J=2, n=600, m=64, t=5)
    t_wide = 80
    V = jax.random.normal(jax.random.key(9), (600, t_wide))
    G = jax.random.normal(jax.random.key(10), (2, t_wide, 64))
    want_t = ski._dense_interp_transpose_impl(state, V)
    want_a = ski._dense_interp_apply_sum_impl(state, G)

    monkeypatch.setattr(ski, "_use_pallas_interp", lambda: True)
    monkeypatch.setattr(ski, "_PALLAS_T_MAX", 32)
    monkeypatch.setattr(pi, "transpose_call",
                        functools.partial(pi.transpose_call, interpret=True))
    monkeypatch.setattr(pi, "apply_sum_call",
                        functools.partial(pi.apply_sum_call, interpret=True))
    got_t = ski._dense_interp_transpose_impl(state, V)
    got_a = ski._dense_interp_apply_sum_impl(state, G)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=2e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               rtol=2e-5, atol=5e-5)
