"""Pallas fused Gram-MVM kernel vs the dense oracle (interpret mode on
the CPU test mesh; the same code compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpagp.ops import kernels, pallas_gram
from rpagp.ops.kernels import KernelSpec
from rpagp.utils.transforms import softplus

KEY = jax.random.key(0)


@pytest.mark.parametrize("base", ["rbf", "matern32"])
@pytest.mark.parametrize("shape", [(40, 30, 3), (300, 530, 5)])
def test_pallas_gram_mvm_matches_dense(base, shape):
    n, m, t = shape
    J, D = 6, 4
    spec = KernelSpec.polynomial(J=J, d=1, base=base)
    kp, kb = kernels.init_kernel_params(KEY, spec, D)
    x1 = jax.random.normal(jax.random.key(1), (n, D))
    x2 = jax.random.normal(jax.random.key(2), (m, D))
    V = jax.random.normal(jax.random.key(3), (m, t))

    u1 = kernels._projected_coords(spec, kp, kb, x1).T
    u2 = kernels._projected_coords(spec, kp, kb, x2).T
    w = kernels._component_scales(spec, kp, x1.dtype)
    got = np.asarray(
        pallas_gram.projected_gram_mvm(u1, u2, w, V, base=base, interpret=True)
    )
    dense = np.asarray(kernels.gram(spec, kp, kb, x1, x2)) @ np.asarray(V)
    np.testing.assert_allclose(got, dense, rtol=2e-4, atol=2e-4)


def test_supports_predicate(monkeypatch):
    # default-OFF (measured loss to XLA on v5e — see supports docstring);
    # RPAGP_PALLAS_GRAM=1 opts in
    assert not pallas_gram.supports(KernelSpec.polynomial(J=4, d=1))
    monkeypatch.setenv("RPAGP_PALLAS_GRAM", "1")
    assert pallas_gram.supports(KernelSpec.polynomial(J=4, d=1))
    assert not pallas_gram.supports(KernelSpec.polynomial(J=4, d=2))
    assert not pallas_gram.supports(
        KernelSpec.polynomial(J=4, d=1, ski=True, grid_size=64)
    )
    assert not pallas_gram.supports(KernelSpec(family="rbf"))
    assert not pallas_gram.supports(
        KernelSpec.generalized(degrees=(1, 1), bases=("rbf", "matern32"))
    )


@pytest.mark.parametrize("base", ["rbf", "matern32"])
def test_pallas_gram_mvm_gradients_match_dense(base):
    """custom_vjp backward kernels (dz1, dz2, dw, dV) vs autodiff of the
    dense oracle."""
    n, m, t, J, D = 33, 45, 3, 4, 5
    z1 = jax.random.normal(jax.random.key(1), (n, J))
    z2 = jax.random.normal(jax.random.key(2), (m, J))
    w = jax.nn.softplus(jax.random.normal(jax.random.key(3), (J,)))
    V = jax.random.normal(jax.random.key(4), (m, t))

    def dense(z1, z2, w, V):
        d = z1[:, None, :] - z2[None, :, :]  # (n, m, J)
        if base == "rbf":
            k = jnp.exp(-0.5 * d * d)
        else:
            s = jnp.sqrt(3.0) * jnp.abs(d)
            k = (1 + s) * jnp.exp(-s)
        K = jnp.einsum("j,nmj->nm", w, k)
        return K @ V

    def loss_p(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a)))

    g_dense = jax.grad(loss_p(dense), argnums=(0, 1, 2, 3))(z1, z2, w, V)
    g_pl = jax.grad(
        loss_p(lambda *a: pallas_gram.projected_gram_mvm(
            *a, base=base, interpret=True)),
        argnums=(0, 1, 2, 3),
    )(z1, z2, w, V)
    for a, b, name in zip(g_pl, g_dense, ["dz1", "dz2", "dw", "dV"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=name,
        )
