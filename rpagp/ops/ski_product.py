"""Product-grid SKI for degree/sub_dim > 1 components — beyond-reference.

The reference (and GPyTorch's grid interpolation) restrict SKI to
degree-1, sub_dim-1 projection kernels ([U] gp_models/kernels.py wiring,
SURVEY.md §3.5): each additive component must be a single 1-D kernel for
the W T W^T structure to hold. This module removes that restriction the
TPU-native way.

A product component is k_j(x, x') = prod_f k1d(z_jf, z'_jf) over
F = degree * sub_dim one-dimensional factors (kernels.py evaluates the
exact version this way already). SKI-ing each FACTOR on its own 1-D
grid, k1d_f ~= W_f T_f W_f^T, and using the Hadamard-product identity

    (W_1 T_1 W_1^T) o (W_2 T_2 W_2^T) o ...
        =  (W_1 *r W_2 *r ...) (T_1 x T_2 x ...) (W_1 *r W_2 *r ...)^T

(*r = row-wise Khatri-Rao, x = Kronecker), the component becomes SKI on
the PRODUCT grid of size M = m^F:

  * interpolation rows: per point, the outer product of the F cubic
    4-tap rows — built densely per n-block exactly like the degree-1
    dense plan (ops/ski.py) and contracted on the MXU. No gathers.
  * grid kernel: T_j = Kron of F one-dimensional Toeplitz matrices, so
    chol(T_j + ...) = Kron of the F small (m, m) factor Choleskys — the
    jitter ladder runs per factor, and the Kronecker assembly is one
    einsum.

Everything lowers to the EXACT grid-space Woodbury solver
(ops/grid_solve.py) with effective per-component grid size M: the same
p x p (p = J * M) blocked-Cholesky factor, the same deterministic
plain-autodiff MLL. The BBMM path is NOT wired for product kernels —
the grid solver is strictly better in the p << n regime these grids
live in, and there is no reference behavior to match (the reference
rejects the combination outright).

Supported: uniform degrees across components (the batched factor ops
want one (Jf, ...) shape; heterogeneous degrees would need per-group
batching — not in the reference either). Mixed BASE kernels are
supported via a static per-base row split in the factor Toeplitz
columns (toeplitz_columns_factors).

State: a plain ops.ski.SKIState whose rows are the Jf = J * F factors
(ski.build_ski_factors). All functions here take `spec` to recover the
static (J, F, m) structure; nothing product-specific is traced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.transforms import softplus
from . import ski
from .kernels import KernelSpec, _k1d

_HI = jax.lax.Precision.HIGHEST

# per-block transient budget for the dense product-interp loops: the
# (J, bn, M) Khatri-Rao slab is the big one; keep it ~tens of MB.
_PROD_BLOCK_ELEMS = 1 << 24


def factors_per_component(spec: KernelSpec) -> int:
    """F = degree * sub_dim, validated uniform (see module docstring)."""
    if not spec.is_projection or not spec.degrees:
        raise ValueError("product SKI needs a projection kernel")
    d = spec.degrees[0]
    if any(dd != d for dd in spec.degrees):
        raise ValueError("product SKI supports uniform degrees only")
    return int(d) * int(spec.sub_dim)


def is_product(spec: KernelSpec) -> bool:
    """Does this SKI spec need the product-grid path?"""
    return bool(spec.is_projection and spec.ski and spec.degrees
                and (any(d != 1 for d in spec.degrees) or spec.sub_dim != 1))


def grid_rank(spec: KernelSpec) -> int:
    """p = J * m^F — the grid solver's Woodbury rank for this spec."""
    if not is_product(spec):
        return spec.J * spec.grid_size
    return spec.J * spec.grid_size ** factors_per_component(spec)


def factor_lengthscales(spec: KernelSpec, kparams):
    """(Jf,) per-factor lengthscales: raw_lengthscale holds one value
    per SUB-KERNEL (sum(degrees) of them); each sub-kernel's sub_dim
    1-D factors share it (kernels.py init contract)."""
    ls = softplus(kparams["raw_lengthscale"])  # (sum(degrees),)
    return jnp.repeat(ls, spec.sub_dim)  # (Jf,)


def toeplitz_columns_factors(spec: KernelSpec, kparams, state):
    """First columns of the factor Toeplitz matrices — (Jf, m).

    Mixed bases: a component's F factors share its base (the exact
    kernel's product structure, kernels._projection_gram), so factor row
    j*F+f uses bases[j]; the split over distinct bases is static
    trace-time bookkeeping (same pattern as ski.toeplitz_columns)."""
    ls = factor_lengthscales(spec, kparams)
    scaled = state.cells[None, :] * state.h[:, None] / ls[:, None]  # (Jf, m)
    base = spec.bases[0]
    if all(b == base for b in spec.bases):
        return _k1d(base, scaled)
    F = factors_per_component(spec)
    fbases = [b for b in spec.bases for _ in range(F)]  # (Jf,) row bases
    out = jnp.zeros_like(scaled)
    for b in sorted(set(fbases)):
        rows = jnp.asarray([i for i, bi in enumerate(fbases) if bi == b])
        out = out.at[rows].set(_k1d(b, scaled[rows]))
    return out


def toeplitz_blocks_factors(spec: KernelSpec, kparams, state):
    """(Jf, m, m) full factor Toeplitz blocks."""
    col = toeplitz_columns_factors(spec, kparams, state)
    m = state.m
    idx = jnp.abs(jnp.arange(m)[:, None] - jnp.arange(m)[None, :])
    return col[:, idx]


def kron_fold(mats):
    """Batched Kronecker product over the factor axis:
    mats (J, F, m, m) -> (J, m^F, m^F), standard Kron ordering
    (factor 0 is the slowest index). Kron of lower-triangular factors
    is lower-triangular, so this maps factor Choleskys to the product
    grid's Cholesky: chol(Kron T_f) = Kron chol(T_f)."""
    J, F = mats.shape[0], mats.shape[1]
    out = mats[:, 0]
    for f in range(1, F):
        a, b = out.shape[-2], mats.shape[-2]
        out = jnp.einsum("jab,jcd->jacbd", out, mats[:, f],
                         precision=_HI).reshape(J, a * b, a * b)
    return out


def _product_block(spec: KernelSpec, tfb_i, cells):
    """Khatri-Rao interpolation rows for one n-block: tfb_i (Jf, bn)
    fractional coords -> (J, bn, M) product tap rows."""
    F = factors_per_component(spec)
    J = spec.J
    m = cells.shape[0]
    W = ski._cubic_kernel(tfb_i[:, :, None] - cells)  # (Jf, bn, m)
    bn = W.shape[1]
    Wj = W.reshape(J, F, bn, m)
    out = Wj[:, 0]  # (J, bn, m)
    for f in range(1, F):
        a = out.shape[-1]
        out = (out[:, :, :, None] * Wj[:, f][:, :, None, :]).reshape(
            J, bn, a * m)
    return out  # (J, bn, m^F)


def _prod_block_size(spec: KernelSpec, n: int) -> int:
    M = spec.grid_size ** factors_per_component(spec)
    bn = max(8, _PROD_BLOCK_ELEMS // max(1, spec.J * M))
    return min(bn, max(8, n))


def _interp_transpose_impl(spec: KernelSpec, state, V):
    """W^T V on the product grid: V (n, t) -> (J, t, M)."""
    cells = state.cells
    n = state.tfrac.shape[1]
    t = V.shape[1]
    J = spec.J
    M = state.m ** factors_per_component(spec)
    bn = _prod_block_size(spec, n)
    nb = -(-n // bn)
    pad = nb * bn - n
    tf = state.tfrac
    VT = V.T
    if pad:
        tf = jnp.pad(tf, ((0, 0), (0, pad)), constant_values=-100.0)
        VT = jnp.pad(VT, ((0, 0), (0, pad)))
    Jf = tf.shape[0]
    tfb = tf.reshape(Jf, nb, bn).transpose(1, 0, 2)  # (nb, Jf, bn)
    Vb = VT.reshape(t, nb, bn).transpose(1, 0, 2)  # (nb, t, bn)

    def body(U, inp):
        tfb_i, vb_i = inp
        W = _product_block(spec, tfb_i, cells)  # (J, bn, M)
        U_p = jax.lax.dot_general(
            vb_i, W, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )  # (t, J, M)
        return U + U_p.transpose(1, 0, 2), None

    U0 = jnp.zeros((J, t, M), jnp.float32)
    U, _ = jax.lax.scan(body, U0, (tfb, Vb))
    return U.astype(V.dtype)


def _interp_apply_sum_impl(spec: KernelSpec, state, G):
    """sum_j W_j G_j on the product grid: G (J, t, M) -> (n, t)."""
    cells = state.cells
    n = state.tfrac.shape[1]
    t = G.shape[1]
    bn = _prod_block_size(spec, n)
    nb = -(-n // bn)
    pad = nb * bn - n
    tf = state.tfrac
    if pad:
        tf = jnp.pad(tf, ((0, 0), (0, pad)), constant_values=-100.0)
    Jf = tf.shape[0]
    tfb = tf.reshape(Jf, nb, bn).transpose(1, 0, 2)  # (nb, Jf, bn)

    def body(_, tfb_i):
        W = _product_block(spec, tfb_i, cells)  # (J, bn, M)
        out = jax.lax.dot_general(
            G, W, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=_HI,
        )  # (J, t, bn)
        return None, jnp.sum(out, axis=0)  # (t, bn)

    _, outs = jax.lax.scan(body, None, tfb)  # (nb, t, bn)
    return outs.transpose(1, 0, 2).reshape(t, -1)[:, :n].T.astype(G.dtype)


# the two directions are each other's adjoints (same duality as the
# degree-1 plans in ops/ski.py) — register them so gradients reuse the
# fast forward code instead of differentiating through the scan
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def interp_transpose(spec: KernelSpec, state, V):
    """W^T V: (n, t) -> (J, t, M) — product dense plan."""
    return _interp_transpose_impl(spec, state, V)


def _it_fwd(spec, state, V):
    return _interp_transpose_impl(spec, state, V), state


def _it_bwd(spec, state, U_bar):
    return None, _interp_apply_sum_impl(spec, state, U_bar)


interp_transpose.defvjp(_it_fwd, _it_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def interp_apply_sum(spec: KernelSpec, state, G):
    """sum_j W_j G_j: (J, t, M) -> (n, t) — product dense plan."""
    return _interp_apply_sum_impl(spec, state, G)


def _ia_fwd(spec, state, G):
    return _interp_apply_sum_impl(spec, state, G), state


def _ia_bwd(spec, state, out_bar):
    return None, _interp_transpose_impl(spec, state, out_bar)


interp_apply_sum.defvjp(_ia_fwd, _ia_bwd)


def build_interp_gram(spec: KernelSpec, state):
    """S = U^T U of the stacked product interpolation rows —
    (J, M, J, M), f32, HIGHEST. Hyperparameter-free (geometry only);
    built once per dataset like the degree-1 version."""
    n = state.tfrac.shape[1]
    J = spec.J
    M = state.m ** factors_per_component(spec)
    p = J * M
    bn = _prod_block_size(spec, n)
    nb = -(-n // bn)
    pad = nb * bn - n
    tf = state.tfrac
    if pad:
        tf = jnp.pad(tf, ((0, 0), (0, pad)), constant_values=-100.0)
    Jf = tf.shape[0]
    tfb = tf.reshape(Jf, nb, bn).transpose(1, 0, 2)
    cells = state.cells

    def body(S, tf_i):
        W = _product_block(spec, tf_i, cells)  # (J, bn, M)
        Wf = W.transpose(0, 2, 1).reshape(p, -1)  # (p, bn)
        S = S + jnp.matmul(Wf, Wf.T, precision=_HI,
                           preferred_element_type=jnp.float32)
        return S, None

    S, _ = jax.lax.scan(body, jnp.zeros((p, p), jnp.float32), tfb)
    return S.reshape(J, M, J, M)


def test_interp_rows(spec: KernelSpec, state, chunk_slice):
    """Dense product W* rows for a contiguous test chunk: (c, p)."""
    tf = state.tfrac[:, chunk_slice]  # (Jf, c)
    W = _product_block(spec, tf, state.cells)  # (J, c, M)
    J, c, M = W.shape
    return W.transpose(1, 0, 2).reshape(c, J * M)
