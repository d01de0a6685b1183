"""SKI / KISS-GP on the 1-D projected kernels: grid interpolation + FFT
Toeplitz MVMs.

TPU-native rebuild of the reference's SKI wiring ([U] kernels.py
`ski=True, grid_size=m` flag) over GPyTorch's stack
([G] gpytorch/kernels/grid_interpolation_kernel.py,
[G] gpytorch/lazy/interpolated_lazy_tensor.py,
[G] gpytorch/utils/toeplitz.py `sym_toeplitz_matmul`,
[G] gpytorch/utils/interpolation.py — all unverified, SURVEY.md §3.5).

Per projection j:   K_j  ~=  W_j  T_j  W_j^T
  * W_j: cubic-convolution interpolation weights of the projected coords
    z_j onto a regular m-point grid — 4 taps per point. TPUs have no
    sparse matmul, so W^T v is 4 batched `segment_sum`s (scatter-add) and
    W u is 4 batched `take_along_axis` gathers — dense, VPU-friendly ops.
  * T_j: the 1-D base kernel on the grid — symmetric TOEPLITZ because the
    grid is regular and the kernel stationary. T u is a circulant
    embedding of size 2m and two (r)FFTs — XLA's TPU FFT — batched over
    all J components at once, O(J m log m) per MVM.

The interpolation geometry (grid, indices, weights) depends only on the
data and the FIXED projections — never on trainable hyperparameters — so
it is computed once per dataset (`build_ski`) and closed over by every
MVM; only the Toeplitz first column (lengthscale-dependent) is
re-evaluated inside the training step.

Restriction (as in the reference): SKI applies to degree-1 projection
kernels — each component must be a single 1-D kernel for W T W^T
structure to hold.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.transforms import softplus
from . import kernels as kernels_mod
from .kernels import KernelSpec, _component_scales, _get_proj, _k1d

_HI = jax.lax.Precision.HIGHEST


class SKIState(NamedTuple):
    """Per-dataset interpolation geometry for all J components."""

    grid_lo: jax.Array  # (J,) left grid endpoint per component
    h: jax.Array  # (J,) grid spacing per component
    idx: jax.Array  # (J, n, 4) int32 tap indices into the grid
    w: jax.Array  # (J, n, 4) tap weights (cubic convolution)
    m: int  # grid size (static)


def _cubic_kernel(s):
    """Keys' cubic-convolution kernel (a = -0.5), support |s| < 2 — the
    same family GPyTorch's Interpolation uses."""
    a = jnp.abs(s)
    inner = 1.5 * a**3 - 2.5 * a**2 + 1.0
    outer = -0.5 * a**3 + 2.5 * a**2 - 4.0 * a + 2.0
    return jnp.where(a <= 1.0, inner, jnp.where(a < 2.0, outer, 0.0))


def project(spec: KernelSpec, kparams, kbuffers, x):
    """Raw projected coordinates z = x P — (J, n). NOT lengthscale-scaled:
    the grid lives in raw projection space so it is hyperparameter-free."""
    P = _get_proj(kparams, kbuffers)
    z = jnp.matmul(x, P, precision=_HI)  # (n, J)
    return z.T


def build_ski(spec: KernelSpec, kparams, kbuffers, x, grid_size: int,
              z_bounds=None):
    """Compute the SKI geometry for inputs x (once per dataset).

    z_bounds: optional (lo (J,), hi (J,)) to build a grid covering MORE
    than x (e.g. train+test range) so the same grid serves cross-kernels.
    """
    if not spec.is_projection or any(d != 1 for d in spec.degrees):
        raise ValueError("SKI supports degree-1 projection kernels only")
    m = int(grid_size)
    z = project(spec, kparams, kbuffers, x)  # (J, n)
    if z_bounds is None:
        lo, hi = jnp.min(z, axis=1), jnp.max(z, axis=1)
    else:
        lo, hi = z_bounds
    span = jnp.maximum(hi - lo, 1e-6)
    # pad by 2 cells each side so all 4 cubic taps stay interior
    h = span / (m - 5)
    grid_lo = lo - 2.0 * h

    t = (z - grid_lo[:, None]) / h[:, None]  # fractional grid coordinate
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 1, m - 3)
    offsets = jnp.arange(-1, 3, dtype=jnp.int32)  # taps i0-1 .. i0+2
    idx = i0[:, :, None] + offsets  # (J, n, 4)
    s = t[:, :, None] - idx.astype(z.dtype)  # signed distance in cells
    w = _cubic_kernel(s)
    # normalize: cubic-convolution weights sum to 1 exactly only for
    # interior points; renormalize to keep constant functions exact.
    # Points far outside the grid (e.g. zero-padding rows) get all-zero
    # taps — guard the division so they contribute exact zeros, not NaNs.
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(wsum > 1e-8, w / jnp.where(wsum == 0, 1.0, wsum), 0.0)
    return SKIState(grid_lo=grid_lo, h=h, idx=idx, w=w, m=m)


def toeplitz_columns(spec: KernelSpec, kparams, state: SKIState):
    """First columns of the T_j: k1d(g_a - g_0) over the grid — (J, m).

    The only lengthscale-dependent piece; re-evaluated per training step.
    """
    ls = softplus(kparams["raw_lengthscale"])  # (J,) for degree-1
    dists = jnp.arange(state.m)[None, :] * state.h[:, None]  # (J, m)
    base = spec.bases[0]
    # all degree-1 bases are required uniform for the batched FFT; mixed
    # bases would need a (cheap) per-group split — not in the reference.
    if any(b != base for b in spec.bases):
        raise ValueError("SKI currently requires a uniform base kernel")
    return _k1d(base, dists / ls[:, None])


def sym_toeplitz_matmul(col, U):
    """(J, m) Toeplitz first columns x (J, m, t) -> (J, m, t) via a 2m
    circulant embedding and batched rFFTs (XLA FFT on TPU)."""
    J, m = col.shape
    circ = jnp.concatenate(
        [col, jnp.zeros((J, 1), col.dtype), col[:, -1:0:-1]], axis=1
    )  # (J, 2m)
    C = jnp.fft.rfft(circ, axis=-1)  # (J, m+1)
    Upad = jnp.concatenate([U, jnp.zeros_like(U)], axis=1)  # (J, 2m, t)
    F = jnp.fft.rfft(Upad, axis=1)  # (J, m+1, t)
    out = jnp.fft.irfft(C[:, :, None] * F, n=2 * m, axis=1)
    return out[:, :m, :].astype(U.dtype)


def interp_transpose(state: SKIState, V):
    """W^T V: scatter projected-data values onto the grid — (J, m, t).

    4 batched segment-sums (one per cubic tap) keep the intermediate at
    (J, n, t) — never (J, n, 4, t).
    """
    J, n, _ = state.idx.shape
    t = V.shape[1]
    offs = (jnp.arange(J, dtype=jnp.int32) * state.m)[:, None]  # (J, 1)
    out = jnp.zeros((J * state.m, t), V.dtype)
    for tap in range(4):
        ids = (state.idx[:, :, tap] + offs).reshape(J * n)
        contrib = (state.w[:, :, tap, None] * V[None, :, :]).reshape(J * n, t)
        out = out + jax.ops.segment_sum(contrib, ids, num_segments=J * state.m)
    return out.reshape(J, state.m, t)


def interp_apply(state: SKIState, G):
    """W G: gather grid values back to the data points — (J, n, t)."""
    out = 0.0
    for tap in range(4):
        ids = state.idx[:, :, tap]  # (J, n)
        gathered = jnp.take_along_axis(G, ids[:, :, None], axis=1)  # (J, n, t)
        out = out + state.w[:, :, tap, None] * gathered
    return out


def ski_mvm(spec: KernelSpec, kparams, state: SKIState, V,
            state_rhs: SKIState = None):
    """K_ski V = sum_j scale_j (W_j T_j W'_j^T) V — (n, t).

    state_rhs: geometry of the RHS points (for cross-covariances
    K(test, train) v pass state=test geometry, state_rhs=train geometry);
    both must share the same grid (build with common z_bounds).
    """
    if state_rhs is None:
        state_rhs = state
    col = toeplitz_columns(spec, kparams, state)  # (J, m)
    U = interp_transpose(state_rhs, V)  # (J, m, t)
    TU = sym_toeplitz_matmul(col, U)  # (J, m, t)
    WTU = interp_apply(state, TU)  # (J, n, t)
    scales = _component_scales(spec, kparams, V.dtype)  # (J,)
    return jnp.tensordot(scales, WTU, axes=1)  # (n, t)


def ski_gram_diag(spec: KernelSpec, kparams, state: SKIState, n: int):
    """diag(K_ski): per point, w_row^T T[idx, idx] w_row per component.

    Needed so preconditioners/diagnostics see the SKI operator's true
    diagonal (slightly below k(0) because interpolation smooths)."""
    col = toeplitz_columns(spec, kparams, state)  # (J, m)
    # T[a, b] = col[|a-b|]; taps span 4 cells so |a-b| <= 3
    diffs = jnp.abs(
        state.idx[:, :, :, None] - state.idx[:, :, None, :]
    )  # (J, n, 4, 4)
    Tlocal = jax.vmap(lambda c, d: c[d])(col, diffs)  # (J, n, 4, 4)
    quad = jnp.einsum("jnab,jna,jnb->jn", Tlocal, state.w, state.w)
    scales = _component_scales(spec, kparams, col.dtype)
    return jnp.tensordot(scales, quad, axes=1)
