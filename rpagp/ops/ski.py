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
    sparse matmul, and row scatters/gathers of ~10-float rows run at ~7%
    lane efficiency, so both directions are restructured into streaming
    ops: W^T v = [static sort by cell] -> [per-tap cumsum] -> [difference
    at static cell boundaries] (scatter-free), and W u = ONE wide gather
    from a 4-tap-concatenated grid table (4x fewer, 4x wider rows). The
    two directions are registered as each other's custom_vjp adjoints so
    gradients reuse the same fast plans (~3.7x vs naive scatter/gather
    on TPU v5e at n=1e5, J=20).
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
    """Per-dataset interpolation geometry for all J components.

    Beyond the raw taps (idx, w), the state carries a SCATTER-FREE plan:
    per component, points sorted by base cell (a STATIC permutation), so
    W^T V becomes [gather V into sorted order] -> [per-tap cumsum] ->
    [difference at static cell boundaries] — prefix sums and contiguous
    reads instead of 4*J*n row-scatters, which run ~15x slower than
    streaming ops on TPU (scatter lane efficiency at t ~ 10 is ~7%).
    """

    grid_lo: jax.Array  # (J,) left grid endpoint per component
    h: jax.Array  # (J,) grid spacing per component
    idx: jax.Array  # (J, n, 4) int32 tap indices into the grid
    w: jax.Array  # (J, n, 4) tap weights (cubic convolution)
    order: jax.Array  # (J, n) int32: point order sorted by base cell i0
    w_sorted: jax.Array  # (J, n, 4) tap weights in sorted order
    bounds: jax.Array  # (J, m) int32: for each cell c, number of sorted
    #                    points with i0 <= c (cumsum boundary per cell)


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

    # scatter-free transpose plan: sort points by base cell per component
    order = jnp.argsort(i0, axis=1).astype(jnp.int32)  # (J, n)
    i0_sorted = jnp.take_along_axis(i0, order, axis=1)
    w_sorted = jnp.take_along_axis(w, order[:, :, None], axis=1)
    # bounds[j, c] = #points with i0 <= c  (searchsorted per component)
    cells = jnp.arange(m, dtype=i0.dtype)
    bounds = jax.vmap(
        lambda srt: jnp.searchsorted(srt, cells, side="right")
    )(i0_sorted).astype(jnp.int32)
    return SKIState(grid_lo=grid_lo, h=h, idx=idx, w=w,
                    order=order, w_sorted=w_sorted, bounds=bounds)


def toeplitz_columns(spec: KernelSpec, kparams, state: SKIState):
    """First columns of the T_j: k1d(g_a - g_0) over the grid — (J, m).

    The only lengthscale-dependent piece; re-evaluated per training step.
    """
    ls = softplus(kparams["raw_lengthscale"])  # (J,) for degree-1
    m = state.bounds.shape[1]  # static grid size (from array shape, so the
    # state can cross jit boundaries as a buffer pytree without tracing m)
    dists = jnp.arange(m)[None, :] * state.h[:, None]  # (J, m)
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


def _interp_transpose_impl(state: SKIState, V):
    """W^T V: spread projected-data values onto the grid — (J, m, t).

    SCATTER-FREE: with points pre-sorted by base cell (static plan in the
    state), the per-cell sums for each tap are contiguous segments of the
    sorted contribution stream, so each tap is [elementwise weight] ->
    [cumsum along points] -> [difference at static cell boundaries].
    Prefix sums + tiny boundary gathers run ~3x faster than TPU scatters
    and scale linearly with n.

    Cell targeted by tap k of point p is i0_p + (k - 1), so for tap k the
    segment of cell c covers sorted points with i0 in (-inf, c - k + 1]:
    boundary row = bounds[:, c - k + 1].
    """
    return _spread_sorted(
        state,
        jnp.take_along_axis(V[None, :, :], state.order[:, :, None], axis=1),
    )


# transient-memory budget for the grouped component loops below: at
# HouseElectric scale a single (J, n, 4t) intermediate is ~5 GB — beyond
# HBM headroom next to the CG state — so both interp directions process
# components in groups sized to ~64M f32 elements of transient.
_GROUP_BUDGET_ELEMS = 1 << 26


def _component_groups_for(J: int, n: int, t: int) -> int:
    per_j = max(1, n * 4 * t)
    return max(1, min(J, _GROUP_BUDGET_ELEMS // per_j))


def _interp_apply_impl(state: SKIState, G):
    """W G: gather grid values back to the data points — (J, n, t).

    ONE wide gather instead of four narrow ones: build G4[c] =
    [G[c-1] | G[c] | G[c+1] | G[c+2]] (m, 4t) — three rolls of the small
    grid array — then each point reads a single 4t-wide row at its base
    cell. Row count drops 4x and row width grows 4x; both help the
    TPU's per-row gather cost. Components are processed in groups to cap
    the (g, n, 4t) transient.
    """
    J, m, t = G.shape
    n = state.idx.shape[1]

    def apply_group(args):
        Gg, baseg, wg = args  # (g, m, t), (g, n), (g, n, 4)
        G4 = jnp.concatenate(
            [jnp.roll(Gg, 1 - k, axis=1) for k in range(4)], axis=2
        )  # (g, m, 4t); wrap rows land on padded border cells (weight ~0)
        rows = jnp.take_along_axis(G4, baseg[:, :, None], axis=1)
        rows = rows.reshape(Gg.shape[0], -1, 4, t)
        return jnp.einsum("jnk,jnkt->jnt", wg, rows)

    base = state.idx[:, :, 1]  # i0 (tap offsets are base + {-1,0,1,2})
    g = _component_groups_for(J, n, t)
    if g >= J:
        return apply_group((G, base, state.w))
    # static python loop over component groups: slicing (never stacking)
    # keeps the (., ., 4) tap arrays out of loop residuals, whose (8,128)
    # lane tiling pads the 4-wide axis 32x (OOM at HouseElectric scale)
    outs = []
    for s0 in range(0, J, g):
        s1 = min(J, s0 + g)
        outs.append(apply_group((G[s0:s1], base[s0:s1], state.w[s0:s1])))
    return jnp.concatenate(outs, axis=0)


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


# ---------------------------------------------------------------------------
# custom_vjp duality: W and W^T are exact adjoints, so each direction's
# backward pass IS the other direction's fast forward plan. Without this,
# XLA transposes the apply-gather into a slow row-scatter (and vice versa)
# inside every MLL gradient.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def interp_transpose(state: SKIState, V):
    return _interp_transpose_impl(state, V)


def _it_fwd(state, V):
    return _interp_transpose_impl(state, V), state


def _it_bwd(state, G_bar):
    # d/dV (W^T V) @ G_bar = W G_bar, summed over components
    rows = _interp_apply_impl(state, G_bar)  # (J, n, t)
    return None, jnp.sum(rows, axis=0)


interp_transpose.defvjp(_it_fwd, _it_bwd)


@jax.custom_vjp
def interp_apply(state: SKIState, G):
    return _interp_apply_impl(state, G)


def _ia_fwd(state, G):
    return _interp_apply_impl(state, G), state


def _ia_bwd(state, rows_bar):
    # d/dG (W G) @ rows_bar = W^T rows_bar per component
    return None, _interp_transpose_per_component(state, rows_bar)


interp_apply.defvjp(_ia_fwd, _ia_bwd)


def _interp_transpose_per_component(state: SKIState, rows):
    """W_j^T rows_j with a separate RHS per component — (J, n, t) ->
    (J, m, t). Same scatter-free plan as _interp_transpose_impl but the
    gather-to-sorted-order picks from each component's own rows."""
    return _spread_sorted(
        state, jnp.take_along_axis(rows, state.order[:, :, None], axis=1)
    )


def _spread_sorted(state: SKIState, Vs):
    """Shared scatter-free spread core: Vs (J, n, t) already in each
    component's sorted-by-cell order -> grid values (J, m, t). Groups the
    component axis to cap the cumsum transient at ~256 MB."""
    J, n, t = Vs.shape
    m = state.bounds.shape[1]  # static (state.m may be traced under vjp)
    cells = jnp.arange(m)

    def spread_group(args):
        Vg, wg, bg = args  # (g, n, t), (g, n, 4), (g, m)
        g_ = Vg.shape[0]
        zero = jnp.zeros((g_, 1, t), Vg.dtype)
        out = jnp.zeros((g_, m, t), Vg.dtype)
        for tap in range(4):
            contrib = wg[:, :, tap, None] * Vg
            csum = jnp.concatenate([zero, jnp.cumsum(contrib, axis=1)], axis=1)
            # cell c accumulates sorted points with i0 == c - tap + 1
            shift = 1 - tap
            src = jnp.clip(cells + shift, -1, m - 1)
            hi = jnp.where(cells + shift < 0, 0,
                           jnp.take(bg, jnp.maximum(src, 0), axis=1))
            lo = jnp.where(cells + shift - 1 < 0, 0,
                           jnp.take(bg, jnp.maximum(src - 1, 0), axis=1))
            seg = jnp.take_along_axis(csum, hi[:, :, None], axis=1) \
                - jnp.take_along_axis(csum, lo[:, :, None], axis=1)
            out = out + seg
        return out

    g = _component_groups_for(J, n, t)
    if g >= J:
        return spread_group((Vs, state.w_sorted, state.bounds))
    outs = []
    for s0 in range(0, J, g):  # static loop; see _interp_apply_impl note
        s1 = min(J, s0 + g)
        outs.append(
            spread_group((Vs[s0:s1], state.w_sorted[s0:s1], state.bounds[s0:s1]))
        )
    return jnp.concatenate(outs, axis=0)
