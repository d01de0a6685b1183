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
    sparse matmul. Two execution plans (KernelSpec.interp):

    "dense" (default): NEVER gather. Build the (block_n, m) interpolation
    matrix ON THE FLY from the fractional coordinates — m is only a few
    lane tiles (m=512 -> 4), so evaluating the cubic at ALL m cells per
    point is pure fused VPU math — and run both directions as MXU
    matmuls over n-blocks. At HouseElectric scale this is ~5x faster
    per MVM than any gather formulation: the platform's ~12 ns/row
    gather rate is the binding floor there, while the dense plan is
    VPU-compute-bound (measured round 2: 174 ms vs 775 ms per MVM
    round trip at n=1.8M, J=20, m=512, t=9, Precision.HIGH dots).

    "sorted": scatter-free streaming plan — W^T v = [static sort by
    cell] -> [per-tap cumsum] -> [difference at static cell boundaries],
    and W u = ONE wide gather from a 4-tap-stacked grid table. Exact-f32
    taps; kept as the oracle/parity plan and for gather-friendly
    backends.

    Both plans register the two directions as each other's custom_vjp
    adjoints so gradients reuse the same fast forward code.
  * T_j: the 1-D base kernel on the grid — symmetric TOEPLITZ because the
    grid is regular and the kernel stationary. T u is a circulant
    embedding of size 2m and two (r)FFTs — XLA's TPU FFT — batched over
    all J components at once, O(J m log m) per MVM.

LAYOUT RULE (hard-won): every large array keeps n or m as its LAST
(lane) dimension. TPU tiles pad the last dim toward 128, so a (J, n, 4)
tap array or a (J, n, 4t) gather output can materialize 32x / 3.5x
larger than its logical size — enough to OOM (and to stall the compiler)
at HouseElectric scale. Hence taps live as (4, J, n), grid values flow
as (J, t, m), and point values flow as (J, t, n).

The interpolation geometry (grid, taps, sort plan) depends only on the
data and the FIXED projections — never on trainable hyperparameters — so
it is computed once per dataset (`build_ski`, cached into model buffers
by models.exact_gp.prepare_buffers); only the Toeplitz first column
(lengthscale-dependent) is re-evaluated inside the training step.

Restriction (as in the reference): SKI applies to degree-1 projection
kernels — each component must be a single 1-D kernel for W T W^T
structure to hold.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.transforms import softplus
from .kernels import KernelSpec, _component_scales, _get_proj, _k1d

_HI = jax.lax.Precision.HIGHEST

# transient-memory budget for the grouped component loops below: caps the
# per-group (g, t, n) transients while keeping the number of inlined
# groups (and with it compile time) small.
_GROUP_BUDGET_ELEMS = 1 << 28


class SKIState(NamedTuple):
    """Per-dataset interpolation geometry for all J components.

    All fields follow the lane-layout rule above: tap axes lead, the
    point/grid axis is last. The "dense" plan needs only the first four
    fields; the sort-plan fields are None for dense states (None leaves
    vanish from the pytree, so dense states also carry ~10x less HBM
    at scale: tfrac is (J, n) vs the sorted plan's 5 (J, n)-sized
    arrays).
    """

    grid_lo: jax.Array  # (J,) left grid endpoint per component
    h: jax.Array  # (J,) grid spacing per component
    cells: jax.Array  # (m,) f32 cell indices 0..m-1 (m lives here)
    tfrac: jax.Array  # (J, n) fractional grid coordinate (z - lo) / h
    i0: jax.Array | None  # (J, n) int32 base cell (taps at i0+{-1..2})
    w4: jax.Array | None  # (4, J, n) tap weights (cubic convolution)
    order: jax.Array | None  # (J, n) int32 point order sorted by base cell
    w4_sorted: jax.Array | None  # (4, J, n) tap weights in sorted order
    bounds: jax.Array | None  # (J, m) int32: #sorted pts with i0 <= cell

    @property
    def m(self) -> int:
        return self.cells.shape[0]


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


def _tap_geometry(tfrac, m: int, dtype):
    """(i0, w4) from fractional coordinates: base cell + 4 normalized
    cubic tap weights. i0 (J, n) int32; w4 (4, J, n)."""
    i0 = jnp.clip(jnp.floor(tfrac).astype(jnp.int32), 1, m - 3)
    # per-tap weights, built tap-by-tap: never materializes a (J, n, 4)
    # array (lane-padding rule)
    w_taps = []
    for k in range(4):
        s = tfrac - (i0 + (k - 1)).astype(dtype)
        w_taps.append(_cubic_kernel(s))  # (J, n)
    w4 = jnp.stack(w_taps, axis=0)  # (4, J, n)
    # normalize: cubic-convolution weights sum to 1 exactly only for
    # interior points; renormalize to keep constant functions exact.
    # Points far outside the grid (zero-padding rows) get all-zero taps —
    # guard the division so they contribute exact zeros, not NaNs.
    wsum = jnp.sum(w4, axis=0, keepdims=True)
    w4 = jnp.where(wsum > 1e-8, w4 / jnp.where(wsum == 0, 1.0, wsum), 0.0)
    return i0, w4


def build_ski(spec: KernelSpec, kparams, kbuffers, x, grid_size: int,
              z_bounds=None, plan: str | None = None):
    """Compute the SKI geometry for inputs x (once per dataset).

    z_bounds: optional (lo (J,), hi (J,)) to build a grid covering MORE
    than x (e.g. train+test range) so the same grid serves cross-kernels.
    plan: "dense" | "sorted" | None (None -> spec.interp).
    """
    if (not spec.is_projection or any(d != 1 for d in spec.degrees)
            or spec.sub_dim != 1):
        raise ValueError("SKI supports degree-1, sub_dim-1 projection "
                         "kernels only")
    if spec.learn_proj:
        # SKI geometry is built once from (stop-gradded) projections;
        # ski_mvm never reads params["proj"], so the projection gradient
        # would be silently zero. Reject rather than pretend to train it.
        raise ValueError("learn_proj=True is incompatible with ski=True: "
                         "the SKI interpolation geometry is fixed at "
                         "prepare time, so projection gradients are zero")
    plan = spec.interp if plan is None else plan
    if plan not in ("dense", "sorted"):
        raise ValueError(f"unknown SKI interp plan {plan!r}")
    z = project(spec, kparams, kbuffers, x)  # (J, n)
    return _geometry_from_z(z, int(grid_size), z_bounds, plan)


def build_ski_factors(spec: KernelSpec, kparams, kbuffers, x,
                      grid_size: int, z_bounds=None):
    """Per-FACTOR SKI geometry for product (degree*sub_dim > 1)
    components: every 1-D projection column becomes a virtual degree-1
    component, so the returned SKIState has Jf = sum(degrees)*sub_dim
    rows. The product machinery (ops/ski_product.py) combines factor
    rows into Khatri-Rao interpolation rows / Kronecker grid factors
    per component. Dense plan only (the sorted plan's scatter-free
    trick does not compose across factors)."""
    if not spec.is_projection:
        raise ValueError("build_ski_factors needs a projection kernel")
    if spec.learn_proj:
        raise ValueError("learn_proj=True is incompatible with ski=True: "
                         "the SKI interpolation geometry is fixed at "
                         "prepare time, so projection gradients are zero")
    z = project(spec, kparams, kbuffers, x)  # (Jf, n)
    return _geometry_from_z(z, int(grid_size), z_bounds, "dense")


def _geometry_from_z(z, m: int, z_bounds, plan: str):
    """Shared geometry core: z (rows, n) -> SKIState with one grid per
    row (a row is a component for degree-1 kernels, a 1-D factor for
    product kernels)."""
    if z_bounds is None:
        lo, hi = jnp.min(z, axis=1), jnp.max(z, axis=1)
    else:
        lo, hi = z_bounds
    span = jnp.maximum(hi - lo, 1e-6)
    # pad by 2 cells each side so all 4 cubic taps stay interior
    h = span / (m - 5)
    grid_lo = lo - 2.0 * h
    cells = jnp.arange(m, dtype=z.dtype)

    t = (z - grid_lo[:, None]) / h[:, None]  # fractional grid coordinate
    if plan == "dense":
        return SKIState(grid_lo=grid_lo, h=h, cells=cells, tfrac=t,
                        i0=None, w4=None, order=None, w4_sorted=None,
                        bounds=None)

    i0, w4 = _tap_geometry(t, m, z.dtype)
    # scatter-free transpose plan: sort points by base cell per component
    order = jnp.argsort(i0, axis=1).astype(jnp.int32)  # (J, n)
    i0_sorted = jnp.take_along_axis(i0, order, axis=1)
    w4_sorted = jnp.take_along_axis(w4, order[None, :, :], axis=2)
    # bounds[j, c] = #points with i0 <= c  (searchsorted per component)
    bounds = jax.vmap(
        lambda srt: jnp.searchsorted(srt, jnp.arange(m, dtype=i0.dtype),
                                     side="right")
    )(i0_sorted).astype(jnp.int32)
    return SKIState(grid_lo=grid_lo, h=h, cells=cells, tfrac=t, i0=i0,
                    w4=w4, order=order, w4_sorted=w4_sorted, bounds=bounds)


def toeplitz_columns(spec: KernelSpec, kparams, state: SKIState):
    """First columns of the T_j: k1d(g_a - g_0) over the grid — (J, m).

    The only lengthscale-dependent piece; re-evaluated per training step.
    Mixed base kernels (the generalized-kernel family,
    [U] gp_models/kernels.py GeneralizedProjectionKernel) evaluate as one
    static per-BASE row split: bases is a static tuple, so the grouping
    is trace-time bookkeeping and the downstream batched FFT plan is
    unchanged (sym_toeplitz_matmul only consumes column VALUES)."""
    ls = softplus(kparams["raw_lengthscale"])  # (J,) for degree-1
    scaled = state.cells[None, :] * state.h[:, None] / ls[:, None]  # (J, m)
    base = spec.bases[0]
    if all(b == base for b in spec.bases):
        return _k1d(base, scaled)
    out = jnp.zeros_like(scaled)
    for b in sorted(set(spec.bases)):
        rows = jnp.asarray(
            [j for j, bj in enumerate(spec.bases) if bj == b])
        out = out.at[rows].set(_k1d(b, scaled[rows]))
    return out


def sym_toeplitz_matmul(col, U):
    """(J, m) Toeplitz first columns x (J, t, m) -> (J, t, m) via a 2m
    circulant embedding and batched rFFTs over the last axis.

    (A direct T-materialization + MXU einsum alternative was measured at
    parity with the FFT at the flagship m=256 — 624 vs 619 ms/step,
    docs/BENCHMARKS.md r2 — so the simpler FFT plan stays.)

    SYMMETRY ENFORCEMENT: the symmetric embedding's spectrum is exactly
    real, so only roundoff lives in Im(rfft) — dropping it makes the
    grid operator exactly symmetric by construction (CG/Lanczos at the
    near-interpolation extremes are unforgiving of asymmetric roundoff).
    NOTE: clamping the eigenvalues at zero was tried and is WRONG — the
    minimal circulant embedding of an RBF Toeplitz has LEGITIMATE
    negative eigenvalues (~1e-3 scale here); only the Toeplitz submatrix
    is PSD, and clamping biased the operator by ~4e-3 (caught by the
    dense-oracle tests)."""
    J, m = col.shape
    circ = jnp.concatenate(
        [col, jnp.zeros((J, 1), col.dtype), col[:, -1:0:-1]], axis=1
    )  # (J, 2m)
    C = jnp.fft.rfft(circ, axis=-1).real  # (J, m+1)
    Upad = jnp.concatenate([U, jnp.zeros_like(U)], axis=-1)  # (J, t, 2m)
    F = jnp.fft.rfft(Upad, axis=-1)  # (J, t, m+1)
    out = jnp.fft.irfft(C[:, None, :] * F, n=2 * m, axis=-1)
    return out[..., :m].astype(U.dtype)


def _component_group_size(J: int, n: int, t: int) -> int:
    per_j = max(1, n * 4 * t)
    return max(1, min(J, _GROUP_BUDGET_ELEMS // per_j))


# ---------------------------------------------------------------------------
# core implementations (grouped over components; lane-clean layouts)
# ---------------------------------------------------------------------------


def _spread_sorted(state: SKIState, Vs):
    """Scatter-free spread: Vs (J, t, n) in each component's sorted-by-cell
    order -> grid values (J, t, m) via per-tap cumsum + static boundary
    differences. Cell c accumulates, for tap k, the sorted points with
    i0 == c - k + 1; the prefix boundary per cell is bounds[c - k + 1]."""
    J, t, n = Vs.shape
    m = state.bounds.shape[1]
    cells = jnp.arange(m)

    def spread_group(Vg, wg, bg):
        # Vg (g, t, n), wg (4, g, n), bg (g, m)
        g_ = Vg.shape[0]
        zero = jnp.zeros((g_, t, 1), Vg.dtype)
        out = jnp.zeros((g_, t, m), Vg.dtype)
        for tap in range(4):
            contrib = wg[tap][:, None, :] * Vg  # (g, t, n)
            csum = jnp.concatenate([zero, jnp.cumsum(contrib, axis=-1)], axis=-1)
            shift = 1 - tap  # i0 = c + (1 - tap)
            src = jnp.clip(cells + shift, -1, m - 1)
            hi = jnp.where(cells + shift < 0, 0,
                           jnp.take(bg, jnp.maximum(src, 0), axis=1))
            lo = jnp.where(cells + shift - 1 < 0, 0,
                           jnp.take(bg, jnp.maximum(src - 1, 0), axis=1))
            seg = jnp.take_along_axis(csum, hi[:, None, :], axis=-1) \
                - jnp.take_along_axis(csum, lo[:, None, :], axis=-1)
            out = out + seg
        return out

    g = _component_group_size(J, n, t)
    if g >= J:
        return spread_group(Vs, state.w4_sorted, state.bounds)
    outs = []
    for s0 in range(0, J, g):  # static python loop: slices, never stacks
        s1 = min(J, s0 + g)
        outs.append(spread_group(Vs[s0:s1], state.w4_sorted[:, s0:s1],
                                 state.bounds[s0:s1]))
    return jnp.concatenate(outs, axis=0)


def _interp_transpose_impl(state: SKIState, V):
    """W^T V: V (n, t) -> grid values (J, t, m). The one unavoidable
    per-component gather brings V into sorted order (lane-dim gather)."""
    VT = V.T  # (t, n)
    Vs = jnp.take_along_axis(
        VT[None, :, :], state.order[:, None, :], axis=2
    )  # (J, t, n)
    return _spread_sorted(state, Vs)


def _interp_transpose_per_component(state: SKIState, rows):
    """W_j^T rows_j with a separate RHS per component: rows (J, t, n) ->
    (J, t, m)."""
    Vs = jnp.take_along_axis(rows, state.order[:, None, :], axis=2)
    return _spread_sorted(state, Vs)


def _interp_apply_impl(state: SKIState, G):
    """W G: grid values (J, t, m) -> point values (J, t, n).

    ONE wide gather per group: stack the 4 tap-shifted copies of G along
    the sublane axis — G4 (g, 4t, m) — and gather all taps' values for a
    point with a single lane-index (i0); then combine with tap weights.
    """
    J, t, m = G.shape
    n = state.i0.shape[1]

    def apply_group(Gg, i0g, wg):
        # Gg (g, t, m), i0g (g, n), wg (4, g, n)
        if t < 4:
            # tiny-t MVMs (e.g. the mean solve): the stacked-tap table
            # would have a size-4t middle dim that XLA's layout pass turns
            # into a 32x-padded [g*n, 4t] monster at scale — per-tap
            # gathers are cheap here and keep lanes on n
            out = 0.0
            for k in range(4):
                idxk = jnp.clip(i0g + (k - 1), 0, m - 1)
                gk = jnp.take_along_axis(Gg, idxk[:, None, :], axis=-1)
                out = out + wg[k][:, None, :] * gk
            return out  # (g, t, n)
        G4 = jnp.concatenate(
            [jnp.roll(Gg, 1 - k, axis=-1) for k in range(4)], axis=1
        )  # (g, 4t, m); wrap rows land on padded border cells (weight ~0
        #    for interior-built geometry: i0 in [1, m-3])
        rows = jnp.take_along_axis(G4, i0g[:, None, :], axis=-1)  # (g, 4t, n)
        out = 0.0
        for k in range(4):
            out = out + wg[k][:, None, :] * rows[:, k * t:(k + 1) * t, :]
        return out  # (g, t, n)

    g = _component_group_size(J, n, t)
    if g >= J:
        return apply_group(G, state.i0, state.w4)
    outs = []
    for s0 in range(0, J, g):  # static python loop; see _spread_sorted
        s1 = min(J, s0 + g)
        outs.append(apply_group(G[s0:s1], state.i0[s0:s1],
                                state.w4[:, s0:s1]))
    return jnp.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# custom_vjp duality: W and W^T are exact adjoints, so each direction's
# backward pass IS the other direction's fast forward plan. Without this,
# XLA transposes the apply-gather into a slow row-scatter (and vice versa)
# inside every MLL gradient.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def interp_transpose(state: SKIState, V):
    """W^T V: (n, t) -> (J, t, m)."""
    return _interp_transpose_impl(state, V)


def _it_fwd(state, V):
    return _interp_transpose_impl(state, V), state


def _it_bwd(state, G_bar):
    # d/dV (W^T V) @ G_bar = sum_j W_j G_bar_j, back in (n, t) layout
    rows = _interp_apply_impl(state, G_bar)  # (J, t, n)
    return None, jnp.sum(rows, axis=0).T


interp_transpose.defvjp(_it_fwd, _it_bwd)


@jax.custom_vjp
def interp_apply(state: SKIState, G):
    """W G: (J, t, m) -> (J, t, n)."""
    return _interp_apply_impl(state, G)


def _ia_fwd(state, G):
    return _interp_apply_impl(state, G), state


def _ia_bwd(state, rows_bar):
    # d/dG (W G) @ rows_bar = W^T rows_bar per component
    return None, _interp_transpose_per_component(state, rows_bar)


interp_apply.defvjp(_ia_fwd, _ia_bwd)


# ---------------------------------------------------------------------------
# DENSE interpolation plan: no gathers at all. Both directions build the
# (block_n, m) interpolation matrix on the fly from tfrac (fused VPU
# cubic eval over all m cells — m is a handful of lane tiles) and
# contract it on the MXU. VPU-compute-bound; ~5x the sorted plan at
# HouseElectric scale where gathers are the floor. The two directions
# are EXACT adjoints of each other:
#       dense_interp_transpose: V (n, t)   -> U (J, t, m),  U_j = W_j^T V
#       dense_interp_apply_sum: G (J, t, m) -> (n, t),  sum_j W_j G_j
# so each one's custom_vjp backward is the other's forward.
# ---------------------------------------------------------------------------

_DENSE_BLOCK = 4096
# HIGH = bf16x3 passes: ~1.5e-5 relative error on the interp dots (far
# below the SKI approximation itself) at ~60% of HIGHEST's cost. The
# platform DEFAULT is a single bf16 pass (~2e-3) — too loose for CG.
_DENSE_PREC = jax.lax.Precision.HIGH


def _use_pallas_interp() -> bool:
    """Pallas one-hot interp kernels (ops/pallas_interp.py): 2.5x the XLA
    dense plan per direction on TPU (46 vs 113 ms at n=1.8M, J=20, m=512
    — docs/BENCHMARKS.md r2). Env RPAGP_NO_PALLAS_INTERP=1 forces XLA."""
    import os

    if os.environ.get("RPAGP_NO_PALLAS_INTERP", "0") == "1":
        return False
    from . import pallas_interp

    return pallas_interp.on_tpu()


def _pallas_pad(tfrac):
    from . import pallas_interp as pi

    J, n = tfrac.shape
    n_pad = -(-n // pi.BN) * pi.BN
    if n_pad != n:
        tfrac = jnp.pad(tfrac, ((0, 0), (0, n_pad - n)),
                        constant_values=-100.0)
    return tfrac, n_pad


def _dense_blocks(tfrac):
    """Pad tfrac to a whole number of blocks. Padded slots get tfrac
    -100: every cubic weight is exactly 0, so they contribute nothing."""
    J, n = tfrac.shape
    bn = min(_DENSE_BLOCK, max(8, n))
    nb = -(-n // bn)
    pad = nb * bn - n
    if pad:
        tfrac = jnp.pad(tfrac, ((0, 0), (0, pad)), constant_values=-100.0)
    return tfrac, bn, nb, pad


# Pallas interp kernels hold an (8*t, m) f32 accumulator (+ the tap-
# stacked bf16 operand) in VMEM per block — wide-t calls (e.g. the LOVE
# cache build, t = love_rank) must chunk columns or they blow the 16 MB
# scoped-vmem limit.
_PALLAS_T_MAX = 64


def _dense_interp_transpose_impl(state: SKIState, V):
    """W^T V per component: V (n, t) -> (J, t, m)."""
    if _use_pallas_interp():
        from . import pallas_interp as pi

        t = V.shape[1]
        if t > _PALLAS_T_MAX:
            outs = [
                _dense_interp_transpose_impl(state, V[:, s:s + _PALLAS_T_MAX])
                for s in range(0, t, _PALLAS_T_MAX)
            ]
            return jnp.concatenate(outs, axis=1)
        tf, n_pad = _pallas_pad(state.tfrac)
        VT = V.T
        if n_pad != V.shape[0]:
            VT = jnp.pad(VT, ((0, 0), (0, n_pad - V.shape[0])))
        return pi.transpose_call(tf, VT.astype(jnp.float32),
                                 state.m).astype(V.dtype)
    cells = state.cells
    J, n = state.tfrac.shape
    t = V.shape[1]
    tf, bn, nb, pad = _dense_blocks(state.tfrac)
    VT = V.T if not pad else jnp.pad(V.T, ((0, 0), (0, pad)))  # (t, n_pad)
    tfb = tf.reshape(J, nb, bn).transpose(1, 0, 2)  # (nb, J, bn)
    Vb = VT.reshape(t, nb, bn).transpose(1, 0, 2)  # (nb, t, bn)

    def body(U, inp):
        tfb_i, vb_i = inp
        W = _cubic_kernel(tfb_i[:, :, None] - cells)  # (J, bn, m)
        U_p = jax.lax.dot_general(
            vb_i, W, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DENSE_PREC,
        )  # (t, J, m)
        return U + U_p.transpose(1, 0, 2), None

    U0 = jnp.zeros((J, t, cells.shape[0]), jnp.float32)
    U, _ = jax.lax.scan(body, U0, (tfb, Vb))
    return U.astype(V.dtype)


def _dense_interp_apply_sum_impl(state: SKIState, G):
    """sum_j W_j G_j: G (J, t, m) -> (n, t)."""
    if _use_pallas_interp():
        from . import pallas_interp as pi

        t = G.shape[1]
        if t > _PALLAS_T_MAX:
            outs = [
                _dense_interp_apply_sum_impl(state, G[:, s:s + _PALLAS_T_MAX])
                for s in range(0, t, _PALLAS_T_MAX)
            ]
            return jnp.concatenate(outs, axis=1)
        n = state.tfrac.shape[1]
        tf, n_pad = _pallas_pad(state.tfrac)
        out = pi.apply_sum_call(tf, G.astype(jnp.float32))
        return out[:, :n].T.astype(G.dtype)
    cells = state.cells
    J, n = state.tfrac.shape
    t = G.shape[1]
    tf, bn, nb, _ = _dense_blocks(state.tfrac)
    tfb = tf.reshape(J, nb, bn).transpose(1, 0, 2)  # (nb, J, bn)

    def body(_, tfb_i):
        W = _cubic_kernel(tfb_i[:, :, None] - cells)  # (J, bn, m)
        out = jax.lax.dot_general(
            G, W, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=_DENSE_PREC,
        )  # (J, t, bn)
        return None, jnp.sum(out, axis=0)  # (t, bn)

    _, outs = jax.lax.scan(body, None, tfb)  # (nb, t, bn)
    return outs.transpose(1, 0, 2).reshape(t, -1)[:, :n].T.astype(G.dtype)


@jax.custom_vjp
def dense_interp_transpose(state: SKIState, V):
    """W^T V: (n, t) -> (J, t, m) — dense plan."""
    return _dense_interp_transpose_impl(state, V)


def _dit_fwd(state, V):
    return _dense_interp_transpose_impl(state, V), state


def _dit_bwd(state, U_bar):
    return None, _dense_interp_apply_sum_impl(state, U_bar)


dense_interp_transpose.defvjp(_dit_fwd, _dit_bwd)


@jax.custom_vjp
def dense_interp_apply_sum(state: SKIState, G):
    """sum_j W_j G_j: (J, t, m) -> (n, t) — dense plan."""
    return _dense_interp_apply_sum_impl(state, G)


def _dia_fwd(state, G):
    return _dense_interp_apply_sum_impl(state, G), state


def _dia_bwd(state, out_bar):
    return None, _dense_interp_transpose_impl(state, out_bar)


dense_interp_apply_sum.defvjp(_dia_fwd, _dia_bwd)


# ---------------------------------------------------------------------------
# public kernel ops
# ---------------------------------------------------------------------------


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
    scales = _component_scales(spec, kparams, V.dtype)  # (J,)
    if state_rhs.order is None:  # dense plan
        U = dense_interp_transpose(state_rhs, V)  # (J, t, m)
    else:
        U = interp_transpose(state_rhs, V)  # (J, t, m)
    TU = sym_toeplitz_matmul(col, U)  # (J, t, m)
    if state.order is None:  # dense plan: scales fold into grid space
        return dense_interp_apply_sum(state, scales[:, None, None] * TU)
    WTU = interp_apply(state, TU)  # (J, t, n)
    return jnp.tensordot(scales, WTU, axes=1).T  # (n, t)


def ski_gram_diag(spec: KernelSpec, kparams, state: SKIState, n: int):
    """diag(K_ski): per point, w^T T_local w per component. The grid is
    regular, so T[idx_a, idx_b] = col[|tap_a - tap_b|] — position
    independent: a single (4, 4) matrix per component."""
    col = toeplitz_columns(spec, kparams, state)  # (J, m)
    taps = jnp.arange(4)
    Tlocal = col[:, jnp.abs(taps[:, None] - taps[None, :])]  # (J, 4, 4)
    w4 = state.w4
    if w4 is None:  # dense-plan state: derive taps from tfrac on demand
        _, w4 = _tap_geometry(state.tfrac, state.m, state.tfrac.dtype)
    quad = jnp.einsum("jab,ajn,bjn->jn", Tlocal, w4, w4)
    scales = _component_scales(spec, kparams, col.dtype)
    return jnp.tensordot(scales, quad, axes=1)
