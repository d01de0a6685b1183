"""Pallas TPU kernels for SKI grid interpolation (the dense plan's hot op).

The XLA dense plan (ops/ski.py) evaluates the cubic-convolution kernel at
ALL m grid cells for every point — O(n m) VPU work (~11 ops/element) plus
the (block, m) weight matrix materializing through HBM between the VPU
eval and the MXU dot. At HouseElectric scale that VPU+traffic cost IS the
MLL step (measured 174 ms per MVM round trip, docs/BENCHMARKS.md).

These kernels restructure the same math around a ONE-HOT factorization.
With i0 = floor(tfrac) and f = tfrac - i0 in [0, 1), the interpolation
matrix is exactly

    W[i, c] = sum_{d in {-1,0,1,2}}  w_d(f_i) * [ i0_i + d == c ]

where the four tap weights are fixed cubic polynomials of f (Keys
a=-0.5; no piecewise selects needed because each tap sits in a fixed
piece for f in [0,1)):

    w_{-1}(f) = outer(1+f),  w_0(f) = inner(f),
    w_1(f)  = inner(1-f),   w_2(f)  = outer(2-f).

So both interpolation directions become: O(n) Horner evals for the
weights (VPU, negligible), a 0/1 matrix E[i, c] = [i0_i == c] built
in VMEM with ONE compare per element (~5x cheaper than the cubic-at-
every-cell eval), and a single MXU contraction against E per point
block — E is EXACT in bfloat16, and the dense operand is fed as an
exact hi+lo bfloat16 split accumulated in f32 (~1e-6 relative error,
between Precision.HIGH and HIGHEST). W never touches HBM.

Semantics match ops/ski.py's dense plan for all points interior to the
grid (tfrac in [1, m-3], which build_ski guarantees for covered data) and
for the -100 padding convention (pad rows/cols contribute exact zeros).
For points OUTSIDE the grid the taps are dropped (zero weights) rather
than truncated — callers must build grids covering their points (they
do: union z_bounds).

The two directions are exact adjoints of each other (same E, same w_d),
preserving ops/ski.py's custom_vjp duality when swapped in as impls.

Reference analog: [G] gpytorch/utils/interpolation.py +
[G] lazy/interpolated_lazy_tensor.py (SURVEY.md §3.5) — there as sparse
CUDA matmuls; here as a TPU systolic-array formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 2048  # point-block size (lane-dim blocks of n)


def _tap_weights(f):
    """The four cubic-convolution tap weights at fractional offset
    f in [0, 1): (w_{-1}, w_0, w_1, w_2), each the SAME fixed polynomial
    piece for all f (Horner, 3 FMA each, no selects).

    inner(s) = 1.5 s^3 - 2.5 s^2 + 1         (|s| <= 1)
    outer(s) = -0.5 s^3 + 2.5 s^2 - 4 s + 2  (1 < |s| < 2)
    """
    g = 1.0 - f  # offset of tap 1; tap 2 sits at 1+g, tap -1 at 1+f
    inner = lambda s: ((1.5 * s - 2.5) * s) * s + 1.0
    outer = lambda s: ((-0.5 * s + 2.5) * s - 4.0) * s + 2.0
    return outer(1.0 + f), inner(f), inner(g), outer(1.0 + g)


def _split_hi_lo(x):
    """Exact-ish bf16 split: x ~= hi + lo with ~1e-6 combined residual."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, lo


def _shift_last(a, d):
    """a[..., c - d] along the last axis with ZERO fill (not wrap): lane
    roll + iota mask — Mosaic rejects unaligned lane/sublane concats, and
    a plain roll would wrap edge taps (wrong for points at i0 = 0 or
    m-1, e.g. slightly extrapolating test chunks)."""
    if d == 0:
        return a
    r = pltpu.roll(a, d % a.shape[-1], a.ndim - 1)  # roll wants shift >= 0
    lanes = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    mask = (lanes >= d) if d > 0 else (lanes < a.shape[-1] + d)
    return jnp.where(mask, r, 0.0)


def _one_hot(i0, m):
    """E (m, bn) bf16 one-hot of the (f32 floor-valued) base cells:
    int32 iota-compare, one VPU op per element.

    (A bf16-compare variant — exact for m <= 256 where every index is
    representable, hoping for 2-packed compares — was tried in round 2:
    Mosaic rejects the bf16 eq lowering inside the kernel. Not a lever.)"""
    bn = i0.shape[0]
    cells = jax.lax.broadcasted_iota(jnp.int32, (m, bn), 0)
    return (cells == i0.astype(jnp.int32)[None, :]).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# transpose direction: U[j] = W_j^T V,  (n, t) -> (J, t, m)
# ---------------------------------------------------------------------------


def _transpose_kernel(tf_ref, v_ref, u_ref, acc_ref, *, m, t, nb, J):
    """Grid (nb, J), j INNERMOST: the tfrac slab and V block have
    j-independent index maps, so Pallas fetches them once per point
    block and the J component passes reuse them from VMEM — the naive
    (J, nb) order re-streamed ~4 GB/direction of tfrac+V at flagship
    scale (measured ~5 ms/CG-iter of pure redundant DMA).

    The tap shifts + hi/lo combine are applied PER BLOCK (they are
    linear, so order with accumulation doesn't matter), shrinking the
    accumulator from (8t, m) per component to one resident (J, t, m)
    scratch written back once at the final invocation."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tf = tf_ref[j, :]  # (bn,) f32 — tfrac block carries all J rows
    i0 = jnp.floor(tf)
    w = _tap_weights(tf - i0)  # 4 x (bn,)
    V = v_ref[:]  # (t, bn)
    X = jnp.concatenate([wd[None, :] * V for wd in w], axis=0)  # (4t, bn)
    Xhi, Xlo = _split_hi_lo(X)
    X2 = jnp.concatenate([Xhi, Xlo], axis=0)  # (8t, bn) bf16
    # E^T tile: (m, bn) one-hot of i0 — exact in bf16 (int32 iota;
    # Mosaic has no float iota)
    E = _one_hot(i0, m)
    P = jax.lax.dot_general(
        X2, E, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (8t, m) — m on lanes so the tap shifts are lane rolls
    A = P[: 4 * t] + P[4 * t :]  # (4t, m) hi+lo
    out = jnp.zeros((t, m), jnp.float32)
    for k, d in enumerate((-1, 0, 1, 2)):
        out = out + _shift_last(A[k * t : (k + 1) * t], d)
    acc_ref[j] += out

    @pl.when(jnp.logical_and(i == nb - 1, j == J - 1))
    def _():
        u_ref[:] = acc_ref[:]


def transpose_call(tfrac, VT, m: int, interpret: bool = False):
    """W^T V: tfrac (J, n_pad), VT (t, n_pad) -> (J, t, m)."""
    J, n_pad = tfrac.shape
    t = VT.shape[0]
    assert n_pad % BN == 0, (n_pad, BN)
    nb = n_pad // BN
    kernel = functools.partial(_transpose_kernel, m=m, t=t, nb=nb, J=J)
    return pl.pallas_call(
        kernel,
        grid=(nb, J),  # j innermost: see kernel docstring
        in_specs=[
            # (J, BN) slab: a (1, BN) block is illegal (second-to-last
            # block dim must divide 8 or equal the array dim); the whole
            # J-row slab is KBs, fetched once per i, and the kernel
            # picks its row
            pl.BlockSpec((J, BN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, BN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((J, t, m), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((J, t, m), jnp.float32),
        scratch_shapes=[pltpu.VMEM((J, t, m), jnp.float32)],
        interpret=interpret,
    )(tfrac, VT)


# ---------------------------------------------------------------------------
# apply direction: out = sum_j W_j G_j,  (J, t, m) -> (t, n)
# ---------------------------------------------------------------------------


def _apply_kernel(tf_ref, g_ref, o_ref, *, m, t, J):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    tf = tf_ref[j, :]  # (bn,) — tfrac block carries all J rows
    i0 = jnp.floor(tf)
    w = _tap_weights(tf - i0)
    G = g_ref[0]  # (t, m)
    G4 = jnp.concatenate([_shift_last(G, -d) for d in (-1, 0, 1, 2)], 0)
    Ghi, Glo = _split_hi_lo(G4)
    G8 = jnp.concatenate([Ghi, Glo], axis=0)  # (8t, m) bf16
    E = _one_hot(i0, m)  # (m, bn)
    R = jax.lax.dot_general(
        G8, E, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (8t, bn)
    Rc = R[: 4 * t] + R[4 * t :]  # (4t, bn)
    out = 0.0
    for k in range(4):
        out = out + w[k][None, :] * Rc[k * t : (k + 1) * t]
    o_ref[:] += out


def apply_sum_call(tfrac, G, interpret: bool = False):
    """sum_j W_j G_j: tfrac (J, n_pad), G (J, t, m) -> (t, n_pad)."""
    J, n_pad = tfrac.shape
    _, t, m = G.shape
    assert n_pad % BN == 0, (n_pad, BN)
    nb = n_pad // BN
    kernel = functools.partial(_apply_kernel, m=m, t=t, J=J)
    return pl.pallas_call(
        kernel,
        grid=(nb, J),
        in_specs=[
            pl.BlockSpec((J, BN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, m), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, BN), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n_pad), jnp.float32),
        interpret=interpret,
    )(tfrac, G)


def on_tpu() -> bool:
    """True only when compute actually lands on TPU: default_backend says
    tpu AND no CPU default-device pin is active (dryrun_multichip and the
    CPU-mesh tests pin jax_default_device to CPU on TPU-capable hosts —
    a Pallas TPU kernel must not be traced into those programs)."""
    try:
        if jax.default_backend() != "tpu":
            return False
        dd = jax.config.jax_default_device
        return dd is None or getattr(dd, "platform", "tpu") == "tpu"
    except Exception:
        return False
