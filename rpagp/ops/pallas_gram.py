"""Pallas TPU kernel: fused randomly-projected additive Gram x vector.

The dense-path hot op (SURVEY.md §3.2 hot loop (2), BASELINE config 3):
    out = K V,   K[i, l] = sum_j w_j * k1d(z1[i, j] - z2[l, j])
computed tile-by-tile entirely in VMEM. The XLA fallback (ops.kernels.mvm)
must materialize (J, block, m) kernel slabs in HBM — ~J x the Gram in
traffic; this kernel keeps the (TILE_I, TILE_L) additive Gram tile
resident in VMEM while all J components accumulate into it (VPU), then
contracts with the V tile on the MXU. HBM traffic drops to the z tiles +
V + out: O(n (J + t)) instead of O(J n m).

Grid: (n/TILE_I, m/TILE_L), l innermost; the output tile revisits across
l so the contraction accumulates in place (standard Pallas reduction
pattern). All shapes padded to tile multiples by the host wrapper; pad
columns carry weight-0 via V-padding and pad rows are sliced off.

Supports the uniform degree-1 projection kernel (the RPA-GP hot case)
with any stationary 1-D base (rbf / matern12/32/52).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.23606797749979

TILE_I = 256
TILE_L = 512


def _k1d_tile(base: str, diff, bf16_exp: bool = False):
    """Stationary 1-D kernel on a (TI, TL) difference tile — VPU math.

    bf16_exp: evaluate the transcendental in bfloat16 (2 elems/lane on
    the VPU) with f32 everywhere else. Absolute kernel-value error is
    bounded by ~2e-3 (worst at s ~ 2 where |d exp(-s/2)/ds|*s*eps_bf16
    peaks) — an O(1e-3) consistent perturbation of K, measured against
    CG/MLL in scripts/bench_gram.py before it is ever the default."""
    if base == "rbf":
        s = -0.5 * diff * diff
        if bf16_exp:
            return jnp.exp(s.astype(jnp.bfloat16)).astype(jnp.float32)
        return jnp.exp(s)

    def _exp(v):
        if bf16_exp:
            return jnp.exp(v.astype(jnp.bfloat16)).astype(jnp.float32)
        return jnp.exp(v)

    a = jnp.abs(diff)
    if base == "matern12":
        return _exp(-a)
    if base == "matern32":
        s = _SQRT3 * a
        return (1.0 + s) * _exp(-s)
    if base == "matern52":
        s = _SQRT5 * a
        return (1.0 + s + s * s / 3.0) * _exp(-s)
    raise ValueError(base)


def _k1d_grad_tile(base: str, diff):
    """d k1d(d) / d d on a difference tile (signed derivative)."""
    if base == "rbf":
        return -diff * jnp.exp(-0.5 * diff * diff)
    a = jnp.abs(diff)
    sgn = jnp.sign(diff)
    if base == "matern12":
        return -sgn * jnp.exp(-a)
    if base == "matern32":
        s = _SQRT3 * a
        return -sgn * _SQRT3 * s * jnp.exp(-s)
    if base == "matern52":
        s = _SQRT5 * a
        return -sgn * _SQRT5 * (s + s * s) / 3.0 * jnp.exp(-s)
    raise ValueError(base)


def _gram_mvm_kernel(base: str, J: int, prec, bf16_exp: bool,
                     z1_ref, z2_ref, w_ref, v_ref, out_ref, ksum_ref):
    """One (i, l) tile: build the additive Gram tile in VMEM, contract."""
    l = pl.program_id(1)

    ksum_ref[:] = jnp.zeros_like(ksum_ref)
    for j in range(J):  # static unroll: J ~ 10-20 components
        d = z1_ref[:, j][:, None] - z2_ref[:, j][None, :]  # (TI, TL)
        ksum_ref[:] += w_ref[0, j] * _k1d_tile(base, d, bf16_exp)

    contrib = jnp.dot(
        ksum_ref[:], v_ref[:], preferred_element_type=jnp.float32,
        precision=prec,
    )  # (TI, T) — MXU; HIGH (bf16x3, ~1.5e-5) is enough for CG, the
    # platform DEFAULT single-bf16 pass (~2e-3) is not

    @pl.when(l == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(l > 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def _pad(a, mult, axis):
    p = (-a.shape[axis]) % mult
    if p == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, p)
    return jnp.pad(a, widths)


_PRECS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


@functools.partial(jax.jit,
                   static_argnames=("base", "interpret", "prec", "bf16_exp"))
def _gram_mvm_fwd_call(z1, z2, w, V, base: str, interpret: bool,
                       prec: str = "highest", bf16_exp: bool = False):
    """out = K V (forward Pallas call; padding handled here)."""
    n, J = z1.shape
    m, t = V.shape[0], V.shape[1]

    z1p = _pad(z1, TILE_I, 0)
    z2p = _pad(z2, TILE_L, 0)
    Vp = _pad(_pad(V, TILE_L, 0), 128, 1)  # lane-pad t for clean MXU tiles
    np_, mp_, tp_ = z1p.shape[0], z2p.shape[0], Vp.shape[1]
    # pad rows of z2 produce garbage kernel values but multiply V's zero
    # pad rows — contributions vanish exactly.

    grid = (np_ // TILE_I, mp_ // TILE_L)
    kernel = functools.partial(_gram_mvm_kernel, base, J, _PRECS[prec],
                               bf16_exp)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_I, J), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_L, J), lambda i, l: (l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_L, tp_), lambda i, l: (l, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_I, tp_), lambda i, l: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, tp_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_I, TILE_L), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * mp_ * (J + tp_),
            bytes_accessed=4 * (np_ * J + mp_ * J + mp_ * tp_ + np_ * tp_),
            transcendentals=np_ * mp_ * J,
        ),
        interpret=interpret,
    )(z1p, z2p, w.reshape(1, J), Vp)
    return out[:n, :t]


def _gram_mvm_bwd_kernel(base: str, J: int,
                         z1_ref, z2_ref, w_ref, v_ref, g_ref,
                         dz_ref, dw_ref, gmat_ref):
    """One (i, l) tile of the backward pass.

    Gm = Ĝ V^T on the tile (MXU), then per component j:
      dw_j  += sum(Gm * k_j(d))           (accumulated over the grid)
      dz1_j += w_j * rowsum(Gm * k'_j(d)) (accumulated over l)
    with d = z1_i - z2_l. The same kernel yields dz2 when called with
    both the coordinate sides (z1<->z2) AND the value sides (V<->Ĝ)
    swapped: Gm transposes and k' is odd (k even), so the swapped
    rowsum equals -w_j sum_i Gm_il k'_j(d_il) = dz2 exactly.
    """
    i = pl.program_id(0)
    l = pl.program_id(1)

    gmat_ref[:] = jnp.dot(
        g_ref[:], v_ref[:].T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TI, TL)

    # build whole (TI, J) / (1, J) tiles in registers, then one vector
    # store each — Mosaic cannot store scalars/columns into VMEM refs
    G = gmat_ref[:]
    dz_cols = []
    dw_vals = []
    for j in range(J):
        d = z1_ref[:, j][:, None] - z2_ref[:, j][None, :]  # (TI, TL)
        dw_vals.append(jnp.sum(G * _k1d_tile(base, d), keepdims=True))
        dz_cols.append(
            w_ref[0, j] * jnp.sum(G * _k1d_grad_tile(base, d), axis=1,
                                  keepdims=True)
        )
    dz_tile = jnp.concatenate(dz_cols, axis=1)  # (TI, J)
    dw_tile = jnp.concatenate(dw_vals).reshape(1, J)  # (1, J)

    @pl.when(l == 0)
    def _():
        dz_ref[:] = dz_tile

    @pl.when(l > 0)
    def _():
        dz_ref[:] = dz_ref[:] + dz_tile

    @pl.when(jnp.logical_and(i == 0, l == 0))
    def _():
        dw_ref[:] = dw_tile

    @pl.when(jnp.logical_or(i > 0, l > 0))
    def _():
        dw_ref[:] = dw_ref[:] + dw_tile


@functools.partial(jax.jit, static_argnames=("base", "interpret"))
def _gram_mvm_bwd_call(z1, z2, w, V, G_bar, base: str, interpret: bool):
    """(dz1, dw) for out = K V given cotangent G_bar (see kernel doc)."""
    n, J = z1.shape
    z1p = _pad(z1, TILE_I, 0)
    z2p = _pad(z2, TILE_L, 0)
    Vp = _pad(_pad(V, TILE_L, 0), 128, 1)
    Gp = _pad(_pad(G_bar, TILE_I, 0), 128, 1)
    np_, mp_, tp_ = z1p.shape[0], z2p.shape[0], Vp.shape[1]

    grid = (np_ // TILE_I, mp_ // TILE_L)
    kernel = functools.partial(_gram_mvm_bwd_kernel, base, J)

    dz, dw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_I, J), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_L, J), lambda i, l: (l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_L, tp_), lambda i, l: (l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_I, tp_), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_I, J), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_, J), jnp.float32),
            jax.ShapeDtypeStruct((1, J), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((TILE_I, TILE_L), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * mp_ * (2 * J + tp_),
            bytes_accessed=4 * (np_ * J + mp_ * J + mp_ * tp_ + np_ * tp_),
            transcendentals=2 * np_ * mp_ * J,
        ),
        interpret=interpret,
    )(z1p, z2p, w.reshape(1, J), Vp, Gp)
    return dz[:n], dw[0]


@functools.lru_cache(maxsize=None)
def _make_pgm(base: str, interpret: bool, prec: str, bf16_exp: bool):
    """custom_vjp'd projected Gram MVM for a given static config."""

    @jax.custom_vjp
    def pgm(z1, z2, w, V):
        return _gram_mvm_fwd_call(z1, z2, w, V, base, interpret,
                                  prec=prec, bf16_exp=bf16_exp)

    def fwd(z1, z2, w, V):
        return pgm(z1, z2, w, V), (z1, z2, w, V)

    def bwd(res, G_bar):
        z1, z2, w, V = res
        # dV = K^T G_bar — the same fused forward kernel, sides swapped
        dV = _gram_mvm_fwd_call(z2, z1, w, G_bar, base, interpret,
                                prec=prec, bf16_exp=bf16_exp)
        dz1, dw = _gram_mvm_bwd_call(z1, z2, w, V, G_bar, base, interpret)
        # dz2: swap coordinates AND values (see kernel doc); its dw output
        # equals the first pass's (k is even) and is discarded
        dz2, _ = _gram_mvm_bwd_call(z2, z1, w, G_bar, V, base, interpret)
        return dz1, dz2, dw, dV

    pgm.defvjp(fwd, bwd)
    return pgm


def projected_gram_mvm(z1, z2, w, V, base: str = "rbf",
                       interpret: bool = False, prec: str = "highest",
                       bf16_exp: bool = False):
    """out = K V for the degree-1 additive projected kernel, with a full
    Pallas backward (dz1, dz2, dw, dV) — usable in differentiated code.

    z1: (n, J) lengthscale-scaled projected rows; z2: (m, J) columns;
    w: (J,) component weights (outputscale/J folded in); V: (m, t).
    prec: MXU precision for the Gram-V contraction ("highest" = bf16x6,
    "high" = bf16x3). bf16_exp: bf16 transcendentals (see _k1d_tile);
    the backward's dz/dw kernels stay exact-f32 either way (an O(1e-3)
    gradient inconsistency, far under the probe estimator's ~2% noise).
    """
    return _make_pgm(base, bool(interpret), prec, bool(bf16_exp))(
        z1, z2, w, V)


def supports(spec) -> bool:
    """Pallas dense-Gram path: uniform degree-1 projection kernels, and
    OPT-IN ONLY (env RPAGP_PALLAS_GRAM=1).

    Default-off decision (round 2, measured on v5e — scripts/bench_gram.py,
    docs/BENCHMARKS.md "Pallas vs XLA"): at the config-3 shape the XLA
    blocked MVM wins (8.6 ms) over every Pallas variant — HIGHEST 10.6,
    DEFAULT-precision 9.6 (error 6e-3: the regime round 1 measured CG
    stalling in), bf16-transcendental 11.3 (SLOWER: the VPU evaluates
    exp in f32 regardless, the casts are pure overhead). Both paths are
    exp-throughput-bound, so there is no headroom for the fused tile
    kernel to claw back. Kept as a tested vehicle for future kernel
    experiments, not a production default."""
    return (
        spec.is_projection
        and len(set(spec.bases)) == 1
        and all(d == 1 for d in spec.degrees)
        and spec.sub_dim == 1
        and not spec.ski
        and os.environ.get("RPAGP_PALLAS_GRAM", "0") == "1"
        and os.environ.get("RPAGP_NO_PALLAS", "0") != "1"
    )


def on_tpu() -> bool:
    """True when computations default to a non-CPU device. Honors
    jax_default_device (tests pin CPU execution while a TPU plugin still
    tops jax.devices())."""
    try:
        dev = jax.config.jax_default_device
        if dev is None:
            dev = jax.devices()[0]
        plat = getattr(dev, "platform", str(dev))
    except Exception:
        return False
    return plat not in ("cpu", "cpu:0")
