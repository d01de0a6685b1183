"""Exact grid-space (Woodbury) solver for the SKI path: no CG, no SLQ.

The SKI approximation makes the kernel matrix DEGENERATE: with fixed
interpolation matrices W_j (hyperparameter-free geometry, ops/ski.py)

    A  =  noise I_n  +  sum_j scale_j W_j T_j W_j^T
       =  noise I_n  +  V V^T,        V = [sqrt(scale_j) W_j L_j]_j ,

where L_j = chol(T_j + eps I) and V is n x p with p = J*m.  At flagship
scale p = 20*256 = 5120 << n = 1.8M, so Woodbury + the matrix
determinant lemma give the EXACT marginal log-likelihood of the SKI
model in O(p^3 + n p / m) per step instead of O(cg_iters * n m J):

    C            = noise I_p + V^T V = noise I_p + G^T S G
    logdet A     = (n - p) log noise + logdet C
    y^T A^-1 y   = y^T r / noise,   r = y - V C^-1 V^T y

with S = U^T U the (p, p) cross-interpolation Gram of the STACKED
interpolation matrices U = [W_1 .. W_J] and G = blockdiag(sqrt(scale_j)
L_j).  S depends only on the dataset geometry — it is precomputed once
per dataset (`build_interp_gram`, cached as buffers["ski_uu"]) — and
only the (J, m, m) Toeplitz blocks re-factor per training step.

The n-space residual form of the inv-quad (r = y - Vw) avoids the
catastrophic n-scale cancellation of the textbook y^Ty - b^T C^-1 b
expression: the cancellation happens per-element at O(1) magnitudes.

Gradients are PLAIN AUTODIFF — every operation (batched Cholesky of the
Toeplitz blocks, the p x p Cholesky, triangular solves, the interp
adjoint pair) has an exact, stable VJP.  Measured against the dense SKI
oracle the gradient relative error is ~1e-5, vs ~1e-2 for the CG+SLQ
probe estimator at tight knobs (see tests/test_grid_solve.py) — the
grid solver is both faster and three orders of magnitude more accurate.

eps (ModelSpec.grid_jitter, default 1e-6): chol needs T_j + eps I
because the RBF grid Toeplitz spectrum decays below f32. The bias is
O(eps): equivalent to using base kernel k(z) + eps*delta(z), far below
the SKI interpolation error itself.

Reference analog: none — the reference (and GPyTorch) run BBMM CG on
the SKI operator ([G] gpytorch/functions/_inv_quad_log_det.py,
SURVEY.md §3.2). The exact grid-space factorization is a TPU-first
design choice: it converts the whole MLL into a handful of p-sized MXU
matmuls and Choleskys, which is exactly the shape XLA:TPU is best at.
The BBMM path remains (ModelSpec.solver = "bbmm") for p ~ n regimes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..models import exact_gp
from ..models.exact_gp import ModelSpec
from ..ops import kernels, pallas_chol, ski, ski_product
from ..ops.block_chol import (blocked_cholesky, blocked_cholesky_safe,
                              blocked_solve_triangular)
from ..ops.exact import LOG_2PI
from ..ops.kernels import _component_scales

_HI = jax.lax.Precision.HIGHEST

# absolute cap on p = J*m for auto-dispatch: the p-space factor work
# (p x p Cholesky + its VJP + the G^T S G einsums) stops paying off past
# this. Re-measured r3 WITH the blocked factor (scripts/bench_crossover.py,
# one v5e core, n=45k, full value+grad step, amortized sync;
# docs/BENCHMARKS.md "grid vs BBMM crossover, r3"):
#   p= 5120: grid  41 ms vs bbmm(cg=60)  55 ms  -> grid
#   p= 8192: grid  96 ms vs bbmm         70 ms  -> bbmm
#   p=10240: grid 156 ms vs bbmm         83 ms  (was 8.5 s pre-blocked)
#   p=16384: grid 602 ms vs bbmm        123 ms
# The step-time crossover still sits between 5120 and 8192, so the cap
# stands. solver="grid" still forces past it (the grid step stays exact
# and deterministic — at p=10240 that now costs only ~1.9x BBMM's step,
# not 5.7x, so forcing is a reasonable accuracy choice).
_P_MAX = 6144


def use_grid_solver(spec: ModelSpec, n: int) -> bool:
    """Trace-time policy: does this spec/size run the exact grid solver?

    "grid" forces it; "auto" uses it for SKI specs whenever the grid
    rank p = J*m (J*m^F for product components) is well below n (the
    Woodbury regime); "bbmm" keeps the reference-style CG+SLQ path.
    Product (degree*sub_dim > 1) SKI specs ALWAYS use the grid solver:
    the BBMM path has no product wiring (the reference rejects the
    combination outright — SKI there is degree-1 only)."""
    if not spec.kernel.ski:
        return False
    if ski_product.is_product(spec.kernel):
        if spec.solver == "bbmm":
            raise ValueError(
                "solver='bbmm' does not support product (degree*sub_dim"
                " > 1) SKI kernels; use solver='grid'/'auto'")
        # Product specs have NO fallback solver, so the degree-1 policy
        # (silently route p > _P_MAX to BBMM) is unavailable — but a
        # plausible spec (d=2, m=128, J=10 -> p = J*m^F = 163,840) would
        # otherwise attempt a replicated p x p Cholesky (~107 GB of
        # factor work). Auto-dispatch refuses past the same budget the
        # degree-1 path uses; solver="grid" still forces, with a warning
        # (the grid step stays exact, just expensive).
        p = ski_product.grid_rank(spec.kernel)
        if p > _P_MAX:
            if spec.solver == "grid":
                import warnings

                warnings.warn(
                    f"product-SKI grid rank p = J*m^F = {p} exceeds the "
                    f"auto-dispatch budget ({_P_MAX}); solver='grid' "
                    f"forces an O(p^3) replicated factor "
                    f"(~{8 * p * p / 2**30:.1f} GiB for the p x p "
                    "Cholesky alone)", stacklevel=2)
            else:
                raise ValueError(
                    f"product-SKI grid rank p = J*m^F = {p} exceeds the "
                    f"grid solver budget ({_P_MAX}) and the BBMM path "
                    "has no product wiring — reduce grid_size (p scales "
                    "as m^F) or J, or force solver='grid' to accept the "
                    "O(p^3) replicated factor")
        return True
    if spec.solver == "bbmm":
        return False
    p = spec.kernel.J * spec.kernel.grid_size
    if spec.solver == "grid":
        return True
    return p <= min(n // 2, _P_MAX)


def _interp_T(kspec, state, V):
    """Grid-space interp transpose dispatch: (n, t) -> (J, t, M)."""
    if ski_product.is_product(kspec):
        return ski_product.interp_transpose(kspec, state, V)
    return ski.dense_interp_transpose(state, V)


def _interp_A(kspec, state, G):
    """Grid-space interp apply dispatch: (J, t, M) -> (n, t)."""
    if ski_product.is_product(kspec):
        return ski_product.interp_apply_sum(kspec, state, G)
    return ski.dense_interp_apply_sum(state, G)


def _build_geometry(kspec, kp, kb, x, grid_size, z_bounds=None):
    """build_ski / build_ski_factors dispatch (dense plan)."""
    if ski_product.is_product(kspec):
        return ski.build_ski_factors(kspec, kp, kb, x, grid_size,
                                     z_bounds=z_bounds)
    return ski.build_ski(kspec, kp, kb, x, grid_size, z_bounds=z_bounds)


def _build_gram(kspec, state):
    """interp-Gram dispatch: S = U^T U, (J, M, J, M)."""
    if ski_product.is_product(kspec):
        return ski_product.build_interp_gram(kspec, state)
    return build_interp_gram(state)


def build_interp_gram(state: ski.SKIState, block: int = 8192):
    """S = U^T U for the stacked dense-plan interpolation matrices —
    (J, m, J, m), f32, HIGHEST precision.

    Hyperparameter-free (depends only on the SKI geometry): built once
    per dataset alongside the geometry, cached as buffers["ski_uu"].
    Blockwise over n so the (J, bn, m) W slabs never exceed a few MB.
    """
    J, n = state.tfrac.shape
    m = state.m
    bn = min(block, max(8, n))
    nb = -(-n // bn)
    pad = nb * bn - n
    tf = state.tfrac
    if pad:
        # tfrac -100 => all cubic weights exactly 0 => zero rows
        tf = jnp.pad(tf, ((0, 0), (0, pad)), constant_values=-100.0)
    tfb = tf.reshape(J, nb, bn).transpose(1, 0, 2)  # (nb, J, bn)
    cells = state.cells

    def body(S, tf_i):
        W = ski._cubic_kernel(tf_i[:, :, None] - cells)  # (J, bn, m)
        Wf = W.transpose(0, 2, 1).reshape(J * m, bn)
        S = S + jnp.matmul(Wf, Wf.T, precision=_HI,
                           preferred_element_type=jnp.float32)
        return S, None

    S, _ = jax.lax.scan(body, jnp.zeros((J * m, J * m), jnp.float32), tfb)
    return S.reshape(J, m, J, m)


def build_interp_y(kspec, state: ski.SKIState, y):
    """(uy, u1) = (U^T y, U^T 1), each (J, M) — hyperparameter-free.

    U (the stacked interpolation matrices) depends only on the dataset
    geometry, so U^T y is a per-dataset constant: caching it (buffers
    "ski_uy"/"ski_u1") removes one n-sized interp pass from the MLL
    forward AND its adjoint from the backward — the remaining
    n-proportional work per step is exactly one interp_apply (forward)
    and one interp_transpose (its VJP). U^T yc then assembles in grid
    space as uy - mean_const * u1 (interp is linear; identical to
    interp_T(y - mu) up to one f32 rounding).

    The cache is keyed to the TRAINING y: grid_mll called with a
    different y than prepare_buffers saw would silently use the wrong
    data. The training paths (train.py, runner, bench) always evaluate
    the MLL on the prepared split, which is the only meaningful use of
    a marginal likelihood."""
    ones = jnp.ones_like(y)
    uy = _interp_T(kspec, state, y[:, None])[:, 0, :]
    u1 = _interp_T(kspec, state, ones[:, None])[:, 0, :]
    return uy, u1


def _cached_U(spec: ModelSpec, params, buffers):
    """U^T yc from the per-dataset cache, or None when not cached."""
    uy = buffers.get("ski_uy")
    if uy is None:
        return None
    if spec.mean == "constant":
        return uy - params["mean_const"] * buffers["ski_u1"]
    return uy


def _anchor_q0(S4, uy):
    """Ridge-LS anchor: (S + delta I) q0 = U^T y, (J, M). A healthy
    ridge (the anchor need not be the exact LS solution) errs on the
    well-conditioned side; q0 = 0 (exactly the un-anchored linear form)
    if the factor still fails."""
    J, M = uy.shape
    p = J * M
    S = S4.reshape(p, p)
    S = 0.5 * (S + S.T)
    delta = 1e-3 * (jnp.trace(S) / p) + 1e-12
    Ls, ok = blocked_cholesky_safe(S + delta * jnp.eye(p, dtype=S.dtype))
    q0 = jax.scipy.linalg.cho_solve((Ls, True), uy.reshape(p))
    return jnp.where(ok, q0, 0.0).reshape(J, M)


def build_value_cache(kspec, state, S4, y, uy):
    """Per-dataset anchor for the ZERO-n-pass MLL value (r3d).

    The r2k step's one remaining n-proportional op was the stable
    inv-quad VALUE's residual pass yc^T (yc - V Gw) (~14 ms of the 43 ms
    headline, BENCHMARKS r3c). This cache removes it: anchor the value
    to a fixed grid vector q0 and the EXACT identity

      yc^T yc - <U^T yc, Gw>
        = a0 - mu (a1 + sy) + mu^2 n + <uy - mu u1, q0 - Gw>

    holds for ANY q0 (yc = y - mu 1; a0 = y^T r, a1 = sum r, r = y - V q0,
    sy = sum y — all cached scalars from ONE prepare-time n-pass). q0
    only controls STABILITY: the cancellation-prone inner product now
    rides q0 - Gw, which is small exactly in the near-interpolation
    regime where the textbook yc^T yc - b^T C^-1 b form cancels at O(n)
    magnitudes (module docstring). q0 is the ridge-LS grid projection of
    y — (S + delta I) q0 = U^T y with S the interp Gram — i.e. the
    noise->0 limit Gw approaches, so the anchor is tight precisely where
    it must be.

    Returns {"q0", "a0", "a1", "sy", "yy"}; hyperparameter-free, keyed
    to the TRAINING y like the uy cache (build_interp_y docstring)."""
    q0 = _anchor_q0(S4, uy)
    Vq0 = _interp_A(kspec, state, q0[:, None, :])[:, 0]  # (n,) one n-pass
    r = y - Vq0
    return {
        "q0": q0,
        "a0": jnp.vdot(y, r),
        "a1": jnp.sum(r),
        "sy": jnp.sum(y),
        "yy": jnp.vdot(y, y),
    }


def _anchored_iq(spec: ModelSpec, params, vc, U, Gw, n):
    """Inv-quad numerator from the value cache: STABLE value and
    grid-space gradient, zero n-proportional work (see
    build_value_cache). Same straight-through structure as _resid_iq:
    value = anchored form, gradient = d(linear form) — the two agree
    exactly in exact arithmetic, so the surrogate gradient is exact."""
    sg = jax.lax.stop_gradient
    mu = (params["mean_const"] if spec.mean == "constant"
          else jnp.zeros((), Gw.dtype))
    lin = (vc["yy"] - 2.0 * mu * vc["sy"] + mu * mu * n) - jnp.vdot(U, Gw)
    val = (vc["a0"] - mu * (vc["a1"] + vc["sy"]) + mu * mu * n
           + jnp.vdot(sg(U), sg(vc["q0"] - Gw)))
    return lin + sg(val - lin)


def _toeplitz_blocks(kspec, kparams, state: ski.SKIState):
    """(J, m, m) full Toeplitz blocks from the first columns."""
    col = ski.toeplitz_columns(kspec, kparams, state)  # (J, m)
    m = state.m
    idx = jnp.abs(jnp.arange(m)[:, None] - jnp.arange(m)[None, :])
    return col[:, idx]


# jitter-ladder multipliers probed by _chol_ladder (x sqrt(10) steps):
# the RBF grid Toeplitz's conditioning worsens as lengthscale/spacing
# grows during training, so the minimal safe jitter is data- and
# step-dependent — measured 3e-5 (relative) at init lengthscale and
# 1e-4 after +2 raw-lengthscale drift at flagship m=256
_LADDER = (1.0, 3.162278, 10.0, 31.62278, 100.0, 1000.0)


def _resolve_ladder_fast() -> str:
    """Mode of the ladder's factor-first fast path: "" (off — the XLA
    probe ladder runs unconditionally), "pallas" (compiled batched
    leaf), or "interpret" (CPU integration testing).

    RPAGP_PALLAS_LADDER: "auto" (default — fast path on a real TPU
    backend only; on CPU the XLA ladder is both correct and faster than
    an interpreted kernel), "1" force, "interpret" force-interpreted,
    "0"/"off" disable."""
    env = os.environ.get("RPAGP_PALLAS_LADDER", "auto")
    if env.lower() in ("0", "off", "false", "no"):
        return ""
    if env == "interpret":
        return "interpret"
    if env == "1":
        return "pallas"
    from .pallas_interp import on_tpu

    return "pallas" if on_tpu() else ""


def _chol_ladder_xla(T, eps0, eye):
    """The probe ladder: per-block minimal-jitter choice via a
    lax.while_loop of stop-gradient XLA chols (ONE chol lowering, early
    exit at the first level where every block factors — a python ladder
    compiled 6 separate chols and near-tripled the flagship compile
    time), then one differentiable chol at the chosen levels.

    The probe runs entirely on stop_gradient values: which jitter level
    to use is a DISCRETE algorithmic choice (no gradient), and the
    final differentiable chol is finite by construction (same values,
    same algorithm as the probe level that passed). This avoids the
    0 * NaN cotangent poisoning a where() over failed chols would cause
    — with the NaN-propagating XLA chol, a "factor first, cond on
    failure" fast path is impossible: a differentiable chol computed
    OUTSIDE the cond has a NaN primal when escalation engages, and even
    the zero cotangent of the untaken branch turns into NaN gradients
    through it (measured: tests/test_grid_solve.py
    flagship-conditioning test)."""
    Ts = jax.lax.stop_gradient(T)
    mults = jnp.asarray(_LADDER, T.dtype)
    nlev = len(_LADDER)

    def probe_chol(Te):
        L = jnp.linalg.cholesky(Te)
        return jnp.all(jnp.isfinite(L), axis=(-2, -1))

    def cond(c):
        k, chosen, done = c
        return (k < nlev) & ~jnp.all(done)

    def body(c):
        k, chosen, done = c
        e = eps0 * mults[k]
        ok = probe_chol(Ts + e[..., None, None] * eye)
        chosen = jnp.where(ok & ~done, e, chosen)
        return k + 1, chosen, done | ok

    init = (jnp.asarray(0), eps0 * mults[-1],
            jnp.zeros(T.shape[0], bool))
    _, chosen, _ = jax.lax.while_loop(cond, body, init)
    return jnp.linalg.cholesky(T + chosen[..., None, None] * eye), chosen


def _chol_ladder(T, eps0):
    """Per-block minimal-jitter batched Cholesky of T + eps I.

    FAST PATH (on-TPU default): ONE differentiable
    `pallas_chol.chol_linv_batched` call at the base jitter. Its
    finite-primal failure contract (per-block ok flags, garbage-but-
    finite factors) is exactly what makes factor-first sound here —
    when any block fails, lax.cond discards L0 (a zero cotangent times
    FINITE primals stays zero, the blocked_cholesky_safe argument) and
    the XLA probe ladder takes over. This halves the common-path factor
    count (the r4b two-call pallas ladder LOST its A/B precisely
    because it still probed-then-factored: two kernel dispatches per
    step) and swaps the batched-trsm chol VJP for chol_linv's GEMM-only
    closed form. The fast path's level choice is eps0 itself — the same
    level-0 choice the probe ladder makes whenever it succeeds, so
    engaged-fallback telemetry (`factor_diagnostics`) reads identically.

    eps0: (J,) absolute base jitters (relative jitter x block diagonal).
    Returns (L, eps_used)."""
    m = T.shape[-1]
    eye = jnp.eye(m, dtype=T.dtype)
    eps0 = jax.lax.stop_gradient(eps0)
    fast = _resolve_ladder_fast() if pallas_chol.batch_supported(m) else ""
    if not fast:
        return _chol_ladder_xla(T, eps0, eye)

    # fused variant: every block's elimination advances in one row loop
    # (one/few kernel programs) instead of J sequential grid programs —
    # the A/B winner at the flagship ladder shape (BENCHMARKS r4f).
    # RPAGP_LADDER_FUSED=0 falls back to the vmap form.
    use_fused = (pallas_chol.fused_supported(T.shape[0], m)
                 and os.environ.get("RPAGP_LADDER_FUSED", "1")
                 not in ("0", "off"))
    batched = (pallas_chol.chol_linv_batched_fused if use_fused
               else pallas_chol.chol_linv_batched)
    L0, _, okf = batched(
        T + eps0[..., None, None] * eye, fast == "interpret")

    def use_fast(_):
        return L0, eps0

    def escalate(_):
        # full XLA ladder from level 0: the XLA NaN criterion and the
        # pallas pivot flag can disagree near the edge, so the slow
        # branch re-chooses its own minimal level with its own factor
        return _chol_ladder_xla(T, eps0, eye)

    return jax.lax.cond(jnp.all(okf > 0.5), use_fast, escalate, None)


# C-chol fallback jitter, in units of NOISE (lambda_min(C) = noise
# exactly in real arithmetic; f32 rounding in the G^T S G einsums can
# push the computed C indefinite when |Sg|/noise ~ 1/sqrt(eps_f32) —
# measured at HouseElectric scale, |Sg| ~ 6e3 vs noise 0.22, where the
# un-jittered p x p chol went NaN at training iter 15). Level 0 is
# exact; escalation biases the solver by O(level) relative noise
# inflation in the grid column space — bounded best-effort, same stance
# as best-iterate CG (docs/BENCHMARKS.md r2f).
_C_LEVELS = (0.0, 1e-3, 3e-3, 1e-2, 3e-2, 1e-1, 3e-1)


def _chol_with_fallback(C, noise):
    """Minimal-jitter chol(C + c*noise I), c from _C_LEVELS."""
    return _chol_with_fallback_eps(C, noise)[0]


def _chol_with_fallback_eps(C, noise):
    """Minimal-jitter chol(C + c*noise I), c from _C_LEVELS; returns
    (L, eps_chosen) — eps_chosen/noise is the engaged ladder level
    (0.0 = exact), surfaced by `factor_diagnostics`.

    FAST PATH: factor C directly (level 0 = exact) with the MXU-blocked
    Cholesky (ops/block_chol.py — XLA's native p x p chol + its
    trsm-pair VJP were ~85% of the flagship step, BENCHMARKS.md r2h).
    The fast factor uses blocked_cholesky_SAFE: its primals stay finite
    even when C is indefinite (failure comes back as the ok flag), so
    the zero cotangent it receives when `lax.cond` picks the escalation
    branch stays zero instead of 0 * NaN-poisoning the gradient. In the
    common case — every step until extreme hyperparameter drift — the
    step pays exactly ONE p x p factorization.

    Escalation keeps the stop-gradient probe pattern of _chol_ladder
    (the level choice is a discrete algorithmic decision; one lowering
    via lax.while_loop), and probes with the SAME blocked algorithm
    that produces the final factor, so "probe passed" implies the final
    differentiable factor is finite (clean VJP)."""
    p = C.shape[-1]
    eye = jnp.eye(p, dtype=C.dtype)
    Cs = jax.lax.stop_gradient(C)
    ns = jax.lax.stop_gradient(noise)
    levels = jnp.asarray(_C_LEVELS, C.dtype)
    nlev = len(_C_LEVELS)

    L0, ok0 = blocked_cholesky_safe(C)

    def ladder(_):
        def cond(c):
            k, chosen, done = c
            return (k < nlev) & ~done

        def body(c):
            k, chosen, done = c
            e = ns * levels[k]
            L = blocked_cholesky(Cs + e * eye)
            ok = jnp.all(jnp.isfinite(L))
            chosen = jnp.where(ok & ~done, e, chosen)
            return k + 1, chosen, done | ok

        # level 0 is exactly the fast path that just failed
        init = (jnp.asarray(1), ns * levels[-1], jnp.asarray(False))
        _, chosen, _ = jax.lax.while_loop(cond, body, init)
        return blocked_cholesky(C + chosen * eye), chosen

    zero = jnp.zeros((), C.dtype)
    return jax.lax.cond(ok0, lambda _: (L0, zero), ladder, None)


def _factor(spec: ModelSpec, kparams, state: ski.SKIState, S4, noise,
            chol_fn=None):
    """(G, Lc): G (J, m, m) = sqrt(scale_j) chol(T_j + eps I); Lc = the
    p x p Cholesky of C = noise I + G^T S G (+ minimal fallback jitter,
    see _chol_with_fallback). chol_fn overrides the p x p factor —
    the distributed grid step passes parallel.dist_chol's banded
    fallback so the O(p^3) work shards over the mesh."""
    G, Lc, _ = _factor_diag(spec, kparams, state, S4, noise,
                            chol_fn=chol_fn)
    return G, Lc


def _grid_chol_G(spec: ModelSpec, kparams, state: ski.SKIState):
    """(G, t_jitter_mult): G (J, M, M) = sqrt(scale_j) chol(T_j + eps).

    Degree-1: T_j is the (m, m) grid Toeplitz, jitter-laddered batched
    chol. Product components: T_j = Kron of the F factor Toeplitzes, so
    chol(Kron) = Kron(chol) — the ladder runs on the SMALL (m, m)
    factors and one einsum assembles the (m^F, m^F) product factor
    (ops/ski_product.py)."""
    kspec = spec.kernel
    if ski_product.is_product(kspec):
        Tf = ski_product.toeplitz_blocks_factors(kspec, kparams, state)
        eps0 = spec.grid_jitter * Tf[:, 0, 0]
        Lf, eps_t = _chol_ladder(Tf, eps0)  # (Jf, m, m)
        F = ski_product.factors_per_component(kspec)
        m = state.m
        Lt = ski_product.kron_fold(Lf.reshape(kspec.J, F, m, m))
    else:
        T = _toeplitz_blocks(kspec, kparams, state)
        # relative jitter: T's diagonal is k(0) per block, and the
        # minimal safe absolute jitter scales with it
        eps0 = spec.grid_jitter * T[:, 0, 0]
        Lt, eps_t = _chol_ladder(T, eps0)
    scales = _component_scales(kspec, kparams, Lt.dtype)  # (J,)
    G = jnp.sqrt(scales)[:, None, None] * Lt  # (J, M, M), lower-tri
    return G, eps_t / jnp.maximum(eps0, 1e-30)


def _factor_diag(spec: ModelSpec, kparams, state: ski.SKIState, S4, noise,
                 chol_fn=None):
    """_factor plus the fallback-engagement diagnostics: which jitters
    the two ladders actually chose (dead-code-eliminated when the
    caller drops them)."""
    G, t_mult = _grid_chol_G(spec, kparams, state)
    J, M = G.shape[0], G.shape[1]
    p = J * M
    # Sg = G^T S G as two J-batched block products (blockdiag structure)
    if os.environ.get("RPAGP_GSG_DOT", "1") == "1":
        # explicit batched-GEMM layout — DEFAULT since the r5c A/B:
        # 33.44 -> 27.70 ms/step interleaved median at the flagship
        # shape (identical values; docs/BENCHMARKS.md r5c). Each
        # contraction is ONE dot_general with a leading batch dim and
        # an MXU-shaped (J*M, M) x (M, M) per batch element, instead of
        # whatever layout XLA picks for the 4-axis einsum
        # (RPAGP_GSG_DOT=0 reverts)
        S_j = S4.transpose(2, 0, 1, 3).reshape(J, J * M, M)  # (j, i*m, n)
        SG_j = jax.lax.dot_general(  # (j, i*m, b)
            S_j, G, (((2,), (1,)), ((0,), (0,))), precision=_HI)
        # (i, m, j*b) view for the left product
        SG_i = SG_j.reshape(J, J, M, M).transpose(1, 2, 0, 3) \
            .reshape(J, M, J * M)
        Sg = jax.lax.dot_general(  # (i, a, j*b): G[i]^T @ SG[i]
            G.transpose(0, 2, 1), SG_i, (((2,), (1,)), ((0,), (0,))),
            precision=_HI).reshape(p, p)
    else:
        SG = jnp.einsum("imjn,jnb->imjb", S4, G, precision=_HI)
        Sg = jnp.einsum("ima,imjb->iajb", G, SG,
                        precision=_HI).reshape(p, p)
    Sg = 0.5 * (Sg + Sg.T)  # rounding hygiene: kill the asymmetric error
    C = Sg + noise * jnp.eye(p, dtype=Sg.dtype)
    Lc, eps_c = (chol_fn or _chol_with_fallback_eps)(C, noise)
    diag = {
        # T-ladder multiplier per block (1.0 = base grid_jitter)
        "t_jitter_mult": t_mult,
        # engaged _C_LEVELS level in units of noise (0.0 = exact)
        "c_jitter_over_noise": eps_c / jnp.maximum(noise, 1e-30),
    }
    return G, Lc, diag


def factor_diagnostics_traced(spec: ModelSpec, params, buffers):
    """Traceable fallback-engagement telemetry: (t_jitter_mult_max,
    c_jitter_over_noise) as scalars — composable into a larger jitted
    program. Eagerly evaluating the p x p factor dispatches hundreds of
    primitives one-by-one over the remote TPU transport (measured
    170 s/split at protein scale, r5b) — callers on a hot path must
    fold THIS into an existing jitted program (the runner rides it on
    the posterior; XLA CSEs / cheaply recomputes the shared factor)."""
    state = buffers["ski_state"]
    S4 = buffers["ski_uu"]
    noise = exact_gp.noise_value(params)
    _, _, diag = _factor_diag(spec, params["kernel"], state, S4, noise)
    return jnp.max(diag["t_jitter_mult"]), diag["c_jitter_over_noise"]


def factor_diagnostics(spec: ModelSpec, params, buffers):
    """Fallback-engagement telemetry at the CURRENT hyperparameters:
    maximal T-ladder multiplier across blocks and the engaged C-chol
    level (units of noise). Escalation is invisible during training
    (the ladders are silent by design — discrete stop-gradient
    choices); the runner surfaces this once per split so long runs
    record whether the solver ever left the exact level. Jitted as one
    program (see factor_diagnostics_traced for the hot-path form)."""
    t_mult_max, c_over = _factor_diagnostics_jit(spec, params, buffers)
    return {
        "t_jitter_mult_max": float(t_mult_max),
        "c_jitter_over_noise": float(c_over),
    }


_factor_diagnostics_jit = jax.jit(factor_diagnostics_traced,
                                  static_argnums=0)


def _G_apply(G, z):
    """blockdiag(G) @ z for z (..., p) -> (J, ..., m) grid layout."""
    J, m, _ = G.shape
    zj = z.reshape(z.shape[:-1] + (J, m))
    return jnp.einsum("jab,...jb->j...a", G, zj, precision=_HI)


def _Gt_apply(G, U):
    """blockdiag(G)^T @ u for U in (J, m) grid layout -> (p,)."""
    return jnp.einsum("jab,ja->jb", G, U, precision=_HI).reshape(-1)


def _resid_iq(kspec, state, yc, U, Gw):
    """Numerator of the inv-quad yc^T A^-1 yc * noise = yc^T (yc - Vw):
    STABLE value, GRID-SPACE gradient.

    The inv-quad numerator is LINEAR in Gw — yc^T V w = <U^T yc, Gw> —
    so the two algebraically identical forms split cleanly by role:

    - VALUE: the n-space residual form vdot(yc, yc - Vw). Near
      interpolation the textbook yc^T yc - b^T C^-1 b form cancels
      coherently at O(n) magnitudes; the residual form cancels
      per-element at O(1) (module docstring). Computed under
      stop_gradient: one interp_apply n-pass, NO adjoint pass.
    - GRADIENT: the grid-space linear form vdot(yc, yc) - vdot(U, Gw).
      Its cotangent into Gw is exactly -U (the cached U^T yc), so the
      backward pays zero n-proportional interp work on the cached
      training path (the r2j U^T y cache already removed the forward
      interp_T pass; this removes the interp_transpose adjoint of the
      value pass — measured 52.3 -> 43 ms/step at n=1.8M, ONE n-pass
      per step remains).

    The straight-through assembly lin + sg(val - lin) also makes the
    noise-quotient derivative in grid_mll use the STABLE primal (the
    quotient rule sees the corrected value), so no gradient path ever
    touches the cancelled textbook value. Exactness of the surrogate
    gradient (both yc- and hyperparameter-sides, cached and uncached U)
    is covered by tests/test_grid_solve.py gradient parity vs the dense
    SKI oracle."""
    sg = jax.lax.stop_gradient
    Vw = _interp_A(kspec, state, sg(Gw)[:, None, :])[:, 0]  # (n,)
    val = jnp.vdot(sg(yc), sg(yc) - Vw)
    lin = jnp.vdot(yc, yc) - jnp.vdot(U, Gw)
    return lin + sg(val - lin)


def grid_mll(spec: ModelSpec, params, buffers, x, y):
    """EXACT marginal log-likelihood of the SKI model (total over n).

    Deterministic — no probe vectors, no CG tolerance; gradients by
    plain autodiff (every piece has an exact VJP)."""
    n = x.shape[0]
    state = buffers["ski_state"]
    S4 = buffers["ski_uu"]
    J, M = S4.shape[0], S4.shape[1]  # M = m (degree-1) or m^F (product)
    p = J * M
    noise = exact_gp.noise_value(params)
    yc = y - exact_gp.mean_fn(spec, params, x)

    G, Lc = _factor(spec, params["kernel"], state, S4, noise)
    # b = V^T yc = G^T U^T yc; U^T yc from the per-dataset cache when
    # prepare_buffers saw y (build_interp_y), else one interp pass
    U = _cached_U(spec, params, buffers)
    if U is None:
        U = _interp_T(spec.kernel, state, yc[:, None])[:, 0, :]  # (J, M)
    b = _Gt_apply(G, U)  # (p,)
    w = jax.scipy.linalg.cho_solve((Lc, True), b)
    Gw = _G_apply(G, w)  # (J, M)
    vc = buffers.get("ski_vc")
    if vc is not None and "ski_uy" in buffers:
        # anchored value cache: the whole step is p-space math, zero
        # n-proportional work (build_value_cache)
        iq = _anchored_iq(spec, params, vc, U, Gw, n) / noise
    else:
        iq = _resid_iq(spec.kernel, state, yc, U, Gw) / noise
    ld = (n - p) * jnp.log(noise) + 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(Lc)))
    return -0.5 * (iq + ld + n * LOG_2PI)


def _posterior_factor(spec: ModelSpec, params, buffers, x_train, y_train,
                      z_bounds):
    """Shared cache for the posterior paths: geometry on the given grid
    bounds, S for that grid, the factor (G, Lc), and the mean-cache
    weights q.

    The explained-variance quadratic form u^T R u with
    R = G (I - noise C^-1) G^T is evaluated in FACTORED form
    (_explained_chunk): |G^T u|^2 - noise |Lc^-1 G^T u|^2. Materializing
    R needed several dense (p, p) buffers (block_diag(G), C^-1 G^T, R
    itself) and OOM'd the 16G HBM at protein scale (p = J*512 = 10240);
    the factored form touches only (p, chunk) buffers, costs the same
    per chunk, and skips the p^3 R build entirely."""
    noise = exact_gp.noise_value(params)
    yc = y_train - exact_gp.mean_fn(spec, params, x_train)
    st_train = _build_geometry(spec.kernel, params["kernel"],
                               buffers["kernel"], x_train,
                               spec.kernel.grid_size, z_bounds=z_bounds)
    S4 = _build_gram(spec.kernel, st_train)
    G, Lc = _factor(spec, params["kernel"], st_train, S4, noise)

    # mean weights in grid space, DIRECT form: mu* = V* C^-1 V^T yc,
    # i.e. q = G C^-1 b. This is algebraically identical to routing
    # through the n-space residual (G^T U^T (yc - V C^-1 V^T yc) =
    # noise C^-1 b, so the 1/noise cancels exactly) but numerically far
    # stabler: the residual route amplifies the f32 yc - Vw cancellation
    # by 1/noise, and a ~1e-4 factor perturbation (e.g. eager-vs-jit
    # fusion differences) swung the protein posterior mean from
    # rmse 0.35 to 2.8. The MLL keeps the residual form for the
    # inv-quad VALUE, where the per-element cancellation argument holds.
    U = _interp_T(spec.kernel, st_train, yc[:, None])[:, 0, :]
    b = _Gt_apply(G, U)
    q = _G_apply(G, jax.scipy.linalg.cho_solve((Lc, True), b))  # (J, M)
    return st_train, q, (G, Lc), noise


def _explained_chunk(factor, noise, Uc):
    """explained_i = u_i^T G (I - noise C^-1) G^T u_i for the dense
    interp rows Uc (c, p) of a test chunk — factored, no (p, p) R."""
    G, Lc = factor
    J, m, _ = G.shape
    c = Uc.shape[0]
    # t = G^T u per block: (c, J, m) x (J, m, m) -> (c, J, m)
    Ub = Uc.reshape(c, J, m)
    t = jnp.einsum("jab,cja->cjb", G, Ub, precision=_HI)
    tp = t.reshape(c, J * m)
    # wide-RHS solve as GEMMs: XLA's trsm ran this chunk at ~1 Tf/s
    s = blocked_solve_triangular(Lc, tp.T)  # (p, c)
    return jnp.sum(tp * tp, axis=1) - noise * jnp.sum(s * s, axis=0)


def _test_interp_rows(state_test: ski.SKIState, chunk_slice, kspec=None):
    """Dense W* rows for a contiguous test chunk: (c, p)."""
    if kspec is not None and ski_product.is_product(kspec):
        return ski_product.test_interp_rows(kspec, state_test, chunk_slice)
    tf = state_test.tfrac[:, chunk_slice]  # (J, c)
    W = ski._cubic_kernel(tf[:, :, None] - state_test.cells)  # (J, c, m)
    J, c, m = W.shape
    return W.transpose(1, 0, 2).reshape(c, J * m)


def grid_posterior(spec: ModelSpec, params, buffers, x_train, y_train,
                   x_test, observation_noise: bool = True,
                   chunk: int = 8192):
    """Posterior predictive (mean, var) — EXACT within the SKI model, no
    CG solves ([G] exact_prediction_strategies.py analog on the grid
    path; variance is PSD by construction: noise * V* C^-1 V*^T).

    The grid is rebuilt over the union of train/test projection bounds
    (same stance as iterative_posterior) and S is rebuilt for it — a
    one-time O(n p) cost per call, amortized by the chunked test loop.
    k** uses the exact kernel diagonal (consistent with the BBMM
    posterior paths): variance = k_exact_diag - explained + noise.
    """
    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    z_tr = ski.project(kspec, kp, kb, x_train)
    z_te = ski.project(kspec, kp, kb, x_test)
    lo = jnp.minimum(jnp.min(z_tr, axis=1), jnp.min(z_te, axis=1))
    hi = jnp.maximum(jnp.max(z_tr, axis=1), jnp.max(z_te, axis=1))
    st_train, q, factor, noise = _posterior_factor(
        spec, params, buffers, x_train, y_train, (lo, hi))
    st_test = _build_geometry(kspec, kp, kb, x_test, kspec.grid_size,
                              z_bounds=(lo, hi))

    n_test = x_test.shape[0]
    mu = _interp_A(kspec, st_test, q[:, None, :])[:, 0]
    mu = mu + exact_gp.mean_fn(spec, params, x_test)

    kd = kernels.gram_diag(kspec, kp, kb, x_test)
    nc = -(-n_test // chunk)
    outs = []
    for ci in range(nc):
        sl = slice(ci * chunk, min((ci + 1) * chunk, n_test))
        Uc = _test_interp_rows(st_test, sl, kspec)  # (c, p)
        outs.append(_explained_chunk(factor, noise, Uc))
    explained = jnp.concatenate(outs) if nc > 1 else outs[0]
    var = jnp.maximum(kd - explained, 1e-10)
    if observation_noise:
        var = var + noise
    return mu, var


def grid_posterior_cov(spec: ModelSpec, params, buffers, x_train,
                       y_train, x_test, observation_noise: bool = False):
    """Posterior (mean, FULL covariance) on the grid path — EXACT within
    the SKI model, same solver family as grid_posterior's mean/variance
    (reference analog: [G] exact_prediction_strategies.py predictive
    covar; r3 verdict weak #3 — posterior_cov previously fell through to
    the LOVE/Lanczos-ESTIMATED covariance for grid-dispatched specs).

    The explained block extends _explained_chunk's factored quadratic
    form off the diagonal: with V* = U* blockdiag(G) (rows tp, (c, p)),

        cov = K** - V* (I - noise C^-1) V*^T
            = K** - (tp tp^T - noise s^T s),   s = Lc^{-1} tp^T,

    touching only (p, c) buffers — no (p, p) R materialization. The
    prior test block K** uses the EXACT kernel Gram (consistent with
    iterative_posterior_cov: at batch sizes where a dense covariance
    makes sense, exactness beats interpolation consistency; the
    diagonal of the result therefore matches grid_posterior's variance
    to rounding). Intended for MODEST test batches — the covariance is
    (n_test, n_test)."""
    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    z_tr = ski.project(kspec, kp, kb, x_train)
    z_te = ski.project(kspec, kp, kb, x_test)
    lo = jnp.minimum(jnp.min(z_tr, axis=1), jnp.min(z_te, axis=1))
    hi = jnp.maximum(jnp.max(z_tr, axis=1), jnp.max(z_te, axis=1))
    st_train, q, factor, noise = _posterior_factor(
        spec, params, buffers, x_train, y_train, (lo, hi))
    st_test = _build_geometry(kspec, kp, kb, x_test, kspec.grid_size,
                              z_bounds=(lo, hi))
    n_test = x_test.shape[0]
    mu = _interp_A(kspec, st_test, q[:, None, :])[:, 0]
    mu = mu + exact_gp.mean_fn(spec, params, x_test)

    G, Lc = factor
    J, m, _ = G.shape
    Uc = _test_interp_rows(st_test, slice(0, n_test), kspec)  # (c, p)
    Ub = Uc.reshape(n_test, J, m)
    tp = jnp.einsum("jab,cja->cjb", G, Ub,
                    precision=_HI).reshape(n_test, J * m)  # V* rows
    s = blocked_solve_triangular(Lc, tp.T)  # (p, c) = Lc^{-1} V*^T
    K_ss = kernels.gram(kspec, kp, kb, x_test, x_test)
    cov = K_ss - (jnp.matmul(tp, tp.T, precision=_HI)
                  - noise * jnp.matmul(s.T, s, precision=_HI))
    cov = 0.5 * (cov + cov.T)
    if observation_noise:
        cov = cov + noise * jnp.eye(n_test, dtype=cov.dtype)
    return mu, cov


def make_grid_predictor(spec: ModelSpec, params, buffers, x_train,
                        y_train, observation_noise: bool = True,
                        grid_margin: float = 0.5):
    """Eval-mode cached predictor on the grid path: factor once on a
    margin-extended train grid, then each test batch costs two interp
    contractions (mean) + one (c, p) matmul (variance). Test points
    projecting beyond the margin get zero taps -> revert to the prior
    mean with conservative variance (same stance as
    iterative.make_predictor)."""
    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    z_tr = ski.project(kspec, kp, kb, x_train)
    lo, hi = jnp.min(z_tr, axis=1), jnp.max(z_tr, axis=1)
    span = hi - lo
    bounds = (lo - grid_margin * span, hi + grid_margin * span)
    st_train, q, factor, noise = _posterior_factor(
        spec, params, buffers, x_train, y_train, bounds)

    def predict(x_test, chunk: int = 8192):
        st_test = _build_geometry(kspec, kp, kb, x_test, kspec.grid_size,
                                  z_bounds=bounds)
        n_test = x_test.shape[0]
        mu = _interp_A(kspec, st_test, q[:, None, :])[:, 0]
        mu = mu + exact_gp.mean_fn(spec, params, x_test)
        kd = kernels.gram_diag(kspec, kp, kb, x_test)
        nc = -(-n_test // chunk)
        outs = []
        for ci in range(nc):
            sl = slice(ci * chunk, min((ci + 1) * chunk, n_test))
            Uc = _test_interp_rows(st_test, sl, kspec)
            outs.append(_explained_chunk(factor, noise, Uc))
        explained = jnp.concatenate(outs) if nc > 1 else outs[0]
        var = jnp.maximum(kd - explained, 1e-10)
        if observation_noise:
            var = var + noise
        return mu, var

    return predict
