"""Exact GP regression model: mean + kernel + Gaussian likelihood.

TPU-native rebuild of the reference's model layer
([U] gp_models/models.py — ExactGPModel(train_x, train_y, likelihood,
kernel) subclassing gpytorch.models.ExactGP; unverified, SURVEY.md §1 L4).
Instead of a stateful nn.Module, the model is a static `ModelSpec` plus a
(params, buffers) pytree pair; every operation is a pure function of them,
so `jax.jit` / `jax.grad` / `shard_map` apply directly.

params:
  mean_const       — constant mean value (GPyTorch ConstantMean default).
  raw_noise        — likelihood noise through softplus + 1e-4 floor
                     (matches [G] gpytorch GaussianLikelihood's
                     GreaterThan(1e-4) constraint).
  kernel: {...}    — see ops.kernels.init_kernel_params.
buffers:
  kernel: {proj}   — fixed random projections (checkpointed with params:
                     they define the model, arXiv:1912.12834).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ops import exact, kernels
from ..ops.kernels import KernelSpec
from ..utils.transforms import softplus

NOISE_FLOOR = 1e-4


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static model configuration (hashable; safe as a jit closure)."""

    kernel: KernelSpec
    mean: str = "constant"  # "constant" | "zero"
    jitter: float = 1e-6
    # exact-vs-iterative dispatch, mirroring GPyTorch's max_cholesky_size
    # ([G] gpytorch/settings.py); the iterative path lands in ops.cg/slq.
    max_cholesky_size: int = 4096
    # iterative-path knobs (BBMM CG + pivoted-Cholesky precond + SLQ logdet)
    # cg_tol is a RELATIVE residual threshold (must be < 1: the relative
    # residual STARTS at 1.0, so tol >= 1 freezes CG at iteration zero)
    cg_tol: float = 1e-2
    cg_max_iters: int = 100
    precond_rank: int = 15
    num_probes: int = 10
    mvm_block_rows: int = 4096
    # LOVE predictive-variance cache rank (0 = off: chunked-CG variances)
    love_rank: int = 0
    # rebuild the pivoted-Cholesky preconditioner every k training steps
    # (1 = every MLL evaluation, GPyTorch behavior; k > 1 = cached in
    # buffers["precond_cache"] and refreshed by the train loop — see
    # refresh_preconditioner; unbiased for any k, only CG convergence
    # quality drifts between refreshes)
    precond_refresh: int = 1
    # large-n SKI solver: "auto" picks the EXACT grid-space Woodbury
    # solver (ops/grid_solve.py — no CG/SLQ, deterministic gradients)
    # whenever p = J*grid_size << n; "grid" forces it; "bbmm" keeps the
    # reference-style CG+SLQ estimator path
    solver: str = "auto"
    # BASE relative jitter for chol(T_j + eps*k(0) I) in the grid
    # solver (the RBF grid Toeplitz spectrum decays below f32). The
    # solver probes a x-sqrt(10) ladder upward from this per block and
    # uses the smallest level that factors (grid_solve._chol_ladder);
    # bias is O(eps_chosen), measured ~3e-5 relative at flagship scale
    grid_jitter: float = 1e-6


def init_model(key, spec: ModelSpec, D: int, dtype=jnp.float32):
    """Build (params, buffers) for a fresh model. Raw params init to 0
    (GPyTorch defaults: lengthscale/outputscale/noise ~ softplus(0))."""
    kp, kb = kernels.init_kernel_params(key, spec.kernel, D, dtype)
    params = {
        "raw_noise": jnp.zeros((), dtype),
        "kernel": kp,
    }
    if spec.mean == "constant":
        params["mean_const"] = jnp.zeros((), dtype)
    buffers = {"kernel": kb}
    return params, buffers


def prepare_buffers(spec: ModelSpec, params, buffers, x_train,
                    y_train=None):
    """Attach per-dataset precomputations to buffers (call once per split,
    before jitting the training step).

    Currently: the SKI interpolation geometry (grid, taps, sort plan) —
    hyperparameter-free, so rebuilding it inside every MLL evaluation
    wastes a (J, n) argsort + weight build per step (SURVEY.md §3.4's
    "construction" work, hoisted out of the hot loop). On the grid-
    solver path, passing y_train additionally caches U^T y / U^T 1
    (grid_solve.build_interp_y) — the cache halves the per-step
    n-proportional work and is keyed to THIS y: only evaluate grid_mll
    on the same training split afterwards."""
    if spec.kernel.ski:
        from ..ops import grid_solve

        # ONE jit'd (module-level, memoized-by-jit) program per variant:
        # eager dispatch of the dozens of geometry ops is pathologically
        # slow on remote-compile TPU paths, and the previous fresh
        # jax.jit(lambda ...) wrappers re-traced per SPLIT (function-
        # identity keyed cache; measured 10-13 s/split at protein scale
        # even warm). Product (degree*sub_dim > 1) specs build
        # per-FACTOR geometry and lower to the grid solver
        # (ops/ski_product.py) — beyond-reference.
        if grid_solve.use_grid_solver(spec, x_train.shape[0]):
            if y_train is not None:
                out = _aot_prepare(
                    _prepare_grid_y_jit, "prepare_grid_y", spec,
                    (spec, params["kernel"], buffers["kernel"], x_train,
                     y_train))
                state, S4, uy, u1, vc = out
                # anchored value cache: with it the grid MLL step does
                # ZERO n-proportional work (grid_solve.build_value_cache)
                return {**buffers, "ski_state": state, "ski_uu": S4,
                        "ski_uy": uy, "ski_u1": u1, "ski_vc": vc}
            state, S4 = _aot_prepare(
                _prepare_grid_jit, "prepare_grid", spec,
                (spec, params["kernel"], buffers["kernel"], x_train))
            return {**buffers, "ski_state": state, "ski_uu": S4}
        state = _prepare_geometry_jit(spec, params["kernel"],
                                      buffers["kernel"], x_train)
        return {**buffers, "ski_state": state}
    if spec.precond_refresh > 1 and spec.precond_rank > 0:
        buffers = refresh_preconditioner(spec, params, buffers, x_train)
    return buffers


def _prepare_geometry(spec, kp, kb, xt):
    from ..ops import grid_solve

    return grid_solve._build_geometry(spec.kernel, kp, kb, xt,
                                      spec.kernel.grid_size)


def _prepare_grid(spec, kp, kb, xt):
    from ..ops import grid_solve

    state = _prepare_geometry(spec, kp, kb, xt)
    # the exact grid solver's U^T U Gram — hyperparameter-free, one
    # blocked pass over the data; replaces the per-step preconditioner
    # entirely (no CG left to precondition)
    S4 = grid_solve._build_gram(spec.kernel, state)
    return state, S4


def _prepare_grid_y(spec, kp, kb, xt, yy):
    from ..ops import grid_solve

    state, S4 = _prepare_grid(spec, kp, kb, xt)
    uy, u1 = grid_solve.build_interp_y(spec.kernel, state, yy)
    vc = grid_solve.build_value_cache(spec.kernel, state, S4, yy, uy)
    return state, S4, uy, u1, vc


_prepare_geometry_jit = functools.partial(jax.jit, static_argnums=0)(
    _prepare_geometry)
_prepare_grid_jit = functools.partial(jax.jit, static_argnums=0)(
    _prepare_grid)
_prepare_grid_y_jit = functools.partial(jax.jit, static_argnums=0)(
    _prepare_grid_y)


def _aot_prepare(jit_fn, tag, spec, args):
    """Serve a prepare program from the persistent AOT cache (skips its
    per-process trace+lower); falls back to the plain jitted call."""
    try:
        from ..utils.aot_cache import aot_step

        fn = aot_step(functools.partial(jit_fn, spec), args[1:],
                      key_parts=(tag, spec))
        return fn(*args[1:])
    except Exception:
        return jit_fn(*args)


@functools.partial(jax.jit, static_argnums=0)
def _build_precond_cache(spec: ModelSpec, params, kbuffers, x_train):
    from ..ops import precond

    noise = noise_value(jax.lax.stop_gradient(params))
    return precond.build_preconditioner(
        spec.kernel, jax.lax.stop_gradient(params["kernel"]),
        kbuffers, x_train, noise, spec.precond_rank,
    )


def refresh_preconditioner(spec: ModelSpec, params, buffers, x_train):
    """Rebuild the cached pivoted-Cholesky preconditioner at the CURRENT
    hyperparameters (buffers["precond_cache"]).

    Used with spec.precond_refresh = k > 1: the training loop calls this
    every k steps instead of the MLL rebuilding it every evaluation. A
    stale preconditioner is statistically sound — the estimator draws
    probes from N(0, M), applies the SAME M^{-1}, and adds the SAME
    logdet(M), so it is unbiased for ANY SPD M; staleness only degrades
    CG convergence rate as hyperparameters drift (measured in
    docs/BENCHMARKS.md; the build is ~85 ms/step at HouseElectric scale).

    Only the build is jitted (against the STABLE kernel-buffers pytree);
    the dict merge stays in Python so the cache key's presence can't
    trigger a retrace in the refresh path."""
    pre = _build_precond_cache(spec, params, buffers["kernel"], x_train)
    return {**buffers, "precond_cache": pre}


def noise_value(params):
    return softplus(params["raw_noise"]) + NOISE_FLOOR


def mean_fn(spec: ModelSpec, params, x):
    n = x.shape[0]
    if spec.mean == "constant":
        return jnp.full((n,), 1.0, x.dtype) * params["mean_const"]
    return jnp.zeros((n,), x.dtype)


def exact_mll(spec: ModelSpec, params, buffers, x, y):
    """Exact Cholesky marginal log-likelihood (total over n points)."""
    K = kernels.gram(spec.kernel, params["kernel"], buffers["kernel"], x, x)
    yc = y - mean_fn(spec, params, x)
    return exact.cholesky_mll(K, yc, noise_value(params), spec.jitter)


def predict(spec: ModelSpec, params, buffers, x_train, y_train, x_test,
            observation_noise: bool = True):
    """Posterior predictive mean/variance at x_test (exact Cholesky path).

    Mirrors the reference's `likelihood(model(test_x))` stack (SURVEY.md
    §3.3): mean cache solve, cross-covariance mean, Cholesky-whitened
    variance, + observation noise from the likelihood.
    """
    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    K = kernels.gram(kspec, kp, kb, x_train, x_train)
    yc = y_train - mean_fn(spec, params, x_train)
    noise = noise_value(params)
    L, alpha = exact.cholesky_posterior_cache(K, yc, noise, spec.jitter)
    K_star = kernels.gram(kspec, kp, kb, x_test, x_train)
    k_diag = kernels.gram_diag(kspec, kp, kb, x_test)
    mean_delta, var = exact.posterior_from_cache(
        K_star, k_diag, L, alpha, noise=noise if observation_noise else None
    )
    return mean_delta + mean_fn(spec, params, x_test), var


def make_predictor(spec: ModelSpec, params, buffers, x_train, y_train,
                   observation_noise: bool = True):
    """Eval-mode cached predictor (exact Cholesky path): factor K + s^2 I
    and the mean cache ONCE, return predict(x_test) -> (mu, var) for
    repeated test batches ([G] exact_prediction_strategies.py caching)."""
    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    K = kernels.gram(kspec, kp, kb, x_train, x_train)
    yc = y_train - mean_fn(spec, params, x_train)
    noise = noise_value(params)
    L, alpha = exact.cholesky_posterior_cache(K, yc, noise, spec.jitter)

    def predict(x_test):
        K_star = kernels.gram(kspec, kp, kb, x_test, x_train)
        k_diag = kernels.gram_diag(kspec, kp, kb, x_test)
        mean_delta, var = exact.posterior_from_cache(
            K_star, k_diag, L, alpha,
            noise=noise if observation_noise else None,
        )
        return mean_delta + mean_fn(spec, params, x_test), var

    return predict


def predict_cov(spec: ModelSpec, params, buffers, x_train, y_train, x_test,
                observation_noise: bool = False):
    """Posterior (mean, FULL covariance) at x_test — exact Cholesky path
    ([G] exact_prediction_strategies.py exact_predictive_covar)."""
    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    K = kernels.gram(kspec, kp, kb, x_train, x_train)
    yc = y_train - mean_fn(spec, params, x_train)
    noise = noise_value(params)
    L, alpha = exact.cholesky_posterior_cache(K, yc, noise, spec.jitter)
    K_star = kernels.gram(kspec, kp, kb, x_test, x_train)
    K_ss = kernels.gram(kspec, kp, kb, x_test, x_test)
    mu = jnp.matmul(K_star, alpha, precision=jax.lax.Precision.HIGHEST)
    cov = exact.posterior_cov_from_cache(
        K_star, K_ss, L, noise=noise if observation_noise else None
    )
    return mu + mean_fn(spec, params, x_test), cov
