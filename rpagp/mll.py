"""Unified marginal log-likelihood and posterior: exact vs iterative dispatch.

Rebuild of GPyTorch's size-based dispatch ([G]
gpytorch/distributions/multivariate_normal.py log_prob +
gpytorch/functions/_inv_quad_log_det.py + settings.max_cholesky_size —
SURVEY.md §3.2): below `spec.max_cholesky_size` training points the MLL is
the dense Cholesky; above, it is the BBMM path — batched preconditioned CG
for the inv-quad and stochastic Lanczos quadrature for the logdet, with a
custom_vjp so gradients are probe-vector trace estimates (never
differentiating through CG iterations).

Dispatch happens at TRACE time on the static shape of x — no dynamic
control flow enters the compiled program.
"""

from __future__ import annotations

import functools

import jax

from .models import exact_gp
from .models.exact_gp import ModelSpec


def mll(spec: ModelSpec, params, buffers, x, y, key=None):
    """Marginal log-likelihood (total, not per-point)."""
    n = x.shape[0]
    if n <= spec.max_cholesky_size and not spec.kernel.ski:
        return exact_gp.exact_mll(spec, params, buffers, x, y)
    from .ops import grid_solve

    if grid_solve.use_grid_solver(spec, n):
        # exact grid-space Woodbury MLL: deterministic, key unused.
        # The dispatch must agree with posterior()'s (spec/size alone) —
        # never silently substitute the stochastic BBMM estimator just
        # because the caller skipped prepare_buffers. The grid caches
        # are hyperparameter-free, so build them inline (traceable);
        # warn once at trace time since rebuilding per step is wasteful.
        if not isinstance(buffers, dict) or "ski_uu" not in buffers:
            import warnings

            warnings.warn(
                "mll(): grid-solver dispatch with unprepared buffers — "
                "building the SKI geometry/Gram inline. Call "
                "exact_gp.prepare_buffers(spec, params, buffers, x, "
                "y_train=y) once per dataset to cache them.",
                stacklevel=2,
            )
            sg = jax.lax.stop_gradient
            buffers = dict(buffers)
            if "ski_state" not in buffers:
                buffers["ski_state"] = grid_solve._build_geometry(
                    spec.kernel, sg(params["kernel"]), buffers["kernel"],
                    x, spec.kernel.grid_size)
            buffers["ski_uu"] = grid_solve._build_gram(
                spec.kernel, buffers["ski_state"])
        return grid_solve.grid_mll(spec, params, buffers, x, y)
    from .ops.iterative import iterative_mll  # deferred: stage-3 module

    if key is None:
        key = jax.random.key(0)
    return iterative_mll(spec, params, buffers, x, y, key)


@functools.partial(jax.jit, static_argnums=(0, 6))
def _posterior_jit(spec, params, buffers, x_train, y_train, x_test,
                   observation_noise):
    n = x_train.shape[0]
    if n <= spec.max_cholesky_size and not spec.kernel.ski:
        return exact_gp.predict(
            spec, params, buffers, x_train, y_train, x_test,
            observation_noise=observation_noise,
        )
    from .ops import grid_solve

    if grid_solve.use_grid_solver(spec, n):
        return grid_solve.grid_posterior(
            spec, params, buffers, x_train, y_train, x_test,
            observation_noise=observation_noise,
        )
    from .ops.iterative import iterative_posterior

    return iterative_posterior(
        spec, params, buffers, x_train, y_train, x_test,
        observation_noise=observation_noise,
    )


def posterior(spec: ModelSpec, params, buffers, x_train, y_train, x_test,
              observation_noise: bool = True):
    """Posterior predictive (mean, var) with the same size dispatch.

    Jitted as ONE program (spec static): the eager path dispatches every
    primitive separately, which on remote-compile TPU transports costs
    a per-op compile + round trip — a cold d>=2 exact posterior took
    MINUTES eagerly vs seconds under jit."""
    return _posterior_jit(spec, params, buffers, x_train, y_train, x_test,
                          bool(observation_noise))


def make_predictor(spec: ModelSpec, params, buffers, x_train, y_train,
                   observation_noise: bool = True):
    """Eval-mode CACHED predictor with the usual size dispatch: factor
    once (Cholesky small-n; CG mean cache + LOVE Lanczos cache large-n),
    then every call is one cross-kernel MVM — the reference's
    prediction-strategy caching ([G] exact_prediction_strategies.py).
    Returns predict(x_test) -> (mu, var)."""
    n = x_train.shape[0]
    if n <= spec.max_cholesky_size and not spec.kernel.ski:
        from .models.exact_gp import make_predictor as _exact_mp

        return _exact_mp(spec, params, buffers, x_train, y_train,
                         observation_noise=observation_noise)
    from .ops import grid_solve

    if grid_solve.use_grid_solver(spec, n):
        return grid_solve.make_grid_predictor(
            spec, params, buffers, x_train, y_train,
            observation_noise=observation_noise)
    from .ops.iterative import make_predictor as _iter_mp

    return _iter_mp(spec, params, buffers, x_train, y_train,
                    observation_noise=observation_noise)


@functools.partial(jax.jit, static_argnums=(0, 6))
def _posterior_cov_jit(spec, params, buffers, x_train, y_train, x_test,
                       observation_noise):
    n = x_train.shape[0]
    if n <= spec.max_cholesky_size and not spec.kernel.ski:
        from .models.exact_gp import predict_cov

        return predict_cov(spec, params, buffers, x_train, y_train, x_test,
                           observation_noise=observation_noise)
    from .ops import grid_solve

    if grid_solve.use_grid_solver(spec, n):
        # same solver family as posterior(): exact grid-space covariance
        # (a grid-dispatched spec previously got a deterministic-exact
        # MLL/posterior but a LOVE-estimated covariance — r3 weak #3)
        return grid_solve.grid_posterior_cov(
            spec, params, buffers, x_train, y_train, x_test,
            observation_noise=observation_noise,
        )
    from .ops.iterative import iterative_posterior_cov

    return iterative_posterior_cov(
        spec, params, buffers, x_train, y_train, x_test,
        observation_noise=observation_noise,
    )


def posterior_cov(spec: ModelSpec, params, buffers, x_train, y_train,
                  x_test, observation_noise: bool = False):
    """Posterior (mean, FULL covariance) at a modest test batch, with the
    same size dispatch ([G] exact_prediction_strategies.py predictive
    covar: exact Cholesky small-n, LOVE / CG solves large-n). One jitted
    program (see posterior)."""
    return _posterior_cov_jit(spec, params, buffers, x_train, y_train,
                              x_test, bool(observation_noise))


def sample_posterior(spec: ModelSpec, params, buffers, x_train, y_train,
                     x_test, key, num_samples: int = 8,
                     observation_noise: bool = False):
    """Joint posterior function draws at x_test — (num_samples, n_test)
    (the reference's `pred.rsample()`; [G] multivariate_normal.rsample)."""
    from .ops.exact import mvn_sample

    mu, cov = posterior_cov(spec, params, buffers, x_train, y_train, x_test,
                            observation_noise=observation_noise)
    return mvn_sample(key, mu, cov, num_samples, jitter=spec.jitter)
