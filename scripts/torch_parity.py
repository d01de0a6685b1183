"""Numeric PARITY oracle: rpagp vs an independent torch implementation.

Round-2 verdict finding: every parity test in the repo compared rpagp
against *rpagp's own* dense oracles, and the one independent
implementation in the image (scripts/torch_baseline.py, the torch
reimplementation of the reference's GPyTorch algorithm stack —
SURVEY.md §3.2) was used only as a stopwatch. This module closes that:
it computes THE SAME NUMBERS as rpagp — MLL values at matched
hyperparameters, and end-to-end Adam-trained test RMSE/NLL — in torch,
sharing nothing with the jax code but the published model definition:

    K = outputscale/J * sum_j k1d((P_j x - P_j x')/ls_j) + noise I
    mll = -1/2 [ yc^T Khat^{-1} yc + logdet Khat + n log 2pi ]
    Khat = K + (softplus(raw_noise) + 1e-4 + jitter) I

Conventions deliberately matched to rpagp (and GPyTorch, which both
mirror): softplus raw parameters, noise floor 1e-4
(models/exact_gp.NOISE_FLOOR), Cholesky jitter 1e-6 (ModelSpec.jitter),
Keys cubic-convolution interpolation and the grid layout
h = span/(m-5), grid_lo = lo - 2h (ops/ski._geometry_from_z — itself
the [G] grid_interpolation_kernel.py convention), predictive variance
clamp 1e-10 + observation noise (ops/exact.posterior_from_cache), NLL =
mean over points of 0.5(log 2pi var + resid^2/var)
(ops/exact.gaussian_nll; the reference's CSV NLL column,
[U] gp_experiment_runner.py).

The torch side runs in float64 for the matched-params value checks (a
true oracle: the comparison error is rpagp's f32 error) and float32 for
the end-to-end training runs (same arithmetic class as rpagp, so the
Adam trajectories are comparable step for step).

Usage (writes the PARITY table printed at the end into BASELINE.md by
hand — see tests/test_torch_parity.py for the asserted version):

  JAX_PLATFORMS=cpu python scripts/torch_parity.py
"""

from __future__ import annotations

import math

import numpy as np
import torch

LOG_2PI = math.log(2.0 * math.pi)
NOISE_FLOOR = 1e-4  # rpagp.models.exact_gp.NOISE_FLOOR


# ---------------------------------------------------------------------------
# shared problem construction (numpy — identical bits into torch and jax)
# ---------------------------------------------------------------------------


def make_problem(n, D, J=None, seed=0, n_test=64):
    """Deterministic data + projection + NONZERO raw hypers, as numpy.

    Raw hypers are offset from the softplus(0) init so the matched-params
    check exercises the parameter transforms, not just defaults."""
    rng = np.random.RandomState(seed)
    X = rng.randn(n + n_test, D).astype(np.float64)
    y = np.sin(2.0 * X[:, 0]) + 0.3 * rng.randn(n + n_test)
    P = (rng.randn(D, J) / np.sqrt(D)).astype(np.float64) if J else None
    n_ls = J if J else D
    raw = {
        "raw_lengthscale": 0.3 + 0.1 * rng.randn(n_ls),
        "raw_outputscale": np.float64(0.2),
        "raw_noise": np.float64(-0.5),
        "mean_const": np.float64(0.1),
    }
    return {
        "X": X[:n], "y": y[:n], "Xt": X[n:], "yt": y[n:], "P": P, "raw": raw,
    }


# ---------------------------------------------------------------------------
# torch model (independent of rpagp; float64 by default)
# ---------------------------------------------------------------------------


def _sp(x):
    return torch.nn.functional.softplus(x)


def _gram_torch(X1, X2, p, P=None):
    """Dense Gram: full-D ARD RBF, or the RPA additive kernel."""
    ls = _sp(p["raw_lengthscale"])
    os_ = _sp(p["raw_outputscale"])
    if P is None:
        d = (X1[:, None, :] - X2[None, :, :]) / ls
        return os_ * torch.exp(-0.5 * (d**2).sum(-1))
    Z1, Z2 = X1 @ P, X2 @ P
    J = P.shape[1]
    d = (Z1[:, None, :] - Z2[None, :, :]) / ls
    return (os_ / J) * torch.exp(-0.5 * d**2).sum(-1)


def _khat(X, p, P=None, jitter=1e-6):
    n = X.shape[0]
    noise = _sp(p["raw_noise"]) + NOISE_FLOOR
    K = _gram_torch(X, X, p, P)
    return K + (noise + jitter) * torch.eye(n, dtype=K.dtype), noise


def chol_mll_torch(X, y, p, P=None, jitter=1e-6):
    """Total exact MLL, dense Cholesky (the reference's small-n path)."""
    n = X.shape[0]
    Khat, _ = _khat(X, p, P, jitter)
    L = torch.linalg.cholesky(Khat)
    yc = (y - p["mean_const"]).unsqueeze(1)
    alpha = torch.cholesky_solve(yc, L)
    return -0.5 * ((yc * alpha).sum() + 2.0 * L.diagonal().log().sum()
                   + n * LOG_2PI)


def _cubic(s):
    a = s.abs()
    inner = 1.5 * a**3 - 2.5 * a**2 + 1.0
    outer = -0.5 * a**3 + 2.5 * a**2 - 4.0 * a + 2.0
    return torch.where(a <= 1.0, inner,
                       torch.where(a < 2.0, outer, torch.zeros_like(a)))


def ski_operator_torch(X, p, P, m, grid_jitter=1e-6):
    """Materialized SKI operator A = noise I + (os/J) sum_j W_j T_j W_j^T
    with T_j = k_rbf(grid dists / ls_j) + grid_jitter I — the model the
    rpagp grid solver (ops/grid_solve.py) solves EXACTLY."""
    Z = X @ P  # (n, J)
    n, J = Z.shape
    lo, hi = Z.min(0).values, Z.max(0).values
    span = (hi - lo).clamp_min(1e-6)
    h = span / (m - 5)
    grid_lo = lo - 2.0 * h
    tfrac = (Z - grid_lo) / h  # (n, J)
    cells = torch.arange(m, dtype=Z.dtype)
    ls = _sp(p["raw_lengthscale"])
    os_ = _sp(p["raw_outputscale"])
    noise = _sp(p["raw_noise"]) + NOISE_FLOOR
    idx = (cells[:, None] - cells[None, :]).abs()
    A = noise * torch.eye(n, dtype=Z.dtype)
    for j in range(J):
        W = _cubic(tfrac[:, j : j + 1] - cells[None, :])  # (n, m) dense
        T = torch.exp(-0.5 * (idx * h[j] / ls[j]) ** 2) \
            + grid_jitter * torch.eye(m, dtype=Z.dtype)
        A = A + (os_ / J) * (W @ T @ W.t())
    return A, noise


def ski_mll_torch(X, y, p, P, m, grid_jitter=1e-6):
    """Exact MLL of the SKI model via dense Cholesky of the materialized
    operator — the independent oracle for rpagp's grid_mll."""
    n = X.shape[0]
    A, _ = ski_operator_torch(X, p, P, m, grid_jitter)
    L = torch.linalg.cholesky(A)
    yc = (y - p["mean_const"]).unsqueeze(1)
    alpha = torch.cholesky_solve(yc, L)
    return -0.5 * ((yc * alpha).sum() + 2.0 * L.diagonal().log().sum()
                   + n * LOG_2PI)


def predict_torch(X, y, Xt, p, P=None, jitter=1e-6):
    """Posterior predictive (mu, var) with observation noise — matches
    rpagp ops/exact.posterior_from_cache semantics (var clamp 1e-10)."""
    Khat, noise = _khat(X, p, P, jitter)
    L = torch.linalg.cholesky(Khat)
    yc = (y - p["mean_const"]).unsqueeze(1)
    alpha = torch.cholesky_solve(yc, L)
    Ks = _gram_torch(Xt, X, p, P)
    mu = (Ks @ alpha)[:, 0] + p["mean_const"]
    v = torch.linalg.solve_triangular(L, Ks.t(), upper=False)
    k_diag = _sp(p["raw_outputscale"]) * torch.ones(Xt.shape[0],
                                                    dtype=X.dtype)
    var = (k_diag - (v**2).sum(0)).clamp_min(1e-10) + noise
    return mu, var


def rmse_nll(yt, mu, var):
    rmse = float(((mu - yt) ** 2).mean().sqrt())
    nll = float(0.5 * (torch.log(2.0 * math.pi * var)
                       + (yt - mu) ** 2 / var).mean())
    return rmse, nll


def train_adam_torch(X, y, P=None, iters=150, lr=0.1, jitter=1e-6,
                     ski_m=None, grid_jitter=1e-6):
    """Plain Adam on -mll/n for a FIXED iteration count (deterministic;
    the rpagp side runs the same count so trajectories are comparable).
    ski_m: when set, train the SKI model (materialized-operator MLL)."""
    n_ls = P.shape[1] if P is not None else X.shape[1]
    p = {
        "raw_lengthscale": torch.zeros(n_ls, dtype=X.dtype,
                                       requires_grad=True),
        "raw_outputscale": torch.zeros((), dtype=X.dtype,
                                       requires_grad=True),
        "raw_noise": torch.zeros((), dtype=X.dtype, requires_grad=True),
        "mean_const": torch.zeros((), dtype=X.dtype, requires_grad=True),
    }
    opt = torch.optim.Adam(p.values(), lr=lr)
    n = X.shape[0]
    losses = []
    for _ in range(iters):
        opt.zero_grad()
        if ski_m is not None:
            loss = -ski_mll_torch(X, y, p, P, ski_m, grid_jitter) / n
        else:
            loss = -chol_mll_torch(X, y, p, P, jitter) / n
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return {k: v.detach() for k, v in p.items()}, losses


# ---------------------------------------------------------------------------
# torch SVGP oracle (whitened Hensman ELBO — [U] gp_models/models.py
# SVGPRegressionModel over [G] gpytorch VariationalStrategy; conventions
# matched to rpagp.models.svgp: C = tril(raw,-1) + diag(softplus(diag)),
# K_MM jitter = 10 * ModelSpec.jitter, var clamp 1e-10, noise floor 1e-4)
# ---------------------------------------------------------------------------


def svgp_elbo_torch(X, y, p, P, n_total, jitter_mm):
    """Whitened-parameterization SVGP evidence lower bound, full batch.

    p carries raw_lengthscale/raw_outputscale/raw_noise/mean_const plus
    inducing (M, D), var_mean (M,), var_chol (M, M) raw lower factor."""
    Z = p["inducing"]
    M = Z.shape[0]
    Kmm = _gram_torch(Z, Z, p, P) + jitter_mm * torch.eye(M, dtype=X.dtype)
    L = torch.linalg.cholesky(Kmm)
    Kxz = _gram_torch(X, Z, p, P)  # (n, M)
    A = torch.linalg.solve_triangular(L, Kxz.t(), upper=False)  # (M, n)
    raw = p["var_chol"]
    C = torch.tril(raw, -1) + torch.diag(_sp(torch.diagonal(raw)))
    vm = p["var_mean"]
    mean = A.t() @ vm + p["mean_const"]
    CA = C.t() @ A  # (M, n)
    kdiag = _sp(p["raw_outputscale"]) * torch.ones(X.shape[0], dtype=X.dtype)
    var = kdiag - (A**2).sum(0) + (CA**2).sum(0)
    var = var.clamp_min(1e-10)
    noise = _sp(p["raw_noise"]) + NOISE_FLOOR
    lik = -0.5 * (LOG_2PI + torch.log(noise) + (y - mean) ** 2 / noise)
    lik = lik - 0.5 * var / noise
    lik_term = (n_total / X.shape[0]) * lik.sum()
    kl = 0.5 * ((C**2).sum() + vm @ vm - M
                - 2.0 * torch.log(torch.diagonal(C)).sum())
    return lik_term - kl


# ---------------------------------------------------------------------------
# the rpagp side + comparison driver
# ---------------------------------------------------------------------------


def _rpagp_model(prob, spec_kind, m=None, spec_kw=None):
    """Build the rpagp (spec, params, buffers, x, y, xt, yt) for a shared
    problem, injecting the SHARED projection and raw hypers."""
    import jax
    import jax.numpy as jnp

    from rpagp.models import exact_gp
    from rpagp.models.exact_gp import ModelSpec
    from rpagp.ops.kernels import KernelSpec

    X = jnp.asarray(prob["X"], jnp.float32)
    y = jnp.asarray(prob["y"], jnp.float32)
    Xt = jnp.asarray(prob["Xt"], jnp.float32)
    yt = jnp.asarray(prob["yt"], jnp.float32)
    D = X.shape[1]
    if spec_kind == "rbf":
        kspec = KernelSpec(family="rbf", ard=True)
    elif spec_kind in ("rpa", "bbmm"):
        J = prob["P"].shape[1]
        kspec = KernelSpec.polynomial(J=J, d=1, base="rbf")
    elif spec_kind == "ski":
        J = prob["P"].shape[1]
        kspec = KernelSpec.polynomial(J=J, d=1, base="rbf", ski=True,
                                      grid_size=m)
    else:
        raise ValueError(spec_kind)
    spec = ModelSpec(kernel=kspec,
                     max_cholesky_size=(0 if spec_kind in ("ski", "bbmm")
                                        else 10**9),
                     **(spec_kw or {}))
    params, buffers = exact_gp.init_model(jax.random.key(0), spec, D)
    if prob["P"] is not None:
        buffers = dict(buffers)
        buffers["kernel"] = {"proj": jnp.asarray(prob["P"], jnp.float32)}
    raw = prob["raw"]
    params = {
        "raw_noise": jnp.asarray(raw["raw_noise"], jnp.float32),
        "mean_const": jnp.asarray(raw["mean_const"], jnp.float32),
        "kernel": {
            "raw_lengthscale": jnp.asarray(raw["raw_lengthscale"],
                                           jnp.float32),
            "raw_outputscale": jnp.asarray(raw["raw_outputscale"],
                                           jnp.float32),
        },
    }
    return spec, params, buffers, X, y, Xt, yt


def _torch_params(prob, dtype):
    return {k: torch.tensor(v, dtype=dtype) for k, v in prob["raw"].items()}


def mll_parity(spec_kind, n=400, D=6, J=10, m=32, seed=0):
    """Matched-params MLL relative error, rpagp f32 vs torch f64."""
    prob = make_problem(n, D, J=(J if spec_kind != "rbf" else None),
                        seed=seed)
    spec, params, buffers, X, y, _, _ = _rpagp_model(prob, spec_kind, m=m)
    pt = _torch_params(prob, torch.float64)
    Xt64 = torch.tensor(prob["X"], dtype=torch.float64)
    yt64 = torch.tensor(prob["y"], dtype=torch.float64)
    P64 = (torch.tensor(prob["P"], dtype=torch.float64)
           if prob["P"] is not None else None)
    if spec_kind == "ski":
        from rpagp.models import exact_gp
        from rpagp.ops import grid_solve

        buffers = exact_gp.prepare_buffers(spec, params, buffers, X,
                                           y_train=y)
        v_rpagp = float(grid_solve.grid_mll(spec, params, buffers, X, y))
        v_torch = float(ski_mll_torch(Xt64, yt64, pt, P64, m,
                                      grid_jitter=spec.grid_jitter))
    else:
        from rpagp.models.exact_gp import exact_mll

        v_rpagp = float(exact_mll(spec, params, buffers, X, y))
        v_torch = float(chol_mll_torch(Xt64, yt64, pt, P64,
                                       jitter=spec.jitter))
    return v_rpagp, v_torch, abs(v_rpagp - v_torch) / abs(v_torch)


def trained_parity(spec_kind, n=400, D=6, J=10, m=32, iters=150, lr=0.1,
                   seed=0):
    """End-to-end: identical data/projection/init/optimizer in both
    codebases, fixed Adam iterations, then test RMSE/NLL from each."""
    import jax.numpy as jnp
    import optax

    from rpagp.mll import mll as rp_mll, posterior as rp_posterior
    from rpagp.models import exact_gp
    from rpagp.ops.exact import gaussian_nll
    from rpagp.train import train_to_convergence

    prob = make_problem(n, D, J=(J if spec_kind != "rbf" else None),
                        seed=seed)
    spec, params0, buffers, X, y, Xt, yt = _rpagp_model(prob, spec_kind,
                                                        m=m)
    # both sides start from the raw-zeros init (the GPyTorch default)
    params0 = {
        "raw_noise": jnp.zeros((), jnp.float32),
        "mean_const": jnp.zeros((), jnp.float32),
        "kernel": {
            "raw_lengthscale": jnp.zeros_like(
                params0["kernel"]["raw_lengthscale"]),
            "raw_outputscale": jnp.zeros((), jnp.float32),
        },
    }
    buffers = exact_gp.prepare_buffers(spec, params0, buffers, X, y_train=y)
    nloc = X.shape[0]
    loss_fn = lambda p, b, xx, yy: -rp_mll(spec, p, b, xx, yy) / nloc
    res = train_to_convergence(
        loss_fn, params0, max_iters=iters, patience=10**9, rel_tol=0.0,
        optimizer=optax.adam(lr), loss_args=(buffers, X, y))
    mu, var = rp_posterior(spec, res.params, buffers, X, y, Xt)
    rmse_j = float(jnp.sqrt(jnp.mean((mu - yt) ** 2)))
    nll_j = float(gaussian_nll(yt, mu, var))

    dt = torch.float32  # same arithmetic class as the jax side
    Xt32 = torch.tensor(prob["X"], dtype=dt)
    yt32 = torch.tensor(prob["y"], dtype=dt)
    Xq = torch.tensor(prob["Xt"], dtype=dt)
    yq = torch.tensor(prob["yt"], dtype=dt)
    P32 = (torch.tensor(prob["P"], dtype=dt)
           if prob["P"] is not None else None)
    pT, losses_t = train_adam_torch(
        Xt32, yt32, P32, iters=iters, lr=lr,
        ski_m=(m if spec_kind == "ski" else None),
        grid_jitter=spec.grid_jitter)
    if spec_kind == "ski":
        # posterior oracle for the SKI model: exact solve against the
        # materialized operator; cross-covariance uses the DENSE kernel
        # (rpagp's grid posterior interpolates the cross-kernel too, an
        # O(interp) difference — the RMSE/NLL band absorbs it)
        A, noise = ski_operator_torch(Xt32, pT, P32, m, spec.grid_jitter)
        L = torch.linalg.cholesky(A)
        yc = (yt32 - pT["mean_const"]).unsqueeze(1)
        alpha = torch.cholesky_solve(yc, L)
        Ks = _gram_torch(Xq, Xt32, pT, P32)
        mu_t = (Ks @ alpha)[:, 0] + pT["mean_const"]
        v = torch.linalg.solve_triangular(L, Ks.t(), upper=False)
        k_diag = _sp(pT["raw_outputscale"]) * torch.ones(Xq.shape[0],
                                                         dtype=dt)
        var_t = (k_diag - (v**2).sum(0)).clamp_min(1e-10) + noise
    else:
        mu_t, var_t = predict_torch(Xt32, yt32, Xq, pT, P32,
                                    jitter=spec.jitter)
    rmse_t, nll_t = rmse_nll(yq, mu_t, var_t)
    return {
        "rmse_rpagp": rmse_j, "rmse_torch": rmse_t,
        "nll_rpagp": nll_j, "nll_torch": nll_t,
        "final_loss_rpagp": res.losses[-1], "final_loss_torch": losses_t[-1],
        "d_rmse": abs(rmse_j - rmse_t), "d_nll": abs(nll_j - nll_t),
    }


# ---------------------------------------------------------------------------
# config 3: the BBMM CG+SLQ estimator family vs the torch f64 oracle
# ---------------------------------------------------------------------------

_BBMM_TIGHT = dict(cg_max_iters=400, cg_tol=1e-10, precond_rank=15,
                   num_probes=64)


def bbmm_mll_parity(n=2048, D=8, J=8, seed=0, seeds=(3, 4, 5)):
    """Config-3 matched-params check: rpagp's iterative_mll — the BBMM
    CG + pivoted-Cholesky + SLQ stack (ops/cg.py, ops/precond.py,
    ops/slq.py, ops/iterative.py custom_vjp; rebuild of
    [G] gpytorch/utils/linear_cg.py / stochastic_lq.py /
    functions/_inv_quad_log_det.py) at TIGHT knobs — against the torch
    f64 DENSE Cholesky MLL of the same model (the estimand; jitter=0
    because the iterative A = K + noise I carries no explicit jitter).

    The estimator is stochastic (SLQ probes): returns per-seed values,
    the torch value, and (mean-of-seeds, worst-seed) relative errors."""
    import jax

    from rpagp.ops import iterative

    prob = make_problem(n, D, J=J, seed=seed)
    spec, params, buffers, X, y, _, _ = _rpagp_model(
        prob, "bbmm", spec_kw=_BBMM_TIGHT)
    vals = [
        float(iterative.iterative_mll(spec, params, buffers, X, y,
                                      jax.random.key(s)))
        for s in seeds
    ]
    pt = _torch_params(prob, torch.float64)
    v_t = float(chol_mll_torch(
        torch.tensor(prob["X"], dtype=torch.float64),
        torch.tensor(prob["y"], dtype=torch.float64), pt,
        torch.tensor(prob["P"], dtype=torch.float64), jitter=0.0))
    rel_mean = abs(sum(vals) / len(vals) - v_t) / abs(v_t)
    rel_worst = max(abs(v - v_t) for v in vals) / abs(v_t)
    return vals, v_t, rel_mean, rel_worst


_BBMM_GRAD_ORDER = ("raw_lengthscale", "raw_outputscale", "raw_noise",
                    "mean_const")


def _flat_rpagp_grad(g, order):
    import numpy as _np

    flat = []
    for k in order:
        v = g["kernel"][k] if k in g.get("kernel", {}) else g[k]
        flat.append(_np.ravel(_np.asarray(v, _np.float64)))
    return _np.concatenate(flat)


def _flat_torch_grad(p, order):
    return np.concatenate(
        [np.ravel(np.asarray(p[k].grad.detach(), np.float64))
         for k in order])


def bbmm_grad_parity(n=1024, D=8, J=8, seed=0, seeds=(7, 8, 9)):
    """Gradient-direction check for the config-3 custom_vjp: the probe
    trace-estimator gradient of iterative_mll vs the torch f64 autograd
    gradient of the dense Cholesky MLL, flattened in one canonical
    order. Returns (per-seed cosines, rel error of the seed-mean)."""
    import jax

    from rpagp.ops import iterative

    prob = make_problem(n, D, J=J, seed=seed)
    spec, params, buffers, X, y, _, _ = _rpagp_model(
        prob, "bbmm", spec_kw=_BBMM_TIGHT)

    pt = {k: torch.tensor(v, dtype=torch.float64, requires_grad=True)
          for k, v in prob["raw"].items()}
    loss = chol_mll_torch(
        torch.tensor(prob["X"], dtype=torch.float64),
        torch.tensor(prob["y"], dtype=torch.float64), pt,
        torch.tensor(prob["P"], dtype=torch.float64), jitter=0.0)
    loss.backward()
    g_t = _flat_torch_grad(pt, _BBMM_GRAD_ORDER)

    cosines, gs = [], []
    for s in seeds:
        g = jax.grad(
            lambda p: iterative.iterative_mll(spec, p, buffers, X, y,
                                              jax.random.key(s))
        )(params)
        gj = _flat_rpagp_grad(g, _BBMM_GRAD_ORDER)
        cosines.append(float(
            gj @ g_t / (np.linalg.norm(gj) * np.linalg.norm(g_t))))
        gs.append(gj)
    gm = np.mean(gs, axis=0)
    rel_mean = float(np.linalg.norm(gm - g_t) / np.linalg.norm(g_t))
    return cosines, rel_mean


def bbmm_trained_parity(n=1200, D=8, J=8, iters=60, lr=0.1, seed=0):
    """End-to-end config 3: rpagp trains through the STOCHASTIC BBMM MLL
    (fresh probe key every step, the reference's behavior); torch trains
    the same model through its f32 dense-Cholesky MLL. The trajectories
    are NOT step-identical (probe noise jitters the rpagp gradient), so
    the comparison is the trained test RMSE/NLL band — the quantity the
    reference's CSV records."""
    import jax
    import jax.numpy as jnp
    import optax

    from rpagp.models import exact_gp
    from rpagp.ops import iterative
    from rpagp.ops.exact import gaussian_nll
    from rpagp.train import train_to_convergence

    prob = make_problem(n, D, J=J, seed=seed)
    spec_kw = dict(cg_max_iters=100, cg_tol=1e-6, precond_rank=15,
                   num_probes=32)
    spec, params0, buffers, X, y, Xt, yt = _rpagp_model(
        prob, "bbmm", spec_kw=spec_kw)
    params0 = {
        "raw_noise": jnp.zeros((), jnp.float32),
        "mean_const": jnp.zeros((), jnp.float32),
        "kernel": {
            "raw_lengthscale": jnp.zeros_like(
                params0["kernel"]["raw_lengthscale"]),
            "raw_outputscale": jnp.zeros((), jnp.float32),
        },
    }
    nloc = X.shape[0]
    loss_fn = lambda p, b, xx, yy, k: -iterative.iterative_mll(
        spec, p, b, xx, yy, k) / nloc
    res = train_to_convergence(
        loss_fn, params0, max_iters=iters, patience=10**9, rel_tol=0.0,
        optimizer=optax.adam(lr), key=jax.random.key(seed + 1),
        loss_args=(buffers, X, y))
    mu, var = iterative.iterative_posterior(
        spec, res.params, buffers, X, y, Xt, var_chunk=64, var_tol=1e-4)
    rmse_j = float(jnp.sqrt(jnp.mean((mu - yt) ** 2)))
    nll_j = float(gaussian_nll(yt, mu, var))

    dt = torch.float32
    pT, losses_t = train_adam_torch(
        torch.tensor(prob["X"], dtype=dt),
        torch.tensor(prob["y"], dtype=dt),
        torch.tensor(prob["P"], dtype=dt), iters=iters, lr=lr, jitter=0.0)
    mu_t, var_t = predict_torch(
        torch.tensor(prob["X"], dtype=dt),
        torch.tensor(prob["y"], dtype=dt),
        torch.tensor(prob["Xt"], dtype=dt), pT,
        torch.tensor(prob["P"], dtype=dt), jitter=0.0)
    rmse_t, nll_t = rmse_nll(torch.tensor(prob["yt"], dtype=dt), mu_t,
                             var_t)
    return {
        "rmse_rpagp": rmse_j, "rmse_torch": rmse_t,
        "nll_rpagp": nll_j, "nll_torch": nll_t,
        "final_loss_rpagp": res.losses[-1],
        "final_loss_torch": losses_t[-1],
        "d_rmse": abs(rmse_j - rmse_t), "d_nll": abs(nll_j - nll_t),
    }


# ---------------------------------------------------------------------------
# SVGP: whitened Hensman ELBO vs the torch f64 oracle
# ---------------------------------------------------------------------------

_SVGP_GRAD_ORDER = ("raw_lengthscale", "raw_outputscale", "raw_noise",
                    "mean_const", "inducing", "var_mean", "var_chol")


def _make_svgp_problem(n, D, J, M, seed=0, n_test=64):
    """Shared problem + SVGP variational state (numpy, same bits both
    sides). Variational raws are offset from init so the KL and the
    whitening transforms are all exercised."""
    prob = make_problem(n, D, J=J, seed=seed)
    rng = np.random.RandomState(seed + 100)
    idx = rng.choice(n, M, replace=False)
    prob["svgp"] = {
        "inducing": prob["X"][idx].copy(),
        "var_mean": 0.3 * rng.randn(M),
        "var_chol": (np.tril(0.1 * rng.randn(M, M), -1)
                     + np.diag(0.2 * rng.randn(M))),
    }
    return prob


def _rpagp_svgp(prob):
    """rpagp (spec, params, buffers, X, y, Xt, yt) at the shared state."""
    import jax
    import jax.numpy as jnp

    from rpagp.models import svgp
    from rpagp.models.exact_gp import ModelSpec
    from rpagp.ops.kernels import KernelSpec

    X = jnp.asarray(prob["X"], jnp.float32)
    y = jnp.asarray(prob["y"], jnp.float32)
    J = prob["P"].shape[1]
    spec = ModelSpec(kernel=KernelSpec.polynomial(J=J, d=1, base="rbf"))
    M = prob["svgp"]["inducing"].shape[0]
    params, buffers = svgp.init_svgp_params(jax.random.key(0), spec, X, M)
    buffers = dict(buffers)
    buffers["kernel"] = {"proj": jnp.asarray(prob["P"], jnp.float32)}
    raw, sv = prob["raw"], prob["svgp"]
    params = {
        "raw_noise": jnp.asarray(raw["raw_noise"], jnp.float32),
        "mean_const": jnp.asarray(raw["mean_const"], jnp.float32),
        "kernel": {
            "raw_lengthscale": jnp.asarray(raw["raw_lengthscale"],
                                           jnp.float32),
            "raw_outputscale": jnp.asarray(raw["raw_outputscale"],
                                           jnp.float32),
        },
        "inducing": jnp.asarray(sv["inducing"], jnp.float32),
        "var_mean": jnp.asarray(sv["var_mean"], jnp.float32),
        "var_chol": jnp.asarray(sv["var_chol"], jnp.float32),
    }
    return spec, params, buffers, X, y


def _torch_svgp_params(prob, dtype, requires_grad=False):
    out = {k: torch.tensor(v, dtype=dtype, requires_grad=requires_grad)
           for k, v in prob["raw"].items()}
    for k, v in prob["svgp"].items():
        out[k] = torch.tensor(v, dtype=dtype, requires_grad=requires_grad)
    return out


def svgp_elbo_parity(n=600, D=6, J=6, M=32, seed=0):
    """Matched-params whitened-ELBO value AND gradient parity: rpagp
    svgp.elbo (f32) vs svgp_elbo_torch (f64) at identical data,
    projection, hyper + variational state. Both sides are deterministic
    (full-batch ELBO) — agreement to f32 roundoff, no estimator-noise
    excuse. Returns (v_rpagp, v_torch, rel_err, grad_cosine)."""
    import jax

    from rpagp.models import svgp

    prob = _make_svgp_problem(n, D, J, M, seed=seed)
    spec, params, buffers, X, y = _rpagp_svgp(prob)
    v_r, g_r = jax.value_and_grad(
        lambda p: svgp.elbo(spec, p, buffers, X, y, n))(params)

    pt = _torch_svgp_params(prob, torch.float64, requires_grad=True)
    v_t = svgp_elbo_torch(
        torch.tensor(prob["X"], dtype=torch.float64),
        torch.tensor(prob["y"], dtype=torch.float64), pt,
        torch.tensor(prob["P"], dtype=torch.float64), n,
        jitter_mm=spec.jitter * 10.0)
    v_t.backward()
    g_t = _flat_torch_grad(pt, _SVGP_GRAD_ORDER)
    gj = _flat_rpagp_grad(g_r, _SVGP_GRAD_ORDER)
    cos = float(gj @ g_t / (np.linalg.norm(gj) * np.linalg.norm(g_t)))
    vt = float(v_t.detach())
    rel = abs(float(v_r) - vt) / abs(vt)
    return float(v_r), vt, rel, cos


def svgp_trained_parity(n=500, D=6, J=6, M=24, iters=120, lr=0.05,
                        seed=0):
    """End-to-end SVGP: full-batch Adam on -ELBO/n from the shared init
    in both codebases (full batch -> both trajectories deterministic
    and step-comparable, same arithmetic class f32), then test RMSE/NLL
    from each side's predictive marginals."""
    import jax
    import jax.numpy as jnp
    import optax

    from rpagp.models import svgp
    from rpagp.ops.exact import gaussian_nll

    prob = _make_svgp_problem(n, D, J, M, seed=seed)
    spec, params, buffers, X, y = _rpagp_svgp(prob)
    Xt = jnp.asarray(prob["Xt"], jnp.float32)
    yt = jnp.asarray(prob["yt"], jnp.float32)

    opt = optax.adam(lr)
    opt_state = opt.init(params)
    loss_fn = jax.jit(jax.value_and_grad(
        lambda p: -svgp.elbo(spec, p, buffers, X, y, n) / n))
    losses_j = []
    for _ in range(iters):
        loss, grads = loss_fn(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses_j.append(float(loss))
    mu, var = svgp.svgp_predict(spec, params, buffers, Xt)
    rmse_j = float(jnp.sqrt(jnp.mean((mu - yt) ** 2)))
    nll_j = float(gaussian_nll(yt, mu, var))

    dt = torch.float32
    pt = _torch_svgp_params(prob, dt, requires_grad=True)
    Xt32 = torch.tensor(prob["X"], dtype=dt)
    yt32 = torch.tensor(prob["y"], dtype=dt)
    P32 = torch.tensor(prob["P"], dtype=dt)
    optT = torch.optim.Adam(pt.values(), lr=lr)
    losses_t = []
    jmm = spec.jitter * 10.0
    for _ in range(iters):
        optT.zero_grad()
        loss = -svgp_elbo_torch(Xt32, yt32, pt, P32, n, jitter_mm=jmm) / n
        loss.backward()
        optT.step()
        losses_t.append(float(loss.detach()))
    with torch.no_grad():
        # torch predictive marginals: same whitened q(f) formula
        Z = pt["inducing"]
        Mn = Z.shape[0]
        Kmm = _gram_torch(Z, Z, pt, P32) + jmm * torch.eye(Mn, dtype=dt)
        L = torch.linalg.cholesky(Kmm)
        Xq = torch.tensor(prob["Xt"], dtype=dt)
        Kxz = _gram_torch(Xq, Z, pt, P32)
        A = torch.linalg.solve_triangular(L, Kxz.t(), upper=False)
        raw = pt["var_chol"]
        C = torch.tril(raw, -1) + torch.diag(_sp(torch.diagonal(raw)))
        mu_t = A.t() @ pt["var_mean"] + pt["mean_const"]
        CA = C.t() @ A
        kdiag = _sp(pt["raw_outputscale"]) * torch.ones(Xq.shape[0],
                                                        dtype=dt)
        var_t = (kdiag - (A**2).sum(0) + (CA**2).sum(0)).clamp_min(1e-10)
        var_t = var_t + _sp(pt["raw_noise"]) + NOISE_FLOOR
    rmse_t, nll_t = rmse_nll(torch.tensor(prob["yt"], dtype=dt), mu_t,
                             var_t)
    return {
        "rmse_rpagp": rmse_j, "rmse_torch": rmse_t,
        "nll_rpagp": nll_j, "nll_torch": nll_t,
        "final_loss_rpagp": losses_j[-1], "final_loss_torch": losses_t[-1],
        "d_rmse": abs(rmse_j - rmse_t), "d_nll": abs(nll_j - nll_t),
    }


def main():
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    torch.manual_seed(0)
    rows = []
    for kind, label, kw in [
        ("rbf", "config 1: exact RBF chol (yacht-shape n=308, D=6)",
         dict(n=308, D=6)),
        ("rpa", "config 2: RPA J=10 chol (energy-shape n=691, D=8)",
         dict(n=691, D=8, J=10)),
        ("ski", "config 4 pair: SKI m=32 (grid solver vs torch dense SKI)",
         dict(n=1200, D=8, J=4, m=32)),
    ]:
        v_r, v_t, rel = mll_parity(kind, **kw)
        rows.append((label, "mll@matched-params", f"{v_r:.4f}",
                     f"{v_t:.4f}", f"{rel:.2e}"))
    for kind, label, kw in [
        ("rbf", "config 1 trained (150 Adam iters)", dict(n=308, D=6)),
        ("rpa", "config 2 trained (150 Adam iters)",
         dict(n=691, D=8, J=10)),
        ("ski", "config 4 trained (80 Adam iters)",
         dict(n=1200, D=8, J=4, m=32, iters=80)),
    ]:
        r = trained_parity(kind, **kw)
        rows.append((label, "test RMSE",
                     f"{r['rmse_rpagp']:.5f}", f"{r['rmse_torch']:.5f}",
                     f"{r['d_rmse']:.2e}"))
        rows.append((label, "test NLL",
                     f"{r['nll_rpagp']:.5f}", f"{r['nll_torch']:.5f}",
                     f"{r['d_nll']:.2e}"))
    vals, v_t, rel_mean, rel_worst = bbmm_mll_parity()
    rows.append(("config 3: BBMM CG+SLQ tight knobs (n=2048, 3 seeds)",
                 "mll@matched-params",
                 f"{sum(vals)/len(vals):.4f} (seed-mean)",
                 f"{v_t:.4f}", f"{rel_mean:.2e} / worst {rel_worst:.2e}"))
    cosines, g_rel = bbmm_grad_parity()
    rows.append(("config 3: BBMM gradient vs f64 oracle (n=1024)",
                 "grad cosine / seed-mean rel",
                 f"min cos {min(cosines):.6f}", "1.0 (oracle)",
                 f"{g_rel:.2e}"))
    r = bbmm_trained_parity()
    rows.append(("config 3 trained (60 Adam iters, stochastic MLL)",
                 "test RMSE", f"{r['rmse_rpagp']:.5f}",
                 f"{r['rmse_torch']:.5f}", f"{r['d_rmse']:.2e}"))
    rows.append(("config 3 trained (60 Adam iters, stochastic MLL)",
                 "test NLL", f"{r['nll_rpagp']:.5f}",
                 f"{r['nll_torch']:.5f}", f"{r['d_nll']:.2e}"))
    v_r, v_t, rel, cos = svgp_elbo_parity()
    rows.append(("SVGP: whitened ELBO (n=600, M=32)",
                 "elbo@matched-params", f"{v_r:.4f}", f"{v_t:.4f}",
                 f"{rel:.2e} (grad cos {cos:.6f})"))
    r = svgp_trained_parity()
    rows.append(("SVGP trained (120 full-batch Adam iters)",
                 "test RMSE", f"{r['rmse_rpagp']:.5f}",
                 f"{r['rmse_torch']:.5f}", f"{r['d_rmse']:.2e}"))
    rows.append(("SVGP trained (120 full-batch Adam iters)",
                 "test NLL", f"{r['nll_rpagp']:.5f}",
                 f"{r['nll_torch']:.5f}", f"{r['d_nll']:.2e}"))
    print("| config | quantity | rpagp | torch oracle | |delta| (rel for mll) |")
    print("|---|---|---|---|---|")
    for row in rows:
        print("| " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
