"""Iterative (large-N) marginal log-likelihood and posterior: the BBMM path.

TPU-native rebuild of GPyTorch's inv_quad_logdet stack
([G] gpytorch/functions/_inv_quad_log_det.py + the custom autograd
Function that backs it — unverified, SURVEY.md §3.2). Forward: ONE batched
preconditioned CG on [y_centered | probes] gives the inv-quad solve and the
Lanczos tridiagonals; SLQ turns those into the logdet estimate. Backward:
a `jax.custom_vjp` whose gradient is the PROBE-BASED TRACE ESTIMATOR —
never reverse-mode through CG iterations:

  d/dθ  y^T A^{-1} y = -α^T (dA/dθ) α + 2 α^T d(y_c)/dθ,   α = A^{-1} y_c
  d/dθ  logdet A    ~= (1/t) Σ_i s_i^T (dA/dθ) m_i,
        s_i = A^{-1} z_i,  m_i = M^{-1} z_i,  z_i ~ N(0, M)

(unbiased since E[z z^T] = M ⇒ E[s^T dA m] = tr(A^{-1} dA M^{-1} M)).
Both reduce to gradients of QUADRATIC FORMS u^T A(θ) v with u, v constant,
evaluated through the blocked kernel MVM — O(n·J) memory, exact autodiff
of the kernel, stochastic only where the reference is stochastic.

The preconditioner is deliberately excluded from gradients (stop-grad):
it only changes estimator variance, not the estimand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import exact_gp
from ..models.exact_gp import ModelSpec
from ..ops import cg as cg_mod
from ..ops import kernels, precond, ski, slq
from ..ops.exact import LOG_2PI


def _kernel_mvm(spec: ModelSpec, params, buffers, x1, x2, V, states=None,
                allow_pallas: bool = False):
    """K(x1, x2) @ V — SKI (W T W^T, FFT) when the spec asks for it,
    otherwise the blocked dense-free Gram MVM (Pallas fused tile kernel
    on TPU for value-only call sites)."""
    if spec.kernel.ski and states is not None:
        st1, st2 = states
        return ski.ski_mvm(spec.kernel, params["kernel"], st1, V, state_rhs=st2)
    return kernels.mvm(
        spec.kernel, params["kernel"], buffers["kernel"], x1, x2, V,
        block_rows=spec.mvm_block_rows, allow_pallas=allow_pallas,
    )


def _ski_state(spec: ModelSpec, params, buffers, x, z_bounds=None,
               use_cache: bool = False):
    """SKI geometry for x (hyperparameter-free; see ops.ski).

    use_cache: consume a geometry precomputed into buffers["ski_state"]
    by models.exact_gp.prepare_buffers — skips a (J, n) argsort + weight
    build per MLL evaluation (significant at HouseElectric scale)."""
    if not spec.kernel.ski:
        return None
    import os
    if (use_cache and buffers.get("ski_state") is not None
            and os.environ.get("RPAGP_NO_SKI_CACHE", "0") != "1"):
        return buffers["ski_state"]
    return ski.build_ski(
        spec.kernel, params["kernel"], buffers["kernel"], x,
        spec.kernel.grid_size, z_bounds=z_bounds,
    )


def _make_A_mvm(spec: ModelSpec, params, buffers, x, noise, state=None):
    """A = K(x, x) + noise I as an MVM closure (the LazyTensor equivalent)."""

    def A_mvm(V):
        KV = _kernel_mvm(spec, params, buffers, x, x, V,
                         states=None if state is None else (state, state),
                         allow_pallas=True)
        return KV + noise * V

    return A_mvm


def _build_pre(spec: ModelSpec, params, buffers, x, noise):
    """Preconditioner (stop-gradded params: value-only object)."""
    kp = jax.lax.stop_gradient(params["kernel"])
    kb = buffers["kernel"]
    ns = jax.lax.stop_gradient(noise)
    return precond.build_preconditioner(spec.kernel, kp, kb, x, ns, spec.precond_rank)


@functools.lru_cache(maxsize=None)
def _make_inv_quad_logdet(spec: ModelSpec):
    """Build the custom_vjp'd (params, buffers, x, y, key) -> (iq, ld)."""

    def fwd_impl(params, buffers, x, y, eps_small, eps_big):
        n = x.shape[0]
        noise = exact_gp.noise_value(params)
        yc = y - exact_gp.mean_fn(spec, params, x)
        state = _ski_state(spec, params, buffers, x, use_cache=True)
        A_mvm = _make_A_mvm(spec, params, buffers, x, noise, state=state)

        # probes z ~ N(0, M) built from PRE-SAMPLED normals (eps passed in
        # as plain float arrays so the custom_vjp boundary stays
        # differentiable-typed; keys have no tangent space)
        if spec.precond_rank > 0:
            if (spec.precond_refresh > 1
                    and buffers.get("precond_cache") is not None):
                # stale-but-consistent preconditioner, refreshed by the
                # train loop every spec.precond_refresh steps (see
                # models.exact_gp.refresh_preconditioner)
                pre = jax.lax.stop_gradient(buffers["precond_cache"])
            else:
                pre = _build_pre(spec, params, buffers, x, noise)
            M_inv = lambda R: precond.apply_inverse(pre, R)
            # pre.noise, NOT the live noise: M = L L^T + pre.noise I must
            # be ONE consistent operator across probes / M_inv / logdet(M)
            # (they differ only when the cache is stale)
            Z = jnp.matmul(pre.L, eps_small,
                           precision=jax.lax.Precision.HIGHEST) \
                + jnp.sqrt(pre.noise) * eps_big
            pre_logdet = pre.logdet
        else:
            nsg = jax.lax.stop_gradient(noise)
            M_inv = lambda R: R / nsg
            Z = jnp.sqrt(nsg) * eps_big
            pre_logdet = n * jnp.log(nsg)
        Z = jax.lax.stop_gradient(Z)

        B = jnp.concatenate([yc[:, None], Z], axis=1)
        res = cg_mod.batched_pcg(
            A_mvm, B, M_inv, max_iters=spec.cg_max_iters, tol=spec.cg_tol
        )
        alpha = res.solution[:, 0]
        S = res.solution[:, 1:]  # probe solves A^{-1} z_i
        MZ = M_inv(Z)  # m_i = M^{-1} z_i

        inv_quad = yc @ alpha
        T = cg_mod.lanczos_tridiags_from_cg(res.alphas[:, 1:], res.betas[:, 1:])
        probe_sq = jnp.sum(Z * MZ, axis=0)
        logdet = slq.slq_logdet_from_tridiags(T, probe_sq, pre_logdet)
        return (inv_quad, logdet), (params, alpha, S, MZ)

    @jax.custom_vjp
    def iql(params, buffers, x, y, eps_small, eps_big):
        (iq, ld), _ = fwd_impl(params, buffers, x, y, eps_small, eps_big)
        return iq, ld

    def iql_fwd(params, buffers, x, y, eps_small, eps_big):
        (iq, ld), (params_r, alpha, S, MZ) = fwd_impl(
            params, buffers, x, y, eps_small, eps_big)
        return (iq, ld), (params_r, buffers, x, y, alpha, S, MZ,
                          eps_small, eps_big)

    def iql_bwd(resids, cots):
        params, buffers, x, y, alpha, S, MZ, eps_small, eps_big = resids
        g_iq, g_ld = cots
        t = S.shape[1]

        # SKI geometry is hyperparameter-free: cached or rebuilt, never
        # differentiated
        state = _ski_state(spec, params, buffers, x, use_cache=True)
        sts = None if state is None else (state, state)

        def h(p, yy):
            noise = exact_gp.noise_value(p)
            yc = yy - exact_gp.mean_fn(spec, p, x)
            # ONE batched MVM for both heads — the t-independent kernel
            # costs (tfrac streaming, one-hot build) are paid once
            K_AM = _kernel_mvm(spec, p, buffers, x, x,
                               jnp.concatenate([alpha[:, None], MZ], axis=1),
                               states=sts, allow_pallas=True)
            Ka, KM = K_AM[:, 0], K_AM[:, 1:]
            # inv-quad total derivative: -α^T A α + 2 α^T y_c
            quad_y = -(alpha @ Ka + noise * (alpha @ alpha)) + 2.0 * (alpha @ yc)
            # logdet trace estimator: (1/t) Σ s_i^T A m_i
            tr = (jnp.sum(S * KM) + noise * jnp.sum(S * MZ)) / t
            return g_iq * quad_y + g_ld * tr

        d_params, d_y = jax.grad(h, argnums=(0, 1))(params, y)
        # None = symbolic-zero cotangents (buffers now carry int arrays —
        # the cached SKI plan — whose tangent type is float0, not zeros)
        return (d_params, None, None, d_y, None, None)

    iql.defvjp(iql_fwd, iql_bwd)
    return iql


def inv_quad_logdet(spec: ModelSpec, params, buffers, x, y, key):
    """(y_c^T A^{-1} y_c, logdet A) with estimator-defined gradients."""
    k1, k2 = jax.random.split(key)
    n = x.shape[0]
    rank = spec.precond_rank if spec.precond_rank > 0 else 0
    eps_small = jax.random.normal(k1, (rank, spec.num_probes), x.dtype)
    eps_big = jax.random.normal(k2, (n, spec.num_probes), x.dtype)
    return _make_inv_quad_logdet(spec)(params, buffers, x, y, eps_small, eps_big)


def iterative_mll(spec: ModelSpec, params, buffers, x, y, key):
    """Large-N marginal log-likelihood via BBMM CG + SLQ."""
    n = x.shape[0]
    iq, ld = inv_quad_logdet(spec, params, buffers, x, y, key)
    return -0.5 * (iq + ld + n * LOG_2PI)


def iterative_posterior(
    spec: ModelSpec,
    params,
    buffers,
    x_train,
    y_train,
    x_test,
    observation_noise: bool = True,
    var_chunk: int = 256,
    var_tol: float = 1e-2,
):
    """Posterior predictive by CG solves (reference analog: eval-mode
    prediction strategy with CG mean cache; variance by chunked batched CG
    against K(x_train, x_test) columns — LOVE cache lands in a later
    stage, SURVEY.md §2.2 row 'LOVE predictive variances').
    """
    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    n, n_test = x_train.shape[0], x_test.shape[0]
    noise = exact_gp.noise_value(params)
    yc = y_train - exact_gp.mean_fn(spec, params, x_train)

    # SKI: one shared grid covering train+test projections so the
    # cross-covariance W_test T W_train^T is consistent
    st_train = st_test = None
    if spec.kernel.ski:
        z_tr = ski.project(kspec, kp, kb, x_train)
        z_te = ski.project(kspec, kp, kb, x_test)
        lo = jnp.minimum(jnp.min(z_tr, axis=1), jnp.min(z_te, axis=1))
        hi = jnp.maximum(jnp.max(z_tr, axis=1), jnp.max(z_te, axis=1))
        st_train = _ski_state(spec, params, buffers, x_train, z_bounds=(lo, hi))
        st_test = _ski_state(spec, params, buffers, x_test, z_bounds=(lo, hi))
    A_mvm = _make_A_mvm(spec, params, buffers, x_train, noise, state=st_train)

    if spec.precond_rank > 0:
        pre = _build_pre(spec, params, buffers, x_train, noise)
        M_inv = lambda R: precond.apply_inverse(pre, R)
    else:
        M_inv = None

    # mean cache: α = A^{-1} y_c (one tight-tolerance CG solve)
    res = cg_mod.batched_pcg_while(
        A_mvm, yc[:, None], M_inv, max_iters=4 * spec.cg_max_iters, tol=1e-4
    )
    alpha = res.solution[:, 0]
    cross_states = None if st_train is None else (st_test, st_train)
    mu = _kernel_mvm(spec, params, buffers, x_test, x_train, alpha[:, None],
                     states=cross_states, allow_pallas=True)[:, 0]
    mu = mu + exact_gp.mean_fn(spec, params, x_test)

    if spec.love_rank > 0:
        # LOVE path: one Lanczos cache, then one cross-MVM per test batch
        from . import love

        cache = love.build_love_cache(
            A_mvm, yc, noise, spec.love_rank, alpha=alpha
        )
        K_star_Q = _kernel_mvm(
            spec, params, buffers, x_test, x_train, cache.Q,
            states=cross_states, allow_pallas=True,
        )  # (n_test, r)
        kd = kernels.gram_diag(kspec, kp, kb, x_test)
        var = love.love_variance(cache, K_star_Q, kd,
                                 observation_noise=observation_noise)
        return mu, var

    # variance: chunk the test points; each chunk is one batched CG
    nc = -(-n_test // var_chunk)
    pad = nc * var_chunk - n_test
    xt_pad = jnp.pad(x_test, ((0, pad), (0, 0)))
    xt_chunks = xt_pad.reshape(nc, var_chunk, x_test.shape[1])

    def chunk_var(xc):
        # K(x_train, chunk) materialized blockwise via identity MVM
        if st_train is not None:
            m_tr = st_train.m
            st_c = _ski_state(
                spec, params, buffers, xc,
                z_bounds=(st_train.grid_lo + 2.0 * st_train.h,
                          st_train.grid_lo + (m_tr - 3) * st_train.h),
            )
            Kc = _kernel_mvm(spec, params, buffers, x_train, xc,
                             jnp.eye(var_chunk, dtype=x_train.dtype),
                             states=(st_train, st_c))
        else:
            Kc = _kernel_mvm(spec, params, buffers, x_train, xc,
                             jnp.eye(var_chunk, dtype=x_train.dtype),
                             allow_pallas=True)  # (n, c)
        sol = cg_mod.batched_pcg_while(
            A_mvm, Kc, M_inv, max_iters=2 * spec.cg_max_iters, tol=var_tol
        ).solution
        kd = kernels.gram_diag(kspec, kp, kb, xc)
        return kd - jnp.sum(Kc * sol, axis=0)

    var = jax.lax.map(chunk_var, xt_chunks).reshape(-1)[:n_test]
    var = jnp.maximum(var, 1e-10)
    if observation_noise:
        var = var + noise
    return mu, var


def make_predictor(spec: ModelSpec, params, buffers, x_train, y_train,
                   observation_noise: bool = True, grid_margin: float = 0.5):
    """Eval-mode CACHED prediction strategy: build the expensive caches
    ONCE (mean cache alpha = A^{-1} y_c, the LOVE Lanczos cache, the SKI
    train geometry), return `predict(x_test) -> (mu, var)` for repeated
    test batches — each batch then costs one cross-kernel MVM
    (constant-time predictions, Pleiss et al. 2018; reference analog:
    [G] exact_prediction_strategies.py caching on first eval call).

    Requires spec.love_rank > 0 (the cache IS the variance path).

    SKI: the cached grid covers the train projection range EXTENDED by
    `grid_margin` x span each side, so moderately extrapolating test
    batches keep interior taps; points projecting beyond the margin get
    zero tap weight, i.e. revert to the prior — the asymptotically
    correct behavior (and the failure mode is conservative variance,
    never spurious confidence).
    """
    if spec.love_rank <= 0:
        raise ValueError("make_predictor requires spec.love_rank > 0 "
                         "(the LOVE cache is the cached variance path)")
    from . import love

    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    noise = exact_gp.noise_value(params)
    yc = y_train - exact_gp.mean_fn(spec, params, x_train)

    st_train = None
    bounds = None
    if kspec.ski:
        z_tr = ski.project(kspec, kp, kb, x_train)
        lo, hi = jnp.min(z_tr, axis=1), jnp.max(z_tr, axis=1)
        span = hi - lo
        bounds = (lo - grid_margin * span, hi + grid_margin * span)
        st_train = _ski_state(spec, params, buffers, x_train,
                              z_bounds=bounds)
    A_mvm = _make_A_mvm(spec, params, buffers, x_train, noise,
                        state=st_train)
    if spec.precond_rank > 0:
        pre = _build_pre(spec, params, buffers, x_train, noise)
        M_inv = lambda R: precond.apply_inverse(pre, R)
    else:
        M_inv = None

    res = cg_mod.batched_pcg_while(
        A_mvm, yc[:, None], M_inv, max_iters=4 * spec.cg_max_iters, tol=1e-4
    )
    alpha = res.solution[:, 0]
    cache = love.build_love_cache(A_mvm, yc, noise, spec.love_rank,
                                  alpha=alpha)
    AQ = jnp.concatenate([alpha[:, None], cache.Q], axis=1)  # (n, 1+r)

    def predict(x_test):
        st_test = (None if st_train is None else
                   _ski_state(spec, params, buffers, x_test,
                              z_bounds=bounds))
        cross_states = None if st_train is None else (st_test, st_train)
        # ONE cross-kernel MVM per batch: columns [alpha | Q]
        C = _kernel_mvm(spec, params, buffers, x_test, x_train, AQ,
                        states=cross_states, allow_pallas=True)
        mu = C[:, 0] + exact_gp.mean_fn(spec, params, x_test)
        kd = kernels.gram_diag(kspec, kp, kb, x_test)
        var = love.love_variance(cache, C[:, 1:], kd,
                                 observation_noise=observation_noise)
        return mu, var

    return predict


def iterative_posterior_cov(spec: ModelSpec, params, buffers, x_train,
                            y_train, x_test, observation_noise: bool = False):
    """Posterior (mean, FULL covariance) at a test batch on the BBMM path
    (reference analog: [G] exact_prediction_strategies.py predictive
    covar — LOVE when spec.love_rank > 0, else n_test CG solves against
    the cross-covariance columns). Intended for MODEST test batches
    (the covariance is (n_test, n_test)); the prior test block uses the
    exact Gram even under SKI — at batch sizes where a dense covariance
    makes sense, exactness beats interpolation consistency.
    """
    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    noise = exact_gp.noise_value(params)
    yc = y_train - exact_gp.mean_fn(spec, params, x_train)

    st_train = st_test = None
    if kspec.ski:
        z_tr = ski.project(kspec, kp, kb, x_train)
        z_te = ski.project(kspec, kp, kb, x_test)
        lo = jnp.minimum(jnp.min(z_tr, axis=1), jnp.min(z_te, axis=1))
        hi = jnp.maximum(jnp.max(z_tr, axis=1), jnp.max(z_te, axis=1))
        st_train = _ski_state(spec, params, buffers, x_train, z_bounds=(lo, hi))
        st_test = _ski_state(spec, params, buffers, x_test, z_bounds=(lo, hi))
    A_mvm = _make_A_mvm(spec, params, buffers, x_train, noise, state=st_train)
    if spec.precond_rank > 0:
        pre = _build_pre(spec, params, buffers, x_train, noise)
        M_inv = lambda R: precond.apply_inverse(pre, R)
    else:
        M_inv = None

    res = cg_mod.batched_pcg_while(
        A_mvm, yc[:, None], M_inv, max_iters=4 * spec.cg_max_iters, tol=1e-4
    )
    alpha = res.solution[:, 0]
    cross_states = None if st_train is None else (st_test, st_train)
    mu = _kernel_mvm(spec, params, buffers, x_test, x_train, alpha[:, None],
                     states=cross_states)[:, 0]
    mu = mu + exact_gp.mean_fn(spec, params, x_test)

    K_ss = kernels.gram(kspec, kp, kb, x_test, x_test)
    if spec.love_rank > 0:
        from . import love

        cache = love.build_love_cache(A_mvm, yc, noise, spec.love_rank,
                                      alpha=alpha)
        K_star_Q = _kernel_mvm(spec, params, buffers, x_test, x_train,
                               cache.Q, states=cross_states)
        cov = love.love_covariance(cache, K_star_Q, K_ss)
    else:
        # K(train, test) columns via identity MVM, then one batched CG
        eye = jnp.eye(x_test.shape[0], dtype=x_train.dtype)
        Kc = _kernel_mvm(spec, params, buffers, x_train, x_test, eye,
                         states=None if st_train is None
                         else (st_train, st_test))
        sol = cg_mod.batched_pcg_while(
            A_mvm, Kc, M_inv, max_iters=4 * spec.cg_max_iters, tol=1e-4
        ).solution
        cov = K_ss - jnp.matmul(Kc.T, sol,
                                precision=jax.lax.Precision.HIGHEST)
        cov = 0.5 * (cov + cov.T)
    if observation_noise:
        cov = cov + noise * jnp.eye(cov.shape[0], dtype=cov.dtype)
    return mu, cov
