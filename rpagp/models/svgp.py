"""Stochastic variational GP (SVGP) regression — the inducing-point family.

TPU-native rebuild of the reference's SVGP baseline
([U] gp_models/models.py `SVGPRegressionModel` over
[G] gpytorch/models/approximate_gp.py + VariationalStrategy +
CholeskyVariationalDistribution — unverified, SURVEY.md §2.1 "Model
definitions"): the inducing-point variational bound of Hensman et al.
(2013), used in the paper's experiments as the scalable-GP baseline
against RPA-GP.

Whitened parameterization (the GPyTorch default): q(u) =
N(L_MM v_m, L_MM S L_MM^T) with S = C C^T, C lower-triangular — all
solves are against the M x M Cholesky of K_MM (+jitter), M ~ hundreds:
tiny dense linear algebra that XLA maps straight onto the MXU, plus one
n x M cross-kernel per batch. ELBO terms are closed-form for the
Gaussian likelihood.

params (beyond the base kernel/noise/mean):
  inducing   — (M, D) inducing locations (trainable, k-means-free init
               from a random training subset, as the reference does)
  var_mean   — (M,) whitened variational mean
  var_chol   — (M, M) raw lower factor of S (diagonal through softplus
               for positivity; strictly-lower part free)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ops import kernels
from ..ops.exact import LOG_2PI
from ..utils.transforms import softplus
from .exact_gp import ModelSpec, mean_fn, noise_value

_HI = jax.lax.Precision.HIGHEST


def init_svgp_params(key, spec: ModelSpec, x_train, num_inducing: int,
                     dtype=jnp.float32):
    """(params, buffers) for SVGP; inducing points init to a random
    training subset (reference behavior)."""
    D = x_train.shape[1]
    kkey, ikey = jax.random.split(key)
    kp, kb = kernels.init_kernel_params(kkey, spec.kernel, D, dtype)
    M = num_inducing
    idx = jax.random.choice(ikey, x_train.shape[0], (M,), replace=False)
    params = {
        "raw_noise": jnp.zeros((), dtype),
        "mean_const": jnp.zeros((), dtype),
        "kernel": kp,
        "inducing": jnp.asarray(x_train)[idx],
        "var_mean": jnp.zeros((M,), dtype),
        # raw chol: zeros => diag softplus(0) ~ 0.693... start closer to
        # identity-ish prior: use inv_softplus(1.0)
        "var_chol": jnp.zeros((M, M), dtype)
        + jnp.eye(M, dtype=dtype) * 0.5413248,  # softplus(0.5413) = 1.0
    }
    return params, {"kernel": kb}


def _var_chol(params):
    """Lower-triangular C with softplus-positive diagonal."""
    raw = params["var_chol"]
    M = raw.shape[0]
    lower = jnp.tril(raw, -1)
    diag = softplus(jnp.diagonal(raw))
    return lower + jnp.diag(diag)


def _kmm_chol(spec: ModelSpec, params, buffers):
    Z = params["inducing"]
    Kmm = kernels.gram(spec.kernel, params["kernel"], buffers["kernel"], Z, Z)
    Kmm = Kmm + spec.jitter * 10.0 * jnp.eye(Z.shape[0], dtype=Kmm.dtype)
    return jax.lax.linalg.cholesky(Kmm)


def _predictive_qf(spec: ModelSpec, params, buffers, x):
    """q(f(x)): mean and variance of the variational posterior marginals.

    Whitened: A = L_MM^{-1} K_MZ^T (M, n);
      mean = A^T v_m;  var = k_diag - sum(A^2) + sum((C^T A)^2).
    """
    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    Z = params["inducing"]
    L = _kmm_chol(spec, params, buffers)
    Kxz = kernels.gram(kspec, kp, kb, x, Z)  # (n, M)
    A = jax.lax.linalg.triangular_solve(
        L, Kxz.T, left_side=True, lower=True
    )  # (M, n)
    mean = jnp.matmul(A.T, params["var_mean"], precision=_HI)
    C = _var_chol(params)
    CA = jnp.matmul(C.T, A, precision=_HI)  # (M, n)
    kdiag = kernels.gram_diag(kspec, kp, kb, x)
    var = kdiag - jnp.sum(A * A, axis=0) + jnp.sum(CA * CA, axis=0)
    return mean + mean_fn(spec, params, x), jnp.maximum(var, 1e-10)


def elbo(spec: ModelSpec, params, buffers, x_batch, y_batch, n_total: int):
    """Minibatch evidence lower bound (total-data scale).

    ELBO = (n/|B|) sum_i [ log N(y_i | mu_i, s^2) - var_i / (2 s^2) ]
           - KL( N(v_m, C C^T) || N(0, I) )        (whitened KL)
    """
    mu, var = _predictive_qf(spec, params, buffers, x_batch)
    noise = noise_value(params)
    b = x_batch.shape[0]
    lik = -0.5 * (LOG_2PI + jnp.log(noise) + (y_batch - mu) ** 2 / noise)
    lik = lik - 0.5 * var / noise
    lik_term = (n_total / b) * jnp.sum(lik)

    C = _var_chol(params)
    vm = params["var_mean"]
    M = vm.shape[0]
    kl = 0.5 * (
        jnp.sum(C * C) + vm @ vm - M - 2.0 * jnp.sum(jnp.log(jnp.diagonal(C)))
    )
    return lik_term - kl


@functools.partial(jax.jit, static_argnums=(0, 4))
def svgp_predict(spec: ModelSpec, params, buffers, x_test,
                 observation_noise: bool = True):
    """Predictive marginals at x_test (adds likelihood noise by default).
    Jitted as one program — eager dispatch costs a per-op remote compile
    on TPU transports (see mll.posterior)."""
    mu, var = _predictive_qf(spec, params, buffers, x_test)
    if observation_noise:
        var = var + noise_value(params)
    return mu, var


@dataclasses.dataclass
class SVGPTrainResult:
    params: dict
    losses: list


# epoch-program memo: a fresh @jax.jit closure per train_svgp call
# would re-pay the Python trace per call/per split (jit keys its cache
# on function identity — the r4h finding); keyed on everything the
# closure captures. LRU-bounded.
_EPOCH_CACHE: dict = {}
_EPOCH_CACHE_MAX = 16


def _epoch_program(spec: ModelSpec, n: int, steps: int, b: int, lr: float):
    """(jitted epoch fn, optimizer) for the (spec, shape, lr) signature.
    The epoch is ONE XLA program: device-side shuffle + lax.scan over
    the minibatch Adam steps."""
    import optax

    key = (spec, n, steps, b, lr)
    if key in _EPOCH_CACHE:
        return _EPOCH_CACHE[key]
    opt = optax.adam(lr)

    @jax.jit
    def epoch(params, opt_state, x, y, buffers, key):
        # x/y/buffers are ARGS, not closures: closed-over arrays embed
        # as inline MLIR constants — at n~1.8M that is a multi-100MB
        # compile payload (see train.make_step docstring)
        perm = jax.random.permutation(key, n)
        xs = x[perm[: steps * b]].reshape(steps, b, -1)
        ys = y[perm[: steps * b]].reshape(steps, b)

        def step(carry, xy):
            params, opt_state = carry
            xb, yb = xy
            loss, grads = jax.value_and_grad(
                lambda p: -elbo(spec, p, buffers, xb, yb, n) / n
            )(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (xs, ys)
        )
        return params, opt_state, losses.mean()

    if len(_EPOCH_CACHE) >= _EPOCH_CACHE_MAX:
        _EPOCH_CACHE.pop(next(iter(_EPOCH_CACHE)))
    _EPOCH_CACHE[key] = (epoch, opt)
    return epoch, opt


def train_svgp(spec: ModelSpec, params, buffers, x, y, key,
               batch_size: int = 1024, num_epochs: int = 50, lr: float = 0.01,
               verbose: bool = False):
    """Minibatch Adam on -ELBO (the reference's SVGP training loop,
    [U] training_routines.py SVGP branch). Epoch shuffling on device;
    steps-per-epoch static; one jit'd (memoized) epoch program reused
    throughout and across calls of the same signature."""
    n = x.shape[0]
    b = min(batch_size, n)
    steps = max(1, n // b)
    epoch, opt = _epoch_program(spec, n, steps, b, lr)
    opt_state = opt.init(params)
    # persistent AOT: the epoch program's trace is small but its
    # XLA pipeline still cost ~100 s cold at n=1.8M (BENCHMARKS r5d);
    # a warm process deserializes the lowered module instead
    from ..utils.aot_cache import aot_step

    epoch = aot_step(
        epoch, (params, opt_state, x, y, buffers, jax.random.key(0)),
        key_parts=("svgp_epoch", spec, n, steps, b, lr))

    losses = []
    for e in range(num_epochs):
        key, k = jax.random.split(key)
        params, opt_state, loss = epoch(params, opt_state, x, y, buffers, k)
        losses.append(float(loss))
        if verbose and e % 10 == 0:
            print(f"  epoch {e:3d}  -elbo/n {losses[-1]:.5f}")
    return SVGPTrainResult(params=params, losses=losses)


def train_svgp_distributed(spec: ModelSpec, params, buffers, x, y, key,
                           mesh, batch_size: int = 1024,
                           num_epochs: int = 50, lr: float = 0.01,
                           verbose: bool = False):
    """SPMD mirror of train_svgp: each minibatch's rows shard over the
    mesh's data axis; the M-sized variational state replicates (see
    parallel.sharding.distributed_elbo for the collective/gradient
    contract). Same permutation stream as train_svgp for the same key,
    so the trajectories agree to reduction-order roundoff."""
    import optax

    from ..parallel import sharding

    n = x.shape[0]
    ndev = mesh.devices.size
    b = min(batch_size, n)
    b -= b % ndev  # batches must divide across the data axis
    if b <= 0:
        raise ValueError(f"batch_size {batch_size} < mesh size {ndev}")
    steps = max(1, n // b)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    params = sharding.replicate(params, mesh)
    buffers = sharding.replicate(buffers, mesh)
    epoch = sharding.make_distributed_svgp_epoch(
        spec, mesh, opt, n_total=n, steps=steps, batch=b)

    losses = []
    for e in range(num_epochs):
        key, k = jax.random.split(key)
        params, opt_state, loss = epoch(params, buffers, opt_state, x, y, k)
        losses.append(float(loss))
        if verbose and e % 10 == 0:
            print(f"  epoch {e:3d}  -elbo/n {losses[-1]:.5f}")
    return SVGPTrainResult(params=params, losses=losses)
