"""Hyperparameter training: Adam on the (negative) marginal log-likelihood.

TPU-native rebuild of the reference's training routines
([U] training_routines.py — `train_to_convergence(model, xs, ys, objective,
max_iter, patience, ...)`; unverified, SURVEY.md §1 L5). The torch pattern
(module.backward + optimizer.step) becomes one jit'd pure step:
`value_and_grad(loss)(params)` + `optax.adam` update — compiled once,
re-used every iteration.

Two loops are provided:
  * train_to_convergence — Python loop with patience-based early stopping
    (host reads the loss each step, like the reference's convergence check).
  * train_fixed — `lax.scan` over a fixed iteration count: zero host sync,
    the whole optimization is ONE XLA program (the benchmark-mode loop; no
    torch equivalent — this is where TPU wins wall-clock).
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Callable

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class TrainResult:
    params: dict
    losses: list
    iterations: int
    converged: bool
    wall_time_s: float
    # objective at the RETURNED params (tracker best; EMA-smoothed on
    # the stochastic path) — losses[-1] is the LAST iterate's loss,
    # which on a patience stop describes params `patience` steps past
    # the returned best (the reference reports the model it returns)
    best_loss: float = float("nan")


# jitted-step memo: jax.jit's in-memory cache keys on the FUNCTION
# OBJECT, so a fresh jit wrapper per train_to_convergence call re-pays
# the full Python trace+lower (~50 s for the flagship-class graph,
# BENCHMARKS r4g) even when the persistent XLA cache skips the compile.
# Memoizing on (loss_fn, optimizer, with_key, env-switches) lets callers
# that reuse their loss_fn/optimizer across calls (the runner reuses
# them across k-fold splits) trace once per process. LRU-bounded;
# identity keys are safe because the cache holds strong refs.
_STEP_CACHE: dict = {}
_STEP_CACHE_MAX = 16

# trace-time env switches that change the compiled program without
# changing (loss_fn, optimizer) identity: fold their resolved values
# into the memo key, else toggling one mid-process would be silently
# ignored while the memo is warm
_ENV_SWITCHES = (
    "RPAGP_PALLAS_LADDER", "RPAGP_LADDER_FUSED", "RPAGP_TRI_UPDATE",
    "RPAGP_PALLAS_CHOL", "RPAGP_PALLAS_GRAM", "RPAGP_NO_PALLAS_INTERP",
    "RPAGP_NO_PALLAS", "RPAGP_NO_SKI_CACHE", "RPAGP_DIST_CHOL",
    "RPAGP_GSG_DOT",
)


def resolve_env_switches() -> tuple:
    """Current values of every RPAGP_* switch read at trace time."""
    import os

    return tuple(os.environ.get(k) for k in _ENV_SWITCHES)


def make_step(loss_fn: Callable, optimizer, with_key: bool = False) -> Callable:
    """Build (memoized) the jit'd (params, opt_state, *loss_args[, key])
    -> (params, opt_state, loss) step.

    loss_args (data, buffers, cached geometry, ...) are TRACED ARGUMENTS,
    not closure constants: closed-over arrays are embedded into the
    compiled module as inline constants, which at large n means
    multi-GB MLIR payloads (observed: remote-compile HTTP 413 / half-hour
    compiles at HouseElectric scale).

    with_key: loss_fn(params, *loss_args, key) — for stochastic MLLs
    whose probe vectors resample every step (the reference's behavior)."""
    try:
        cache_key = (loss_fn, optimizer, with_key, resolve_env_switches())
        if cache_key in _STEP_CACHE:
            return _STEP_CACHE[cache_key]
    except TypeError:  # unhashable loss_fn/optimizer: build uncached
        cache_key = None

    step = _build_step(loss_fn, optimizer, with_key)
    if cache_key is not None:
        if len(_STEP_CACHE) >= _STEP_CACHE_MAX:
            _STEP_CACHE.pop(next(iter(_STEP_CACHE)))
        _STEP_CACHE[cache_key] = step
    return step


def make_chunk(loss_fn: Callable, optimizer, with_key: bool,
               k: int) -> Callable:
    """Build (memoized) ONE jitted program that runs `k` optimizer steps
    back-to-back via lax.scan and returns every step's loss and
    pre-step params.

    Signature: chunk(params, opt_state, *loss_args, key) ->
    (params, opt_state, losses[k], pstack, key_out) where pstack is the
    params pytree with a leading k axis (params BEFORE step j — the
    iterate each loss was evaluated at; GP hyperparameter pytrees are
    tiny, so stacking k copies is ~free) and key_out continues the host
    key stream (the chunk performs the same per-step
    `key, sub = split(key)` the host loop would).

    MEASURED NEGATIVE RESULT (BENCHMARKS r5h) — kept as tested opt-in,
    NOT the default: the scanned chunk reads 30.2 ms/iter vs 27.1 for
    the per-step sync_every loop on the warm protein train call (the
    r5f "57 ms/iter residual = dispatch RTT" hypothesis was wrong; the
    residual was a per-loss jnp.isfinite device sync, since fixed).
    Per-step dispatch overhead is ~1 ms/iter once the loop stops
    syncing per loss; the scan pays ~3 ms/iter stacking/fusion
    overhead. [U] training_routines.py train_to_convergence is the
    contract."""
    try:
        cache_key = ("chunk", loss_fn, optimizer, with_key, k,
                     resolve_env_switches())
        if cache_key in _STEP_CACHE:
            return _STEP_CACHE[cache_key]
    except TypeError:
        cache_key = None

    @jax.jit
    def chunk(params, opt_state, *rest):
        if with_key:
            *args, key = rest
        else:
            args, key = rest, jax.random.key(0)

        def body(carry, _):
            params, opt_state, key = carry
            if with_key:
                key, sub = jax.random.split(key)
                loss, grads = jax.value_and_grad(loss_fn)(params, *args, sub)
            else:
                loss, grads = jax.value_and_grad(loss_fn)(params, *args)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return (new_params, opt_state, key), (loss, params)

        (params, opt_state, key), (dlosses, pstack) = jax.lax.scan(
            body, (params, opt_state, key), None, length=k)
        return params, opt_state, dlosses, pstack, key

    if cache_key is not None:
        if len(_STEP_CACHE) >= _STEP_CACHE_MAX:
            _STEP_CACHE.pop(next(iter(_STEP_CACHE)))
        _STEP_CACHE[cache_key] = chunk
    return chunk


def _build_step(loss_fn: Callable, optimizer, with_key: bool) -> Callable:
    if with_key:

        @jax.jit
        def step(params, opt_state, *rest):
            *args, key = rest
            loss, grads = jax.value_and_grad(loss_fn)(params, *args, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    @jax.jit
    def step(params, opt_state, *args):
        loss, grads = jax.value_and_grad(loss_fn)(params, *args)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


@dataclasses.dataclass
class ConvergenceTracker:
    """Best-loss patience stopping, shared by every train loop (the
    single-device loops here and the runner's distributed loop — the
    logic was previously duplicated and the copies drifted: one lost the
    best==inf guard, silently stopping at exactly `patience` iters with
    the init params as best).

    stochastic=True smooths the raw loss with an EMA before the patience
    comparison (BBMM probe resampling makes the loss noisy); the
    deterministic solvers (Cholesky, grid) compare the raw loss."""

    patience: int
    rel_tol: float
    stochastic: bool = False
    ema_decay: float = 0.8
    best: float = float("inf")
    best_params: object = None  # init params until the first update
    bad: int = 0
    _ema: float | None = None

    def update(self, loss: float, params) -> bool:
        """Record one step's loss; keeps the best (EMA-)loss params.
        Returns True when patience is exhausted (stop training)."""
        crit = loss
        if self.stochastic:
            self._ema = (loss if self._ema is None
                         else self.ema_decay * self._ema
                         + (1.0 - self.ema_decay) * loss)
            crit = self._ema
        # best == inf guard: inf - rel_tol*inf is nan and `x < nan` is
        # always False — without it every step counts as "bad"
        if self.best == float("inf") or \
                crit < self.best - self.rel_tol * max(1.0, abs(self.best)):
            self.best, self.best_params, self.bad = crit, params, 0
            return False
        self.bad += 1
        return self.bad >= self.patience


class _ChunkSlot:
    """Placeholder best_params inside one chunk's tracker pass: records
    the winning step index; the real pytree is materialized with ONE
    device slice per improving chunk (slicing per step would re-pay the
    per-op dispatch the chunk exists to avoid)."""

    __slots__ = ("j",)

    def __init__(self, j: int):
        self.j = j


def _warn_if_frozen(params_prev, params):
    """Zero-gradient stall detection (failure-detection subsystem).

    An Adam step moves every parameter with a nonzero gradient by ~lr
    regardless of gradient scale, so bitwise-unchanged params after the
    FIRST step mean the gradient was exactly zero. With the iterative MLL
    that has one known cause: CG made no progress (best-iterate returned
    the zero initial guess — ops/cg.py), which happens at large n with
    precond_rank=0 where lambda_max ~ O(n) swamps an unpreconditioned
    short CG. The loss alone cannot reveal this (SLQ probe noise still
    jitters it), so training would otherwise burn max_iters silently."""
    moved = any(
        bool(jnp.any(a != b))
        for a, b in zip(jax.tree.leaves(params_prev), jax.tree.leaves(params))
    )
    if not moved:
        import sys

        print(
            "[warn] training stalled at step 0: the optimizer step changed "
            "no parameter (gradient exactly zero). With the iterative MLL "
            "this means CG made no progress on the initial system — enable "
            "preconditioning (spec.precond_rank ~ 15) or raise "
            "cg_max_iters.",
            file=sys.stderr,
        )


def train_to_convergence(
    loss_fn: Callable,
    params,
    lr: float = 0.1,
    max_iters: int = 1000,
    patience: int = 20,
    rel_tol: float = 1e-6,
    verbose: bool = False,
    optimizer=None,
    key=None,
    loss_args=(),
    args_refresh=None,
    aot_key=None,
    sync_every: int = 1,
    chunk_steps: int = 1,
) -> TrainResult:
    """Adam to convergence with patience stopping on the best loss seen.

    Mirrors the reference's `train_to_convergence` contract: stop when the
    loss has not improved by `rel_tol` for `patience` consecutive steps, or
    at `max_iters`.

    key: when given, loss_fn must be loss_fn(params, *loss_args, key) and
    receives a fresh subkey every step (stochastic MLL probe resampling,
    as the reference does); patience then runs on an EMA of the noisy
    loss.
    loss_args: extra traced arguments (data, buffers) — pass large arrays
    HERE rather than closing over them (see make_step).
    args_refresh: optional (every, fn) — every `every` steps, loss_args
    is replaced by fn(params, loss_args) OUTSIDE the jitted step (e.g.
    rebuilding the cached preconditioner at the current hyperparameters,
    spec.precond_refresh; same compiled step keeps running since shapes
    are unchanged).
    aot_key: optional hashable semantic key (e.g. (spec, n, mode,
    train-config)) enabling the persistent jax.export AOT cache — a
    warm process then skips the Python trace+lower of the step graph
    entirely (utils/aot_cache.py). Must determine the traced program
    together with the argument shapes.
    sync_every: read losses from the device every k dispatches instead
    of every step. The per-step float(loss) host sync costs a tunnel
    RTT on remote TPU transports (measured ~85 ms/iter wall vs the
    26 ms amortized step at protein scale, BENCHMARKS r5b); chunked
    reads keep the device queue full. The PARAMETER TRAJECTORY is
    bit-identical — losses are still consumed in order through the
    same tracker — only stop DETECTION lags, so up to k-1 extra steps
    are dispatched and discarded past the stopping point.
    chunk_steps: run k optimizer steps as ONE lax.scan program
    (make_chunk) instead of k dispatches. Opt-in, measured SLOWER than
    the sync_every loop on the warm protein call (30.2 vs 27.1 ms/iter
    — BENCHMARKS r5h; see make_chunk). Same stop-detection lag contract
    as sync_every (<= k-1 extra dispatched steps discarded past the
    stop); the per-step math is the same program text but compiled as
    one module, so the trajectory may differ from the single-step
    program at f32 reduction-order roundoff (like r5c/r5f — tested
    equivalent). When args_refresh is set, the effective chunk is
    gcd(chunk_steps, every) so refreshes stay on chunk boundaries;
    gcd < 2 falls back to the sync_every loop.
    """
    optimizer = optimizer or optax.adam(lr)
    opt_state = optimizer.init(params)
    stochastic = key is not None
    every = args_refresh[0] if args_refresh is not None else 0
    k_eff = 1
    if chunk_steps > 1:
        k_eff = math.gcd(chunk_steps, every) if every else chunk_steps
    if aot_key is not None:
        from .utils.aot_cache import aot_step

    tracker = ConvergenceTracker(patience=patience, rel_tol=rel_tol,
                                 stochastic=stochastic, best_params=params)
    losses = []
    t0 = time.perf_counter()
    converged = False
    diverged = False

    if k_eff > 1:
        chunk = make_chunk(loss_fn, optimizer, stochastic, k_eff)
        if aot_key is not None:
            example = (params, opt_state) + tuple(loss_args)
            if stochastic:
                example = example + (jax.random.key(0),)
            chunk = aot_step(chunk, example, ("chunk", k_eff, aot_key))
        i = 0
        while i < max_iters and not (converged or diverged):
            if args_refresh is not None and i > 0 and i % every == 0:
                loss_args = args_refresh[1](params, loss_args)
            # the final chunk may overshoot max_iters: extra dispatched
            # steps are discarded, exactly the sync_every lag contract
            take = min(k_eff, max_iters - i)
            if stochastic:
                params, opt_state, dl, pstack, key = chunk(
                    params, opt_state, *loss_args, key)
            else:
                params, opt_state, dl, pstack, _ = chunk(
                    params, opt_state, *loss_args)
            if i == 0:
                _warn_if_frozen(jax.tree.map(lambda a: a[0], pstack),
                                jax.tree.map(lambda a: a[1], pstack))
            # ONE device->host transfer per chunk
            chunk_losses = [float(v) for v in jax.device_get(dl)][:take]
            for j, lf in enumerate(chunk_losses):
                losses.append(lf)
                if verbose and (len(losses) - 1) % 50 == 0:
                    print(f"  iter {len(losses) - 1:4d}  loss {lf:.6f}")
                if not math.isfinite(lf):
                    diverged = True
                    break
                if tracker.update(lf, _ChunkSlot(j)):
                    converged = True
                    break
            if isinstance(tracker.best_params, _ChunkSlot):
                jj = tracker.best_params.j
                tracker.best_params = jax.tree.map(
                    lambda a: a[jj], pstack)
            i += take
        return TrainResult(
            params=tracker.best_params,
            losses=losses,
            iterations=len(losses),
            converged=converged,
            wall_time_s=time.perf_counter() - t0,
            best_loss=(tracker.best if tracker.best != float("inf")
                       else float("nan")),
        )

    step = make_step(loss_fn, optimizer, with_key=stochastic)
    if aot_key is not None:
        example = (params, opt_state) + tuple(loss_args)
        if stochastic:
            # aval-only example key: the REAL key stream is untouched,
            # so AOT and non-AOT runs share the exact trajectory
            example = example + (jax.random.key(0),)
        step = aot_step(step, example, aot_key)

    pending = []  # (device loss, params it was evaluated at)
    for i in range(max_iters):
        if args_refresh is not None and i > 0 and i % args_refresh[0] == 0:
            loss_args = args_refresh[1](params, loss_args)
        params_prev = params
        if stochastic:
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, *loss_args, sub)
        else:
            params, opt_state, loss = step(params, opt_state, *loss_args)
        if i == 0:
            _warn_if_frozen(params_prev, params)
        # the step returns loss(params_prev): pair the loss with the
        # params it was EVALUATED at, not the post-update iterate
        # (post-step params were never evaluated; on exact plateaus the
        # patience stop would otherwise return one-Adam-step-past-best)
        pending.append((loss, params_prev))
        if len(pending) < sync_every and i < max_iters - 1:
            continue  # keep the device queue full (see sync_every)
        if len(pending) > 1:
            # ONE device->host transfer for the whole chunk (a float()
            # per loss would pay one tunnel RTT each — the thing
            # sync_every exists to avoid)
            chunk = [float(v) for v in jax.device_get(
                jnp.stack([dl for dl, _ in pending]))]
        else:
            chunk = [float(pending[0][0])]
        for lf, (_, pprev) in zip(chunk, pending):
            losses.append(lf)
            if verbose and (len(losses) - 1) % 50 == 0:
                print(f"  iter {len(losses) - 1:4d}  loss {lf:.6f}")
            if not math.isfinite(lf):
                diverged = True  # return the best params seen
                break
            if tracker.update(lf, pprev):
                converged = True
                break
        pending.clear()
        if converged or diverged:
            break
    return TrainResult(
        params=tracker.best_params,
        losses=losses,
        iterations=len(losses),
        converged=converged,
        wall_time_s=time.perf_counter() - t0,
        best_loss=(tracker.best if tracker.best != float("inf")
                   else float("nan")),
    )


def train_with_checkpointing(
    loss_fn: Callable,
    params,
    checkpoint_dir: str,
    lr: float = 0.1,
    max_iters: int = 1000,
    patience: int = 20,
    rel_tol: float = 1e-6,
    checkpoint_every: int = 100,
    keep: int = 3,
    key=None,
    loss_args=(),
    resume: bool = True,
) -> TrainResult:
    """`train_to_convergence` with periodic checkpoint/resume (the aux
    subsystem the reference lacks — SURVEY.md §5 'checkpoint/resume').

    Same convergence contract as train_to_convergence (patience stopping
    on the best [EMA-smoothed when stochastic] loss, best-params return).
    Checkpoints carry params, best-params, optimizer state, PRNG key,
    step counter AND the convergence state (best/bad/ema), so a resumed
    run continues the patience logic exactly; the full loss history is
    persisted alongside (losses.npy), so `losses` spans ALL segments."""
    import os as _os

    import jax.numpy as _jnp
    import numpy as _np

    from .utils.checkpoint import Checkpointer, load_checkpoint

    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    stochastic = key is not None
    state = {
        "params": params,
        "best_params": params,
        "opt_state": opt_state,
        "key": key if stochastic else jax.random.key(0),
        "step": _jnp.asarray(0),
        "best": _jnp.asarray(_jnp.inf),
        "bad": _jnp.asarray(0),
        "ema": _jnp.asarray(_jnp.nan),
    }
    cp = Checkpointer(checkpoint_dir, every=checkpoint_every, keep=keep)
    losses_path = _os.path.join(checkpoint_dir, "losses.npy")
    start = 0
    losses: list = []
    if resume:
        latest = cp.latest()
        if latest is not None:
            state = load_checkpoint(latest, state)
            start = int(state["step"])
            if _os.path.exists(losses_path):
                losses = list(_np.load(losses_path)[:start])
    params, opt_state, key = state["params"], state["opt_state"], state["key"]
    tracker = ConvergenceTracker(
        patience=patience, rel_tol=rel_tol, stochastic=stochastic,
        best_params=state["best_params"], best=float(state["best"]),
        bad=int(state["bad"]),
        _ema=(None if not _np.isfinite(float(state["ema"]))
              else float(state["ema"])))

    def _save(i, params, opt_state, key):
        path = cp.maybe_save(i, {
            "params": params,
            "best_params": tracker.best_params,
            "opt_state": opt_state,
            "key": key if stochastic else jax.random.key(0),
            "step": _jnp.asarray(i),
            "best": _jnp.asarray(tracker.best),
            "bad": _jnp.asarray(tracker.bad),
            "ema": _jnp.asarray(_jnp.nan if tracker._ema is None
                                else tracker._ema),
        })
        if path is not None:
            _os.makedirs(checkpoint_dir, exist_ok=True)
            _np.save(losses_path, _np.asarray(losses, dtype=_np.float64))
        return path

    step = make_step(loss_fn, optimizer, with_key=stochastic)
    t0 = time.perf_counter()
    converged = False
    i = start
    for i in range(start, max_iters):
        params_prev = params
        if stochastic:
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, *loss_args, sub)
        else:
            params, opt_state, loss = step(params, opt_state, *loss_args)
        loss = float(loss)
        losses.append(loss)
        if not math.isfinite(loss):
            break
        # pair the loss with the params it was evaluated at (see
        # train_to_convergence)
        converged = tracker.update(loss, params_prev)
        _save(i + 1, params, opt_state, key)
        if converged:
            break
    return TrainResult(
        params=tracker.best_params,
        losses=losses,
        iterations=i + 1 - start,
        converged=converged,
        wall_time_s=time.perf_counter() - t0,
        best_loss=(tracker.best if tracker.best != float("inf")
                   else float("nan")),
    )


def train_fixed(
    loss_fn: Callable,
    params,
    lr: float = 0.1,
    num_iters: int = 100,
    optimizer=None,
):
    """Fixed-iteration training as ONE compiled XLA program (lax.scan).

    Returns (params, losses). No host round-trips: the TPU runs all
    `num_iters` Adam steps back-to-back — the right shape for benchmarking
    MLL-step wall-clock (BASELINE.md metric).
    """
    optimizer = optimizer or optax.adam(lr)

    def scan_step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def run(params):
        opt_state = optimizer.init(params)
        (params, _), losses = jax.lax.scan(
            scan_step, (params, opt_state), None, length=num_iters
        )
        return params, losses

    return run(params)
