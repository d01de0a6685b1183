"""Experiment runner CLI: datasets x CV splits -> CSV of RMSE/NLL/time.

Rebuild of the reference's entry point ([U] gp_experiment_runner.py —
unverified, SURVEY.md §1 L6 / §3.1): parse args, loop datasets and k-fold
splits, build the model from a JSON spec, train to convergence, evaluate,
and append one CSV row per (dataset, split) with the same column contract
(dataset, split, rmse, nll, train_time, iterations, mll) so downstream
result aggregation carries over.

Usage:
  python -m rpagp.runner --model_spec specs/rp_poly_j10.json \
      --datasets yacht energy --splits 10 --output results.csv
"""

from __future__ import annotations

import argparse
import csv
import math
import functools
import sys
import time

from . import _IMPORT_T0 as _T0  # pre-jax package-import timestamp

import jax
import jax.numpy as jnp

from .mll import mll as mll_fn, posterior as posterior_fn
from .models import exact_gp
from .ops.exact import gaussian_nll
from .train import train_to_convergence
from .utils import datasets as data_mod
from .utils.config import ExperimentSpec, load_spec, make_optimizer

CSV_COLUMNS = [
    "dataset",
    "split",
    "model",
    "n_train",
    "n_test",
    "rmse",
    "nll",
    "mll",
    "train_time_s",
    "iterations",
    "synthetic_data",
]


# per-process memo of (loss_fn, optimizer) keyed by everything their
# closures capture: with equal_train k-folds every split shares one
# train shape, so reusing the SAME function objects lets
# train.make_step's jitted-step memo serve all k splits with ONE
# trace+compile (BENCHMARKS r4g/r4h: trace+compile dominate sweeps).
_FN_CACHE: dict = {}
_FN_CACHE_MAX = 32


def _loss_and_optimizer(spec, n, iterative, train_cfg):
    key = (spec, n, iterative, train_cfg)
    if key not in _FN_CACHE:
        if iterative:
            # stochastic MLL: resample probe vectors every step
            # (reference behavior); train loop smooths patience with an
            # EMA
            fn = (lambda p, b, xx, yy, k:
                  -mll_fn(spec, p, b, xx, yy, key=k) / n)
        else:
            fn = lambda p, b, xx, yy: -mll_fn(spec, p, b, xx, yy) / n
        if len(_FN_CACHE) >= _FN_CACHE_MAX:
            _FN_CACHE.pop(next(iter(_FN_CACHE)))
        _FN_CACHE[key] = (fn, make_optimizer(train_cfg))
    return _FN_CACHE[key]


def _posterior_for_aot(spec, params, buffers, x, y, xt):
    """Module-level posterior entry for the AOT cache (run_split)."""
    return posterior_fn(spec, params, buffers, x, y, xt)


def _posterior_diag_for_aot(spec, params, buffers, x, y, xt):
    """Grid-spec variant: posterior + the jitter-ladder telemetry in ONE
    program. Evaluating factor_diagnostics as its own dispatch cost
    170 s/split eagerly (r5b) or an extra trace+compile jitted; riding
    the posterior program re-uses its trace/compile/AOT entry and the
    factor recompute is ~ms inside it."""
    from .ops import grid_solve

    mu, var = posterior_fn(spec, params, buffers, x, y, xt)
    t_mult_max, c_over = grid_solve.factor_diagnostics_traced(
        spec, params, buffers)
    return mu, var, t_mult_max, c_over


def _pad_rows(a, multiple: int = 64):
    """Pad a row-major array to the next multiple by repeating its last
    row; returns (padded, true_n). k-fold test folds differ by one row
    (they exactly partition the data), so the posterior re-traces and
    re-lowers per split without this; the posterior's (mu, var) are
    per-test-point, so duplicate-row padding + slicing back is EXACT.
    (The train-side mirror is equal_train — BENCHMARKS r4h.)"""
    n = a.shape[0]
    pad = -n % multiple
    if pad == 0:
        return a, n
    return jnp.concatenate(
        [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])]), n


def run_split(exp: ExperimentSpec, split, seed: int = 0,
              distributed: bool = False, comp_shards: int = 1):
    """Train on one split, return metrics dict (SURVEY.md §3.1 inner loop)."""
    x = jnp.asarray(split.train_x)
    y = jnp.asarray(split.train_y)
    xt = jnp.asarray(split.test_x)
    yt = jnp.asarray(split.test_y)
    spec = exp.model

    if exp.model_family == "svgp":
        return _run_split_svgp(exp, x, y, xt, yt, seed,
                               distributed=distributed)
    if distributed:
        return _run_split_distributed(exp, x, y, xt, yt, seed,
                                      comp_shards=comp_shards)

    import os as _os

    timing = _os.environ.get("RPAGP_TIMING", "0") == "1"
    tP = time.perf_counter()
    params, buffers = exact_gp.init_model(jax.random.key(seed), spec, x.shape[1])
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x, y_train=y)
    if timing:
        jax.block_until_ready(buffers)
        print(f"[time] prepare {time.perf_counter() - tP:.1f}s",
              file=sys.stderr)
    n = x.shape[0]
    from .ops import grid_solve

    # the exact grid-space solver is DETERMINISTIC (no probes): plain
    # patience logic, no probe keys, no preconditioner refresh
    grid = grid_solve.use_grid_solver(spec, n)
    iterative = (n > spec.max_cholesky_size or spec.kernel.ski) and not grid
    loss_fn, optimizer = _loss_and_optimizer(spec, n, iterative, exp.train)
    key = jax.random.key(seed + 1) if iterative else None

    refresh = None
    if iterative and spec.precond_refresh > 1 and spec.precond_rank > 0:
        refresh = (
            spec.precond_refresh,
            lambda p, a: (
                exact_gp.refresh_preconditioner(spec, p, a[0], a[1]),
            ) + a[1:],
        )
    t0 = time.perf_counter()
    res = train_to_convergence(
        loss_fn,
        params,
        lr=exp.train.lr,
        max_iters=exp.train.max_iters,
        patience=exp.train.patience,
        rel_tol=exp.train.rel_tol,
        key=key,
        loss_args=(buffers, x, y),
        optimizer=optimizer,
        args_refresh=refresh,
        # persistent AOT: a warm process skips the step's Python
        # trace+lower (~50-100 s for flagship-class graphs, r4g)
        aot_key=(spec, n, iterative, grid, exp.train),
        # chunked convergence reads: the per-step float(loss) sync costs
        # a tunnel RTT (~85 vs 26 ms/iter at protein scale, r5b);
        # trajectory is bit-identical, stop detection lags <= 7 steps.
        # chunk_steps (one scanned program per k steps) measured SLOWER
        # than this per-step loop (30.2 vs 27.1 ms/iter, r5h interleaved
        # A/B) — per-step dispatch overhead is ~1 ms once the loop stops
        # syncing per loss; the scan pays ~3 ms/iter stacking overhead
        sync_every=8,
    )
    train_time = time.perf_counter() - t0

    tQ = time.perf_counter()
    xt_p, nt = _pad_rows(xt)
    # AOT the posterior program too: its trace+lower shares the factor
    # chain with the train step (~50 s flagship-class) and re-pays per
    # process without this; padding makes its shapes sweep-stable. For
    # grid specs the jitter-ladder telemetry rides the SAME program
    # (its own eager dispatch measured 170 s/split at protein scale).
    from .utils.aot_cache import aot_step

    entry = _posterior_diag_for_aot if grid else _posterior_for_aot
    post = aot_step(
        jax.jit(functools.partial(entry, spec)),
        (res.params, buffers, x, y, xt_p),
        key_parts=("posterior+diag" if grid else "posterior", spec, n,
                   int(xt_p.shape[0])),
    )
    out = post(res.params, buffers, x, y, xt_p)
    mu, var = out[0][:nt], out[1][:nt]
    if timing:
        jax.block_until_ready((mu, var))
        print(f"[time] posterior {time.perf_counter() - tQ:.1f}s",
              file=sys.stderr)
    if grid:
        # the ladders are silent by design (discrete stop-gradient
        # choices inside jit): surface once per split whether this run
        # ever needed them, at the params the row reports
        t_mult_max, c_over = float(out[2]), float(out[3])
        if t_mult_max > 1.0 or c_over > 0.0:
            print(
                f"[diag] grid-factor jitter fallback engaged at best "
                f"params: T-ladder x{t_mult_max:.3g}, "
                f"C-chol {c_over:.3g} * noise",
                file=sys.stderr,
            )
    rmse = float(jnp.sqrt(jnp.mean((mu - yt) ** 2)))
    nll = float(gaussian_nll(yt, mu, var))
    return {
        "rmse": rmse,
        "nll": nll,
        # objective AT the returned (best-iterate) params, so the row's
        # mll/rmse/nll all describe the same model (EMA on the
        # stochastic path — VERDICT r4 weak #5)
        "mll": -res.best_loss,
        "train_time_s": train_time,
        "iterations": res.iterations,
        "n_train": int(n),
        "n_test": int(xt.shape[0]),
    }


def _run_split_svgp(exp: ExperimentSpec, x, y, xt, yt, seed: int,
                    distributed: bool = False):
    """SVGP branch: minibatch ELBO training + variational prediction.
    With distributed=True each minibatch's rows shard over the data
    mesh (parallel.sharding.make_distributed_svgp_epoch)."""
    from .models import svgp

    spec = exp.model
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    params, buffers = svgp.init_svgp_params(
        k1, spec, x, num_inducing=min(exp.num_inducing, x.shape[0])
    )
    t0 = time.perf_counter()
    if distributed:
        from .parallel import sharding

        res = svgp.train_svgp_distributed(
            spec, params, buffers, x, y, k2, mesh=sharding.make_mesh(),
            batch_size=exp.batch_size,
            num_epochs=max(1, exp.train.max_iters // 10),
            lr=exp.train.lr,
        )
    else:
        res = svgp.train_svgp(
            spec, params, buffers, x, y, k2,
            batch_size=exp.batch_size,
            num_epochs=max(1, exp.train.max_iters // 10),
            lr=exp.train.lr,
        )
    train_time = time.perf_counter() - t0
    mu, var = svgp.svgp_predict(spec, res.params, buffers, xt)
    rmse = float(jnp.sqrt(jnp.mean((mu - yt) ** 2)))
    nll = float(gaussian_nll(yt, mu, var))
    return {
        "rmse": rmse,
        "nll": nll,
        "mll": -res.losses[-1] if res.losses else float("nan"),
        "train_time_s": train_time,
        "iterations": len(res.losses),
        "n_train": int(x.shape[0]),
        "n_test": int(xt.shape[0]),
    }


def _run_split_distributed(exp: ExperimentSpec, x, y, xt, yt, seed: int,
                           comp_shards: int = 1):
    """Multi-chip branch: row-sharded SPMD training over the full device
    mesh (parallel/sharding.py) and sharded posterior prediction. With
    comp_shards > 1 the mesh is 2-D (data x comp) and kernel components
    are sharded over the comp axis (the TP/EP analog)."""
    from .parallel import sharding

    spec = exp.model
    mesh = sharding.make_mesh(comp=comp_shards)
    ndata = mesh.shape[sharding.AXIS]
    n = (x.shape[0] // ndata) * ndata  # rows must divide the data axis
    x, y = x[:n], y[:n]

    params, buffers = exact_gp.init_model(jax.random.key(seed), spec, x.shape[1])
    # reuse ONE optimizer object across splits: sharding's factory memo
    # keys on optimizer identity, so a fresh optax object per split
    # would defeat the one-trace-per-sweep reuse (VERDICT r4 weak #2)
    opt_key = ("dist_opt", spec, exp.train)
    if opt_key not in _FN_CACHE:
        if len(_FN_CACHE) >= _FN_CACHE_MAX:
            _FN_CACHE.pop(next(iter(_FN_CACHE)))
        _FN_CACHE[opt_key] = make_optimizer(exp.train)
    opt = _FN_CACHE[opt_key]
    step = sharding.make_distributed_train_step(spec, mesh, opt, n_global=n)

    xs = sharding.shard_rows(x, mesh)
    ys = sharding.shard_rows(y, mesh)
    params = sharding.replicate(params, mesh)
    buffers = sharding.replicate(buffers, mesh)
    # exact grid-space solver when the spec dispatches to it (comp-
    # replicated geometry + replicated U^T U Gram + U^T y / U^T 1
    # per-dataset caches), else the BBMM path
    (ski_state, grid_gram, grid_uy, grid_u1,
     grid_vc) = sharding.prepare_distributed_grid(
        spec, params, buffers, xs, mesh, y_sharded=ys)
    if grid_gram is None:
        # SKI geometry is hyperparameter-free: build once per dataset
        ski_state = sharding.prepare_distributed_ski(spec, params, buffers,
                                                     xs, mesh)
    opt_state = opt.init(params)

    from .train import ConvergenceTracker, _warn_if_frozen

    key = jax.random.key(seed + 1)
    t0 = time.perf_counter()
    losses = []
    # BBMM: probes resample every step, so the loss is stochastic and
    # the tracker smooths with an EMA; the grid solver is deterministic
    tracker = ConvergenceTracker(patience=exp.train.patience,
                                 rel_tol=exp.train.rel_tol,
                                 stochastic=grid_gram is None,
                                 best_params=params)
    # chunked convergence reads, same contract as train_to_convergence
    # sync_every=8: one stacked device_get per window instead of a
    # tunnel RTT per step; trajectory identical, stop lags <= 7 steps.
    # (The scanned-chunk variant — make_distributed_train_chunk — lost
    # its single-device A/B to this per-step loop, BENCHMARKS r5h; all
    # finiteness checks run on HOST floats: jnp.isfinite on a python
    # float costs a device sync per iteration, the r5h 2x finding.)
    stop = False
    pending = []
    for i in range(exp.train.max_iters):
        key, k = jax.random.split(key)
        params_prev = params
        params, opt_state, loss = step(params, buffers, opt_state, xs, ys, k,
                                       ski_state, grid_gram, grid_uy,
                                       grid_u1, grid_vc)
        if i == 0:
            _warn_if_frozen(params_prev, params)
        # pair the loss with the params it was evaluated at (train.py
        # ConvergenceTracker contract — not the post-update iterate)
        pending.append((loss, params_prev))
        if len(pending) < 8 and i < exp.train.max_iters - 1:
            continue
        chunk = [float(v) for v in jax.device_get(
            jnp.stack([dl for dl, _ in pending]))]
        for lf, (_, pprev) in zip(chunk, pending):
            losses.append(lf)
            if not math.isfinite(lf) or tracker.update(lf, pprev):
                stop = True
                break
        pending.clear()
        if stop:
            break
    best_params = tracker.best_params
    train_time = time.perf_counter() - t0

    # prediction stays on the mesh: sharded mean solve + sharded LOVE
    # cache (or chunked sharded CG) — the training set is never gathered
    predict = sharding.make_distributed_posterior(spec, mesh, n_global=n)
    xt_p, nt = _pad_rows(jnp.asarray(xt))
    mu, var = predict(best_params, buffers, xs, ys, xt_p,
                      jax.random.key(seed + 2))
    mu, var = mu[:nt], var[:nt]
    rmse = float(jnp.sqrt(jnp.mean((mu - yt) ** 2)))
    nll = float(gaussian_nll(yt, mu, var))
    return {
        "rmse": rmse,
        "nll": nll,
        # objective at the returned best-iterate params (see run_split)
        "mll": (-tracker.best if tracker.best != float("inf")
                else float("nan")),
        "train_time_s": train_time,
        "iterations": len(losses),
        "n_train": int(n),
        "n_test": int(xt.shape[0]),
    }


def main(argv=None):
    # persistent XLA compile cache: the runner's end-to-end cost is
    # ~85% compile without it (BENCHMARKS r4g); RPAGP_COMPILE_CACHE=off
    # disables
    from .utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser(description="RPA-GP experiment runner (TPU-native)")
    ap.add_argument("--model_spec", required=True, help="path to JSON model spec")
    ap.add_argument("--datasets", nargs="+", required=True)
    ap.add_argument("--splits", type=int, default=10, help="k for k-fold CV")
    ap.add_argument("--max_splits", type=int, default=None,
                    help="run only the first m of the k folds")
    ap.add_argument("--output", default="results.csv")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max_points", type=int, default=None)
    ap.add_argument("--distributed", action="store_true",
                    help="row-shard training over all devices (SPMD mesh)")
    ap.add_argument("--comp_shards", type=int, default=1,
                    help="with --distributed: shard kernel components over "
                         "a second mesh axis of this size (J must divide it)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin jax_default_device to cpu:0 (the axon TPU "
                         "plugin ignores JAX_PLATFORMS=cpu; combine with "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                         "to drive --distributed on a virtual CPU mesh)")
    ap.add_argument("--profile", metavar="LOGDIR", default=None,
                    help="write a jax.profiler trace of the first split "
                         "to LOGDIR (view in TensorBoard)")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    exp = load_spec(args.model_spec)
    timing = __import__("os").environ.get("RPAGP_TIMING", "0") == "1"
    if timing:
        # perf_counter has an arbitrary epoch but CLOCK_MONOTONIC is
        # shared process-wide: elapsed since the interpreter's first
        # moments ~= import cost (jax + backend discovery dominate)
        print(f"[time] main_entry {time.perf_counter() - _T0:.1f}s since "
              "module import", file=sys.stderr)
    rows = []
    for ds_name in args.datasets:
        tL = time.perf_counter()
        ds = data_mod.load_dataset(ds_name, max_points=args.max_points)
        if timing:
            print(f"[time] load_dataset({ds_name}) "
                  f"{time.perf_counter() - tL:.1f}s", file=sys.stderr)
        if ds.synthetic:
            print(f"[warn] {ds_name}: no .mat found — synthetic fallback data",
                  file=sys.stderr)
        # equal_train: one train shape across all k folds so ONE
        # trace+compile serves the sweep (BENCHMARKS r4h); library
        # default stays False (exact reference folds)
        for i, split in enumerate(data_mod.kfold_splits(
                ds, k=args.splits, seed=args.seed, equal_train=True)):
            if args.max_splits is not None and i >= args.max_splits:
                break
            if args.profile and i == 0 and not rows:
                from .utils.profiling import trace

                with trace(args.profile):
                    m = run_split(exp, split, seed=args.seed + i,
                                  distributed=args.distributed,
                                  comp_shards=args.comp_shards)
                print(f"[profile] trace written to {args.profile}",
                      file=sys.stderr)
            else:
                m = run_split(exp, split, seed=args.seed + i,
                              distributed=args.distributed,
                              comp_shards=args.comp_shards)
            row = {
                "dataset": ds_name,
                "split": i,
                "model": exp.name,
                "synthetic_data": ds.synthetic,
                **m,
            }
            rows.append(row)
            print(
                f"{ds_name}[{i}] n={m['n_train']} rmse={m['rmse']:.4f} "
                f"nll={m['nll']:.4f} iters={m['iterations']} "
                f"t={m['train_time_s']:.1f}s"
            )

    with open(args.output, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=CSV_COLUMNS)
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f"wrote {len(rows)} rows -> {args.output}")


if __name__ == "__main__":
    main()
