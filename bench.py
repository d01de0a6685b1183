"""Benchmark: flagship RPA-GP MLL-step wall-clock on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The driver metric (BASELINE.md): MLL-step wall-clock for RPA-GP with SKI
MVMs at large n. This bench runs the flagship J=20, grid-256 SKI
value-and-grad step at HouseElectric scale unless RPAGP_BENCH_N
overrides. The solver is whatever the spec dispatches to — since r2g
that is the EXACT grid-space Woodbury solver (ops/grid_solve.py: no
CG, no SLQ, deterministic plain-autodiff gradients ~1000x closer to the
oracle than the probe estimator). RPAGP_BENCH_SOLVER=bbmm benches the
reference-style BBMM CG(20) + SLQ(8 probes) estimator path instead.

Grid size: m=256 is evidence-based, not a speed hack — the grid-size
study (scripts/grid_accuracy.py + the r2c knee extension,
docs/BENCHMARKS.md) shows the MLL bias at matched hyperparameters is
IDENTICAL for m=96..4096 at n=16k (the SLQ probe estimator's ~1.5e-4
floor dominates), and at n=200k the m=256 and m=2048 MLLs agree to
1.2e-7/datum at tight knobs. m=256 keeps a >2.5x spacing margin over
the measured knee even after the ~1.2x z-span growth from the 16k study
scale to HouseElectric's 1.8M.

vs_baseline: speedup vs the reference step time. No real A100 GPyTorch
number was ever readable (BASELINE.md provenance), so the reference is
min(1.0 s A100 stand-in budget, measured torch-CPU reference step from
BASELINE.json.published if present) — the min keeps the comparison
conservative: a slow CPU measurement can never inflate our speedup.
See reference_step_s().
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from rpagp.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()  # bench pays one cold compile per image, not per run

REFERENCE_STEP_S = 1.0  # A100 stand-in budget (see module docstring)


def reference_step_s(n: int) -> float:
    """Reference step time to compare against, CONSERVATIVELY.

    BASELINE.json.published now carries MEASURED torch-CPU numbers for
    the reference implementation (scripts/torch_baseline.py; this
    machine has 1 CPU core — a floor, not an A100 proxy). To keep
    vs_baseline honest we use the SMALLER of the measured reference and
    the 1.0 s A100 stand-in: the torch-CPU number can only make the
    reference look slower, never us faster."""
    if n != 1_800_000:
        return REFERENCE_STEP_S  # published config-5 is 1.8M-only
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "BASELINE.json")) as f:
            pub = json.load(f).get("published", {})
        meas = pub["torch_cpu_measured"]["houseelectric_rpa_j20_ski"]["step_s"]
        return min(REFERENCE_STEP_S, float(meas))
    except (OSError, KeyError, TypeError, ValueError):
        return REFERENCE_STEP_S


def main():
    from rpagp.models import exact_gp
    from rpagp.ops import grid_solve, iterative

    n = int(os.environ.get("RPAGP_BENCH_N", 1_800_000))
    D = 11
    from __graft_entry__ import _flagship_spec

    probes = int(os.environ.get("RPAGP_BENCH_PROBES", 8))
    grid = int(os.environ.get("RPAGP_BENCH_GRID", 256))
    solver = os.environ.get("RPAGP_BENCH_SOLVER", "auto")
    spec = _flagship_spec(grid_size=grid, cg_iters=20, probes=probes,
                          J=20, solver=solver)

    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), jnp.float32)
    params, buffers = exact_gp.init_model(jax.random.key(1), spec, D)
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x, y_train=y)
    use_grid = grid_solve.use_grid_solver(spec, n)

    @jax.jit
    def step(params, buffers, x, y, key):
        # buffers/x/y are ARGS, not closures: closure constants embed the
        # multi-GB SKI geometry into the compiled module (see train.make_step)
        def obj(p):
            if use_grid:
                return -grid_solve.grid_mll(spec, p, buffers, x, y) / x.shape[0]
            return -iterative.iterative_mll(spec, p, buffers, x, y, key) \
                / x.shape[0]

        return jax.value_and_grad(obj)(params)

    key = jax.random.key(2)
    # warmup / compile (float() forces a host transfer: on the axon
    # plugin block_until_ready can return before device work completes)
    loss, grads = step(params, buffers, x, y, key)
    _ = float(loss)

    refresh = spec.precond_refresh if not use_grid else 1
    # with preconditioner caching (refresh every k steps), time exactly
    # one refresh per k steps so the reported ms/step carries the true
    # amortized cost
    default_iters = refresh if refresh > 1 else 5
    iters = int(os.environ.get("RPAGP_BENCH_ITERS", default_iters))
    # MEDIAN over timed batches: back-to-back single-batch runs swing
    # 38-63 ms with axon-tunnel / shared-chip load drift (BENCHMARKS
    # r3d); the median of several short batches inside one process is
    # the drift-robust estimate an interleaved A/B converges to.
    batches = int(os.environ.get("RPAGP_BENCH_BATCHES", 4))
    # pre-split the per-step keys OUTSIDE the timed region: each
    # jax.random.split is an extra device-op dispatch per iteration, and
    # on the axon tunnel dispatch latency is not free
    keys = list(jax.random.split(key, batches * iters))
    batch_ms = []
    for bi in range(batches):
        t0 = time.perf_counter()
        losses = []
        for i in range(iters):
            if refresh > 1 and i % refresh == 0:
                buffers = exact_gp.refresh_preconditioner(spec, params,
                                                          buffers, x)
            loss, grads = step(params, buffers, x, y, keys[bi * iters + i])
            losses.append(loss)
        # sync ONCE after all dispatches: a single-chip queue executes
        # in order, so the final transfer covers every step. Per-step
        # float() added the ~23.5 ms axon-tunnel RTT to EVERY iteration
        # (measured 2026-08-18: 91 ms/step per-step-synced vs 66.5 ms
        # amortized for the identical program) — transport latency, not
        # step cost.
        _ = [float(l) for l in losses]
        batch_ms.append((time.perf_counter() - t0) / iters)
    dt = sorted(batch_ms)[len(batch_ms) // 2]

    # drift bounds IN the artifact: axon-tunnel load swings identical
    # back-to-back runs 31-38 ms (CLAUDE.md; VERDICT r4 weak #3 — the
    # r4 driver artifact read 37.25 against quiet-window 31.7-33.2 with
    # no way to tell "regressed" from "windy window" post hoc). min_ms
    # is the least-contended batch this process saw; a wide
    # (max-min)/min marks a windy window.
    print(
        json.dumps(
            {
                "metric": f"rpagp_J20_ski_mll_step_n{n}",
                "value": round(dt * 1e3, 3),
                "unit": "ms/step",
                "vs_baseline": round(reference_step_s(n) / dt, 3),
                "min_ms": round(min(batch_ms) * 1e3, 3),
                "max_ms": round(max(batch_ms) * 1e3, 3),
                "batches_ms": [round(b * 1e3, 2) for b in batch_ms],
            }
        )
    )


if __name__ == "__main__":
    main()
