"""Grid-solver vs BBMM crossover sweep with the BLOCKED p x p factor.

Round-2 verdict: `_P_MAX = 6144` (ops/grid_solve.py) rested on an r2h
measurement taken with XLA's builtin Cholesky (p=10240 at 8.5 s/iter vs
BBMM 1.5 s); the MXU-blocked factor landed afterwards (r2i) and roughly
halved the p-space cost, so the crossover needed re-measuring.

For each (J, m) giving p in {5120, 8192, 10240, 16384}, times one jitted
value-and-grad training step of the EXACT grid solver (solver="grid",
amortized sync), and the BBMM CG+SLQ step on the same spec
(solver="bbmm") for the crossover comparison. n defaults to protein
scale (the spec family whose m choice the cap decides).

Run on the real chip:
    python scripts/bench_crossover.py            # full sweep
    N=200000 CG=60 python scripts/bench_crossover.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rpagp.models import exact_gp  # noqa: E402
from rpagp.ops import grid_solve, iterative  # noqa: E402

N = int(os.environ.get("N", 45056))
D = int(os.environ.get("D", 9))
CG = int(os.environ.get("CG", 60))
ITERS = int(os.environ.get("ITERS", 5))

from __graft_entry__ import _flagship_spec  # noqa: E402


def make_problem(n, D, seed=0):
    kx, ky = jax.random.split(jax.random.key(seed))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,),
                                                         jnp.float32)
    return x, y


def time_step(spec, x, y, iters=ITERS):
    params, buffers = exact_gp.init_model(jax.random.key(1), spec,
                                          x.shape[1])
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x, y_train=y)
    use_grid = grid_solve.use_grid_solver(spec, x.shape[0])

    @jax.jit
    def step(params, buffers, x, y, key):
        def obj(p):
            if use_grid:
                return -grid_solve.grid_mll(spec, p, buffers, x, y) \
                    / x.shape[0]
            return -iterative.iterative_mll(spec, p, buffers, x, y, key) \
                / x.shape[0]

        return jax.value_and_grad(obj)(params)

    key = jax.random.key(2)
    t0 = time.perf_counter()
    loss, _ = step(params, buffers, x, y, key)
    _ = float(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    losses = []
    for _i in range(iters):
        key, k = jax.random.split(key)
        loss, _ = step(params, buffers, x, y, k)
        losses.append(loss)
    _ = [float(l) for l in losses]  # ONE sync covers the in-order queue
    return (time.perf_counter() - t0) / iters * 1e3, compile_s


def main():
    x, y = make_problem(N, D)
    print(f"n={N} D={D} cg={CG} iters={ITERS}")
    print("| J | m | p | grid step (ms) | bbmm step (ms) | winner |")
    print("|---|---|---|---|---|---|")
    for J, m in [(20, 256), (16, 512), (20, 512), (16, 1024)]:
        p = J * m
        g_spec = _flagship_spec(grid_size=m, J=J, solver="grid")
        g_ms, g_c = time_step(g_spec, x, y)
        # precond_refresh=1: the preconditioner builds inside every step
        # (the reference's per-evaluation behavior; keeps the comparison
        # self-contained — no out-of-loop refresh bookkeeping)
        b_spec = _flagship_spec(grid_size=m, J=J, solver="bbmm",
                                cg_iters=CG, probes=10, precond_refresh=1)
        try:
            b_ms, b_c = time_step(b_spec, x, y)
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            b_ms, b_c = float("nan"), float("nan")
            print(f"[warn] bbmm J={J} m={m}: {type(e).__name__}: {e}",
                  file=sys.stderr)
        win = "grid" if g_ms < b_ms else "bbmm"
        print(f"| {J} | {m} | {p} | {g_ms:.1f} (compile {g_c:.0f}s) "
              f"| {b_ms:.1f} (compile {b_c:.0f}s) | {win} |")


if __name__ == "__main__":
    main()
