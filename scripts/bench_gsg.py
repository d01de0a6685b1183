"""Interleaved A/B: einsum vs explicit batched-GEMM layout for the
G^T S G assembly in the grid factor (RPAGP_GSG_DOT, grid_solve.py).

The r4e step attribution put "G^T S G einsums + assembly" at ~4 ms of
the 31.7 ms flagship step, with a recorded ~2 ms tightening idea
(docs/BENCHMARKS.md r4c "GEMM-side einsum tightening" — VERDICT r4
item 4). This measures whether hand-choosing the dot_general batch
layout beats XLA's einsum lowering. Interleaved rounds + median per
the repo's drift discipline (CLAUDE.md).

    python scripts/bench_gsg.py [n] [rounds] [steps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from rpagp.models import exact_gp  # noqa: E402
from rpagp.ops import grid_solve  # noqa: E402
from rpagp.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _flagship_spec  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_800_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    D = 11
    spec = _flagship_spec(grid_size=256, cg_iters=20, probes=8, J=20)
    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,),
                                                         jnp.float32)
    params, buffers = exact_gp.init_model(jax.random.key(1), spec, D)
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x, y_train=y)
    assert grid_solve.use_grid_solver(spec, n)

    variants = {}
    for gsg in ("0", "1"):
        os.environ["RPAGP_GSG_DOT"] = gsg

        @jax.jit
        def step(params, buffers, x, y):
            def obj(p):
                return -grid_solve.grid_mll(spec, p, buffers, x, y) / n

            return jax.value_and_grad(obj)(params)

        t0 = time.perf_counter()
        v, g = step(params, buffers, x, y)
        float(v)
        print(f"gsg_dot={gsg}: compile+first {time.perf_counter() - t0:.1f}s"
              f" loss/n={float(v):.6f}")
        variants[gsg] = (step, [])

    for _ in range(rounds):
        for gsg, (fn, ts) in variants.items():
            t0 = time.perf_counter()
            for _ in range(steps):
                v, g = fn(params, buffers, x, y)
            float(v)
            ts.append((time.perf_counter() - t0) / steps * 1e3)

    for gsg, (_, ts) in variants.items():
        ts = sorted(ts)
        print(f"gsg_dot={gsg}: median {ts[len(ts) // 2]:7.2f} ms/step  "
              "(rounds: " + " ".join(f"{t:.2f}" for t in ts) + ")")


if __name__ == "__main__":
    main()
