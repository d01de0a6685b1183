"""Interleaved A/B: full-square vs triangular trailing update in the
blocked Cholesky (ops/block_chol._syrk_tril), fwd+grad at flagship p.

The tri update halves-ish the executed syrk flops (docs/BENCHMARKS.md
r3c attributed ~2x flops to the full-square updates); this measures
whether that converts to wall-clock on chip or is hidden by the
sequential k-chain. Interleaved rounds, median — single-batch bench
numbers drift 38-63 ms with tunnel load (r3f).

    python scripts/bench_tri.py [p] [rounds] [steps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from rpagp.ops.block_chol import blocked_cholesky  # noqa: E402


def main():
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 5120
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    B = jax.random.normal(jax.random.key(0), (p, p), jnp.float32)
    A = B @ B.T / p + 0.5 * jnp.eye(p, dtype=jnp.float32)
    A = 0.5 * (A + A.T)
    R = jax.random.normal(jax.random.key(1), (p, p), jnp.float32)

    def loss(A, R):
        L = blocked_cholesky(A)
        return jnp.vdot(L, R) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

    variants = {}
    for tri in ("0", "1", "2", "4"):
        os.environ["RPAGP_TRI_UPDATE"] = tri
        fn = jax.jit(jax.value_and_grad(loss))
        t0 = time.perf_counter()
        v, g = fn(A, R)
        float(v), float(jnp.sum(g))
        print(f"tri={tri}: compile+first {time.perf_counter() - t0:.1f}s "
              f"val={float(v):.6e}")
        variants[tri] = (fn, [])

    for r in range(rounds):
        for tri, (fn, ts) in variants.items():
            t0 = time.perf_counter()
            for _ in range(steps):
                v, g = fn(A, R)
            float(v), float(jnp.sum(g))
            ts.append((time.perf_counter() - t0) / steps * 1e3)

    for tri, (_, ts) in variants.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        print(f"tri={tri}: median {med:7.2f} ms  (rounds: "
              + " ".join(f"{t:.2f}" for t in ts) + ")")


if __name__ == "__main__":
    main()
