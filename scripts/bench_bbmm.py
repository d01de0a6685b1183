"""Quiet-chip per-iteration cost of the config-3 BBMM stack, amortized.

End-to-end runner timings through the axon tunnel swing 2.5x between
back-to-back IDENTICAL runs (measured r4: 102.1 s vs 250.3 s for the
same 256-iter elevators split), so the honest per-iter number is an
in-process amortized median, same discipline as bench.py (r3f).

Times value_and_grad of the iterative MLL (batched preconditioned CG +
SLQ + pivoted-Cholesky preconditioner, probe resampling per step) at
the elevators shape with the rp_bbmm_elevators spec knobs
(J=10, rank 50, cg 30, probes 10).

    python scripts/bench_bbmm.py [n] [rounds] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from rpagp.mll import mll as mll_fn  # noqa: E402
from rpagp.models import exact_gp  # noqa: E402
from rpagp.utils.config import load_spec  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 14939
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    D = 18  # UCI elevators dimensionality
    exp = load_spec("specs/rp_bbmm_elevators.json")
    spec = exp.model
    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(
        ky, (n,), jnp.float32)
    params, buffers = exact_gp.init_model(jax.random.key(1), spec, D)
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x, y_train=y)

    @jax.jit
    def step(p, b, x, y, key):
        return jax.value_and_grad(
            lambda p: -mll_fn(spec, p, b, x, y, key=key) / n)(p)

    keys = jax.random.split(jax.random.key(2), rounds * steps + 1)
    t0 = time.perf_counter()
    v, g = step(params, buffers, x, y, keys[-1])
    float(v)
    print(f"compile+first {time.perf_counter() - t0:.1f}s "
          f"loss/n={float(v):.6f}")

    ts = []
    ki = 0
    for r in range(rounds):
        t0 = time.perf_counter()
        for _ in range(steps):
            v, g = step(params, buffers, x, y, keys[ki])
            ki += 1
        float(v), float(jnp.sum(g["raw_noise"]))
        ts.append((time.perf_counter() - t0) / steps * 1e3)
    ts = sorted(ts)
    print(f"bbmm step n={n}: median {ts[len(ts) // 2]:.1f} ms/iter "
          f"(rounds: {' '.join(f'{t:.1f}' for t in ts)})")


if __name__ == "__main__":
    main()
