"""SVGP on-chip cost: amortized ms/step and s/epoch at config-5 scale.

The SVGP family has torch-parity rows (tests/test_torch_parity.py — ELBO
1.4e-7 rel) but was the only solver family without a measured on-chip
cost (VERDICT r4 item 7). This measures the production shape from
SURVEY §6 config 5 / the reference's scalable-GP baseline
([U] gp_models/models.py SVGPRegressionModel): n large, M=512 inducing,
minibatch 4096, RBF-ARD kernel — the whole epoch is ONE XLA program
(lax.scan over minibatches, svgp.train_svgp), so ms/step amortizes the
per-epoch host round trip away.

Usage: python scripts/bench_svgp.py
Env: RPAGP_BENCH_N (default 1_800_000), RPAGP_SVGP_M (512),
     RPAGP_SVGP_BATCH (4096), RPAGP_SVGP_EPOCHS (3 timed).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from rpagp.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    from rpagp.models import svgp
    from rpagp.models.exact_gp import ModelSpec
    from rpagp.ops.kernels import KernelSpec

    n = int(os.environ.get("RPAGP_BENCH_N", 1_800_000))
    M = int(os.environ.get("RPAGP_SVGP_M", 512))
    batch = int(os.environ.get("RPAGP_SVGP_BATCH", 4096))
    epochs = int(os.environ.get("RPAGP_SVGP_EPOCHS", 3))
    D = 11

    spec = ModelSpec(kernel=KernelSpec(family="rbf", ard=True))
    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,),
                                                         jnp.float32)
    params, buffers = svgp.init_svgp_params(jax.random.key(1), spec, x,
                                            num_inducing=M)
    steps = max(1, n // batch)

    # warmup epoch = compile + one full pass
    t0 = time.perf_counter()
    res = svgp.train_svgp(spec, params, buffers, x, y, jax.random.key(2),
                          batch_size=batch, num_epochs=1, lr=0.01)
    t_compile_first = time.perf_counter() - t0

    # timed epochs, warm program (train_svgp re-jits per call — but the
    # persistent compile cache serves the XLA binary; the trace is small)
    t0 = time.perf_counter()
    res = svgp.train_svgp(spec, res.params, buffers, x, y,
                          jax.random.key(3), batch_size=batch,
                          num_epochs=epochs, lr=0.01)
    dt = time.perf_counter() - t0
    epoch_s = dt / epochs
    step_ms = epoch_s / steps * 1e3

    print(json.dumps({
        "metric": f"svgp_M{M}_b{batch}_n{n}",
        "steps_per_epoch": steps,
        "epoch_s": round(epoch_s, 3),
        "step_ms": round(step_ms, 3),
        "compile_plus_first_epoch_s": round(t_compile_first, 1),
        "final_neg_elbo_per_n": res.losses[-1],
    }))


if __name__ == "__main__":
    main()
