"""Dense Gram-MVM shootout on the real TPU (VERDICT r1 weak #5 / next #8):
XLA blocked MVM vs the Pallas fused tile kernel and its experiment knobs
(contraction precision HIGHEST->HIGH, bf16 transcendentals).

Config-3 shape by default (elevators: n=16.4k, J=10, t=11). Prints per-
variant ms/MVM and accuracy vs the XLA HIGHEST oracle. Decides the
default documented in docs/BENCHMARKS.md "Pallas vs XLA".

Run: python scripts/bench_gram.py [--n 16384] [--J 10] [--t 11]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rpagp.ops import kernels, pallas_gram  # noqa: E402
from rpagp.ops.kernels import KernelSpec, init_kernel_params  # noqa: E402


def timed(f, *args, iters=10):
    out = f(*args)
    float(jnp.sum(out))  # force completion (repo rule: float, not block)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, s, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--J", type=int, default=10)
    ap.add_argument("--t", type=int, default=11)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    n, J, t = args.n, args.J, args.t

    spec = KernelSpec.polynomial(J=J, d=1, base="rbf")
    kp, kb = init_kernel_params(jax.random.key(0), spec, 18)
    x = jax.random.normal(jax.random.key(1), (n, 18), jnp.float32)
    V = jax.random.normal(jax.random.key(2), (n, t), jnp.float32)

    z = kernels._projected_coords(spec, kp, kb, x).T  # (n, J) scaled
    w = kernels._component_scales(spec, kp, jnp.float32)

    xla = jax.jit(lambda V: kernels.mvm(spec, kp, kb, x, x, V,
                                        allow_pallas=False))
    variants = {
        "xla_blocked(HIGHEST)": xla,
        "pallas prec=highest": jax.jit(
            lambda V: pallas_gram.projected_gram_mvm(z, z, w, V)),
        "pallas prec=default": jax.jit(
            lambda V: pallas_gram.projected_gram_mvm(z, z, w, V,
                                                     prec="default")),
        "pallas hi+bf16exp": jax.jit(
            lambda V: pallas_gram.projected_gram_mvm(
                z, z, w, V, bf16_exp=True)),
        "pallas def+bf16exp": jax.jit(
            lambda V: pallas_gram.projected_gram_mvm(
                z, z, w, V, prec="default", bf16_exp=True)),
    }

    ref = None
    for name, f in variants.items():
        ms, _, out = timed(f, V, iters=args.iters)
        o = np.asarray(out, np.float64)
        if ref is None:
            ref = o
            err = 0.0
        else:
            err = float(np.max(np.abs(o - ref)) / np.max(np.abs(ref)))
        print(f"{name:26s} {ms:8.2f} ms/MVM   relerr_vs_xla={err:.2e}")


if __name__ == "__main__":
    main()
