"""Roofline attribution for the flagship 43 ms grid step (verdict r2 #8).

The blocked p x p factor (p = 5120) runs ~1.4e11 flops of fwd+VJP work
in ~23 ms (~6 Tf/s effective). This script pins down the practical MXU
ceiling on THIS chip and attributes the remaining gap piece by piece:

  1. GEMM ceiling: a (p, p) @ (p, p) matmul at HIGHEST precision (the
     factor's required precision, CLAUDE.md) and at default (bf16-class)
     precision — the two rooflines.
  2. blocked_cholesky forward at several block sizes (sequential-chain
     length nb = p/b vs GEMM granularity).
  3. forward + VJP (the training step's actual use).
  4. The full grid _factor (Toeplitz chols + G^T S G einsums + C chol)
     fwd and fwd+grad at flagship (J=20, m=256).

Run on the real chip:  python scripts/bench_roofline.py [p] [iters]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rpagp.models import exact_gp  # noqa: E402
from rpagp.ops import grid_solve  # noqa: E402
from rpagp.ops.block_chol import blocked_cholesky  # noqa: E402

HI = jax.lax.Precision.HIGHEST


def timeit(fn, *args, iters=10):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn_j(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 5120
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    key = jax.random.key(0)
    B = jax.random.normal(key, (p, p), jnp.float32)
    A = jnp.matmul(B, B.T, precision=HI) / p + 2.0 * jnp.eye(p)

    gemm_flops = 2.0 * p**3
    chol_flops = p**3 / 3.0

    ms = timeit(lambda a, b: jnp.matmul(a, b, precision=HI), A, B,
                iters=iters)
    print(f"GEMM p={p} HIGHEST: {ms:.2f} ms = {gemm_flops/ms/1e9:.1f} Tf/s")
    ms = timeit(lambda a, b: jnp.matmul(a, b,
                                        precision=jax.lax.Precision.HIGH),
                A, B, iters=iters)
    print(f"GEMM p={p} HIGH:    {ms:.2f} ms = {gemm_flops/ms/1e9:.1f} Tf/s")
    ms = timeit(lambda a, b: jnp.matmul(a, b), A, B, iters=iters)
    print(f"GEMM p={p} default: {ms:.2f} ms = {gemm_flops/ms/1e9:.1f} Tf/s")

    for blk in (256, 512, 1024):
        ms = timeit(lambda a, blk=blk: blocked_cholesky(a, block=blk), A,
                    iters=iters)
        print(f"blocked_chol b={blk} fwd: {ms:.2f} ms = "
              f"{chol_flops/ms/1e9:.1f} Tf/s (nb={p//blk} chain steps)")
    ms = timeit(jax.jit(jnp.linalg.cholesky), A, iters=iters)
    print(f"builtin chol fwd: {ms:.2f} ms = {chol_flops/ms/1e9:.1f} Tf/s")

    for blk in (256, 512, 1024):
        def vg(a, blk=blk):
            return jax.value_and_grad(
                lambda x: jnp.sum(blocked_cholesky(x, block=blk)))(a)

        ms = timeit(vg, A, iters=iters)
        # VJP of the blocked graph ~ 2x fwd GEMM flops (each GEMM has
        # two transposed-GEMM cotangents) => ~p^3 total
        print(f"blocked_chol b={blk} fwd+VJP: {ms:.2f} ms = "
              f"{3.0*chol_flops/ms/1e9:.1f} Tf/s (flops ~ p^3)")

    # the full flagship factor (J=20, m=256 -> p=5120) fwd and fwd+grad
    J, m, n, D = 20, 256, 50_000, 11
    from __graft_entry__ import _flagship_spec

    spec = _flagship_spec(grid_size=m, J=J)
    kx, ky = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,),
                                                         jnp.float32)
    params, buffers = exact_gp.init_model(jax.random.key(2), spec, D)
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x, y_train=y)
    state, S4 = buffers["ski_state"], buffers["ski_uu"]

    def factor_fwd(kp, noise):
        G, Lc = grid_solve._factor(spec, kp, state, S4, noise)
        return jnp.sum(Lc) + jnp.sum(G)

    noise = exact_gp.noise_value(params)
    ms = timeit(factor_fwd, params["kernel"], noise, iters=iters)
    print(f"grid _factor fwd (J={J}, m={m}): {ms:.2f} ms")
    ms = timeit(lambda kp, nz: jax.value_and_grad(factor_fwd)(kp, nz),
                params["kernel"], noise, iters=iters)
    print(f"grid _factor fwd+grad: {ms:.2f} ms")

    def mll_step(prm):
        return jax.value_and_grad(
            lambda q: -grid_solve.grid_mll(spec, q, buffers, x, y) / n)(prm)

    ms = timeit(mll_step, params, iters=iters)
    print(f"full grid_mll value+grad step (n={n}): {ms:.2f} ms")


if __name__ == "__main__":
    main()
