"""Shootout: builtin vs blocked (MXU-GEMM) Cholesky at flagship p.

Measures forward and value+grad time of jnp.linalg.cholesky vs
ops/block_chol.blocked_cholesky over a block-size sweep, plus the
integrated _chol_with_fallback fast path. Run on the real chip:

    python scripts/bench_chol.py [p] [iters]

Timing forces completion with float(), per CLAUDE.md.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from rpagp.ops import grid_solve  # noqa: E402
from rpagp.ops.block_chol import blocked_cholesky  # noqa: E402


def timeit(fn, *args, iters=10):
    fn_j = jax.jit(fn)
    t0 = time.perf_counter()
    out = fn_j(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters * 1e3, compile_s


def main():
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 5120
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    key = jax.random.key(0)
    B = jax.random.normal(key, (p, p), jnp.float32)
    A = B @ B.T / p + 0.5 * jnp.eye(p, dtype=jnp.float32)
    A = 0.5 * (A + A.T)
    R = jax.random.normal(jax.random.key(1), (p, p), jnp.float32)

    def grad_of(chol_fn):
        # R passed as an ARGUMENT, not a closure: a closed-over (p, p)
        # array inlines as an MLIR constant — HTTP 413 at p=10240
        # (CLAUDE.md trap, measured 2026-08-18).
        def loss(A, R):
            L = chol_fn(A)
            return jnp.vdot(L, R) + 2.0 * jnp.sum(
                jnp.log(jnp.diagonal(L)))
        return jax.grad(loss)

    ms, cs = timeit(jnp.linalg.cholesky, A, iters=iters)
    print(f"builtin        fwd  p={p}: {ms:8.2f} ms   (compile {cs:.1f}s)")
    ms, cs = timeit(grad_of(jnp.linalg.cholesky), A, R, iters=iters)
    print(f"builtin        grad p={p}: {ms:8.2f} ms   (compile {cs:.1f}s)")

    for leaf in ("xla", "pallas"):
        for b in (128, 256, 512, 1024):
            if leaf == "xla" and b == 128:
                continue  # 40 sequential XLA chol+trsm pairs: pointless
            fn = lambda A, b=b, leaf=leaf: blocked_cholesky(A, block=b,
                                                            leaf=leaf)
            try:
                ms, cs = timeit(fn, A, iters=iters)
                print(f"blocked b={b:4d} {leaf:7s} fwd  p={p}: {ms:8.2f} ms"
                      f"   (compile {cs:.1f}s)")
                ms, cs = timeit(grad_of(fn), A, R, iters=iters)
                print(f"blocked b={b:4d} {leaf:7s} grad p={p}: {ms:8.2f} ms"
                      f"   (compile {cs:.1f}s)")
                err = float(jnp.max(jnp.abs(fn(A) - jnp.linalg.cholesky(A))))
                print(f"          max|diff vs builtin| = {err:.3e}")
            except Exception as e:  # keep sweeping past a broken variant
                print(f"blocked b={b:4d} {leaf:7s} p={p}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")

    noise = jnp.asarray(0.5, jnp.float32)
    ms, cs = timeit(lambda C: grid_solve._chol_with_fallback(C, noise),
                    A, iters=iters)
    print(f"fallback(fast) fwd  p={p}: {ms:8.2f} ms   (compile {cs:.1f}s)")
    err = float(jnp.max(jnp.abs(
        blocked_cholesky(A) - jnp.linalg.cholesky(A))))
    print(f"max |blocked - builtin| = {err:.3e}")


if __name__ == "__main__":
    main()
