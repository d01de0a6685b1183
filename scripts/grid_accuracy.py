"""MLL accuracy study: SKI grid size + flagship iterative knobs vs the
exact Cholesky oracle.

Questions this answers (VERDICT r1 items #2/#4):
  1. How much MLL/gradient bias does the SKI grid size introduce at
     matched hyperparameters? (picks the bench's grid_size on evidence)
  2. What do the FLAGSHIP knobs (cg 20, tol 1e-2, 8 probes, rank 15)
     cost vs a tight-tolerance estimator and vs exact Cholesky?

Runs at n=16384 (elevators scale) where the exact Cholesky MLL is
computable on-device. Usage: python scripts/grid_accuracy.py [n]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rpagp.models import exact_gp
from rpagp.models.exact_gp import ModelSpec
from rpagp.ops import exact, iterative, kernels
from rpagp.ops.kernels import KernelSpec


def flat(g):
    return jnp.concatenate([jnp.ravel(v) for v in jax.tree_util.tree_leaves(g)])


def rel(a, b):
    return float(abs(a - b) / (abs(b) + 1e-30))


def grad_err(ga, gb):
    fa, fb = flat(ga), flat(gb)
    return float(jnp.linalg.norm(fa - fb) / (jnp.linalg.norm(fb) + 1e-30))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    D, J = 18, 10  # elevators-like shape
    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.5 * jnp.sin(x[:, 1] + x[:, 2]) \
        + 0.1 * jax.random.normal(ky, (n,), jnp.float32)

    kspec_exact = KernelSpec.polynomial(J=J, d=1, base="rbf")
    spec_chol = ModelSpec(kernel=kspec_exact, max_cholesky_size=10**9)
    params, buffers = exact_gp.init_model(jax.random.key(1), spec_chol, D)
    # move off the (symmetric) init point so gradients are generic
    params = dict(params)
    params["kernel"] = dict(params["kernel"])
    params["kernel"]["raw_lengthscale"] = (
        params["kernel"]["raw_lengthscale"]
        + 0.3 * jax.random.normal(jax.random.key(2), (J,))
    )

    def mll_chol(p):
        return exact_gp.exact_mll(spec_chol, p, buffers, x, y) / n

    v_ref, g_ref = jax.jit(jax.value_and_grad(mll_chol))(params)
    v_ref = float(v_ref)
    print(f"n={n} exact Cholesky MLL/n = {v_ref:.6f}")

    def run_iter(label, kspec, cg, tol, probes, rank, key=3, seeds=3):
        spec = ModelSpec(kernel=kspec, max_cholesky_size=256,
                         cg_max_iters=cg, cg_tol=tol,
                         precond_rank=rank, num_probes=probes)
        bufs = exact_gp.prepare_buffers(spec, params, buffers, x)

        @jax.jit
        def vg(p, b, k):
            return jax.value_and_grad(
                lambda q: iterative.iterative_mll(spec, q, b, x, y, k) / n
            )(p)

        vs, gerrs = [], []
        for s in range(seeds):
            v, g = vg(params, bufs, jax.random.key(key + s))
            vs.append(float(v))
            gerrs.append(grad_err(g, g_ref))
        vm = float(np.mean(vs))
        print(f"{label:42s} mll/n={vm:+.6f} bias={vm - v_ref:+.2e} "
              f"sd={np.std(vs):.2e} grad_relerr={np.mean(gerrs):.3f}")

    print("\n-- dense-kernel iterative (no SKI): estimator quality --")
    run_iter("tight (cg300 tol1e-10 p64 r15)", kspec_exact, 300, 1e-10, 64, 15)
    run_iter("flagship knobs (cg20 tol1e-2 p8 r15)", kspec_exact, 20, 1e-2, 8, 15)

    print("\n-- SKI grid size at tight knobs: m-induced bias --")
    for m in (96, 128, 192, 256, 512, 1024, 4096):
        ks = KernelSpec.polynomial(J=J, d=1, base="rbf", ski=True, grid_size=m)
        run_iter(f"ski m={m} tight (cg300 tol1e-10 p64 r15)",
                 ks, 300, 1e-10, 64, 15, seeds=2)

    print("\n-- SKI flagship: full production config --")
    for m in (512, 4096):
        ks = KernelSpec.polynomial(J=J, d=1, base="rbf", ski=True, grid_size=m)
        run_iter(f"ski m={m} flagship (cg20 tol1e-2 p8 r15)",
                 ks, 20, 1e-2, 8, 15)


if __name__ == "__main__":
    main()
