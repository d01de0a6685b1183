"""Grid-solver step breakdown on the real TPU: where do the 92 ms go?

The headline step (bench.py, n=1.8M, J=20, m=256 -> p=5120) is the
exact grid-space solver (ops/grid_solve.py). This times its pieces:

  geometry-free per-step work  = Toeplitz chol ladder + G^T S G einsums
                                 + p x p factor (+ its VJP in the step)
  n-proportional work          = the two interp contractions (b, Vw)

Env: N (default 1.8M), M (grid size, default 256), J (default 20).
Timing forces completion with float() per CLAUDE.md.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rpagp.models import exact_gp  # noqa: E402
from rpagp.ops import grid_solve, ski  # noqa: E402

n = int(os.environ.get("N", 1_800_000))
m = int(os.environ.get("M", 256))
J = int(os.environ.get("J", 20))
D = 11

from __graft_entry__ import _flagship_spec  # noqa: E402

spec = _flagship_spec(grid_size=m, J=J)
kspec = spec.kernel

kx, ky = jax.random.split(jax.random.key(0))
x = jax.random.normal(kx, (n, D), jnp.float32)
y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), jnp.float32)
params, buffers = exact_gp.init_model(jax.random.key(1), spec, D)
buffers = exact_gp.prepare_buffers(spec, params, buffers, x, y_train=y)
state = buffers["ski_state"]
S4 = buffers["ski_uu"]
noise = exact_gp.noise_value(params)
p = J * m
print(f"n={n} J={J} m={m} p={p}")


def timeit(f, *a, iters=10):
    """Amortized: sync ONCE after iters dispatches (single-core TPU
    executes in order, so the final sync covers them all). Per-call
    float() pays the ~23.5 ms tunnel RTT per iteration — measured
    2026-08-18, it made a 1.4 ms Pallas leaf read as 24 ms."""
    r = f(*a)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    for _i in range(iters):
        r = f(*a)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


# 1. the hyperparameter-dependent factor alone (fwd)
fac = jax.jit(lambda kp, ns: grid_solve._factor(spec, kp, state, S4, ns))
print("factor fwd       ms:", round(timeit(fac, params["kernel"], noise), 1))

# 2. factor value+grad (the p-space part of the step)
def fac_loss(kp, ns):
    G, Lc = grid_solve._factor(spec, kp, state, S4, ns)
    return jnp.sum(jnp.log(jnp.diagonal(Lc))) + 1e-3 * jnp.sum(G)

facg = jax.jit(jax.value_and_grad(fac_loss, argnums=(0, 1)))
print("factor val+grad  ms:", round(timeit(facg, params["kernel"], noise), 1))

# 3. the two n-sized interp contractions (fwd)
yc = y - jnp.mean(y)
it = jax.jit(lambda V: grid_solve._interp_T(kspec, state, V))
print("interp_T (t=1)   ms:", round(timeit(it, yc[:, None]), 1))
G0 = it(yc[:, None])[:, 0, :]
ia = jax.jit(lambda U: grid_solve._interp_A(kspec, state, U[:, None, :]))
print("interp_A (t=1)   ms:", round(timeit(ia, G0), 1))

# 4. full MLL value — buffers/x/y as ARGUMENTS, not closures (CLAUDE.md:
# closed-over big arrays inline as MLIR constants -> HTTP 413).
mllv = jax.jit(lambda prm, buf, xx, yy: grid_solve.grid_mll(
    spec, prm, buf, xx, yy))
print("mll value        ms:", round(timeit(mllv, params, buffers, x, y), 1))

# 5. full step (value + grad), the headline unit
step = jax.jit(jax.value_and_grad(
    lambda prm, buf, xx, yy: -grid_solve.grid_mll(spec, prm, buf, xx, yy)
    / xx.shape[0]))
print("full step        ms:", round(timeit(step, params, buffers, x, y), 1))
