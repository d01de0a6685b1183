"""Headline-step breakdown on the real TPU: where do the 954 ms go?

Times, at the flagship config (n=1.8M, J=20, m=512, cg=20, probes=8):
one SKI MVM (t=9), the Toeplitz FFT alone, the interp directions alone,
the CG forward, and the full value_and_grad step.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rpagp.models import exact_gp  # noqa: E402
from rpagp.ops import iterative, ski  # noqa: E402

n = int(os.environ.get("N", 1_800_000))
D = 11

from __graft_entry__ import _flagship_spec  # noqa: E402

spec = _flagship_spec(grid_size=512, cg_iters=20, probes=8, J=20)
kspec = spec.kernel

kx, ky = jax.random.split(jax.random.key(0))
x = jax.random.normal(kx, (n, D), jnp.float32)
y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,), jnp.float32)
params, buffers = exact_gp.init_model(jax.random.key(1), spec, D)
buffers = exact_gp.prepare_buffers(spec, params, buffers, x)
state = buffers["ski_state"]
t = spec.num_probes + 1
V = jax.random.normal(jax.random.key(3), (n, t), jnp.float32)


def timeit(f, *a, iters=5):
    r = f(*a)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    for _i in range(iters):
        r = f(*a)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


mvm = jax.jit(lambda st, V, kp: ski.ski_mvm(kspec, kp, st, V))
print("ski_mvm t=9      ms:", round(timeit(mvm, state, V, params["kernel"]), 1))

trans = jax.jit(lambda st, V: ski.dense_interp_transpose(st, V))
U = trans(state, V)
print("interp_transpose ms:", round(timeit(trans, state, V), 1))
app = jax.jit(lambda st, G: ski.dense_interp_apply_sum(st, G))
print("interp_apply     ms:", round(timeit(app, state, U), 1))
col = ski.toeplitz_columns(kspec, params["kernel"], state)
toe = jax.jit(ski.sym_toeplitz_matmul)
print("toeplitz fft     ms:", round(timeit(toe, col, U), 1))


@jax.jit
def fwd_only(params, buffers, x, y, key):
    return iterative.iterative_mll(spec, params, buffers, x, y, key)


print("mll forward      ms:", round(
    timeit(fwd_only, params, buffers, x, y, jax.random.key(5)), 1))


@jax.jit
def step(params, buffers, x, y, key):
    return jax.value_and_grad(
        lambda p: -iterative.iterative_mll(spec, p, buffers, x, y, key)
        / x.shape[0])(params)


print("full step        ms:", round(
    timeit(step, params, buffers, x, y, jax.random.key(5)), 1))
