"""Prototype: dense-W blocked SKI interpolation vs the sorted/gather path.

The round-1 headline step is gather-rate-bound (~12 ns/row x 2 (J n)-row
gathers per MVM). Idea: never gather. Build the (block_n x m) cubic
interpolation matrix ON THE FLY from the fractional coordinates (pure
VPU elementwise math — m=512 is only 4 lane tiles) and turn both
interpolation directions into MXU matmuls:

    W^T V : (m x bn) @ (bn x t)   accumulated over blocks
    W G   : (bn x m) @ (m x t)    per block, summed over J

Usage: python scripts/proto_dense_interp.py [n] [bn]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
J, M, T = 20, 512, int(os.environ.get('PROTO_T', 9))
PREC = {'default': jax.lax.Precision.DEFAULT, 'high': jax.lax.Precision.HIGH, 'highest': jax.lax.Precision.HIGHEST}[os.environ.get('PROTO_PREC', 'highest')]


def cubic(s):
    a = jnp.abs(s)
    inner = ((1.5 * a - 2.5) * a) * a + 1.0
    outer = ((-0.5 * a + 2.5) * a - 4.0) * a + 2.0
    return jnp.where(a <= 1.0, inner, jnp.where(a < 2.0, outer, 0.0))


@functools.partial(jax.jit, static_argnames=("m", "bn", "bf16"))
def dense_spread(tfrac, V, m, bn, bf16=True):
    """W^T V: tfrac (J, n), V (t, n) -> (J, t, m)."""
    Jd, n = tfrac.shape
    t = V.shape[0]
    nb = n // bn
    cells = jnp.arange(m, dtype=tfrac.dtype)
    tf = tfrac.reshape(Jd, nb, bn).transpose(1, 0, 2)  # (nb, J, bn)
    Vb = V.reshape(t, nb, bn).transpose(1, 0, 2)  # (nb, t, bn)

    def body(U, inp):
        tfb, vb = inp
        W = cubic(tfb[:, :, None] - cells)  # (J, bn, m)
        if bf16:
            W = W.astype(jnp.bfloat16)
            vb = vb.astype(jnp.bfloat16)
        # (J, bn, m) x (t, bn) -> (J, t, m), contract bn
        U_p = jax.lax.dot_general(
            vb, W, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(None if bf16 else PREC),
        )  # (t, J, m)
        return U + U_p.transpose(1, 0, 2), None

    U0 = jnp.zeros((Jd, t, m), jnp.float32)
    U, _ = jax.lax.scan(body, U0, (tf, Vb))
    return U


@functools.partial(jax.jit, static_argnames=("bn", "bf16"))
def dense_apply(tfrac, G, bn, bf16=True):
    """sum_j W_j G_j: tfrac (J, n), G (J, t, m) -> (t, n)."""
    Jd, n = tfrac.shape
    t, m = G.shape[1], G.shape[2]
    nb = n // bn
    cells = jnp.arange(m, dtype=tfrac.dtype)
    tf = tfrac.reshape(Jd, nb, bn).transpose(1, 0, 2)  # (nb, J, bn)
    Gc = G.astype(jnp.bfloat16) if bf16 else G

    def body(_, tfb):
        W = cubic(tfb[:, :, None] - cells)  # (J, bn, m)
        if bf16:
            W = W.astype(jnp.bfloat16)
        # contract m AND batch-sum j: (J, bn, m) x (J, t, m) -> (bn, t)
        out = jax.lax.dot_general(
            Gc, W, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=(None if bf16 else PREC),
        )  # (J, t, bn)
        return None, jnp.sum(out, axis=0)  # (t, bn)

    _, outs = jax.lax.scan(body, None, tf)  # (nb, t, bn)
    return outs.transpose(1, 0, 2).reshape(t, n)


def sorted_path_ops(n, key):
    """Build the existing SKIState machinery on random data for timing."""
    sys.path.insert(0, ".")
    from rpagp.ops import ski
    from rpagp.ops.kernels import KernelSpec
    from rpagp.ops import kernels as K

    D = 11
    spec = KernelSpec.polynomial(J=J, d=1, base="rbf", ski=True, grid_size=M)
    kp, kb = K.init_kernel_params(jax.random.key(1), spec, D)
    x = jax.random.normal(key, (n, D), jnp.float32)
    state = jax.jit(
        lambda kp, kb, x: ski.build_ski(spec, kp, kb, x, M)
    )(kp, kb, x)
    return spec, kp, state, ski


def timeit(f, *args, iters=5):
    out = f(*args)
    jax.tree_util.tree_map(
        lambda a: float(jnp.asarray(a).ravel()[0].astype(jnp.float32)), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.tree_util.tree_map(
        lambda a: float(jnp.asarray(a).ravel()[0].astype(jnp.float32)), out)
    return (time.perf_counter() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_802_240
    bn = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    n = (n // bn) * bn
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)

    tfrac = jax.random.uniform(k1, (J, n), jnp.float32, 2.0, M - 3.0)
    V = jax.random.normal(k2, (T, n), jnp.float32)
    G = jax.random.normal(k3, (J, T, M), jnp.float32)

    # --- correctness vs a HIGHEST-precision dense oracle at small n ---
    ns = 4096
    tfs = jax.random.uniform(jax.random.key(7), (J, ns), jnp.float32,
                             2.0, M - 3.0)
    Vs = jax.random.normal(jax.random.key(8), (T, ns), jnp.float32)
    # oracle: dense W matmul in f64-ish f32 HIGHEST
    cells = jnp.arange(M, dtype=jnp.float32)
    Wd = cubic(tfs[:, :, None] - cells)  # (J, ns, M)
    U_oracle = jnp.einsum("jnm,tn->jtm", Wd, Vs,
                          precision=jax.lax.Precision.HIGHEST)
    U_fast = dense_spread(tfs, Vs, M, 512, bf16=False)
    err = float(jnp.max(jnp.abs(U_fast - U_oracle)) /
                (jnp.max(jnp.abs(U_oracle)) + 1e-30))
    print(f"spread f32H rel err vs f32 oracle: {err:.2e}")
    Gs = jax.random.normal(jax.random.key(9), (J, T, M), jnp.float32)
    o_oracle = jnp.einsum("jnm,jtm->tn", Wd, Gs,
                          precision=jax.lax.Precision.HIGHEST)
    o_fast = dense_apply(tfs, Gs, 512, bf16=False)
    err2 = float(jnp.max(jnp.abs(o_fast - o_oracle)) /
                 (jnp.max(jnp.abs(o_oracle)) + 1e-30))
    print(f"apply  f32H rel err vs f32 oracle: {err2:.2e}")

    # --- timing at scale ---
    for use_bf16 in (True, False):
        ts = timeit(lambda: dense_spread(tfrac, V, M, bn, bf16=use_bf16))
        ta = timeit(lambda: dense_apply(tfrac, G, bn, bf16=use_bf16))
        tag = "bf16" if use_bf16 else "f32 "
        print(f"n={n} bn={bn} {tag}: dense spread {ts*1e3:8.2f} ms   "
              f"dense apply {ta*1e3:8.2f} ms")

    # --- sorted/gather path at scale for comparison ---
    import os
    if os.environ.get("SKIP_SORTED", "0") == "1":
        return
    spec, kp, state, ski = sorted_path_ops(n, jax.random.key(6))
    Vn = jax.random.normal(jax.random.key(10), (n, T), jnp.float32)
    f_it = jax.jit(lambda s, v: ski.interp_transpose(s, v))
    f_ia = jax.jit(lambda s, g: ski.interp_apply(s, g))
    t_it = timeit(f_it, state, Vn)
    Gg = f_it(state, Vn)
    t_ia = timeit(f_ia, state, Gg)
    print(f"n={n} sorted: interp_transpose {t_it*1e3:8.2f} ms   "
          f"interp_apply {t_ia*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
