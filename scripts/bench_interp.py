import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from rpagp.ops import ski, pallas_interp as pi
from rpagp.ops.kernels import KernelSpec
from rpagp.ops import kernels

print("backend:", jax.default_backend())
J, n, m, t, D = 20, 1_800_000, 512, 9, 11
key = jax.random.key(0)
x = jax.random.normal(key, (n, D))
spec = KernelSpec.polynomial(J=J, d=1, ski=True, grid_size=m)
kp, kb = kernels.init_kernel_params(key, spec, D)
state = ski.build_ski(spec, kp, kb, x, m)
V = jax.random.normal(jax.random.key(1), (n, t))
G = jax.random.normal(jax.random.key(2), (J, t, m))

n_pad = -(-n // pi.BN) * pi.BN
tf = jnp.pad(state.tfrac, ((0,0),(0,n_pad-n)), constant_values=-100.0)
VT = jnp.pad(V.T, ((0,0),(0,n_pad-n)))
tf = jax.device_put(tf); VT = jax.device_put(VT)

def timeit(f, *a, iters=5):
    r = f(*a); _ = float(jnp.sum(r))
    t0 = time.perf_counter()
    for _i in range(iters):
        r = f(*a); _ = float(jnp.sum(r))
    return (time.perf_counter()-t0)/iters*1e3

f_t = jax.jit(lambda tf, VT: pi.transpose_call(tf, VT, m))
f_a = jax.jit(lambda tf, G: pi.apply_sum_call(tf, G))
x_t = jax.jit(lambda st, V: ski._dense_interp_transpose_impl(st, V))
x_a = jax.jit(lambda st, G: ski._dense_interp_apply_sum_impl(st, G))

print("pallas transpose ms:", round(timeit(f_t, tf, VT), 2))
print("pallas apply     ms:", round(timeit(f_a, tf, G), 2))
print("xla    transpose ms:", round(timeit(x_t, state, V), 2))
print("xla    apply     ms:", round(timeit(x_a, state, G), 2))
U1 = f_t(tf, VT); U2 = x_t(state, V)
print("tpu parity transpose:", float(jnp.max(jnp.abs(U1-U2))/jnp.max(jnp.abs(U2))))
o1 = f_a(tf, G)[:, :n].T; o2 = x_a(state, G)
print("tpu parity apply:", float(jnp.max(jnp.abs(o1-o2))/jnp.max(jnp.abs(o2))))
