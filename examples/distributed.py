"""rpagp multi-chip example: SPMD training + sharded posterior.

Runs on whatever devices are visible — a real TPU slice, or a virtual
CPU mesh for development:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/distributed.py

Training rows shard over a 1-D `data` mesh; the SKI kernel MVM reduces
grid-space partials with one psum over ICI (traffic independent of n);
prediction stays on the mesh (sharded mean solve + sharded LOVE cache).
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# on this image the TPU plugin ignores JAX_PLATFORMS=cpu; pin explicitly
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

import optax  # noqa: E402

import rpagp  # noqa: E402
from rpagp.models import exact_gp  # noqa: E402
from rpagp.parallel import sharding  # noqa: E402


def main():
    mesh = sharding.make_mesh()
    ndev = mesh.devices.size
    print(f"mesh: {ndev} x {mesh.devices.flat[0].platform}")

    k1, k2 = jax.random.split(jax.random.key(0))
    n = (4096 // ndev) * ndev
    D = 8
    x = jax.random.normal(k1, (n, D))
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(k2, (n,))
    x_test = jax.random.normal(jax.random.key(3), (64, D))

    spec = rpagp.ModelSpec(
        kernel=rpagp.KernelSpec.polynomial(J=8, d=1, ski=True,
                                           grid_size=128),
        cg_max_iters=25, precond_rank=0, num_probes=8, love_rank=64,
    )
    params, buffers = exact_gp.init_model(jax.random.key(1), spec, D)

    opt = optax.adam(0.1)
    step = sharding.make_distributed_train_step(spec, mesh, opt, n_global=n)

    xs = sharding.shard_rows(x, mesh)
    ys = sharding.shard_rows(y, mesh)
    params = sharding.replicate(params, mesh)
    buffers = sharding.replicate(buffers, mesh)
    ski_state = sharding.prepare_distributed_ski(spec, params, buffers,
                                                 xs, mesh)
    opt_state = opt.init(params)

    key = jax.random.key(2)
    for i in range(30):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, buffers, opt_state, xs, ys,
                                       k, ski_state)
        if i % 10 == 0:
            print(f"step {i:3d}  loss {float(loss):.4f}")

    predict = sharding.make_distributed_posterior(spec, mesh, n_global=n)
    mu, var = predict(params, buffers, xs, ys, x_test, jax.random.key(4))
    print(f"sharded posterior: mu[:3]={mu[:3]}  var[:3]={var[:3]}")


if __name__ == "__main__":
    main()
