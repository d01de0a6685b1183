"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4:
the TPU analog of 'test multi-node without a cluster'). Oracles are the
single-device implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from rpagp import KernelSpec, ModelSpec, init_model, exact_mll
from rpagp.ops import kernels, ski
from rpagp.parallel import sharding

def _cpus():
    try:
        return jax.devices("cpu")
    except RuntimeError:
        return []


pytestmark = pytest.mark.skipif(
    len(_cpus()) < 8, reason="needs 8 virtual CPU devices"
)

KEY = jax.random.key(0)
NDEV = 8


def _mesh():
    return sharding.make_mesh(_cpus()[:NDEV])


def _data(n=128, D=4, seed=1):
    kx, ky = jax.random.split(jax.random.key(seed))
    x = jax.random.normal(kx, (n, D))
    y = jnp.sin(2 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,))
    return x, y


def test_ring_mvm_matches_dense():
    mesh = _mesh()
    x, _ = _data(n=160)
    V = jax.random.normal(jax.random.key(3), (160, 5))
    kspec = KernelSpec.polynomial(J=4, d=1)
    kp, kb = kernels.init_kernel_params(KEY, kspec, 4)

    f = jax.shard_map(
        lambda xl, vl: sharding.ring_mvm(kspec, kp, kb, xl, vl),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
        check_vma=False,
    )
    got = np.asarray(jax.jit(f)(x, V))
    want = np.asarray(kernels.gram(kspec, kp, kb, x, x)) @ np.asarray(V)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sharded_ski_mvm_matches_single_device():
    mesh = _mesh()
    x, _ = _data(n=160)
    V = jax.random.normal(jax.random.key(5), (160, 3))
    kspec = KernelSpec.polynomial(J=4, d=1, ski=True, grid_size=64)
    kp, kb = kernels.init_kernel_params(KEY, kspec, 4)

    # single-device oracle with the global grid
    st_global = ski.build_ski(kspec, kp, kb, x, 64)
    want = np.asarray(ski.ski_mvm(kspec, kp, st_global, V))

    def f(xl, vl):
        bounds = sharding._global_z_bounds(kspec, kp, kb, xl)
        st = ski.build_ski(kspec, kp, kb, xl, 64, z_bounds=bounds)
        return sharding.sharded_ski_mvm(kspec, kp, st, vl)

    got = np.asarray(
        jax.jit(
            jax.shard_map(
                f, mesh=mesh, in_specs=(P("data"), P("data")),
                out_specs=P("data"), check_vma=False,
            )
        )(x, V)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_distributed_mll_matches_exact():
    mesh = _mesh()
    x, y = _data(n=128)
    spec = ModelSpec(
        kernel=KernelSpec.polynomial(J=4, d=1),
        cg_max_iters=60, cg_tol=1e-8, precond_rank=0, num_probes=64,
    )
    params, buffers = init_model(KEY, spec, 4)
    want = float(exact_mll(spec, params, buffers, x, y))

    eps = jax.random.normal(jax.random.key(7), (128, 64))
    f = jax.shard_map(
        lambda p, b, xl, yl, el: sharding.distributed_mll(spec, p, b, xl, yl, el),
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    got = float(jax.jit(f)(params, buffers, x, y, eps))
    assert abs(got - want) / abs(want) < 0.05, (got, want)


def test_distributed_train_step_runs_and_learns_ski():
    mesh = _mesh()
    n = 128
    x, y = _data(n=n)
    spec = ModelSpec(
        kernel=KernelSpec.polynomial(J=4, d=1, ski=True, grid_size=64),
        cg_max_iters=30, precond_rank=0, num_probes=8,
    )
    params, buffers = init_model(KEY, spec, 4)
    opt = optax.adam(0.1)
    step = sharding.make_distributed_train_step(spec, mesh, opt, n_global=n)

    xs = sharding.shard_rows(x, mesh)
    ys = sharding.shard_rows(y, mesh)
    params = sharding.replicate(params, mesh)
    buffers = sharding.replicate(buffers, mesh)
    opt_state = opt.init(params)

    losses = []
    key = jax.random.key(11)
    for i in range(10):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, buffers, opt_state, xs, ys, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_distributed_train_chunk_matches_per_step():
    """make_distributed_train_chunk (one scanned program per k steps)
    walks the same trajectory as k make_distributed_train_step
    dispatches: same key stream, same losses (to scan-fusion roundoff),
    pstack[j] = pre-step-j params."""
    mesh = _mesh()
    n = 128
    x, y = _data(n=n)
    spec = ModelSpec(
        kernel=KernelSpec.polynomial(J=4, d=1, ski=True, grid_size=64),
        cg_max_iters=30, precond_rank=0, num_probes=8,
    )
    params0, buffers = init_model(KEY, spec, 4)
    opt = optax.adam(0.1)
    step = sharding.make_distributed_train_step(spec, mesh, opt, n_global=n)
    chunk = sharding.make_distributed_train_chunk(spec, mesh, opt,
                                                  n_global=n, k=6)

    xs = sharding.shard_rows(x, mesh)
    ys = sharding.shard_rows(y, mesh)
    params = sharding.replicate(params0, mesh)
    buffers = sharding.replicate(buffers, mesh)
    opt_state = opt.init(params)

    key = jax.random.key(11)
    ref_losses, ref_pre = [], []
    p, s = params, opt_state
    for i in range(6):
        key, k = jax.random.split(key)
        ref_pre.append(p)
        p, s, loss = step(p, buffers, s, xs, ys, k)
        ref_losses.append(float(loss))

    pc, sc, dl, pstack, key_out = chunk(params, buffers, opt_state, xs, ys,
                                        jax.random.key(11))
    np.testing.assert_allclose(np.asarray(jax.device_get(dl)),
                               ref_losses, rtol=1e-5)
    for la, lb in zip(jax.tree.leaves(pc), jax.tree.leaves(p)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)
    # pstack[2] is the params BEFORE step 2
    mid = jax.tree.map(lambda a: a[2], pstack)
    for la, lb in zip(jax.tree.leaves(mid), jax.tree.leaves(ref_pre[2])):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)
    # key stream continues where the host loop's would
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key_out)),
        np.asarray(jax.random.key_data(key)))


def test_distributed_train_step_with_preconditioner():
    """Dense ring path + sharded Woodbury preconditioner (rank > 0)."""
    mesh = _mesh()
    n = 128
    x, y = _data(n=n)
    spec = ModelSpec(
        kernel=KernelSpec.polynomial(J=4, d=1),
        cg_max_iters=25, precond_rank=10, num_probes=8,
    )
    params, buffers = init_model(KEY, spec, 4)
    opt = optax.adam(0.1)
    step = sharding.make_distributed_train_step(spec, mesh, opt, n_global=n)

    xs = sharding.shard_rows(x, mesh)
    ys = sharding.shard_rows(y, mesh)
    params = sharding.replicate(params, mesh)
    buffers = sharding.replicate(buffers, mesh)
    opt_state = opt.init(params)

    key = jax.random.key(17)
    losses = []
    for _ in range(8):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, buffers, opt_state, xs, ys, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_distributed_mll_with_preconditioner_matches_exact():
    """Value parity of the preconditioned distributed MLL vs dense."""
    mesh = _mesh()
    x, y = _data(n=128)
    spec = ModelSpec(
        kernel=KernelSpec.polynomial(J=4, d=1),
        cg_max_iters=60, cg_tol=1e-8, precond_rank=10, num_probes=64,
    )
    params, buffers = init_model(KEY, spec, 4)
    want = float(exact_mll(spec, params, buffers, x, y))

    from rpagp.models.exact_gp import noise_value
    from rpagp.ops import precond as precond_mod

    pre = precond_mod.build_preconditioner(
        spec.kernel, params["kernel"], buffers["kernel"], x,
        noise_value(params), spec.precond_rank,
    )
    eps_b = jax.random.normal(jax.random.key(7), (128, 64))
    eps_s = jax.random.normal(jax.random.key(8), (spec.precond_rank, 64))

    f = jax.shard_map(
        lambda p, b, xl, yl, el, Lp: sharding.distributed_mll(
            spec, p, b, xl, yl, el,
            pre_L_local=Lp, pre_chol_small=pre.chol_small,
            pre_logdet=pre.logdet, eps_small=eps_s,
        ),
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    got = float(jax.jit(f)(params, buffers, x, y, eps_b, pre.L))
    assert abs(got - want) / abs(want) < 0.05, (got, want)


def test_distributed_gradients_match_exact_direction():
    mesh = _mesh()
    x, y = _data(n=128)
    spec = ModelSpec(
        kernel=KernelSpec.polynomial(J=4, d=1),
        cg_max_iters=60, cg_tol=1e-8, precond_rank=0, num_probes=64,
    )
    params, buffers = init_model(KEY, spec, 4)
    ge, _ = jax.flatten_util.ravel_pytree(
        jax.grad(lambda p: exact_mll(spec, p, buffers, x, y))(params)
    )
    ge = np.asarray(ge, np.float64)

    def loss(p, b, xl, yl, el):
        l = sharding.distributed_mll(spec, p, b, xl, yl, el)
        return l

    def vg(p, b, xl, yl, el):
        g = jax.grad(loss)(p, b, xl, yl, el)
        return jax.lax.psum(g, "data")

    f = jax.shard_map(
        vg, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data")),
        out_specs=P(), check_vma=False,
    )
    eps = jax.random.normal(jax.random.key(13), (128, 64))
    gi, _ = jax.flatten_util.ravel_pytree(jax.jit(f)(params, buffers, x, y, eps))
    gi = np.asarray(gi, np.float64)
    cos = ge @ gi / (np.linalg.norm(ge) * np.linalg.norm(gi))
    assert cos > 0.99, cos


def test_component_sharded_mll_and_grads_match_exact():
    """2-D mesh (data x comp): DP + the TP/EP analog. Value parity vs the
    dense oracle and gradient parity vs the exact gradient direction."""
    cpus = _cpus()
    import numpy as _np
    from jax.sharding import Mesh

    mesh = Mesh(_np.asarray(cpus[:8]).reshape(4, 2), axis_names=("data", "comp"))
    x, y = _data(n=128)
    spec = ModelSpec(
        kernel=KernelSpec.polynomial(J=4, d=1),
        cg_max_iters=60, cg_tol=1e-8, precond_rank=0, num_probes=64,
    )
    params, buffers = init_model(KEY, spec, 4)
    want = float(exact_mll(spec, params, buffers, x, y))

    eps = jax.random.normal(jax.random.key(7), (128, 64))
    f = jax.shard_map(
        lambda p, b, xl, yl, el: sharding.distributed_mll(
            spec, p, b, xl, yl, el, comp_axis="comp"),
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    got = float(jax.jit(f)(params, buffers, x, y, eps))
    assert abs(got - want) / abs(want) < 0.05, (got, want)

    # full train-step grads through the comp-aware assembly
    import optax

    opt = optax.adam(0.1)
    step = sharding.make_distributed_train_step(spec, mesh, opt, n_global=128)
    xs = sharding.shard_rows(x, mesh)
    ys = sharding.shard_rows(y, mesh)
    pr = sharding.replicate(params, mesh)
    br = sharding.replicate(buffers, mesh)
    st = opt.init(pr)
    losses = []
    key = jax.random.key(23)
    for _ in range(6):
        key, k = jax.random.split(key)
        pr, st, loss = step(pr, br, st, xs, ys, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_component_sharded_gradient_direction():
    import numpy as _np
    from jax.sharding import Mesh

    cpus = _cpus()
    mesh = Mesh(_np.asarray(cpus[:8]).reshape(2, 4), axis_names=("data", "comp"))
    x, y = _data(n=128)
    spec = ModelSpec(
        kernel=KernelSpec.polynomial(J=8, d=1, per_component_scale=True),
        cg_max_iters=60, cg_tol=1e-8, precond_rank=0, num_probes=64,
    )
    params, buffers = init_model(KEY, spec, 4)
    ge, _ = jax.flatten_util.ravel_pytree(
        jax.grad(lambda p: exact_mll(spec, p, buffers, x, y))(params)
    )
    ge = np.asarray(ge, np.float64)

    def loss(p, b, xl, yl, el):
        return sharding.distributed_mll(spec, p, b, xl, yl, el,
                                        comp_axis="comp")

    def vg(p, b, xl, yl, el):
        g = jax.grad(loss)(p, b, xl, yl, el)
        g = jax.lax.psum(g, "data")
        # pmean: psum-transpose already multiplies slice grads by csize
        return jax.lax.pmean(g, "comp")

    f = jax.shard_map(
        vg, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data")),
        out_specs=P(), check_vma=False,
    )
    eps = jax.random.normal(jax.random.key(13), (128, 64))
    gi, _ = jax.flatten_util.ravel_pytree(jax.jit(f)(params, buffers, x, y, eps))
    gi = np.asarray(gi, np.float64)
    cos = ge @ gi / (np.linalg.norm(ge) * np.linalg.norm(gi))
    assert cos > 0.99, cos


def test_prepared_ski_state_matches_instep_build():
    """Hoisted SKI geometry (prepare_distributed_ski) must reproduce the
    in-step build exactly: same loss from the same step/key, on both a
    1-D data mesh and a 2-D data x comp mesh."""
    import numpy as _np
    from jax.sharding import Mesh

    n = 128
    x, y = _data(n=n)
    spec = ModelSpec(
        kernel=KernelSpec.polynomial(J=4, d=1, ski=True, grid_size=64),
        cg_max_iters=30, precond_rank=0, num_probes=8,
    )
    cpus = _cpus()
    meshes = [
        _mesh(),
        Mesh(_np.asarray(cpus[:8]).reshape(4, 2), axis_names=("data", "comp")),
    ]
    for mesh in meshes:
        params, buffers = init_model(KEY, spec, 4)
        opt = optax.adam(0.1)
        step = sharding.make_distributed_train_step(spec, mesh, opt, n_global=n)
        xs = sharding.shard_rows(x, mesh)
        ys = sharding.shard_rows(y, mesh)
        params = sharding.replicate(params, mesh)
        buffers = sharding.replicate(buffers, mesh)
        st = sharding.prepare_distributed_ski(spec, params, buffers, xs, mesh)
        assert st is not None and st.i0 is None  # dense plan, no sort fields

        k = jax.random.key(11)
        opt_state = opt.init(params)
        _, _, loss_instep = step(params, buffers, opt_state, xs, ys, k)
        opt_state = opt.init(params)
        _, _, loss_hoist = step(params, buffers, opt_state, xs, ys, k, st)
        np.testing.assert_allclose(float(loss_hoist), float(loss_instep),
                                   rtol=1e-5)


# ---------------------------------------------------------------------------
# distributed posterior (VERDICT r1 #6): sharded mean solve + sharded LOVE
# cache / chunked sharded-CG variances vs single-device oracles
# ---------------------------------------------------------------------------


def _posterior_setup(n=160, D=4, n_test=48, seed=21, **spec_kw):
    x, y = _data(n=n, D=D, seed=seed)
    xt = jax.random.normal(jax.random.key(seed + 1), (n_test, D))
    spec = ModelSpec(**spec_kw)
    params, buffers = init_model(KEY, spec, D)
    return spec, params, buffers, x, y, xt


def test_distributed_posterior_love_matches_exact():
    from rpagp.models.exact_gp import predict as exact_predict

    mesh = _mesh()
    spec, params, buffers, x, y, xt = _posterior_setup(
        n=240, n_test=40,
        kernel=KernelSpec.polynomial(J=5, d=1),
        cg_max_iters=100, cg_tol=1e-8, precond_rank=10, love_rank=120,
    )
    mu_e, var_e = exact_predict(spec, params, buffers, x, y, xt)

    predict_d = sharding.make_distributed_posterior(spec, mesh,
                                                    n_global=x.shape[0])
    xs, ys = sharding.shard_rows(x, mesh), sharding.shard_rows(y, mesh)
    mu, var = predict_d(params, buffers, xs, ys, xt, jax.random.key(33))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_e), atol=3e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_e),
                               rtol=3e-2, atol=3e-3)


def test_distributed_posterior_ski_chunked_matches_single_device():
    from rpagp.ops import iterative

    mesh = _mesh()
    spec, params, buffers, x, y, xt = _posterior_setup(
        n=160, n_test=40,
        kernel=KernelSpec.polynomial(J=4, d=1, ski=True, grid_size=64),
        cg_max_iters=60, cg_tol=1e-6, precond_rank=0, love_rank=0,
    )
    # single-device oracle: the same algorithm, unsharded
    mu_s, var_s = iterative.iterative_posterior(
        spec, params, buffers, x, y, xt, var_chunk=16, var_tol=1e-4)

    predict_d = sharding.make_distributed_posterior(
        spec, mesh, n_global=x.shape[0], var_chunk=16)
    xs, ys = sharding.shard_rows(x, mesh), sharding.shard_rows(y, mesh)
    mu, var = predict_d(params, buffers, xs, ys, xt, jax.random.key(34))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_s), atol=2e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_s),
                               rtol=2e-2, atol=2e-3)


def test_distributed_posterior_ski_love_matches_single_device():
    from rpagp.ops import iterative

    mesh = _mesh()
    spec, params, buffers, x, y, xt = _posterior_setup(
        n=160, n_test=32,
        kernel=KernelSpec.polynomial(J=4, d=1, ski=True, grid_size=64),
        cg_max_iters=80, cg_tol=1e-8, precond_rank=0, love_rank=80,
    )
    mu_s, var_s = iterative.iterative_posterior(spec, params, buffers,
                                                x, y, xt)
    predict_d = sharding.make_distributed_posterior(spec, mesh,
                                                    n_global=x.shape[0])
    xs, ys = sharding.shard_rows(x, mesh), sharding.shard_rows(y, mesh)
    mu, var = predict_d(params, buffers, xs, ys, xt, jax.random.key(35))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_s), atol=2e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_s),
                               rtol=3e-2, atol=3e-3)


def test_distributed_posterior_2d_mesh_comp_axis():
    """Distributed posterior on a 2-D (data x comp) mesh: the J
    components are sharded over the comp axis during prediction too
    (sliced params/projections, comp-psum'd cross-MVMs and diagonals)."""
    from jax.sharding import Mesh

    cpus = _cpus()
    mesh = Mesh(np.asarray(cpus[:8]).reshape(4, 2),
                axis_names=("data", "comp"))
    spec, params, buffers, x, y, xt = _posterior_setup(
        n=160, n_test=24,
        kernel=KernelSpec.polynomial(J=4, d=1),
        cg_max_iters=80, cg_tol=1e-8, precond_rank=0, love_rank=80,
    )
    from rpagp.ops import iterative

    mu_s, var_s = iterative.iterative_posterior(spec, params, buffers,
                                                x, y, xt)
    predict_d = sharding.make_distributed_posterior(spec, mesh,
                                                    n_global=x.shape[0])
    xs, ys = sharding.shard_rows(x, mesh), sharding.shard_rows(y, mesh)
    mu, var = predict_d(params, buffers, xs, ys, xt, jax.random.key(44))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_s), atol=2e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_s),
                               rtol=3e-2, atol=3e-3)
