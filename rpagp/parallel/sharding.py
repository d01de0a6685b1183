"""Multi-chip execution: device mesh, row-sharded kernel MVMs over ICI.

The reference has NO distributed code (SURVEY.md §2.4: single-process,
single-GPU; torch.distributed never imported) — this layer is the TPU
build's first-class addition (BASELINE.json config 5: data-sharded kernel
MVMs over ICI on HouseElectric, J=20).

Design (scaling-book recipe: pick a mesh, shard, let collectives ride ICI):

* The TRAINING SET is the scaling axis — X rows are sharded over a 1-D
  `data` mesh axis. Hyperparameters are a few dozen floats: always
  replicated. X itself is small (HouseElectric: 1.8M x 11 ~ 80 MB) but
  the MVM compute/intermediates are O(n^2/dev) or O(n/dev) — that's what
  shards.

* Dense-kernel path — RING BLOCKED MVM (`ring_mvm`): each device holds an
  (n/dev)-row shard of X and V; at each of the ndev ring steps it computes
  the K(local rows, visiting columns) @ V_visiting partial product and
  `ppermute`s the visiting (X, V) shard to its ring neighbor. Identical
  data movement to ring attention (SURVEY.md §5 "long-context analog"),
  no softmax. Output rows stay local — no reduction needed.

* SKI path — GRID-PSUM MVM (`sharded_ski_mvm`): interpolation scatters
  each local shard onto the SHARED m-point grids, one `psum` over ICI
  merges grid-space partials (J*m*t floats — megabytes, vs gigabytes of
  data-space), the Toeplitz FFT runs replicated (grid-sized, trivial),
  and the gather back to rows is local. ICI traffic is grid-sized,
  independent of n: this is the config-5 headline path.

Both run inside ONE `jax.shard_map`; CG/Adam logic stays at the jit level
where GSPMD auto-inserts the (cheap, vector-sized) psums for dot products.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import exact_gp
from ..models.exact_gp import ModelSpec
from ..ops import cg as cg_mod
from ..ops import kernels, precond, ski, slq
from ..ops.exact import LOG_2PI

AXIS = "data"


def make_mesh(devices=None, axis: str = AXIS, comp: int = 1) -> Mesh:
    """Data mesh over all (or the given) devices; 2-D (data x comp) when
    comp > 1 (the TP/EP analog: kernel components sharded over `comp`,
    rows over `axis`; J must divide comp — see _slice_components).

    Honors jax_default_device (repo convention — the axon TPU plugin in
    this image ignores JAX_PLATFORMS=cpu, so CPU-pinned programs must not
    silently mesh over the TPU): when a default device is pinned, the
    mesh spans all devices of ITS platform."""
    if devices is None:
        dflt = jax.config.jax_default_device
        if dflt is not None:
            devices = jax.devices(dflt.platform)
        else:
            devices = jax.devices()
    import numpy as np

    devices = np.asarray(devices)
    if comp > 1:
        if devices.size % comp:
            raise ValueError(
                f"comp={comp} must divide the {devices.size}-device mesh")
        return Mesh(devices.reshape(devices.size // comp, comp),
                    axis_names=(axis, COMP_AXIS))
    return Mesh(devices, axis_names=(axis,))


def shard_rows(arr, mesh: Mesh):
    """Place an array row-sharded over the data axis (rows must divide)."""
    spec = P(AXIS, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


# ---------------------------------------------------------------------------
# Ring blocked MVM (dense kernel at scale)
# ---------------------------------------------------------------------------


def ring_mvm(kspec, kparams, kbuffers, x_local, v_local, axis: str = AXIS,
             block_rows: int = 4096):
    """(K V) rows for the local shard via a ring over the mesh axis.

    Runs INSIDE shard_map. x_local: (n/dev, D), v_local: (n/dev, t).
    Each step: partial = K(x_local, x_visit) @ v_visit; rotate visit pair.
    ndev-1 ppermutes over ICI, fully overlappable with the (much larger)
    per-step compute.
    """
    ndev = jax.lax.axis_size(axis)
    perm = [(j, (j + 1) % ndev) for j in range(ndev)]

    def body(i, carry):
        acc, x_visit, v_visit = carry
        acc = acc + kernels.mvm(
            kspec, kparams, kbuffers, x_local, x_visit, v_visit,
            block_rows=block_rows,
        )
        x_visit = jax.lax.ppermute(x_visit, axis, perm)
        v_visit = jax.lax.ppermute(v_visit, axis, perm)
        return acc, x_visit, v_visit

    acc0 = jnp.zeros((x_local.shape[0], v_local.shape[1]), v_local.dtype)
    acc, _, _ = jax.lax.fori_loop(0, ndev, body, (acc0, x_local, v_local))
    return acc


# ---------------------------------------------------------------------------
# Sharded SKI MVM (grid-space psum — ICI traffic independent of n)
# ---------------------------------------------------------------------------


def sharded_ski_mvm(kspec, kparams, state_local: ski.SKIState, v_local,
                    axis: str = AXIS, state_out: ski.SKIState = None):
    """K_ski V rows for the local shard. Runs INSIDE shard_map.

    state_local holds the interpolation geometry of the LOCAL rows against
    the GLOBAL grid (same grid on every device — build with global
    z_bounds). W^T scatter is local; one psum merges (J, m, t) grid
    partials; Toeplitz FFT + gather are local.

    state_out: geometry of the OUTPUT rows for cross-covariances
    K(out, train) V — e.g. replicated test-point geometry on the same
    grid (the distributed LOVE/mean cross-MVM). Defaults to state_local
    (the square K(train, train) V of training).
    """
    if state_out is None:
        state_out = state_local
    col = ski.toeplitz_columns(kspec, kparams, state_out)  # (J, m)
    scales = kernels._component_scales(kspec, kparams, v_local.dtype)
    if state_local.order is None:  # dense plan (KernelSpec.interp)
        U = ski.dense_interp_transpose(state_local, v_local)
        U = jax.lax.psum(U, axis)  # grid-sized ICI traffic
        TU = ski.sym_toeplitz_matmul(col, U)
        return ski.dense_interp_apply_sum(state_out,
                                          scales[:, None, None] * TU)
    U = ski.interp_transpose(state_local, v_local)  # (J, t, m) partial
    U = jax.lax.psum(U, axis)  # grid-sized ICI traffic
    TU = ski.sym_toeplitz_matmul(col, U)
    WTU = ski.interp_apply(state_out, TU)  # (J, t, n_out) output rows
    return jnp.tensordot(scales, WTU, axes=1).T


# ---------------------------------------------------------------------------
# Distributed MLL training step (the config-5 program)
# ---------------------------------------------------------------------------


def _global_z_bounds(kspec, kparams, kbuffers, x_local, axis: str = AXIS):
    """Per-projection global [min, max] of z = xP across all shards."""
    z = ski.project(kspec, kparams, kbuffers, x_local)  # (J, n/dev)
    lo = jax.lax.pmin(jnp.min(z, axis=1), axis)
    hi = jax.lax.pmax(jnp.max(z, axis=1), axis)
    return lo, hi


COMP_AXIS = "comp"


def _slice_components(spec: ModelSpec, params, buffers, comp_axis: str):
    """Per-device component shard: slice the J-indexed kernel params and
    the projection columns by this device's position on the comp axis.
    Returns (spec_local, params_local, buffers_local, J_local).

    dynamic_slice is differentiable — its transpose scatters the local
    slice's gradient back into a zero-padded full vector, so a psum over
    the comp axis reassembles exact full-parameter gradients."""
    kspec = spec.kernel
    csize = jax.lax.axis_size(comp_axis)
    cidx = jax.lax.axis_index(comp_axis)
    assert kspec.J % csize == 0, "J must divide the comp axis"
    assert all(d == 1 for d in kspec.degrees), "comp sharding: degree-1 only"
    # the local spec's bases tuple is STATIC but the device's component
    # range is dynamic (axis_index) — a mixed-base slice cannot be
    # expressed; reject rather than silently evaluate the wrong base
    assert len(set(kspec.bases)) <= 1, \
        "comp sharding requires a uniform base kernel"
    Jl = kspec.J // csize
    sk = kspec.sub_dim
    kspec_l = kspec.__class__(
        **{**kspec.__dict__, "J": Jl, "degrees": (1,) * Jl,
           "bases": (kspec.bases[0],) * Jl}
    )
    kp = dict(params["kernel"])
    kp["raw_lengthscale"] = jax.lax.dynamic_slice_in_dim(
        kp["raw_lengthscale"], cidx * Jl, Jl
    )
    if kspec.per_component_scale:
        kp["raw_outputscale"] = jax.lax.dynamic_slice_in_dim(
            kp["raw_outputscale"], cidx * Jl, Jl
        )
    kb = dict(buffers["kernel"])
    if "proj" in kp:
        kp["proj"] = jax.lax.dynamic_slice_in_dim(
            kp["proj"], cidx * Jl * sk, Jl * sk, axis=1
        )
    elif "proj" in kb:
        kb["proj"] = jax.lax.dynamic_slice_in_dim(
            kb["proj"], cidx * Jl * sk, Jl * sk, axis=1
        )
    params_l = {**params, "kernel": kp}
    buffers_l = {**buffers, "kernel": kb}
    # shared-outputscale models divide sigma^2/J across ALL J components;
    # the local spec must keep the GLOBAL J in its scale normalization —
    # handled by scaling weights post-hoc in the mvm closures below.
    return kspec_l, params_l, buffers_l, Jl


def prepare_distributed_ski(spec: ModelSpec, params, buffers, x_sharded,
                            mesh: Mesh):
    """Build the SKI interpolation geometry ONCE per dataset, laid out for
    the mesh: tfrac row-sharded over the data axis (and component-sharded
    over the comp axis when present), grid scalars replicated.

    The geometry depends only on the data and the FIXED projections —
    never on trainable hyperparameters — so rebuilding it inside every
    training step (a (J, n) projection + normalization) is pure waste;
    pass the result to the step returned by make_distributed_train_step.

    Dense interpolation plan only (the default): the sorted plan's
    per-shard sort/bounds structure is built in-step instead (its cost is
    per-shard-sized). Returns None when not applicable."""
    kspec = spec.kernel
    if not kspec.ski or kspec.interp != "dense":
        return None
    comp = COMP_AXIS if COMP_AXIS in mesh.axis_names else None
    jspec = P(comp) if comp else P()
    tfspec = P(comp, AXIS) if comp else P(None, AXIS)
    out_sh = ski.SKIState(
        grid_lo=NamedSharding(mesh, jspec), h=NamedSharding(mesh, jspec),
        cells=NamedSharding(mesh, P()),
        tfrac=NamedSharding(mesh, tfspec),
        i0=None, w4=None, order=None, w4_sorted=None, bounds=None,
    )

    @functools.partial(jax.jit, static_argnums=(), out_shardings=out_sh)
    def _build(kp, kb, x):
        return ski.build_ski(kspec, kp, kb, x, kspec.grid_size)

    return _build(params["kernel"], buffers["kernel"], x_sharded)


def _ski_state_in_specs(comp_axis):
    """shard_map in_specs pytree for a prepared (dense-plan) SKIState."""
    jspec = P(comp_axis) if comp_axis else P()
    tfspec = P(comp_axis, AXIS) if comp_axis else P(None, AXIS)
    return ski.SKIState(grid_lo=jspec, h=jspec, cells=P(), tfrac=tfspec,
                        i0=None, w4=None, order=None, w4_sorted=None,
                        bounds=None)


def _psum_dot(a, b, axis: str):
    return jax.lax.psum(jnp.sum(a * b, axis=0), axis)


def sharded_pcg(A_mvm, B, M_inv, iters: int, tol: float, axis: str = AXIS):
    """Batched preconditioned CG on row-sharded columns B (n/dev, t).
    Runs INSIDE shard_map: every dot-product reduction carries a psum
    over `axis` (vector-sized ICI traffic). Mirrors ops.cg.batched_pcg
    (convergence masks freeze columns so Lanczos coefficients stay
    clean). Returns (solution (n/dev, t), alphas (iters, t), betas)."""
    X0 = jnp.zeros_like(B)
    R0, Z0 = B, M_inv(B)
    rz0 = _psum_dot(R0, Z0, axis)
    b_norm = jnp.sqrt(_psum_dot(B, B, axis))
    b_norm = jnp.where(b_norm < 1e-20, 1.0, b_norm)

    def step(carry, _):
        Xs, R, Zp, Pd, rz, resid, X_best, r_best = carry
        active = resid > tol
        V = A_mvm(Pd)
        pv = _psum_dot(Pd, V, axis)
        alpha = rz / jnp.where(jnp.abs(pv) < 1e-20, 1e-20, pv)
        alpha = jnp.where(active, alpha, 0.0)
        Xs = Xs + alpha * Pd
        R = R - alpha * V
        Zp = M_inv(R)
        rz_new = _psum_dot(R, Zp, axis)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        beta = jnp.where(active, beta, 0.0)
        Pd = Zp + beta * Pd
        # best-iterate tracking (ops.cg module docstring): bounded
        # best-effort solves when f32 CG diverges at extreme condition.
        # The carried resid doubles as next step's convergence mask
        # (one residual psum per iteration, not two).
        resid_new = jnp.sqrt(_psum_dot(R, R, axis)) / b_norm
        better = resid_new < r_best
        X_best = jnp.where(better[None, :], Xs, X_best)
        r_best = jnp.where(better, resid_new, r_best)
        return (Xs, R, Zp, Pd, rz_new, resid_new, X_best, r_best), (alpha, beta)

    ones = jnp.ones((B.shape[1],), B.dtype)
    (_, _, _, _, _, _, solves, _), (alphas, betas) = jax.lax.scan(
        step, (X0, R0, Z0, Z0, rz0, ones, X0, ones), None, length=iters
    )
    return solves, alphas, betas


def distributed_mll(spec: ModelSpec, params, buffers, x_local, y_local,
                    eps_big_local, axis: str = AXIS, pre_L_local=None,
                    pre_chol_small=None, pre_logdet=None,
                    eps_small=None, comp_axis=None, ski_state_local=None):
    """Marginal log-likelihood on row-sharded data. Runs INSIDE shard_map.

    The SPMD mirror of ops.iterative's forward: batched PCG where the MVM
    is ring (dense) or grid-psum (SKI) and every dot-product reduction
    carries a psum. Gradient flows through jax.grad of THIS function —
    the CG loop is wrapped in stop-gradient solves exactly like the
    single-chip custom_vjp (see distributed_train_step).

    eps_big_local: (n/dev, t) pre-sampled probe normals (per-shard slice).

    Preconditioner: pass pre_L_local (n/dev, k) row-shard of the pivoted
    Cholesky factor plus its (replicated) k x k Cholesky and exact logdet
    (built OUTSIDE shard_map on replicated X — X is megabytes even at
    HouseElectric scale, and rank-k pivoting is k kernel rows of work).
    The Woodbury apply inside costs one k-dim psum per CG iteration —
    k*t floats over ICI, negligible. eps_small: (k, t) replicated probe
    normals so probes carry N(0, M). Omit all four for M = noise*I.
    """
    noise = exact_gp.noise_value(params)
    nsg = jax.lax.stop_gradient(noise)
    n_local = x_local.shape[0]
    ndev = jax.lax.axis_size(axis)
    n = n_local * ndev

    yc = y_local - params.get("mean_const", jnp.zeros((), x_local.dtype))
    has_pre = pre_L_local is not None

    # component (J) sharding — the TP/EP analog: each comp-axis position
    # owns J/csize components; the kernel MVM's final sum over components
    # becomes one psum over the comp axis. Everything outside the MVM is
    # comp-replicated (reductions stay data-axis-only).
    if comp_axis is not None:
        kspec, params_l, buffers_l, Jl = _slice_components(
            spec, params, buffers, comp_axis
        )
        csize = jax.lax.axis_size(comp_axis)
        # component weights normalize by the LOCAL J inside the sliced
        # spec; rescale to the global 1/J (both shared and per-component)
        w_fix = 1.0 / csize
        comp_psum = lambda v: jax.lax.psum(v, comp_axis)
    else:
        kspec = spec.kernel
        params_l, buffers_l = params, buffers
        w_fix = 1.0
        comp_psum = lambda v: v
    kp, kb = params_l["kernel"], buffers_l["kernel"]

    if kspec.ski:
        if ski_state_local is not None:
            # hoisted geometry (prepare_distributed_ski): local shard view
            state = ski_state_local
        else:
            bounds = _global_z_bounds(kspec, jax.lax.stop_gradient(kp), kb,
                                      x_local, axis)
            state = ski.build_ski(kspec, jax.lax.stop_gradient(kp), kb,
                                  x_local, kspec.grid_size, z_bounds=bounds)
        kmvm = lambda p, V: comp_psum(
            w_fix * sharded_ski_mvm(kspec, p["kernel"], state, V, axis)
        )
    else:
        kmvm = lambda p, V: comp_psum(
            w_fix * ring_mvm(kspec, p["kernel"], kb, x_local, V, axis)
        )

    def A_mvm_sg(V):  # value path (stop-grad params), used inside CG
        psg = jax.lax.stop_gradient(params_l)
        return kmvm(psg, V) + nsg * V

    # ---- preconditioner apply + probes (Woodbury; k-dim psum) ----
    if has_pre:
        Lp = jax.lax.stop_gradient(pre_L_local)  # (n/dev, k)
        Cs = jax.lax.stop_gradient(pre_chol_small)  # (k, k) replicated

        def M_inv(R):
            u = jax.lax.psum(
                jnp.matmul(Lp.T, R, precision=jax.lax.Precision.HIGHEST),
                axis,
            )  # (k, t) — the only collective in the apply
            w = jax.scipy.linalg.cho_solve((Cs, True), u)
            return (R - jnp.matmul(Lp, w,
                                   precision=jax.lax.Precision.HIGHEST)) / nsg

        Z = jnp.matmul(Lp, eps_small,
                       precision=jax.lax.Precision.HIGHEST)             + jnp.sqrt(nsg) * eps_big_local
        Z = jax.lax.stop_gradient(Z)
        precond_logdet = pre_logdet
    else:
        M_inv = lambda R: R / nsg
        Z = jnp.sqrt(nsg) * eps_big_local
        precond_logdet = n * jnp.log(nsg)

    B = jnp.concatenate([jax.lax.stop_gradient(yc)[:, None], Z], axis=1)
    solves, alphas, betas = sharded_pcg(
        A_mvm_sg, B, M_inv, spec.cg_max_iters, spec.cg_tol, axis
    )
    solves = jax.lax.stop_gradient(solves)
    alphas = jax.lax.stop_gradient(alphas)
    betas = jax.lax.stop_gradient(betas)
    alpha_vec = solves[:, 0]  # A^{-1} y_c rows (local)
    S = solves[:, 1:]
    MZ = M_inv(Z)

    # ---- differentiable heads (quadratic forms; grads are the probe
    #      trace estimator, matching ops.iterative's custom_vjp) ----
    # ONE batched MVM for both heads (t-independent kernel costs paid once)
    AM = jnp.concatenate([alpha_vec[:, None], MZ], axis=1)
    K_AM = kmvm(params_l, AM) + noise * AM
    Ay = K_AM[:, 0]
    inv_quad = jax.lax.psum(
        2.0 * jnp.sum(alpha_vec * yc) - jnp.sum(alpha_vec * Ay), axis
    )
    AS = K_AM[:, 1:]
    t = S.shape[1]
    surr_tr = jax.lax.psum(jnp.sum(S * AS), axis) / t  # grad == d logdet

    # ---- SLQ logdet value (stop-grad; tridiags replicated) ----
    T = cg_mod.lanczos_tridiags_from_cg(alphas[:, 1:], betas[:, 1:])
    probe_sq = jax.lax.psum(jnp.sum(Z * MZ, axis=0), axis)
    logdet_val = slq.slq_logdet_from_tridiags(T, probe_sq, precond_logdet)

    # value: -(iq + logdet)/2 - n/2 log 2pi; gradient: surrogate heads
    logdet = logdet_val - jax.lax.stop_gradient(surr_tr) + surr_tr
    return -0.5 * (inv_quad + logdet + n * LOG_2PI)


# factory memos: each factory call builds a FRESH @jax.jit closure, and
# jax keys its in-memory trace cache on function identity — so a
# per-split factory call re-pays the full Python trace+lower even at
# identical shapes (the r4h finding, which fixed this for the
# single-device runner; VERDICT r4 weak #2 flags the distributed
# mirror). Keys are (spec, mesh, optimizer-identity, sizes, env
# switches); Mesh and optax GradientTransformations are hashable, and
# callers that want reuse must pass the SAME optimizer object (the
# runner memoizes it per train-config).
_DIST_STEP_CACHE: dict = {}
_DIST_POST_CACHE: dict = {}
_DIST_CACHE_MAX = 16


def _memo(cache: dict, key, build):
    try:
        hash(key)
    except TypeError:
        return build()
    if key not in cache:
        if len(cache) >= _DIST_CACHE_MAX:
            cache.pop(next(iter(cache)))
        cache[key] = build()
    return cache[key]


def make_distributed_train_step(spec: ModelSpec, mesh: Mesh, optimizer,
                                n_global: int, dtype=jnp.float32):
    """Memoized SPMD train-step factory (see _build_distributed_train_step
    for the step contract): same (spec, mesh, optimizer, n) -> the SAME
    jitted step object, so a k-fold sweep traces once."""
    from ..train import resolve_env_switches

    key = (spec, mesh, optimizer, n_global, jnp.dtype(dtype).name,
           resolve_env_switches())
    return _memo(_DIST_STEP_CACHE, key,
                 lambda: jax.jit(_build_distributed_train_body(
                     spec, mesh, optimizer, n_global, dtype)))


def make_distributed_train_chunk(spec: ModelSpec, mesh: Mesh, optimizer,
                                 n_global: int, k: int, dtype=jnp.float32):
    """Memoized SPMD k-step chunk: ONE jitted program scans k distributed
    Adam steps (train.make_chunk's SPMD mirror). Opt-in, NOT the runner
    default: the single-device A/B measured the scanned chunk ~3 ms/iter
    slower than the per-step sync_every loop (BENCHMARKS r5h).

    chunk(params, buffers, opt_state, xs, ys, key, ski_state, grid_gram,
    grid_uy, grid_u1, grid_vc) -> (params, opt_state, losses[k], pstack,
    key_out); pstack carries each step's PRE-step params (leading k
    axis), and the in-scan `key, sub = split(key)` continues the host
    stream exactly as the per-step loop would."""
    from ..train import resolve_env_switches

    mkey = ("chunk", spec, mesh, optimizer, n_global, k,
            jnp.dtype(dtype).name, resolve_env_switches())

    def build():
        body = _build_distributed_train_body(spec, mesh, optimizer,
                                             n_global, dtype)

        @jax.jit
        def chunk(params, buffers, opt_state, x_sharded, y_sharded, key,
                  ski_state=None, grid_gram=None, grid_uy=None,
                  grid_u1=None, grid_vc=None):
            def sbody(carry, _):
                params, opt_state, key = carry
                key, sub = jax.random.split(key)
                new_params, opt_state, loss = body(
                    params, buffers, opt_state, x_sharded, y_sharded, sub,
                    ski_state, grid_gram, grid_uy, grid_u1, grid_vc)
                return (new_params, opt_state, key), (loss, params)

            (params, opt_state, key), (losses, pstack) = jax.lax.scan(
                sbody, (params, opt_state, key), None, length=k)
            return params, opt_state, losses, pstack, key

        return chunk

    return _memo(_DIST_STEP_CACHE, mkey, build)


def _build_distributed_train_body(spec: ModelSpec, mesh: Mesh, optimizer,
                                  n_global: int, dtype=jnp.float32):
    """One SPMD Adam step on row-sharded (x, y) — returned UN-jitted so
    make_distributed_train_step can jit it directly and
    make_distributed_train_chunk can lax.scan it.

    Returns step(params, buffers, opt_state, x_sharded, y_sharded, key[,
    ski_state[, grid_gram]]) -> (params, opt_state, loss). Everything
    under one jit; the shard_map wraps the loss so collectives (ring
    ppermute / grid psum / dot psums) ride ICI inside the compiled
    program. For SKI specs pass ski_state=prepare_distributed_ski(...)
    so the (per-dataset, hyperparameter-free) interpolation geometry is
    built once, not once per step. When the spec dispatches to the
    exact grid-space solver, pass BOTH outputs of
    prepare_distributed_grid(...) as (ski_state, grid_gram) — the step
    then runs distributed_grid_mll (deterministic, key unused) instead
    of the BBMM estimator.
    """
    import optax

    ndev = mesh.devices.size
    comp_axis = COMP_AXIS if COMP_AXIS in mesh.axis_names else None

    use_pre = spec.precond_rank > 0 and not spec.kernel.ski

    def grid_loss_fn(params, x_local, y_local, state_local, S4,
                     uy=None, u1=None, vc=None):
        return -distributed_grid_mll(
            spec, params, x_local, y_local, state_local, S4,
            uy=uy, u1=u1, vc=vc) / n_global

    def loss_fn(params, buffers, x_local, y_local, eps_local,
                Lp, Cs, ld, eps_s, ski_state_local):
        return (
            -distributed_mll(
                spec, params, buffers, x_local, y_local, eps_local,
                pre_L_local=Lp if use_pre else None,
                pre_chol_small=Cs if use_pre else None,
                pre_logdet=ld if use_pre else None,
                eps_small=eps_s if use_pre else None,
                comp_axis=comp_axis,
                ski_state_local=ski_state_local,
            )
            / n_global
        )

    def value_and_summed_grad(p, b, xs, ys, es, Lp, Cs, ld, eps_s, sst):
        loss, g = jax.value_and_grad(loss_fn)(p, b, xs, ys, es, Lp, Cs, ld,
                                              eps_s, sst)
        # each device holds only its shard's contribution to d loss/d params
        # (replicated params, sharded compute) — sum partials over ICI
        g = jax.lax.psum(g, AXIS)
        if comp_axis is not None:
            # pmean over comp for EVERY param: psum's transpose re-psums
            # the (comp-replicated) cotangent, so each shard's slice grad
            # is already csize x its true value — the comp-psum of the
            # zero-padded slices therefore needs /csize (pmean), and the
            # comp-replicated shared params (noise, mean) need the same
            g = jax.lax.pmean(g, comp_axis)
        return loss, g

    in_axis = P(AXIS)  # data-sharded, comp-replicated (if comp exists)

    def step(params, buffers, opt_state, x_sharded, y_sharded, key,
             ski_state=None, grid_gram=None, grid_uy=None, grid_u1=None,
             grid_vc=None):
        if grid_gram is not None:
            # exact grid-space solver path: ski_state here is the
            # comp-REPLICATED geometry from prepare_distributed_grid;
            # grid_uy/grid_u1/grid_vc (same source, y_sharded=...) drop
            # the per-step U^T yc interp pass, the residual value pass,
            # and every per-step psum when present
            cached = grid_uy is not None

            def vg(p, xs, ys, sst, S4, *cache):
                loss, g = jax.value_and_grad(grid_loss_fn)(p, xs, ys,
                                                           sst, S4, *cache)
                # pmean, NOT psum: the mesh-sum of per-device grads is
                # ndev x the true gradient (distributed_grid_mll
                # docstring) — pmean makes distributed gradients match
                # the single-chip grid_mll EXACTLY, so lr/hyperparams
                # transfer between scales
                g = jax.lax.pmean(g, AXIS)
                if comp_axis is not None:
                    g = jax.lax.pmean(g, comp_axis)
                return loss, g

            smapped = jax.shard_map(
                vg, mesh=mesh,
                in_specs=(P(), P(AXIS), P(AXIS),
                          _ski_state_in_specs(None), P())
                + ((P(), P(), P()) if cached else ()),
                out_specs=(P(), P()),
                check_vma=False,
            )
            args = (params, x_sharded, y_sharded, ski_state, grid_gram)
            if cached:
                args = args + (grid_uy, grid_u1, grid_vc)
            loss, grads = smapped(*args)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
        # shard_map is constructed at trace time so the in_specs adapt to
        # whether a hoisted SKI geometry (prepare_distributed_ski) rides
        # along; a None state falls back to the in-step build
        state_specs = (_ski_state_in_specs(comp_axis)
                       if ski_state is not None else P())
        smapped = jax.shard_map(
            value_and_summed_grad,
            mesh=mesh,
            in_specs=(P(), P(), in_axis, in_axis, in_axis,
                      in_axis, P(), P(), P(), state_specs),
            out_specs=(P(), P()),
            check_vma=False,
        )
        k1, k2 = jax.random.split(key)
        eps = jax.random.normal(k1, (n_global, spec.num_probes), dtype)
        rank = spec.precond_rank if use_pre else 1
        if use_pre:
            # pivoted Cholesky on (replicated) gathered X: k kernel rows
            # of work — trivial next to the sharded CG; XLA inserts the
            # all-gather of X once per step (X is tiny)
            x_full = jax.lax.with_sharding_constraint(
                x_sharded, NamedSharding(mesh, P())
            )
            noise = exact_gp.noise_value(jax.lax.stop_gradient(params))
            pre = precond.build_preconditioner(
                spec.kernel, jax.lax.stop_gradient(params["kernel"]),
                buffers["kernel"], x_full, noise, spec.precond_rank,
            )
            Lfull, Cs, ld = pre.L, pre.chol_small, pre.logdet
        else:
            Lfull = jnp.zeros((n_global, rank), dtype)
            Cs = jnp.eye(rank, dtype=dtype)
            ld = jnp.zeros((), dtype)
        eps_s = jax.random.normal(k2, (rank, spec.num_probes), dtype)
        loss, grads = smapped(params, buffers, x_sharded, y_sharded, eps,
                              Lfull, Cs, ld, eps_s, ski_state)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# Distributed exact grid-space solver (the SPMD mirror of ops.grid_solve)
# ---------------------------------------------------------------------------


def prepare_distributed_grid(spec: ModelSpec, params, buffers, x_sharded,
                             mesh: Mesh, y_sharded=None):
    """(ski_state, S4) for the distributed grid solver: full-J SKI
    geometry sharded over the DATA axis only, plus the replicated
    (J, m, J, m) interp Gram S = sum_shards U_i^T U_i (one psum per
    DATASET — (p, p) ICI traffic, paid once, like the single-chip
    buffers["ski_uu"]).

    With y_sharded, returns (ski_state, S4, uy, u1, vc) instead: uy/u1
    are the replicated (J, M) per-dataset caches U^T y / U^T 1 (the SPMD
    mirror of grid_solve.build_interp_y — assembled by one grid-sized
    psum each), and vc is the anchored value cache
    (grid_solve.build_value_cache — q0 + four scalars, one more
    per-dataset psum). Thread them into make_distributed_train_step's
    step as (grid_uy, grid_u1, grid_vc) and the per-step U^T yc interp
    pass, the residual value pass, AND every per-step collective
    disappear — the training step becomes fully replicated grid-space
    math after prepare.

    Unlike prepare_distributed_ski, tfrac is NOT comp-sharded: the grid
    solver's p x p Cholesky couples ALL J components, so the comp axis
    cannot shard the factor. On a 2-D mesh the comp dimension simply
    replicates the grid computation; the step's psum-over-data +
    pmean-over-comp gradient assembly already accounts for that.

    Returns (None, None) — or (None,) * 5 with y_sharded — when the
    spec doesn't run the grid solver."""
    from ..ops import grid_solve

    kspec = spec.kernel
    n_global = x_sharded.shape[0]
    if (kspec.interp != "dense"
            or not grid_solve.use_grid_solver(spec, n_global)):
        return (None, None) if y_sharded is None else (None,) * 5
    out_sh = ski.SKIState(
        grid_lo=NamedSharding(mesh, P()), h=NamedSharding(mesh, P()),
        cells=NamedSharding(mesh, P()),
        tfrac=NamedSharding(mesh, P(None, AXIS)),
        i0=None, w4=None, order=None, w4_sorted=None, bounds=None,
    )

    @functools.partial(jax.jit, out_shardings=out_sh)
    def _build(kp, kb, x):
        # dispatcher: degree-1 grids, or per-factor geometry for
        # product (degree*sub_dim > 1) components (ops/ski_product.py)
        return grid_solve._build_geometry(kspec, kp, kb, x,
                                          kspec.grid_size)

    state = jax.block_until_ready(
        _build(params["kernel"], buffers["kernel"], x_sharded))

    gram = jax.jit(jax.shard_map(
        lambda st: jax.lax.psum(grid_solve._build_gram(kspec, st), AXIS),
        mesh=mesh, in_specs=(_ski_state_in_specs(None),), out_specs=P(),
        check_vma=False,
    ))
    S4 = jax.block_until_ready(gram(state))
    if y_sharded is None:
        return state, S4
    uy_fn = jax.jit(jax.shard_map(
        lambda st, yy: jax.tree_util.tree_map(
            lambda u: jax.lax.psum(u, AXIS),
            grid_solve.build_interp_y(kspec, st, yy)),
        mesh=mesh, in_specs=(_ski_state_in_specs(None), P(AXIS)),
        out_specs=(P(), P()), check_vma=False,
    ))
    uy, u1 = jax.block_until_ready(uy_fn(state, y_sharded))

    def _vc(st_local, y_local, S4r, uyr):
        # anchored value cache, SPMD mirror of grid_solve.build_value_
        # cache: the q0 ridge solve is replicated p-space math; the
        # anchor residual r = y - V q0 is one LOCAL interp pass; the
        # four scalars merge in one stacked psum (paid once per dataset)
        q0 = grid_solve._anchor_q0(S4r, uyr)
        Vq0 = grid_solve._interp_A(kspec, st_local, q0[:, None, :])[:, 0]
        r = y_local - Vq0
        s = jax.lax.psum(
            jnp.stack([jnp.vdot(y_local, r), jnp.sum(r),
                       jnp.sum(y_local), jnp.vdot(y_local, y_local)]),
            AXIS)
        return {"q0": q0, "a0": s[0], "a1": s[1], "sy": s[2], "yy": s[3]}

    vc_fn = jax.jit(jax.shard_map(
        _vc, mesh=mesh,
        in_specs=(_ski_state_in_specs(None), P(AXIS), P(), P()),
        out_specs=P(), check_vma=False,
    ))
    vc = jax.block_until_ready(vc_fn(state, y_sharded, S4, uy))
    return state, S4, uy, u1, vc


def _grid_chol_fn(p: int, ndev: int, axis: str):
    """The p x p factor implementation for the distributed grid solver:
    None (replicated ops.block_chol fast path) below the banding
    threshold, else parallel.dist_chol's row-banded fallback ladder —
    the O(p^3) work then shards over the data axis instead of
    replicating (see dist_chol.use_distributed_factor for the policy).
    Trace-time choice; identical numerics either way (digit-exact factor
    parity, tests/test_dist_chol.py)."""
    from . import dist_chol

    if not dist_chol.use_distributed_factor(p, ndev):
        return None
    return lambda C, nz: dist_chol.distributed_chol_with_fallback_eps(
        C, nz, axis)


def distributed_grid_mll(spec: ModelSpec, params, x_local, y_local,
                         state_local: ski.SKIState, S4, axis: str = AXIS,
                         uy=None, u1=None, vc=None):
    """EXACT grid-space Woodbury MLL on row-sharded data — the SPMD
    mirror of ops.grid_solve.grid_mll. Runs INSIDE shard_map.

    Deterministic: no probes, no CG, no preconditioner; gradients are
    plain autodiff straight through the shard_map. Collectives per step:
    ONE (J, m) psum for U^T yc and one stacked two-scalar psum for the
    loss shares (inv-quad value numerator + local |yc|^2) — the p-space
    factor (batched Toeplitz chol, p x p chol) runs replicated on every
    device. With the per-dataset (uy, u1) cache from
    prepare_distributed_grid(..., y_sharded=...), U^T yc becomes
    replicated grid-space math — the interp_T pass and its psum drop
    out, leaving the stacked loss psum as the only per-step collective;
    with the anchored value cache (vc) that one drops out too and the
    step runs with ZERO per-step collectives.

    Gradient-assembly contract: under check_vma=False the psum
    transpose re-psums replicated cotangents, which makes the MESH SUM
    of per-device parameter gradients exactly ndev x the true gradient
    (measured term-by-term, /tmp-era multiplicity study — uniform 8.000
    on an 8-device mesh for row terms, psum-crossing terms, and
    replicated p-space terms alike). The caller must therefore combine
    with pmean over the data axis (NOT psum), and pmean again over comp
    when the mesh is 2-D."""
    from ..ops import grid_solve

    ndev = jax.lax.axis_size(axis)
    n = x_local.shape[0] * ndev
    noise = exact_gp.noise_value(params)
    p = S4.shape[0] * S4.shape[1]  # J * M (M = m, or m^F for product)
    yc = y_local - params.get("mean_const", jnp.zeros((), y_local.dtype))

    G, Lc = grid_solve._factor(spec, params["kernel"], state_local, S4,
                               noise, chol_fn=_grid_chol_fn(p, ndev, axis))
    if uy is not None:
        U = uy
        if spec.mean == "constant":
            U = U - params["mean_const"] * u1
    else:
        U = grid_solve._interp_T(spec.kernel, state_local,
                                 yc[:, None])[:, 0, :]
        U = jax.lax.psum(U, axis)  # (J, M) — grid-sized ICI traffic
    b = grid_solve._Gt_apply(G, U)
    w = jax.scipy.linalg.cho_solve((Lc, True), b)
    Gw = grid_solve._G_apply(G, w)
    if vc is not None and uy is not None:
        # anchored value cache (grid_solve.build_value_cache): the
        # inv-quad is fully replicated grid-space math — with the
        # (uy, u1, vc) caches this step has NO per-step collective at
        # all (the factor runs replicated; gradients assemble via the
        # caller's pmean exactly as before)
        iq = grid_solve._anchored_iq(spec, params, vc, U, Gw, n) / noise
    else:
        # Stable-value / grid-space-gradient inv-quad, the SPMD mirror
        # of grid_solve._resid_iq: the local residual pass runs
        # value-only (stop_gradient — no interp_transpose adjoint), the
        # gradient rides the replicated linear form <U^T yc, Gw>; one
        # stacked psum merges the two scalar shares (value numerator,
        # local |yc|^2).
        sg = jax.lax.stop_gradient
        Vw = grid_solve._interp_A(spec.kernel, state_local,
                                  sg(Gw)[:, None, :])[:, 0]
        s_val = jnp.vdot(sg(yc), sg(yc) - Vw)  # local yc^T (yc-Vw) share
        s_sq = jnp.vdot(yc, yc)
        ss = jax.lax.psum(jnp.stack([s_val, s_sq]), axis)
        lin = ss[1] - jnp.vdot(U, Gw)
        iq = (lin + sg(ss[0] - lin)) / noise
    ld = (n - p) * jnp.log(noise) + 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(Lc)))
    return -0.5 * (iq + ld + n * LOG_2PI)


def distributed_grid_posterior(spec: ModelSpec, params, buffers, x_local,
                               y_local, x_test, axis: str = AXIS,
                               observation_noise: bool = True,
                               chunk: int = 8192):
    """EXACT SPMD posterior on the grid path — the sharded mirror of
    ops.grid_solve.grid_posterior. Runs INSIDE shard_map with x/y
    row-sharded and x_test replicated.

    All train-set dependence enters through three psums, each paid ONCE
    per call and all grid-sized (n-independent ICI traffic): the (p, p)
    interp Gram S = sum_i U_i^T U_i, U^T yc, and U^T r. Grid bounds are
    the pmin/pmax union of train+test projections (extrapolation stance
    of grid_posterior). Everything downstream — the p-space factor, the
    mean-cache weights q, and the per-test-chunk explained variance —
    is replicated p-sized math, so test points need NO collectives."""
    from ..ops import grid_solve

    kspec, kp, kb = spec.kernel, params["kernel"], buffers["kernel"]
    noise = exact_gp.noise_value(params)
    z_tr = ski.project(kspec, kp, kb, x_local)
    z_te = ski.project(kspec, kp, kb, x_test)
    lo = jnp.minimum(jnp.min(z_tr, axis=1), jnp.min(z_te, axis=1))
    hi = jnp.maximum(jnp.max(z_tr, axis=1), jnp.max(z_te, axis=1))
    lo = jax.lax.pmin(lo, axis)
    hi = jax.lax.pmax(hi, axis)

    st_train = grid_solve._build_geometry(kspec, kp, kb, x_local,
                                          kspec.grid_size,
                                          z_bounds=(lo, hi))
    S4 = jax.lax.psum(grid_solve._build_gram(kspec, st_train), axis)
    yc = y_local - exact_gp.mean_fn(spec, params, x_local)
    p = S4.shape[0] * S4.shape[1]
    G, Lc = grid_solve._factor(
        spec, kp, st_train, S4, noise,
        chol_fn=_grid_chol_fn(p, jax.lax.axis_size(axis), axis))

    # direct mean-cache form q = G C^-1 b (see grid_solve
    # _posterior_factor: algebraically equal to the n-space residual
    # route but without its 1/noise-amplified cancellation) — also one
    # fewer psum and two fewer n-sized interp passes
    U = jax.lax.psum(
        grid_solve._interp_T(kspec, st_train, yc[:, None])[:, 0, :], axis)
    b = grid_solve._Gt_apply(G, U)
    q = grid_solve._G_apply(G, jax.scipy.linalg.cho_solve((Lc, True), b))

    st_test = grid_solve._build_geometry(kspec, kp, kb, x_test,
                                         kspec.grid_size,
                                         z_bounds=(lo, hi))
    n_test = x_test.shape[0]
    mu = grid_solve._interp_A(kspec, st_test, q[:, None, :])[:, 0]
    mu = mu + exact_gp.mean_fn(spec, params, x_test)

    kd = kernels.gram_diag(kspec, kp, kb, x_test)
    nc = -(-n_test // chunk)
    outs = []
    for ci in range(nc):
        sl = slice(ci * chunk, min((ci + 1) * chunk, n_test))
        Uc = grid_solve._test_interp_rows(st_test, sl, kspec)
        outs.append(grid_solve._explained_chunk((G, Lc), noise, Uc))
    explained = jnp.concatenate(outs) if nc > 1 else outs[0]
    var = jnp.maximum(kd - explained, 1e-10)
    if observation_noise:
        var = var + noise
    return mu, var


def _make_distributed_grid_posterior(spec: ModelSpec, mesh: Mesh,
                                     observation_noise: bool = True,
                                     chunk: int = 8192):
    """make_distributed_posterior's grid-path variant: same predict
    signature (key accepted, unused — the grid posterior is exact and
    deterministic)."""

    def local_fn(params, buffers, x_local, y_local, x_test):
        return distributed_grid_posterior(
            spec, params, buffers, x_local, y_local, x_test,
            observation_noise=observation_noise, chunk=chunk)

    @jax.jit
    def predict(params, buffers, x_sharded, y_sharded, x_test, key=None):
        smapped = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(), P(), P(AXIS), P(AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return smapped(params, buffers, x_sharded, y_sharded, x_test)

    return predict


# ---------------------------------------------------------------------------
# Distributed posterior: sharded mean solve + sharded LOVE cache + replicated
# cross-MVMs — prediction never falls back to one device
# ---------------------------------------------------------------------------


def distributed_posterior(spec: ModelSpec, params, buffers, x_local, y_local,
                          x_test, fresh_local, axis: str = AXIS,
                          pre_L_local=None, pre_chol_small=None,
                          comp_axis=None, observation_noise: bool = True,
                          var_chunk: int = 256, var_tol: float = 1e-2):
    """Posterior predictive (mu, var) at replicated test points from
    row-sharded training data. Runs INSIDE shard_map; outputs replicated.

    The SPMD mirror of ops.iterative.iterative_posterior (reference
    analog: [G] exact_prediction_strategies.py eval path — SURVEY.md §3.4):

      * mean cache  alpha = A^{-1} y_c  by one tight-tolerance sharded
        batched PCG (all dot products psum over the data axis);
      * variances via a SHARDED LOVE CACHE when spec.love_rank > 0:
        Lanczos runs over the ring/grid-psum MVM with row-local Q and
        psum-reduced scalar recurrences (ops.love.lanczos rsum mode), so
        the (n, r) basis never leaves its shards; the test-side cross-MVM
        K(x*, X) [alpha | Q] costs one psum of (n_test, r) partials
        (dense kernel) or one grid-sized psum (SKI);
      * spec.love_rank == 0 falls back to chunked-CG variances — each
        test chunk's K(X, chunk) columns stay row-local and the chunk
        solve reuses the sharded PCG.

    fresh_local: (rank, n/dev) LOCAL SLICE of one globally-consistent
    normal table (Lanczos breakdown restarts must agree across devices).
    pre_L_local / pre_chol_small: optional row-sharded pivoted-Cholesky
    preconditioner (non-SKI path), as in distributed_mll.
    """
    noise = exact_gp.noise_value(params)
    n_test = x_test.shape[0]

    if comp_axis is not None:
        kspec, params_l, buffers_l, _ = _slice_components(
            spec, params, buffers, comp_axis
        )
        csize = jax.lax.axis_size(comp_axis)
        w_fix = 1.0 / csize
        comp_psum = lambda v: jax.lax.psum(v, comp_axis)
    else:
        kspec = spec.kernel
        params_l, buffers_l = params, buffers
        w_fix = 1.0
        comp_psum = lambda v: v
    kp, kb = params_l["kernel"], buffers_l["kernel"]

    yc = y_local - exact_gp.mean_fn(spec, params, x_local)

    # ---- geometry + kernel closures ----
    st_train = st_test = None
    if kspec.ski:
        # one shared grid covering the union of train (global, via
        # pmin/pmax over shards) and test (replicated) projections, so the
        # cross-covariance W_test T W_train^T is consistent and test
        # points outside the train range keep interior taps
        z_tr = ski.project(kspec, kp, kb, x_local)
        z_te = ski.project(kspec, kp, kb, x_test)
        lo = jnp.minimum(jax.lax.pmin(jnp.min(z_tr, axis=1), axis),
                         jnp.min(z_te, axis=1))
        hi = jnp.maximum(jax.lax.pmax(jnp.max(z_tr, axis=1), axis),
                         jnp.max(z_te, axis=1))
        st_train = ski.build_ski(kspec, kp, kb, x_local, kspec.grid_size,
                                 z_bounds=(lo, hi))
        st_test = ski.build_ski(kspec, kp, kb, x_test, kspec.grid_size,
                                z_bounds=(lo, hi))

        def kmvm(V):  # K(X, X) V rows for the local shard
            return comp_psum(
                w_fix * sharded_ski_mvm(kspec, kp, st_train, V, axis))

        def cross(V):  # K(x_test, X) V — replicated (n_test, t)
            return comp_psum(w_fix * sharded_ski_mvm(
                kspec, kp, st_train, V, axis, state_out=st_test))

        def kd_diag(state, n_pts):
            return comp_psum(
                w_fix * ski.ski_gram_diag(kspec, kp, state, n_pts))
    else:

        def kmvm(V):
            return comp_psum(
                w_fix * ring_mvm(kspec, kp, kb, x_local, V, axis))

        def cross(V):
            part = kernels.mvm(kspec, kp, kb, x_test, x_local, V)
            return comp_psum(w_fix * jax.lax.psum(part, axis))

        def kd_diag(_, __):
            return comp_psum(w_fix * kernels.gram_diag(kspec, kp, kb, x_test))

    A_mvm = lambda V: kmvm(V) + noise * V
    rsum = lambda s: jax.lax.psum(s, axis)

    if pre_L_local is not None:
        Lp, Cs = pre_L_local, pre_chol_small

        def M_inv(R):
            u = jax.lax.psum(
                jnp.matmul(Lp.T, R, precision=jax.lax.Precision.HIGHEST),
                axis)
            w = jax.scipy.linalg.cho_solve((Cs, True), u)
            return (R - jnp.matmul(
                Lp, w, precision=jax.lax.Precision.HIGHEST)) / noise
    else:
        M_inv = lambda R: R / noise

    # ---- mean cache: alpha = A^{-1} y_c, one tight sharded CG ----
    sol, _, _ = sharded_pcg(A_mvm, yc[:, None], M_inv,
                            4 * spec.cg_max_iters, 1e-4, axis)
    alpha = sol[:, 0]
    mu = cross(alpha[:, None])[:, 0] + exact_gp.mean_fn(spec, params, x_test)

    if spec.love_rank > 0:
        from ..ops import love

        Q, T = love.lanczos(A_mvm, yc, spec.love_rank, rsum=rsum,
                            fresh=fresh_local)
        T = T + 1e-6 * jnp.eye(T.shape[0], dtype=T.dtype)
        T_chol = jax.lax.linalg.cholesky(T)
        K_star_Q = cross(Q)  # (n_test, r) replicated
        w = jax.lax.linalg.triangular_solve(
            T_chol, K_star_Q.T, left_side=True, lower=True)
        var = kd_diag(st_test, n_test) - jnp.sum(w * w, axis=0)
        var = jnp.maximum(var, 1e-10)
        if observation_noise:
            var = var + noise
        return mu, var

    # ---- chunked-CG variances (love_rank == 0) ----
    nc = -(-n_test // var_chunk)
    pad = nc * var_chunk - n_test
    kd_full = jnp.pad(kd_diag(st_test, n_test), (0, pad))
    kd_chunks = kd_full.reshape(nc, var_chunk)
    if kspec.ski:
        # chunk geometry = column slices of the test state's tfrac (the
        # grid is shared, so no rebuild); padded slots get tfrac -100 —
        # all-zero taps, zero contribution (see ski._dense_blocks)
        tf = jnp.pad(st_test.tfrac, ((0, 0), (0, pad)),
                     constant_values=-100.0)
        J = tf.shape[0]
        chunk_geom = tf.reshape(J, nc, var_chunk).transpose(1, 0, 2)
        col = ski.toeplitz_columns(kspec, kp, st_train)
        scales = kernels._component_scales(kspec, kp, x_local.dtype)
    else:
        xt_pad = jnp.pad(x_test, ((0, pad), (0, 0)))
        chunk_geom = xt_pad.reshape(nc, var_chunk, x_test.shape[1])

    def chunk_var(inp):
        geom, kd_c = inp
        eye = jnp.eye(var_chunk, dtype=x_local.dtype)
        if kspec.ski:
            st_c = st_test._replace(tfrac=geom)
            if st_train.order is None:
                U = ski.dense_interp_transpose(st_c, eye)  # replicated
                TU = ski.sym_toeplitz_matmul(col, U)
                Kc = ski.dense_interp_apply_sum(
                    st_train, scales[:, None, None] * TU)  # (n/dev, c)
            else:
                # sorted-plan chunk states would need a per-chunk sort;
                # build from scratch on the shared grid
                raise NotImplementedError(
                    "distributed chunked variances require the dense "
                    "interp plan (or set spec.love_rank > 0)")
            Kc = comp_psum(w_fix * Kc)
        else:
            Kc = comp_psum(w_fix * kernels.mvm(
                kspec, kp, kb, x_local, geom, eye))  # (n/dev, c)
        sol_c, _, _ = sharded_pcg(A_mvm, Kc, M_inv,
                                  2 * spec.cg_max_iters, var_tol, axis)
        return kd_c - jax.lax.psum(jnp.sum(Kc * sol_c, axis=0), axis)

    var = jax.lax.map(chunk_var, (chunk_geom, kd_chunks)).reshape(-1)
    var = jnp.maximum(var[:n_test], 1e-10)
    if observation_noise:
        var = var + noise
    return mu, var


def make_distributed_posterior(spec: ModelSpec, mesh: Mesh, n_global: int,
                               observation_noise: bool = True,
                               var_chunk: int = 256, dtype=jnp.float32):
    """Memoized SPMD posterior factory (see _build_distributed_posterior
    for the call contract): one trace serves every split of a sweep."""
    from ..train import resolve_env_switches

    key = (spec, mesh, n_global, observation_noise, var_chunk,
           jnp.dtype(dtype).name, resolve_env_switches())
    return _memo(_DIST_POST_CACHE, key,
                 lambda: _build_distributed_posterior(
                     spec, mesh, n_global, observation_noise, var_chunk,
                     dtype))


def _build_distributed_posterior(spec: ModelSpec, mesh: Mesh, n_global: int,
                                 observation_noise: bool = True,
                                 var_chunk: int = 256, dtype=jnp.float32):
    """One jit'd SPMD posterior: (params, buffers, x_sharded, y_sharded,
    x_test, key) -> (mu, var) at the test points, computed WITHOUT
    gathering the training set onto one device. Companion to
    make_distributed_train_step — call it on the trained params.

    Specs that dispatch to the exact grid-space solver get the exact
    sharded grid posterior (distributed_grid_posterior) — consistent
    with training and with the single-chip grid_posterior — instead of
    the CG/LOVE approximations."""
    from ..ops import grid_solve

    if (spec.kernel.interp == "dense"
            and grid_solve.use_grid_solver(spec, n_global)):
        return _make_distributed_grid_posterior(
            spec, mesh, observation_noise=observation_noise)
    comp_axis = COMP_AXIS if COMP_AXIS in mesh.axis_names else None
    use_pre = spec.precond_rank > 0 and not spec.kernel.ski
    rank = max(spec.love_rank, 1)

    def local_fn(params, buffers, x_local, y_local, x_test, fresh_local,
                 Lp, Cs):
        return distributed_posterior(
            spec, params, buffers, x_local, y_local, x_test, fresh_local,
            pre_L_local=Lp if use_pre else None,
            pre_chol_small=Cs if use_pre else None,
            comp_axis=comp_axis, observation_noise=observation_noise,
            var_chunk=var_chunk,
        )

    in_axis = P(AXIS)

    @jax.jit
    def predict(params, buffers, x_sharded, y_sharded, x_test, key):
        smapped = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(), P(), in_axis, in_axis, P(), P(None, AXIS),
                      in_axis, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        fresh = jax.random.normal(key, (rank, n_global), dtype)
        if use_pre:
            x_full = jax.lax.with_sharding_constraint(
                x_sharded, NamedSharding(mesh, P()))
            noise = exact_gp.noise_value(params)
            pre = precond.build_preconditioner(
                spec.kernel, params["kernel"], buffers["kernel"], x_full,
                noise, spec.precond_rank)
            Lfull, Cs = pre.L, pre.chol_small
        else:
            Lfull = jnp.zeros((n_global, 1), dtype)
            Cs = jnp.eye(1, dtype=dtype)
        return smapped(params, buffers, x_sharded, y_sharded, x_test,
                       fresh, Lfull, Cs)

    return predict


# ---------------------------------------------------------------------------
# Distributed SVGP: row-sharded minibatch ELBO + one jit'd SPMD epoch
# ---------------------------------------------------------------------------


def distributed_elbo(spec: ModelSpec, params, buffers, x_local, y_local,
                     n_total: int, axis: str = AXIS):
    """SVGP minibatch ELBO on a row-sharded batch — the SPMD mirror of
    models.svgp.elbo. Runs INSIDE shard_map.

    The M x M variational/inducing algebra (K_MM Cholesky, whitened KL)
    is replicated p-sized math; only the per-datum likelihood rows shard.
    ONE scalar psum per evaluation. Gradient-assembly contract matches
    distributed_grid_mll: combine per-device grads with pmean over the
    data axis (the psum transpose re-psums replicated cotangents, making
    the mesh SUM ndev x the true gradient)."""
    from ..models import svgp

    ndev = jax.lax.axis_size(axis)
    b = x_local.shape[0] * ndev
    mu, var = svgp._predictive_qf(spec, params, buffers, x_local)
    noise = exact_gp.noise_value(params)
    lik = -0.5 * (LOG_2PI + jnp.log(noise) + (y_local - mu) ** 2 / noise)
    lik = lik - 0.5 * var / noise
    lik_term = (n_total / b) * jax.lax.psum(jnp.sum(lik), axis)

    C = svgp._var_chol(params)
    vm = params["var_mean"]
    M = vm.shape[0]
    kl = 0.5 * (jnp.sum(C * C) + vm @ vm - M
                - 2.0 * jnp.sum(jnp.log(jnp.diagonal(C))))
    return lik_term - kl


def make_distributed_svgp_epoch(spec: ModelSpec, mesh: Mesh, optimizer,
                                n_total: int, steps: int, batch: int):
    """One jit'd SPMD SVGP epoch: shuffle on device, scan over `steps`
    minibatches of `batch` rows (batch must divide by the data-axis
    size), each step one shard_map'd value-and-grad + Adam update.

    Mirrors models.svgp.train_svgp's epoch exactly (same permutation for
    the same key), so distributed and single-device trajectories agree
    to reduction-order roundoff. Data-axis mesh only (the M-sized
    variational state replicates; a comp axis would have to psum inside
    the cross-kernel — not wired)."""
    import optax

    ndev = mesh.devices.size
    if batch % ndev:
        raise ValueError(f"batch {batch} must divide by mesh size {ndev}")

    def loss_fn(p, bufs, xl, yl):
        return -distributed_elbo(spec, p, bufs, xl, yl, n_total) / n_total

    def vg(p, bufs, xl, yl):
        loss, g = jax.value_and_grad(loss_fn)(p, bufs, xl, yl)
        return loss, jax.lax.pmean(g, AXIS)

    smapped = jax.shard_map(
        vg, mesh=mesh, in_specs=(P(), P(), P(AXIS), P(AXIS)),
        out_specs=(P(), P()), check_vma=False,
    )
    row_sh = NamedSharding(mesh, P(AXIS))

    @jax.jit
    def epoch(params, buffers, opt_state, x, y, key):
        perm = jax.random.permutation(key, n_total)
        xs = x[perm[: steps * batch]].reshape(steps, batch, -1)
        ys = y[perm[: steps * batch]].reshape(steps, batch)

        def step(carry, xy):
            params, opt_state = carry
            xb, yb = xy
            xb = jax.lax.with_sharding_constraint(xb, row_sh)
            yb = jax.lax.with_sharding_constraint(yb, row_sh)
            loss, grads = smapped(params, buffers, xb, yb)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (xs, ys))
        return params, opt_state, losses.mean()

    return epoch
