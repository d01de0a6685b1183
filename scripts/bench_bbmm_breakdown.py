"""Attribution for the config-3 BBMM per-iteration cost (VERDICT r4 #6).

Decomposes the quiet-chip 189.4 ms/iter (scripts/bench_bbmm.py, r4d)
into its parts, the same way bench_grid_breakdown did for the grid step
(r3c): per-MVM cost x CG iteration count, preconditioner build
(amortized over spec.precond_refresh), SLQ tail, and the custom-vjp
backward's extra MVM — so "the reference-style path is at/near its
floor" is an arithmetic statement, not a guess. The hot loop this
mirrors is [G] gpytorch/utils/linear_cg.py + _inv_quad_log_det.py.

    python scripts/bench_bbmm_breakdown.py [n] [rounds] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from rpagp.mll import mll as mll_fn  # noqa: E402
from rpagp.models import exact_gp  # noqa: E402
from rpagp.ops import cg as cg_mod  # noqa: E402
from rpagp.ops import precond  # noqa: E402
from rpagp.ops.iterative import (_build_pre, _make_A_mvm,  # noqa: E402
                                 _ski_state)
from rpagp.utils.compile_cache import enable_persistent_cache  # noqa: E402
from rpagp.utils.config import load_spec  # noqa: E402

enable_persistent_cache()


def _timed(fn, args, rounds, steps, sync):
    fn(*args)  # compile
    sync(fn(*args))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) / steps * 1e3)
    return sorted(ts)[len(ts) // 2]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 14939
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    D = 18
    exp = load_spec("specs/rp_bbmm_elevators.json")
    spec = exp.model
    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (n, D), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jax.random.normal(
        ky, (n,), jnp.float32)
    params, buffers = exact_gp.init_model(jax.random.key(1), spec, D)
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x, y_train=y)
    noise = exact_gp.noise_value(params)
    t = spec.num_probes
    B = jax.random.normal(jax.random.key(3), (n, t + 1), jnp.float32)

    def sync_any(out):
        return float(jnp.sum(jax.tree.leaves(out)[0]))

    # 1) one batched kernel MVM (the CG inner op)
    @jax.jit
    def one_mvm(p, b, x, B):
        state = _ski_state(spec, p, b, x, use_cache=True)
        A = _make_A_mvm(spec, p, b, x, exact_gp.noise_value(p), state=state)
        return A(B)

    mvm_ms = _timed(one_mvm, (params, buffers, x, B), rounds, steps,
                    sync_any)

    # 2) preconditioner build (amortized /spec.precond_refresh in train)
    @jax.jit
    def build_pre(p, b, x):
        return _build_pre(spec, p, b, x, exact_gp.noise_value(p))

    pre_ms = _timed(build_pre, (params, buffers, x), rounds, steps,
                    sync_any)

    # 3) the full forward CG solve (batched PCG, fixed warm pre)
    pre = build_pre(params, buffers, x)

    @jax.jit
    def cg_solve(p, b, x, B, pre):
        state = _ski_state(spec, p, b, x, use_cache=True)
        A = _make_A_mvm(spec, p, b, x, exact_gp.noise_value(p), state=state)
        M_inv = lambda R: precond.apply_inverse(pre, R)
        res = cg_mod.batched_pcg(A, B, M_inv, max_iters=spec.cg_max_iters,
                                 tol=spec.cg_tol)
        return res.solution

    cg_ms = _timed(cg_solve, (params, buffers, x, B, pre), rounds, steps,
                   sync_any)

    # 4) full MLL forward only (value; includes CG + SLQ + probe draws)
    @jax.jit
    def fwd(p, b, x, y, key):
        return -mll_fn(spec, p, b, x, y, key=key) / n

    key = jax.random.key(4)
    fwd_ms = _timed(fwd, (params, buffers, x, y, key), rounds, steps,
                    lambda o: float(o))

    # 5) full value_and_grad (the train step's cost, sans Adam)
    @jax.jit
    def fwd_grad(p, b, x, y, key):
        return jax.value_and_grad(
            lambda p: -mll_fn(spec, p, b, x, y, key=key) / n)(p)

    fg_ms = _timed(fwd_grad, (params, buffers, x, y, key), rounds, steps,
                   lambda o: float(o[0]))

    refresh = max(1, spec.precond_refresh)
    print(f"bbmm breakdown n={n} J={spec.kernel.J} rank={spec.precond_rank} "
          f"cg={spec.cg_max_iters} probes={t} (medians of {rounds}x{steps})")
    print(f"  one batched MVM (t+1={t + 1} cols): {mvm_ms:8.2f} ms")
    print(f"  x {spec.cg_max_iters} CG iters       -> {mvm_ms * spec.cg_max_iters:8.2f} ms (MVM share bound)")
    print(f"  full batched PCG solve:    {cg_ms:8.2f} ms")
    print(f"  precond build (rank {spec.precond_rank}): {pre_ms:8.2f} ms"
          f"  (/{refresh} refresh = {pre_ms / refresh:.2f} ms/step)")
    print(f"  MLL forward total:         {fwd_ms:8.2f} ms"
          f"  (SLQ+draws tail = fwd - CG = {fwd_ms - cg_ms:.2f} ms)")
    print(f"  value_and_grad total:      {fg_ms:8.2f} ms"
          f"  (backward share = {fg_ms - fwd_ms:.2f} ms)")
    print(f"  amortized step estimate:   {fg_ms + pre_ms / refresh:8.2f} ms")


if __name__ == "__main__":
    main()
