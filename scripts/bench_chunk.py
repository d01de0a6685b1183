"""Interleaved A/B: sync_every=8 loop (per-step dispatch) vs
chunk_steps=8 (one lax.scan program per 8 steps) on the warm protein
train call.

r5f left the warm loop at 57 ms/iter against the 29 ms step — the
residual is per-step DISPATCH RTT on the remote-tunnel transport, which
chunked loss reads (sync_every) cannot remove. make_chunk dispatches
ONE XLA program per 8 steps. Interleaved rounds + median per the drift
discipline (CLAUDE.md: identical runs swing up to 2.5x).

    python scripts/bench_chunk.py [iters] [rounds]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from rpagp.mll import mll as mll_fn  # noqa: E402
from rpagp.models import exact_gp  # noqa: E402
from rpagp.train import train_to_convergence  # noqa: E402
from rpagp.utils import datasets as data_mod  # noqa: E402
from rpagp.utils.config import load_spec, make_optimizer  # noqa: E402


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    exp = load_spec("specs/rp_ski_protein.json")
    spec = exp.model
    ds = data_mod.load_dataset("protein")
    split = next(data_mod.kfold_splits(ds, 10, seed=0, equal_train=True))
    x = jnp.asarray(split.train_x)
    y = jnp.asarray(split.train_y)
    n = x.shape[0]
    print(f"protein n={n} iters={iters} rounds={rounds}")

    params, buffers = exact_gp.init_model(jax.random.key(0), spec, x.shape[1])
    buffers = exact_gp.prepare_buffers(spec, params, buffers, x, y_train=y)

    def loss_fn(p, b, xx, yy):
        return -mll_fn(spec, p, b, xx, yy) / n

    optimizer = make_optimizer(exp.train)
    aot = (spec, n, False, True, exp.train)
    kw = dict(lr=exp.train.lr, max_iters=iters, patience=10 * iters,
              rel_tol=0.0, loss_args=(buffers, x, y), optimizer=optimizer)

    # 4-way: loop shape (per-step dispatch vs scanned chunk) x program
    # source (jax.export AOT vs plain jit) — the 2x question is whether
    # the AOT-exported module itself runs slower than the jitted one
    variants = {
        "sync8_aot": dict(sync_every=8, aot_key=aot),
        "chunk8_aot": dict(chunk_steps=8, aot_key=aot),
        "sync8_jit": dict(sync_every=8),
        "chunk8_jit": dict(chunk_steps=8),
    }
    results = {k: [] for k in variants}
    # warm both programs (AOT load / trace+compile) outside the timing
    for name, v in variants.items():
        t0 = time.perf_counter()
        res = train_to_convergence(loss_fn, params, **kw, **v)
        print(f"{name}: warmup {time.perf_counter() - t0:.1f}s "
              f"final_loss={res.losses[-1]:.6f} iters={res.iterations}")

    for r in range(rounds):
        for name, v in variants.items():
            t0 = time.perf_counter()
            res = train_to_convergence(loss_fn, params, **kw, **v)
            dt = time.perf_counter() - t0
            results[name].append(dt)
            print(f"  round {r} {name}: {dt:.2f}s "
                  f"({dt / iters * 1e3:.1f} ms/iter)")

    for name, ts in results.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        print(f"{name}: median {med:.2f}s = {med / iters * 1e3:.1f} ms/iter "
              f"(runs: " + " ".join(f"{t:.2f}" for t in ts) + ")")


if __name__ == "__main__":
    main()
