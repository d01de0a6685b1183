"""Interleaved A/B: XLA batched chol vs the batched Pallas leaf
(pallas_chol.chol_linv_batched) inside grid_solve._chol_ladder, at the
flagship ladder shape (J=20, m=256 Toeplitz blocks), fwd and fwd+grad.

The batched Pallas factor shipped as the on-TPU ladder default in the r3
snapshot WITHOUT a recorded measurement — same evidence-discipline gap
as the tri-update (VERDICT r3 weak #1). The two-call pallas ladder
LOST (r4b: fwd 5.07 vs 4.24 ms, f+g 8.46 vs 7.61); the factor-first
fast path (ONE chol_linv_batched + lax.cond escalation, enabled by the
leaf's finite-primal failure contract) is what r4e measures: "xla"
(RPAGP_PALLAS_LADDER=0) vs "fast" (=1). The p x p panel leaf (measured
r3g, RPAGP_PALLAS_CHOL) is untouched. Interleaved rounds, median, per
r3f drift discipline.

    python scripts/bench_ladder.py [J] [m] [rounds] [steps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from rpagp.ops import grid_solve, pallas_chol  # noqa: E402


def make_blocks(J, m):
    """Flagship-shaped SPD Toeplitz batch: RBF grid kernel columns at
    J different lengthscales (the real ladder input's structure)."""
    x = jnp.arange(m, dtype=jnp.float32)
    ls = jnp.linspace(3.0, 12.0, J)[:, None]  # grid-units lengthscales
    col = jnp.exp(-0.5 * (x[None, :] / ls) ** 2)  # (J, m)
    idx = jnp.abs(jnp.arange(m)[:, None] - jnp.arange(m)[None, :])
    T = col[:, idx]
    # diagonal shift: a realistic RBF grid Toeplitz is near-singular at
    # ANY useful lengthscale, so the two variants' minimal-that-factors
    # ladder levels (XLA NaN-check vs Pallas pivot flag) can disagree —
    # then the while_loop probe counts and the final L differ and the
    # A/B compares different work (observed: vals apart by 0.6%). The
    # shift pins BOTH variants to ladder level 0 / one probe iteration;
    # the printed val= lines must agree to f32 roundoff or the run is
    # invalid. Toeplitz structure and batch shape are preserved.
    eye = jnp.eye(m, dtype=jnp.float32)
    return T + 0.5 * eye


def main():
    J = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    T = make_blocks(J, m)
    eps0 = 1e-5 * T[:, 0, 0]
    R = jax.random.normal(jax.random.key(1), (J, m, m), jnp.float32)

    def loss(T, R):
        L, _ = grid_solve._chol_ladder(T, eps0)
        return jnp.vdot(L, R) + 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

    variants = {}
    for name, env, fused in (("xla", "0", "1"), ("vmap", "1", "0"),
                             ("fused", "1", "1")):
        os.environ["RPAGP_PALLAS_LADDER"] = env
        os.environ["RPAGP_LADDER_FUSED"] = fused
        fwd = jax.jit(lambda T: grid_solve._chol_ladder(T, eps0)[0])
        vg = jax.jit(jax.value_and_grad(loss))
        t0 = time.perf_counter()
        float(jnp.sum(fwd(T)))
        v, g = vg(T, R)
        float(v), float(jnp.sum(g))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s "
              f"val={float(v):.6e}")
        variants[name] = (fwd, vg, [], [])
    assert pallas_chol.batch_supported(m), "fast variant never engaged"

    for r in range(rounds):
        for name, (fwd, vg, tf, tg) in variants.items():
            t0 = time.perf_counter()
            for _ in range(steps):
                L = fwd(T)
            float(jnp.sum(L))
            tf.append((time.perf_counter() - t0) / steps * 1e3)
            t0 = time.perf_counter()
            for _ in range(steps):
                v, g = vg(T, R)
            float(v), float(jnp.sum(g))
            tg.append((time.perf_counter() - t0) / steps * 1e3)

    for name, (_, _, tf, tg) in variants.items():
        tf, tg = sorted(tf), sorted(tg)
        print(f"{name}: fwd median {tf[len(tf) // 2]:7.2f} ms "
              f"(rounds: {' '.join(f'{t:.2f}' for t in tf)})")
        print(f"{name}: f+g median {tg[len(tg) // 2]:7.2f} ms "
              f"(rounds: {' '.join(f'{t:.2f}' for t in tg)})")


if __name__ == "__main__":
    main()
