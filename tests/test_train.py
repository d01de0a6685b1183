"""Training-loop contracts (rpagp/train.py).

The key invariant under test: the returned best params are the iterate
the best loss was EVALUATED at. The jitted step returns
loss(params_in) alongside params_out = adam(params_in), so pairing the
loss with params_out (the historical off-by-one) returns params one
Adam step PAST the best iterate — params whose loss was never computed.
"""

import jax
import jax.numpy as jnp
import pytest

from rpagp.train import ConvergenceTracker, train_fixed, train_to_convergence


def test_sync_every_identical_outcome():
    """sync_every > 1 dispatches ahead but consumes losses in order
    through the same tracker: same losses prefix, same stop iteration,
    same best params/loss as the per-step-sync loop."""
    import numpy as np

    def loss_fn(params, x):
        return jnp.sum((params["w"] - x) ** 2) + 0.1 * jnp.sum(
            jnp.sin(20.0 * params["w"]))  # rough surface -> patience stop

    x = jnp.linspace(0.0, 1.0, 4)
    p0 = {"w": jnp.zeros(4)}
    kw = dict(lr=0.3, max_iters=200, patience=5, rel_tol=1e-6,
              loss_args=(x,))
    a = train_to_convergence(loss_fn, p0, sync_every=1, **kw)
    b = train_to_convergence(loss_fn, p0, sync_every=8, **kw)
    assert a.converged and b.converged
    assert a.iterations == b.iterations
    np.testing.assert_array_equal(a.losses, b.losses)
    assert a.best_loss == b.best_loss
    for la, lb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(la, lb)


def test_chunk_steps_matches_per_step_loop():
    """chunk_steps > 1 (one lax.scan program per k steps) walks the
    same trajectory as the per-step loop: same stop iteration, same
    losses (to scan-fusion roundoff), same best params, and the
    returned params achieve the recorded best loss. Covers: patience
    stop mid-chunk, max_iters not a multiple of k (tail overshoot
    discard), and the deterministic no-key path."""
    import numpy as np

    def loss_fn(params, x):
        return jnp.sum((params["w"] - x) ** 2) + 0.1 * jnp.sum(
            jnp.sin(20.0 * params["w"]))

    x = jnp.linspace(0.0, 1.0, 4)
    p0 = {"w": jnp.zeros(4)}
    kw = dict(lr=0.3, max_iters=203, patience=5, rel_tol=1e-6,
              loss_args=(x,))
    a = train_to_convergence(loss_fn, p0, sync_every=1, **kw)
    b = train_to_convergence(loss_fn, p0, chunk_steps=8, **kw)
    assert a.converged and b.converged
    assert a.iterations == b.iterations
    np.testing.assert_allclose(a.losses, b.losses, rtol=1e-5)
    assert b.best_loss == pytest.approx(a.best_loss, rel=1e-5)
    for la, lb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-7)
    # returned params achieve the recorded best (the _ChunkSlot
    # materialization picked the right in-chunk iterate)
    re_eval = float(loss_fn(b.params, x))
    assert re_eval == pytest.approx(min(b.losses), rel=1e-5, abs=1e-7)


def test_chunk_steps_stochastic_key_stream():
    """Stochastic path: the chunk's in-scan key splits continue the
    host stream, so chunked and per-step runs see identical probe
    subkeys (same loss sequence up to roundoff)."""
    import numpy as np

    def loss_fn(params, x, key):
        noise = 0.01 * jax.random.normal(key, ())
        return jnp.sum((params["w"] - x) ** 2) + noise

    x = jnp.linspace(-1.0, 1.0, 3)
    p0 = {"w": jnp.zeros(3)}
    kw = dict(lr=0.2, max_iters=40, patience=100, rel_tol=1e-9,
              loss_args=(x,))
    a = train_to_convergence(loss_fn, p0, key=jax.random.key(7),
                             sync_every=1, **kw)
    b = train_to_convergence(loss_fn, p0, key=jax.random.key(7),
                             chunk_steps=5, **kw)
    assert a.iterations == b.iterations == 40
    np.testing.assert_allclose(a.losses, b.losses, rtol=1e-5, atol=1e-7)


def test_chunk_steps_respects_refresh_boundaries():
    """args_refresh(every=6) with chunk_steps=8 -> effective chunk
    gcd(8,6)=2; refreshes must fire at exactly the same iterations as
    the per-step loop (multiples of 6), keeping trajectories aligned."""
    import numpy as np

    calls_a, calls_b = [], []

    def loss_fn(params, c, x):
        return jnp.sum((params["w"] - x - c) ** 2)

    x = jnp.linspace(0.0, 1.0, 3)
    p0 = {"w": jnp.zeros(3)}

    def make_refresh(log):
        def refresh(params, loss_args):
            log.append(len(log))
            # bump the offset each refresh so the refresh SCHEDULE is
            # observable in the loss trajectory
            return (loss_args[0] + 0.05, loss_args[1])
        return (6, refresh)

    kw = dict(lr=0.2, max_iters=25, patience=100, rel_tol=1e-9)
    a = train_to_convergence(loss_fn, p0, loss_args=(jnp.asarray(0.0), x),
                             args_refresh=make_refresh(calls_a), **kw)
    b = train_to_convergence(loss_fn, p0, loss_args=(jnp.asarray(0.0), x),
                             args_refresh=make_refresh(calls_b),
                             chunk_steps=8, **kw)
    assert len(calls_a) == len(calls_b) == 4  # iters 6, 12, 18, 24
    np.testing.assert_allclose(a.losses, b.losses, rtol=1e-5, atol=1e-7)


def test_tracker_pairs_loss_with_its_params():
    """Unit contract: best_params is the params object passed WITH the
    best loss (the caller guarantees that pairing)."""
    tr = ConvergenceTracker(patience=3, rel_tol=1e-9)
    seq = [(5.0, "p0"), (4.0, "p1"), (3.0, "p2"),
           (3.0, "p3"), (3.0, "p4"), (3.0, "p5")]
    stopped = False
    for loss, tag in seq:
        if tr.update(loss, tag):
            stopped = True
            break
    assert stopped  # exact plateau exhausts patience=3
    assert tr.best == 3.0
    assert tr.best_params == "p2"  # the iterate that ACHIEVED 3.0


def test_train_returns_params_achieving_best_recorded_loss():
    """End-to-end: re-evaluating the loss at the returned params must
    reproduce min(losses). With the off-by-one the returned params are
    one step past the best iterate and this fails."""

    def loss_fn(params):
        return jnp.sum((params["w"] - 3.0) ** 2)

    params = {"w": jnp.zeros((2,), jnp.float32)}
    res = train_to_convergence(loss_fn, params, lr=0.3, max_iters=200,
                               patience=5, rel_tol=1e-7)
    assert res.converged
    best_recorded = min(res.losses)
    re_eval = float(loss_fn(res.params))
    assert re_eval == pytest.approx(best_recorded, rel=1e-6, abs=1e-7)


def test_train_with_checkpointing_same_pairing(tmp_path):
    from rpagp.train import train_with_checkpointing

    def loss_fn(params):
        return jnp.sum((params["w"] - 1.5) ** 2)

    params = {"w": jnp.zeros((3,), jnp.float32)}
    res = train_with_checkpointing(
        loss_fn, params, str(tmp_path), lr=0.2, max_iters=150,
        patience=5, rel_tol=1e-7, checkpoint_every=50)
    best_recorded = min(res.losses)
    re_eval = float(loss_fn(res.params))
    assert re_eval == pytest.approx(best_recorded, rel=1e-6, abs=1e-7)


def test_train_fixed_matches_loop_trajectory():
    """train_fixed (one lax.scan program) and the Python loop walk the
    same Adam trajectory on a deterministic loss."""

    def loss_fn(params):
        return jnp.sum((params["w"] - 2.0) ** 2) + params["b"] ** 2

    params = {"w": jnp.ones((2,), jnp.float32), "b": jnp.asarray(1.0)}
    p_fixed, losses_fixed = train_fixed(loss_fn, params, lr=0.1,
                                        num_iters=25)
    res = train_to_convergence(loss_fn, params, lr=0.1, max_iters=25,
                               patience=100, rel_tol=0.0)
    assert jnp.allclose(jnp.asarray(res.losses), losses_fixed, rtol=1e-5)
