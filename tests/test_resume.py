"""Checkpointed training resumes exactly: interrupted-then-resumed run
matches the uninterrupted run step for step."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from rpagp import KernelSpec, ModelSpec, exact_mll, init_model
from rpagp.train import train_with_checkpointing

KEY = jax.random.key(0)


def _problem(n=40, D=3):
    kx, ky = jax.random.split(jax.random.key(2))
    x = jax.random.normal(kx, (n, D))
    y = jnp.sin(2 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,))
    return x, y


def test_resume_matches_uninterrupted_run():
    x, y = _problem()
    spec = ModelSpec(kernel=KernelSpec.polynomial(J=3, d=1))
    params, buffers = init_model(KEY, spec, x.shape[1])
    loss = lambda p, b, xx, yy: -exact_mll(spec, p, b, xx, yy) / 40
    args = (buffers, x, y)

    with tempfile.TemporaryDirectory() as d1:
        full = train_with_checkpointing(
            loss, params, os.path.join(d1, "a"),
            max_iters=30, checkpoint_every=10, loss_args=args,
        )
    with tempfile.TemporaryDirectory() as d2:
        ckdir = os.path.join(d2, "b")
        # "crash" after 20 steps (checkpoint at 10 and 20)
        part = train_with_checkpointing(
            loss, params, ckdir, max_iters=20, checkpoint_every=10,
            loss_args=args,
        )
        resumed = train_with_checkpointing(
            loss, params, ckdir, max_iters=30, checkpoint_every=10,
            loss_args=args,
        )
        assert resumed.iterations == 10  # picked up at step 20
        # loss history spans ALL segments (persisted in losses.npy)
        assert len(resumed.losses) == 30
        np.testing.assert_allclose(resumed.losses[:20], part.losses, rtol=1e-6)
        np.testing.assert_allclose(resumed.losses, full.losses, rtol=1e-6)
        fa, _ = jax.flatten_util.ravel_pytree(full.params)
        ra, _ = jax.flatten_util.ravel_pytree(resumed.params)
        np.testing.assert_allclose(np.asarray(ra), np.asarray(fa), rtol=1e-6)


def test_checkpointed_training_converges_with_patience():
    """train_with_checkpointing honors the same patience contract as
    train_to_convergence: it stops early, flags converged, and a resumed
    run continues the patience state rather than resetting it."""
    x, y = _problem()
    spec = ModelSpec(kernel=KernelSpec.polynomial(J=3, d=1))
    params, buffers = init_model(KEY, spec, x.shape[1])
    loss = lambda p, b, xx, yy: -exact_mll(spec, p, b, xx, yy) / 40
    args = (buffers, x, y)

    with tempfile.TemporaryDirectory() as d:
        res = train_with_checkpointing(
            loss, params, os.path.join(d, "a"),
            max_iters=500, patience=5, rel_tol=1e-3,
            checkpoint_every=10, loss_args=args,
        )
    assert res.converged
    assert res.iterations < 500
    # best-params contract: returned params scored the best loss seen
    assert min(res.losses) <= res.losses[-1] + 1e-12

    # convergence state survives resume: run 10 steps of an already-flat
    # objective, resume, and the combined run must still stop early
    flat = lambda p, b, xx, yy: -exact_mll(spec, p, b, xx, yy) * 0.0
    with tempfile.TemporaryDirectory() as d:
        ckdir = os.path.join(d, "b")
        train_with_checkpointing(
            flat, params, ckdir, max_iters=10, patience=12, rel_tol=1e-3,
            checkpoint_every=5, loss_args=args,
        )
        resumed = train_with_checkpointing(
            flat, params, ckdir, max_iters=100, patience=12, rel_tol=1e-3,
            checkpoint_every=5, loss_args=args,
        )
    # 10 flat steps before + patience 12 -> stops ~3 steps in, not 12
    assert resumed.converged
    assert resumed.iterations <= 6


def test_zero_gradient_stall_warning(capsys):
    """Failure detection: exactly-zero gradients (the frozen-training
    signature of a no-progress CG, ops/cg.py best-iterate) must warn on
    the first step; a live objective must not."""
    import jax.numpy as jnp

    from rpagp.train import train_to_convergence

    p0 = {"w": jnp.ones((3,))}
    train_to_convergence(lambda p: jnp.sum(p["w"]) * 0.0, p0, max_iters=3)
    assert "stalled" in capsys.readouterr().err
    train_to_convergence(lambda p: jnp.sum(p["w"] ** 2), p0, max_iters=3)
    assert "stalled" not in capsys.readouterr().err
