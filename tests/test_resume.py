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
        np.testing.assert_allclose(
            part.losses[:20] + resumed.losses,
            full.losses, rtol=1e-6,
        )
        fa, _ = jax.flatten_util.ravel_pytree(full.params)
        ra, _ = jax.flatten_util.ravel_pytree(resumed.params)
        np.testing.assert_allclose(np.asarray(ra), np.asarray(fa), rtol=1e-6)
