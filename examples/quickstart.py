"""rpagp quickstart: train an RPA-GP, predict, sample, checkpoint.

The runnable analog of the reference's exploration notebooks
([U] notebooks/ — SURVEY.md §2.1). Sized to finish in ~a minute on CPU:

    python examples/quickstart.py
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# CPU is plenty here; also dodges partially-initialized TPU plugins
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

import rpagp  # noqa: E402


def main():
    # ---- data: any (n, D) features + (n,) targets ----------------------
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    n, D = 400, 6
    x = jax.random.normal(k1, (n, D))
    y = jnp.sin(2.0 * x[:, 0]) + 0.5 * x[:, 1] ** 2 \
        + 0.1 * jax.random.normal(k2, (n,))
    x_test = jax.random.normal(k3, (50, D))

    # ---- model: J=10 random 1-D projections, RBF sub-kernels -----------
    spec = rpagp.ModelSpec(
        kernel=rpagp.KernelSpec.polynomial(J=10, d=1, base="rbf",
                                           proj_dist="gaussian"),
    )
    params, buffers = rpagp.init_model(jax.random.key(1), spec, D)

    # ---- train: Adam on the exact MLL (n < max_cholesky_size) ----------
    loss = lambda p: -rpagp.mll(spec, p, buffers, x, y) / n
    res = rpagp.train_to_convergence(loss, params, lr=0.1, max_iters=200,
                                     patience=20)
    print(f"trained: {res.iterations} iters, loss {res.losses[-1]:.4f}, "
          f"converged={res.converged}")

    # ---- predict: mean/variance, full covariance, joint samples --------
    mu, var = rpagp.posterior(spec, res.params, buffers, x, y, x_test)
    print(f"posterior: mean[:3]={mu[:3]}, var[:3]={var[:3]}")

    mu_c, cov = rpagp.posterior_cov(spec, res.params, buffers, x, y,
                                    x_test[:10])
    draws = rpagp.sample_posterior(spec, res.params, buffers, x, y,
                                   x_test[:10], jax.random.key(2),
                                   num_samples=5)
    print(f"cov {cov.shape}, samples {draws.shape}")

    # ---- cached predictor: factor once, many test batches --------------
    predict = rpagp.make_predictor(spec, res.params, buffers, x, y)
    for i in range(3):
        xb = jax.random.normal(jax.random.key(10 + i), (32, D))
        mu_b, _ = predict(xb)
        print(f"batch {i}: mean of means {float(mu_b.mean()):+.4f}")

    # ---- checkpoint round trip (projections persist with the model) ----
    import tempfile

    from rpagp.utils import checkpoint as ckpt

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model.npz")
        ckpt.save_checkpoint(path, {"params": res.params,
                                    "buffers": buffers})
        restored = ckpt.load_checkpoint(path, like={"params": res.params,
                                                    "buffers": buffers})
        mu2, _ = rpagp.posterior(spec, restored["params"],
                                 restored["buffers"], x, y, x_test)
        print("checkpoint round-trip max |d mu| =",
              float(jnp.max(jnp.abs(mu2 - mu))))


if __name__ == "__main__":
    main()
