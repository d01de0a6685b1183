"""Integration tests: the runner CLI end-to-end on tiny synthetic data
(the reference's de-facto integration test — SURVEY.md §4: 'experiment
runner on a small UCI set reaching a known RMSE band')."""

import csv
import json
import os
import tempfile

import numpy as np
import pytest

from rpagp import runner
from rpagp.utils.results import aggregate


def _write_spec(d, body):
    path = os.path.join(d, "spec.json")
    with open(path, "w") as f:
        json.dump(body, f)
    return path


def test_runner_end_to_end_exact_kernel():
    with tempfile.TemporaryDirectory() as d:
        spec = _write_spec(d, {
            "name": "it_exact",
            "kernel": {"type": "projection", "J": 4, "d": 1},
            "training": {"lr": 0.1, "max_iters": 60, "patience": 15},
        })
        out = os.path.join(d, "r.csv")
        runner.main([
            "--model_spec", spec, "--datasets", "challenger",
            "--splits", "5", "--max_splits", "2", "--output", out,
        ])
        rows = list(csv.DictReader(open(out)))
        assert len(rows) == 2
        assert rows[0]["dataset"] == "challenger"
        assert rows[0]["synthetic_data"] == "True"
        for r in rows:
            assert np.isfinite(float(r["rmse"]))
            assert np.isfinite(float(r["nll"]))
            assert int(r["iterations"]) >= 1
        agg = aggregate([out])
        assert ("challenger", "it_exact") in agg


def test_runner_degree2_end_to_end():
    """Degree-2 components through the full runner path (regression: the
    eager posterior used to cost a per-op remote compile on TPU
    transports — minutes for the d=2 graph; mll.posterior is now one
    jitted program)."""
    with tempfile.TemporaryDirectory() as d:
        spec = _write_spec(d, {
            "name": "it_d2",
            "kernel": {"type": "projection", "J": 4, "d": 2},
            "training": {"lr": 0.1, "max_iters": 30, "patience": 10},
        })
        out = os.path.join(d, "r.csv")
        runner.main([
            "--model_spec", spec, "--datasets", "challenger",
            "--splits", "5", "--max_splits", "1", "--output", out,
        ])
        rows = list(csv.DictReader(open(out)))
        assert len(rows) == 1
        assert np.isfinite(float(rows[0]["rmse"]))


def test_runner_iterative_dispatch_band():
    """Force the BBMM path via a tiny max_cholesky_size; the model must
    still beat the constant predictor (RMSE < 1 on z-scored targets)."""
    with tempfile.TemporaryDirectory() as d:
        spec = _write_spec(d, {
            "name": "it_bbmm",
            "kernel": {"type": "projection", "J": 4, "d": 1},
            "training": {"lr": 0.1, "max_iters": 80, "patience": 20},
            "inference": {"max_cholesky_size": 16, "cg_max_iters": 40,
                          "precond_rank": 5, "num_probes": 8,
                          "cg_tol": 1e-4},
        })
        out = os.path.join(d, "r.csv")
        runner.main([
            "--model_spec", spec, "--datasets", "fertility",
            "--splits", "5", "--max_splits", "1", "--output", out,
        ])
        rows = list(csv.DictReader(open(out)))
        assert len(rows) == 1
        # measured 0.871 on this seed/data; a constant predictor on
        # z-scored targets scores ~1.0 — the band must separate the two
        assert float(rows[0]["rmse"]) < 0.93
        assert float(rows[0]["nll"]) < 1.40  # constant predictor ~1.42


def test_runner_distributed_end_to_end():
    """--distributed: SPMD training + SHARDED posterior (never gathers
    the training set) on the virtual 8-CPU mesh."""
    import jax

    # conftest pins jax_default_device to cpu:0, so the runner's
    # make_mesh() spans the 8 virtual CPU devices
    try:
        n_cpu = len(jax.devices("cpu"))
    except RuntimeError:
        n_cpu = 0
    if n_cpu < 2:
        pytest.skip("needs a multi-device mesh")
    with tempfile.TemporaryDirectory() as d:
        spec = _write_spec(d, {
            "name": "it_dist",
            "kernel": {"type": "projection", "J": 4, "d": 1,
                       "ski": True, "grid_size": 32},
            "training": {"lr": 0.1, "max_iters": 25, "patience": 10},
            "inference": {"max_cholesky_size": 16, "cg_max_iters": 30,
                          "precond_rank": 0, "num_probes": 8,
                          "love_rank": 40},
        })
        out = os.path.join(d, "r.csv")
        runner.main([
            "--model_spec", spec, "--datasets", "fertility",
            "--splits", "5", "--max_splits", "1", "--output", out,
            "--distributed",
        ])
        rows = list(csv.DictReader(open(out)))
        assert len(rows) == 1
        assert np.isfinite(float(rows[0]["rmse"]))
        assert np.isfinite(float(rows[0]["nll"]))
        # measured 0.888 / 1.300 on this seed; a constant predictor on
        # z-scored targets scores rmse ~1.0 / nll ~1.42 — the SPMD
        # end-to-end path must FAIL when the model learns nothing
        assert float(rows[0]["rmse"]) < 0.93
        assert float(rows[0]["nll"]) < 1.40


def test_runner_distributed_comp_shards_end_to_end():
    """--distributed --comp_shards 2: 2-D (data x comp) mesh — kernel
    components sharded over the comp axis, rows over data — through the
    full runner path including the sharded posterior."""
    import jax

    try:
        n_cpu = len(jax.devices("cpu"))
    except RuntimeError:
        n_cpu = 0
    if n_cpu < 4:
        pytest.skip("needs >=4 devices for a 2x2 mesh")
    with tempfile.TemporaryDirectory() as d:
        spec = _write_spec(d, {
            "name": "it_dist_comp",
            "kernel": {"type": "projection", "J": 4, "d": 1,
                       "ski": True, "grid_size": 32},
            "training": {"lr": 0.1, "max_iters": 25, "patience": 10},
            "inference": {"max_cholesky_size": 16, "cg_max_iters": 30,
                          "precond_rank": 0, "num_probes": 8,
                          "love_rank": 40},
        })
        out = os.path.join(d, "r.csv")
        runner.main([
            "--model_spec", spec, "--datasets", "fertility",
            "--splits", "5", "--max_splits", "1", "--output", out,
            "--distributed", "--comp_shards", "2",
        ])
        rows = list(csv.DictReader(open(out)))
        assert len(rows) == 1
        assert np.isfinite(float(rows[0]["rmse"]))
        assert np.isfinite(float(rows[0]["nll"]))
        # measured 0.888 / 1.300 (same band rationale as the 1-D mesh
        # test above: a constant predictor must fail)
        assert float(rows[0]["rmse"]) < 0.93
        assert float(rows[0]["nll"]) < 1.40


def test_runner_distributed_trains_past_patience():
    """Regression: the distributed loop's best-loss tracking. best starts
    at inf, and `loss < inf - rel_tol*inf` is `loss < nan` == False — so
    without the best==inf guard EVERY iteration counts as "bad", training
    stops at exactly `patience` iters, and the INIT params are returned
    as best. With a steadily-descending deterministic (grid-solver) loss
    the run must go well past patience."""
    import jax

    try:
        n_cpu = len(jax.devices("cpu"))
    except RuntimeError:
        n_cpu = 0
    if n_cpu < 2:
        pytest.skip("needs a multi-device mesh")
    with tempfile.TemporaryDirectory() as d:
        spec = _write_spec(d, {
            "name": "it_dist_grid",
            # J*m = 128 << n: dispatches to the exact grid solver, whose
            # loss descends monotonically for >>patience steps here
            "kernel": {"type": "projection", "J": 4, "d": 1,
                       "ski": True, "grid_size": 32},
            "training": {"lr": 0.1, "max_iters": 40, "patience": 10},
            "inference": {"max_cholesky_size": 16},
        })
        out = os.path.join(d, "r.csv")
        runner.main([
            "--model_spec", spec, "--datasets", "energy",
            "--splits", "5", "--max_splits", "1", "--output", out,
            "--distributed",
        ])
        rows = list(csv.DictReader(open(out)))
        assert len(rows) == 1
        assert int(rows[0]["iterations"]) > 10  # NOT stopped at patience


def test_runner_grid_single_device_end_to_end():
    """Single-device exact-grid-solver path through the runner,
    including the posterior+diag AOT program (r5: the jitter-ladder
    telemetry rides the posterior program instead of dispatching the
    p x p factor eagerly — 170 s/split at protein scale)."""
    with tempfile.TemporaryDirectory() as d:
        spec = _write_spec(d, {
            "name": "it_grid1",
            # J=8 measured rmse 0.782 on this seed/fold (J=4 cannot
            # represent the 8-D synthetic energy target: rmse ~1.02)
            "kernel": {"type": "projection", "J": 8, "d": 1,
                       "ski": True, "grid_size": 16},
            "training": {"lr": 0.1, "max_iters": 80, "patience": 15},
            "inference": {"max_cholesky_size": 16},
        })
        out = os.path.join(d, "r.csv")
        runner.main([
            "--model_spec", spec, "--datasets", "energy",
            "--splits", "5", "--max_splits", "1", "--output", out,
        ])
        rows = list(csv.DictReader(open(out)))
        assert len(rows) == 1
        assert np.isfinite(float(rows[0]["rmse"]))
        assert float(rows[0]["rmse"]) < 0.85  # beats constant predictor
        assert np.isfinite(float(rows[0]["mll"]))


def test_runner_mll_pairs_with_best_params():
    """The CSV mll column must describe the SAME params as rmse/nll —
    the best-iterate params — not the last iteration's objective
    (VERDICT r4 weak #5: on a patience stop the last loss is `patience`
    steps past the returned model)."""
    import jax
    import jax.numpy as jnp

    from rpagp.models import exact_gp
    from rpagp.train import train_to_convergence
    from rpagp.utils import datasets as dm
    from rpagp.utils.config import experiment_spec_from_dict, make_optimizer

    exp = experiment_spec_from_dict({
        "name": "it_pair",
        "kernel": {"type": "projection", "J": 4, "d": 1},
        # lr high enough that the loss oscillates into a patience stop:
        # the LAST loss is then strictly worse than the best (measured
        # delta 0.88), separating the two quantities this test pins
        "training": {"lr": 3.0, "max_iters": 120, "patience": 8},
    })
    ds = dm.load_dataset("challenger")
    split = next(dm.kfold_splits(ds, k=5, seed=0, equal_train=True))
    m = runner.run_split(exp, split, seed=0)

    # independent reproduction of the same trajectory
    x = jnp.asarray(split.train_x)
    y = jnp.asarray(split.train_y)
    n = x.shape[0]
    params, buffers = exact_gp.init_model(jax.random.key(0), exp.model,
                                          x.shape[1])
    buffers = exact_gp.prepare_buffers(exp.model, params, buffers, x,
                                       y_train=y)
    loss_fn, optimizer = runner._loss_and_optimizer(
        exp.model, n, False, exp.train)
    res = train_to_convergence(
        loss_fn, params, lr=exp.train.lr, max_iters=exp.train.max_iters,
        patience=exp.train.patience, rel_tol=exp.train.rel_tol,
        loss_args=(buffers, x, y), optimizer=make_optimizer(exp.train))

    # the row's mll is the objective at the RETURNED params
    assert m["mll"] == pytest.approx(-res.best_loss, rel=1e-6)
    # best_loss is literally loss_fn evaluated at the returned params
    relo = float(loss_fn(res.params, buffers, x, y))
    assert relo == pytest.approx(res.best_loss, rel=1e-6)
    # and the trajectory did overshoot, so last != best (else this test
    # couldn't distinguish the bug it pins)
    assert res.losses[-1] > res.best_loss + 1e-9


def test_runner_rejects_unknown_dataset():
    with tempfile.TemporaryDirectory() as d:
        spec = _write_spec(d, {"kernel": {"type": "rbf"}})
        with pytest.raises(ValueError):
            runner.main([
                "--model_spec", spec, "--datasets", "definitely_not_a_dataset",
                "--output", os.path.join(d, "r.csv"),
            ])
