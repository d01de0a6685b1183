"""Data-layer and results-aggregation unit tests."""

import csv
import os
import tempfile

import numpy as np

from rpagp.utils import datasets as dm
from rpagp.utils.results import aggregate, format_table


def test_kfold_splits_partition_and_determinism():
    ds = dm.load_dataset("servo")
    folds_a = list(dm.kfold_splits(ds, k=5, seed=3))
    folds_b = list(dm.kfold_splits(ds, k=5, seed=3))
    n = ds.X.shape[0]
    total_test = sum(f.test_x.shape[0] for f in folds_a)
    assert total_test == n  # test folds partition the data
    for fa, fb in zip(folds_a, folds_b):
        np.testing.assert_array_equal(fa.test_x, fb.test_x)  # deterministic
    # train stats only: train_x is z-scored to ~0 mean, 1 std
    f = folds_a[0]
    np.testing.assert_allclose(f.train_x.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(f.train_x.std(axis=0), 1.0, atol=1e-4)


def test_kfold_equal_train_opt_in():
    """equal_train=True: one common train shape (trace reuse, r4h);
    default False keeps the exact reference folds (ADVICE r4)."""
    ds = dm.load_dataset("servo")
    n = ds.X.shape[0]
    eq = list(dm.kfold_splits(ds, k=5, seed=3, equal_train=True))
    assert len({f.train_x.shape[0] for f in eq}) == 1  # one shape
    # test folds still partition the data exactly
    assert sum(f.test_x.shape[0] for f in eq) == n
    # library default: exact reference folds (train + test == n)
    ref = list(dm.kfold_splits(ds, k=5, seed=3))
    assert all(f.train_x.shape[0] + f.test_x.shape[0] == n for f in ref)


def test_synthetic_fallback_shapes_and_determinism():
    a = dm.load_dataset("yacht")
    b = dm.load_dataset("yacht")
    assert a.synthetic and a.X.shape == dm.UCI_SHAPES["yacht"]
    np.testing.assert_array_equal(a.X, b.X)
    np.testing.assert_array_equal(a.y, b.y)


def test_max_points_subsample():
    ds = dm.load_dataset("energy", max_points=100)
    assert ds.X.shape[0] == 100


def test_results_aggregation_math():
    rows = [
        {"dataset": "d", "split": i, "model": "m", "rmse": r, "nll": n_,
         "train_time_s": 1.0, "mll": 0, "n_train": 10, "n_test": 2,
         "iterations": 5, "synthetic_data": True}
        for i, (r, n_) in enumerate([(0.5, 1.0), (0.7, 1.2)])
    ]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "r.csv")
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            for r in rows:
                w.writerow(r)
        agg = aggregate([path])
        s = agg[("d", "m")]
        np.testing.assert_allclose(s["rmse_mean"], 0.6)
        np.testing.assert_allclose(s["rmse_std"], np.std([0.5, 0.7], ddof=1))
        assert s["n_splits"] == 2
        table = format_table(agg)
        assert "d" in table and "0.6000" in table


def test_lr_schedule_config():
    """TrainConfig lr_schedule -> optax schedule (reference analog: the
    optional LR scheduler in [U] training_routines.py)."""
    import jax.numpy as jnp

    from rpagp.utils.config import (TrainConfig, experiment_spec_from_dict,
                                    make_optimizer)

    exp = experiment_spec_from_dict({
        "kernel": {"type": "projection", "J": 2},
        "training": {"lr": 0.2, "max_iters": 100, "lr_schedule": "cosine",
                     "lr_decay_rate": 0.05},
    })
    assert exp.train.lr_schedule == "cosine"

    # the schedule actually decays: run a few updates and watch a param
    # under a constant gradient shrink its step size
    opt = make_optimizer(exp.train)
    params = {"w": jnp.zeros(())}
    state = opt.init(params)
    g = {"w": jnp.ones(())}
    steps = []
    prev = params["w"]
    for _ in range(100):
        upd, state = opt.update(g, state, params)
        params = {"w": params["w"] + upd["w"]}
        steps.append(float(abs(params["w"] - prev)))
        prev = params["w"]
    assert steps[-1] < 0.25 * steps[1], steps[:2] + steps[-2:]

    for bad in ("warmup", "linear"):
        cfg = TrainConfig(lr_schedule=bad)
        try:
            make_optimizer(cfg)
            assert False, "expected ValueError"
        except ValueError:
            pass
    # step schedule constructs fine
    make_optimizer(TrainConfig(lr_schedule="step", lr_decay_every=10))
