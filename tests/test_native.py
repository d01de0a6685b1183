"""Native C++ data runtime vs scipy/numpy oracles."""

import os
import tempfile

import numpy as np
import pytest
import scipy.io

from rpagp.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_mat5_reader_matches_scipy_uncompressed():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((37, 5))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.mat")
        scipy.io.savemat(path, {"data": data}, do_compression=False)
        got = native.load_mat(path, "data")
        np.testing.assert_allclose(got, data, rtol=0, atol=0)


def test_mat5_reader_matches_scipy_compressed():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((210, 9))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.mat")
        scipy.io.savemat(path, {"data": data}, do_compression=True)
        got = native.load_mat(path, "data")
        np.testing.assert_allclose(got, data, rtol=0, atol=0)


def test_mat5_reader_picks_named_matrix():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((4, 3))
    data = rng.standard_normal((6, 2))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.mat")
        scipy.io.savemat(path, {"other": a, "data": data})
        got = native.load_mat(path, "data")
        np.testing.assert_allclose(got, data)


def test_csv_parser_matches_numpy():
    rng = np.random.default_rng(3)
    data = rng.standard_normal((50, 4))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.csv")
        np.savetxt(path, data, delimiter=",")
        got = native.load_csv(path)
        np.testing.assert_allclose(got, data, rtol=1e-12)


def test_zscore_matches_numpy():
    rng = np.random.default_rng(4)
    X = rng.standard_normal((100, 6)) * 3 + 1
    Xn, means, stds = native.zscore_fit_apply(X.copy())
    np.testing.assert_allclose(means, X.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(stds, X.std(axis=0), rtol=1e-10)
    np.testing.assert_allclose(Xn, (X - X.mean(0)) / X.std(0), rtol=1e-9, atol=1e-12)


def test_kfold_perm_is_valid_and_deterministic():
    p1 = native.kfold_perm(1000, seed=42)
    p2 = native.kfold_perm(1000, seed=42)
    p3 = native.kfold_perm(1000, seed=43)
    np.testing.assert_array_equal(p1, p2)
    assert not np.array_equal(p1, p3)
    np.testing.assert_array_equal(np.sort(p1), np.arange(1000))
