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


def test_csv_parser_drops_partial_header_rows():
    # regression: a header whose first token parses as a number
    # ("1stcol") must not leak values into the table (ADVICE r1)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.csv")
        with open(path, "w") as f:
            f.write("1stcol,2ndcol,3rdcol\n1,2,3\n4,5,6\n")
        got = native.load_csv(path)
        np.testing.assert_allclose(got, [[1, 2, 3], [4, 5, 6]])


def test_mat5_reader_rejects_truncated_file():
    rng = np.random.default_rng(5)
    data = rng.standard_normal((64, 4))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.mat")
        scipy.io.savemat(path, {"data": data}, do_compression=False)
        raw = open(path, "rb").read()
        trunc = os.path.join(d, "trunc.mat")
        with open(trunc, "wb") as f:
            f.write(raw[: len(raw) // 2])
        assert native.load_mat(trunc, "data") is None  # not a crash/garbage


def test_kfold_perm_python_fallback_matches_native():
    from rpagp.utils.native import _lib, _splitmix64_stream

    lib = _lib()
    assert lib is not None
    for n, seed in [(1, 0), (17, 42), (1000, 7)]:
        native_perm = native.kfold_perm(n, seed)
        perm = np.arange(n, dtype=np.int64)
        if n > 1:
            draws = _splitmix64_stream(seed, n - 1)
            for k, i in enumerate(range(n - 1, 0, -1)):
                j = int(draws[k] % np.uint64(i + 1))
                perm[i], perm[j] = perm[j], perm[i]
        np.testing.assert_array_equal(native_perm, perm)
