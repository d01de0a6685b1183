"""ctypes binding to the native C++ data runtime (rpagp/native/).

Lazily compiles rpagp_native.cpp with g++ on first use (cached .so under
~/.cache/rpagp); every entry point has a pure-Python fallback so the
framework works without a toolchain. See rpagp_native.cpp for what each
function does and why it is native.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "rpagp_native.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "rpagp"
    )
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"rpagp_native_{tag}.so")
    if os.path.exists(so):
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return so


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("RPAGP_NO_NATIVE", "0") == "1":
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i64, c_dp, c_dpp = ctypes.c_int64, ctypes.POINTER(ctypes.c_double), None
    c_dpp = ctypes.POINTER(ctypes.POINTER(ctypes.c_double))
    lib.load_csv.argtypes = [ctypes.c_char_p, c_dpp,
                             ctypes.POINTER(i64), ctypes.POINTER(i64)]
    lib.load_csv.restype = ctypes.c_int
    lib.load_mat_data.argtypes = [ctypes.c_char_p, ctypes.c_char_p, c_dpp,
                                  ctypes.POINTER(i64), ctypes.POINTER(i64)]
    lib.load_mat_data.restype = ctypes.c_int
    lib.zscore_fit_apply.argtypes = [c_dp, i64, i64, c_dp, c_dp]
    lib.zscore_fit_apply.restype = None
    lib.kfold_perm.argtypes = [i64, ctypes.c_uint64, ctypes.POINTER(i64)]
    lib.kfold_perm.restype = None
    lib.rpagp_free.argtypes = [ctypes.c_void_p]
    lib.rpagp_free.restype = None
    _LIB = lib
    return lib


def available() -> bool:
    return _lib() is not None


def _take(lib, ptr, rows, cols) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(rows, cols)).copy()
    lib.rpagp_free(ptr)
    return arr


def load_csv(path: str) -> Optional[np.ndarray]:
    """Numeric table from CSV via the native parser; None on any failure."""
    lib = _lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_double)()
    rows, cols = ctypes.c_int64(), ctypes.c_int64()
    rc = lib.load_csv(path.encode(), ctypes.byref(out),
                      ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        return None
    return _take(lib, out, rows.value, cols.value)


def load_mat(path: str, name: str = "data") -> Optional[np.ndarray]:
    """2-D double matrix from a MATLAB v5 file (Wilson-collection layout)."""
    lib = _lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_double)()
    rows, cols = ctypes.c_int64(), ctypes.c_int64()
    rc = lib.load_mat_data(path.encode(), name.encode(), ctypes.byref(out),
                           ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        return None
    return _take(lib, out, rows.value, cols.value)


def zscore_fit_apply(X: np.ndarray):
    """In-place column z-score; returns (means, stds). Python fallback."""
    lib = _lib()
    X = np.ascontiguousarray(X, dtype=np.float64)
    n, d = X.shape
    means = np.empty(d)
    stds = np.empty(d)
    if lib is None:
        means[:] = X.mean(axis=0)
        stds[:] = X.std(axis=0)
        stds[stds < 1e-10] = 1.0
        X -= means
        X /= stds
        return X, means, stds
    lib.zscore_fit_apply(
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, d,
        means.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        stds.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return X, means, stds


def _splitmix64_stream(seed: int, count: int) -> np.ndarray:
    """The first `count` outputs of splitmix64(seed), vectorized.

    splitmix64's state advances by a constant each call, so output i is a
    pure function of seed + (i+1)*golden — counter-based and vectorizable.
    Must stay bit-identical to rpagp_native.cpp's `next()`.
    """
    golden = np.uint64(0x9E3779B97F4A7C15)
    z = np.uint64(seed) + (np.arange(1, count + 1, dtype=np.uint64) * golden)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def kfold_perm(n: int, seed: int) -> np.ndarray:
    """Deterministic Fisher-Yates permutation of [0, n).

    Native C++ when the toolchain is available; otherwise a bit-identical
    Python fallback (same splitmix64 stream), so split assignment never
    depends on whether g++ exists.
    """
    lib = _lib()
    if lib is not None:
        perm = np.empty(n, dtype=np.int64)
        lib.kfold_perm(n, np.uint64(seed),
                       perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return perm
    perm = np.arange(n, dtype=np.int64)
    if n > 1:
        draws = _splitmix64_stream(seed, n - 1)
        for k, i in enumerate(range(n - 1, 0, -1)):
            j = int(draws[k] % np.uint64(i + 1))
            perm[i], perm[j] = perm[j], perm[i]
    return perm
