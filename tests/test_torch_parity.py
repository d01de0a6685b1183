"""Cross-CODEBASE numeric parity: rpagp vs the independent torch oracle.

Every other parity test in this suite compares rpagp against rpagp's own
dense oracles (correct-by-construction within one codebase). This module
is the independent falsification (round-2 verdict item 1): the SAME
model — identical data, projection matrix, raw hyperparameters, and
optimizer — evaluated/trained by scripts/torch_parity.py's torch
implementation of the reference's algorithm stack, sharing nothing with
the jax code but the published model definition.

Driver metric: BASELINE.json "test RMSE/NLL parity <= 1e-3 vs GPyTorch"
([U] gp_experiment_runner.py CSV outputs). Measured headroom is large
(docs/PARITY.md table): matched-params MLL agrees to ~2e-7 relative,
trained RMSE/NLL to ~5e-5 absolute; the asserted bands below sit 10-50x
above the measurements and 5-1000x inside the driver band.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import torch_parity as tp  # noqa: E402


def test_mll_matched_params_exact_rbf():
    """Config 1 (exact full-D ARD RBF, Cholesky): both sides are exact
    Cholesky — agreement to f32 roundoff, no estimator-noise excuse."""
    v_r, v_t, rel = tp.mll_parity("rbf", n=308, D=6)
    assert rel < 1e-5, (v_r, v_t)


def test_mll_matched_params_rpa_j10():
    """Config 2 (RPA J=10, dense Cholesky), shared projection matrix."""
    v_r, v_t, rel = tp.mll_parity("rpa", n=400, D=8, J=10)
    assert rel < 1e-5, (v_r, v_t)


def test_mll_matched_params_ski_grid_vs_torch_dense():
    """Config 4 pair: rpagp's exact grid-space Woodbury solver vs torch's
    dense Cholesky of the MATERIALIZED SKI operator — same model, two
    codebases, no shared code path."""
    v_r, v_t, rel = tp.mll_parity("ski", n=900, D=8, J=4, m=32)
    assert rel < 1e-5, (v_r, v_t)


def test_trained_parity_rpa_end_to_end():
    """End-to-end config-2: identical init/optimizer/iterations in both
    codebases; trained test RMSE/NLL must agree within the BASELINE
    <= 1e-3 band (measured ~1e-5)."""
    r = tp.trained_parity("rpa", n=400, D=8, J=10, iters=80)
    assert r["d_rmse"] < 1e-3, r
    assert r["d_nll"] < 1e-3, r
    # and the final LOSS trajectories agree too (tighter: same-f32 Adam)
    assert abs(r["final_loss_rpagp"] - r["final_loss_torch"]) < 1e-3, r


def test_trained_parity_ski_grid_end_to_end():
    """End-to-end config-4 pair: the grid solver's training trajectory
    vs torch dense-SKI Cholesky training on the same split."""
    r = tp.trained_parity("ski", n=800, D=8, J=4, m=32, iters=40)
    assert r["d_rmse"] < 1e-3, r
    assert r["d_nll"] < 1e-3, r
    assert abs(r["final_loss_rpagp"] - r["final_loss_torch"]) < 1e-3, r
