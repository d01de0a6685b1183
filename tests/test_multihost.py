"""Multi-process (DCN-analog) runtime: 2 OS processes x 4 CPU devices
run the exact grid-space training step and must reproduce the
single-process 8-device trajectory.

This is the one distributed path the in-process virtual mesh cannot
exercise: jax.distributed.initialize + cross-process collectives (Gloo
here, DCN on a real pod) + global-array construction from per-process
addressable shards (multihost.shard_rows_global). The SPMD program is
identical to tests/test_grid_sharding.py's; only the transport differs.
Reference analog: the reference stack is single-process (SURVEY.md
§2.4) — this is beyond-reference capability, see docs/PARITY.md.

Measured in this image: 1-proc vs 2-proc trajectories are digit-exact
(the grid step has zero per-step collectives; the per-dataset prepare
psums reduce in the same order), but the assertion bands allow f32
reduction-order noise so a jaxlib collective-backend change doesn't
flake the suite.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env():
    env = dict(os.environ)
    # clean slate: the conftest's 8-device XLA_FLAGS and the axon
    # site-hook must not leak into the children (CLAUDE.md env rules)
    env["PYTHONPATH"] = ""
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


def _launch(num_processes: int, local_devices: int, out: str, steps=20,
            mode="grid"):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER,
             "--process_id", str(i), "--num_processes", str(num_processes),
             "--coordinator", f"127.0.0.1:{port}",
             "--local_devices", str(local_devices),
             "--steps", str(steps), "--mode", mode,
             "--out", out if i == 0 else ""],
            env=_child_env(), cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(num_processes)
    ]
    logs = []
    for p in procs:
        out_b, _ = p.communicate(timeout=600)
        logs.append(out_b.decode(errors="replace"))
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{lg[-3000:]}"
    with open(out) as f:
        return json.load(f)


def _flat_params(d):
    out = []

    def rec(v):
        if isinstance(v, list):
            for e in v:
                rec(e)
        else:
            out.append(float(v))

    for k in sorted(d):
        rec(d[k])
    return np.asarray(out)


@pytest.mark.slow
def test_two_process_trajectory_matches_single_process(tmp_path):
    ref = _launch(1, 8, str(tmp_path / "mh1.json"))
    two = _launch(2, 4, str(tmp_path / "mh2.json"))

    assert ref["ndev_global"] == 8 and two["ndev_global"] == 8
    assert two["num_processes"] == 2

    la, lb = np.asarray(ref["losses"]), np.asarray(two["losses"])
    assert la.shape == lb.shape and np.all(np.isfinite(lb))
    # training must actually move (a frozen step would also "match")
    assert lb[-1] < lb[0] - 1e-3
    np.testing.assert_allclose(lb, la, rtol=1e-4, atol=1e-5)

    pa = _flat_params(ref["params"])
    pb = _flat_params(two["params"])
    np.testing.assert_allclose(pb, pa, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_two_process_bbmm_collectives_match_single_process(tmp_path):
    """The collective-HEAVY paths across a real process boundary (r3
    verdict weak #4): the grid step has had zero per-step collectives
    since r3d, so the original test never pushed a per-step psum through
    Gloo. BBMM mode runs sharded_pcg (one psum pair per CG iteration,
    every training step) and one distributed_posterior call; 2 procs x 4
    devices must reproduce the 1 proc x 8 devices trajectory AND
    posterior within f32 reduction-order bands."""
    ref = _launch(1, 8, str(tmp_path / "bb1.json"), steps=6, mode="bbmm")
    two = _launch(2, 4, str(tmp_path / "bb2.json"), steps=6, mode="bbmm")

    assert ref["mode"] == two["mode"] == "bbmm"
    assert ref["ndev_global"] == 8 and two["ndev_global"] == 8
    assert two["num_processes"] == 2

    la, lb = np.asarray(ref["losses"]), np.asarray(two["losses"])
    assert la.shape == lb.shape and np.all(np.isfinite(lb))
    assert lb[-1] < lb[0] - 1e-3  # training must actually move
    np.testing.assert_allclose(lb, la, rtol=1e-4, atol=1e-5)

    pa = _flat_params(ref["params"])
    pb = _flat_params(two["params"])
    np.testing.assert_allclose(pb, pa, rtol=1e-4, atol=1e-5)

    mua, mub = np.asarray(ref["post_mu"]), np.asarray(two["post_mu"])
    vaa, vab = np.asarray(ref["post_var"]), np.asarray(two["post_var"])
    assert np.all(np.isfinite(mub)) and np.all(vab > 0)
    np.testing.assert_allclose(mub, mua, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(vab, vaa, rtol=1e-3, atol=1e-4)
