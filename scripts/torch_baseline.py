"""Measured reference baseline: the RPA-GP MLL training step implemented
the REFERENCE'S way (torch + the GPyTorch algorithm stack it sits on),
timed on this machine's CPU.

Why this exists: BASELINE.json's `published` was empty all of round 1
(reference mount empty, zero egress), so bench.py compared against an
invented 1.0 s/step stand-in. This script replaces that with MEASURED
numbers for the five BASELINE.md configs, produced by a faithful torch
implementation of the reference's hot path (SURVEY.md §3.2):

  * dense RPA kernel + Cholesky MLL + autograd backward (configs 1-2,
    the [G] exact_marginal_log_likelihood path at small n),
  * BBMM: blocked-MVM preconditioned CG on [y | probes] + pivoted-
    Cholesky/Woodbury + SLQ logdet from the CG tridiagonals, backward =
    the probe trace estimator (configs 3-5, the
    [G] functions/_inv_quad_log_det.py path) — with SKI (sparse cubic
    interpolation W + FFT Toeplitz grid kernel) for configs 4-5
    ([G] lazy/interpolated_lazy_tensor.py / utils/toeplitz.py).

The hyper-knobs per config match the repo's own specs/bench defaults so
step times are apples-to-apples with bench.py and docs/BENCHMARKS.md.

HONESTY NOTE: the reference paper ran on 2019-era single GPUs and the
BASELINE.json north star names an A100; neither exists here. These are
torch-CPU numbers on THIS machine (single core — `nproc`=1), recorded
with full hardware metadata. They are a real measured floor for the
reference implementation, not an A100 proxy; BASELINE.md keeps both.

Usage:
  python scripts/torch_baseline.py --configs 1 2 3      # quick configs
  python scripts/torch_baseline.py --configs 5 --steps 1
  python scripts/torch_baseline.py --write              # merge into BASELINE.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import platform
import time

import torch

torch.manual_seed(0)

LOG_2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# kernels (reference forms: RBF, softplus-constrained hypers)
# ---------------------------------------------------------------------------


def softplus(x):
    return torch.nn.functional.softplus(x)


def make_data(n, D):
    X = torch.randn(n, D)
    y = torch.sin(2.0 * X[:, 0]) + 0.1 * torch.randn(n)
    return X, y


def rbf_full(X1, X2, ls, os_):
    """Full-D ARD RBF Gram (config 1)."""
    d = (X1[:, None, :] - X2[None, :, :]) / ls
    return os_ * torch.exp(-0.5 * (d**2).sum(-1))


def rpa_gram(Z1, Z2, ls, os_):
    """Dense RPA Gram from projected coords Z (n, J): (os/J) sum_j k1d."""
    J = Z1.shape[1]
    d = (Z1[:, None, :] - Z2[None, :, :]) / ls  # (n, m, J)
    return (os_ / J) * torch.exp(-0.5 * d**2).sum(-1)


def rpa_mvm_blocked(Z, ls, os_, V, block=4096):
    """Dense-free blocked RPA MVM (the BBMM workhorse)."""
    n = Z.shape[0]
    out = torch.zeros(n, V.shape[1])
    for s in range(0, n, block):
        e = min(n, s + block)
        out[s:e] = rpa_gram(Z[s:e], Z, ls, os_) @ V
    return out


# ---------------------------------------------------------------------------
# SKI: sparse cubic interpolation + FFT Toeplitz (reference §3.5)
# ---------------------------------------------------------------------------


def cubic_kernel(s):
    a = s.abs()
    inner = 1.5 * a**3 - 2.5 * a**2 + 1.0
    outer = -0.5 * a**3 + 2.5 * a**2 - 4.0 * a + 2.0
    return torch.where(a <= 1.0, inner, torch.where(a < 2.0, outer,
                                                    torch.zeros_like(a)))


def build_ski_torch(Z, m):
    """Per-component sparse W (n x m CSR, 4 nnz/row) + grid spacing."""
    n, J = Z.shape
    lo, hi = Z.min(0).values, Z.max(0).values
    h = (hi - lo).clamp_min(1e-6) / (m - 5)
    grid_lo = lo - 2.0 * h
    tfrac = (Z - grid_lo) / h  # (n, J)
    i0 = tfrac.floor().long().clamp(1, m - 3)
    Ws, Wts = [], []
    rows = torch.arange(n)
    for j in range(J):
        cols = torch.stack([i0[:, j] + (k - 1) for k in range(4)], 1)  # (n,4)
        w = cubic_kernel(tfrac[:, j : j + 1] - cols.float())
        w = w / w.sum(1, keepdim=True).clamp_min(1e-8)
        idx = torch.stack([rows.repeat_interleave(4), cols.reshape(-1)])
        W = torch.sparse_coo_tensor(idx, w.reshape(-1), (n, m)).coalesce()
        Ws.append(W.to_sparse_csr())
        Wts.append(W.t().coalesce().to_sparse_csr())
    return Ws, Wts, h


def toeplitz_cols(h, ls, m):
    """RBF on the grid: first Toeplitz columns (J, m)."""
    dists = torch.arange(m, dtype=torch.float32)[None, :] * h[:, None]
    return torch.exp(-0.5 * (dists / ls[:, None]) ** 2)


def sym_toeplitz_mm(col, U):
    """col (J, m), U (J, m, t) -> (J, m, t) via 2m circulant rFFT."""
    J, m = col.shape
    circ = torch.cat([col, torch.zeros(J, 1), col.flip(1)[:, :-1]], 1)
    C = torch.fft.rfft(circ, dim=-1)  # (J, m+1)
    Up = torch.cat([U, torch.zeros_like(U)], dim=1)  # (J, 2m, t)
    F = torch.fft.rfft(Up, dim=1)
    out = torch.fft.irfft(C[:, :, None] * F, n=2 * m, dim=1)
    return out[:, :m, :]


def ski_mvm_torch(Ws, Wts, h, ls, os_, V):
    """(os/J) sum_j W_j T_j W_j^T V."""
    J = len(Ws)
    m = Ws[0].shape[1]
    U = torch.stack([Wts[j] @ V for j in range(J)])  # (J, m, t)
    TU = sym_toeplitz_mm(toeplitz_cols(h, ls, m), U)
    out = sum(Ws[j] @ TU[j] for j in range(J))
    return (os_ / J) * out


# ---------------------------------------------------------------------------
# BBMM machinery: pivoted Cholesky, PCG emitting tridiagonals, SLQ
# ---------------------------------------------------------------------------


def pivoted_cholesky(Z, ls, os_, rank):
    """Greedy rank-k pivoted Cholesky of the RPA kernel (k rows of K)."""
    n = Z.shape[0]
    diag = torch.full((n,), float(os_))
    L = torch.zeros(n, rank)
    for k in range(rank):
        p = int(torch.argmax(diag))
        pval = diag[p].clamp_min(1e-12).sqrt()
        row = rpa_gram(Z[p : p + 1], Z, ls, os_)[0]  # one kernel row
        lk = (row - L[:, :k] @ L[p, :k]) / pval
        lk[p] = pval
        L[:, k] = lk
        diag = (diag - lk**2).clamp_min(0.0)
    return L


def woodbury_inverse(L, noise):
    """M = L L^T + noise I; returns apply(R) -> M^{-1} R and logdet M."""
    k = L.shape[1]
    small = L.t() @ L / noise + torch.eye(k)
    Cs = torch.linalg.cholesky(small)
    logdet = 2.0 * torch.log(Cs.diagonal()).sum() + L.shape[0] * math.log(noise)

    def apply(R):
        u = L.t() @ R
        w = torch.cholesky_solve(u, Cs) / noise
        return (R - L @ w) / noise

    return apply, logdet


def batched_pcg(A_mvm, B, M_inv, iters, tol):
    """PCG on all columns of B at once, emitting Lanczos alphas/betas."""
    X = torch.zeros_like(B)
    R = B.clone()
    Zp = M_inv(R)
    Pd = Zp.clone()
    rz = (R * Zp).sum(0)
    b_norm = B.norm(dim=0).clamp_min(1e-20)
    alphas, betas = [], []
    for _ in range(iters):
        active = (R.norm(dim=0) / b_norm) > tol
        V = A_mvm(Pd)
        pv = (Pd * V).sum(0)
        alpha = torch.where(active, rz / pv.clamp_min(1e-20),
                            torch.zeros_like(rz))
        X = X + alpha * Pd
        R = R - alpha * V
        Zp = M_inv(R)
        rz_new = (R * Zp).sum(0)
        beta = torch.where(active, rz_new / rz.clamp_min(1e-20),
                           torch.zeros_like(rz))
        Pd = Zp + beta * Pd
        alphas.append(alpha)
        betas.append(beta)
        rz = rz_new
    return X, torch.stack(alphas), torch.stack(betas)


def slq_logdet(alphas, betas, probe_sq, pre_logdet, n):
    """SLQ from CG's Lanczos tridiagonals ([G] utils/stochastic_lq.py)."""
    iters, t = alphas.shape
    a = alphas.clamp_min(1e-20)
    diag = 1.0 / a
    diag[1:] += betas[:-1] / a[:-1].clamp_min(1e-20)
    off = betas[:-1].sqrt() / a[:-1].clamp_min(1e-20)
    total = torch.zeros(())
    for i in range(t):
        T = torch.diag(diag[:, i]) + torch.diag(off[:, i], 1) + torch.diag(off[:, i], -1)
        evals, evecs = torch.linalg.eigh(T)
        weights = evecs[0] ** 2
        total = total + probe_sq[i] * (weights * evals.clamp_min(1e-20).log()).sum()
    return total / t + pre_logdet


# ---------------------------------------------------------------------------
# the timed steps
# ---------------------------------------------------------------------------


def cholesky_mll_step(X, y, params, proj=None):
    """Dense Cholesky MLL + full autograd backward (configs 1-2)."""
    n = X.shape[0]
    ls = softplus(params["raw_ls"])
    os_ = softplus(params["raw_os"])
    noise = softplus(params["raw_noise"]) + 1e-4
    if proj is None:
        K = rbf_full(X, X, ls, os_)
    else:
        K = rpa_gram(X @ proj, X @ proj, ls, os_)
    K = K + noise * torch.eye(n)
    Lc = torch.linalg.cholesky(K)
    yc = (y - params["mean"]).unsqueeze(1)
    sol = torch.cholesky_solve(yc, Lc)
    mll = -0.5 * ((yc * sol).sum() + 2.0 * Lc.diagonal().log().sum()
                  + n * LOG_2PI)
    loss = -mll / n
    loss.backward()
    return float(loss)


def bbmm_mll_step(X, y, params, proj, spec, ski=None):
    """BBMM CG + SLQ forward, probe-trace-estimator backward (configs 3-5).

    ski: (Ws, Wts, h) for the SKI MVM, else dense blocked MVM.
    """
    n = X.shape[0]
    for p in params.values():
        if p.grad is not None:
            p.grad = None
    ls = softplus(params["raw_ls"])
    os_ = softplus(params["raw_os"])
    noise = softplus(params["raw_noise"]) + 1e-4
    Z = X @ proj

    # Non-SKI BBMM: GPyTorch materializes the evaluated kernel once per
    # step and reuses it across all CG iterations (LazyEvaluatedKernel
    # caching); mirror that — the per-step cost is one (J-summed) n x n
    # materialization + cheap GEMMs per iteration.
    K_dense = None
    if ski is None:
        with torch.no_grad():
            K_dense = torch.zeros(n, n)
            block = 4096
            for s in range(0, n, block):
                e = min(n, s + block)
                K_dense[s:e] = rpa_gram(Z[s:e], Z, ls.detach(), os_.detach())

    def kmvm(V, ls_, os__, value_only=False):
        if ski is not None:
            Ws, Wts, h = ski
            return ski_mvm_torch(Ws, Wts, h, ls_, os__, V)
        if value_only:
            return K_dense @ V
        return rpa_mvm_blocked(Z, ls_, os__, V)

    with torch.no_grad():
        nsg = noise.detach()
        if spec["rank"] > 0:
            L = pivoted_cholesky(Z, ls.detach(), os_.detach(), spec["rank"])
            M_inv, pre_logdet = woodbury_inverse(L, float(nsg))
            probes = L @ torch.randn(spec["rank"], spec["probes"]) \
                + nsg.sqrt() * torch.randn(n, spec["probes"])
        else:
            M_inv = lambda R: R / nsg
            pre_logdet = n * nsg.log()
            probes = nsg.sqrt() * torch.randn(n, spec["probes"])
        yc = y - params["mean"].detach()
        B = torch.cat([yc.unsqueeze(1), probes], 1)
        A = lambda V: kmvm(V, ls.detach(), os_.detach(), value_only=True) + nsg * V
        sol, alphas, betas = batched_pcg(A, B, M_inv, spec["cg"], spec["tol"])
        alpha_v, S = sol[:, 0], sol[:, 1:]
        MZ = M_inv(probes)
        inv_quad = yc @ alpha_v
        probe_sq = (probes * MZ).sum(0)
        logdet = slq_logdet(alphas[:, 1:], betas[:, 1:], probe_sq,
                            pre_logdet, n)
        mll_value = -0.5 * (inv_quad + logdet + n * LOG_2PI)

    # backward: gradients of the quadratic surrogate heads (the
    # reference's custom autograd Function; never through CG iterations)
    yc_g = y - params["mean"]
    Ka = kmvm(alpha_v.unsqueeze(1), ls, os_)[:, 0]
    quad = -(alpha_v @ Ka + noise * (alpha_v @ alpha_v)) + 2.0 * (alpha_v @ yc_g)
    KM = kmvm(MZ, ls, os_)
    tr = ((S * KM).sum() + noise * (S * MZ).sum()) / spec["probes"]
    surr = -0.5 * (quad + tr) / n
    surr.backward()
    return float(-mll_value / n)


CONFIGS = {
    "1": dict(name="yacht_exact_rbf_chol", n=308, D=6, kind="chol", J=None),
    "2": dict(name="energy_rpa_j10_chol", n=768, D=8, kind="chol", J=10),
    "3": dict(name="elevators_rpa_j10_bbmm", n=16384, D=18, kind="bbmm",
              J=10, cg=60, tol=1e-2, probes=10, rank=15),
    "4": dict(name="protein_rpa_j20_ski", n=45056, D=9, kind="bbmm",
              J=20, cg=60, tol=1e-2, probes=10, rank=15, m=2048),
    "5": dict(name="houseelectric_rpa_j20_ski", n=1_800_000, D=11,
              kind="bbmm", J=20, cg=20, tol=1e-2, probes=8, rank=15, m=512),
}


def run_config(cfg, steps):
    torch.manual_seed(1)
    X, y = make_data(cfg["n"], cfg["D"])
    J = cfg["J"]
    proj = None if J is None else torch.randn(cfg["D"], J) / math.sqrt(cfg["D"])
    params = {
        "raw_ls": torch.zeros(cfg["D"] if J is None else J, requires_grad=True),
        "raw_os": torch.zeros((), requires_grad=True),
        "raw_noise": torch.zeros((), requires_grad=True),
        "mean": torch.zeros((), requires_grad=True),
    }
    ski = None
    prep_s = 0.0
    if cfg["kind"] == "bbmm" and "m" in cfg:
        t0 = time.perf_counter()
        Ws, Wts, h = build_ski_torch(X @ proj, cfg["m"])
        prep_s = time.perf_counter() - t0
        ski = (Ws, Wts, h)

    def one_step():
        for p in params.values():
            if p.grad is not None:
                p.grad = None
        if cfg["kind"] == "chol":
            return cholesky_mll_step(X, y, params, proj)
        spec = {k: cfg[k] for k in ("cg", "tol", "probes", "rank")}
        return bbmm_mll_step(X, y, params, proj, spec, ski=ski)

    one_step()  # warmup (allocator, thread pools)
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        loss = one_step()
        times.append(time.perf_counter() - t0)
    return {
        "step_s": round(min(times), 4),
        "step_s_mean": round(sum(times) / len(times), 4),
        "steps_timed": steps,
        "prep_s": round(prep_s, 3),
        "loss": round(loss, 5),
        "settings": {k: v for k, v in cfg.items() if k != "name"},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["1", "2", "3"],
                    choices=list(CONFIGS))
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--write", action="store_true",
                    help="merge results into BASELINE.json published")
    args = ap.parse_args()

    meta = {
        "impl": "torch-cpu reference reimplementation (this script)",
        "torch": torch.__version__,
        "threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
        "platform": platform.platform(),
    }
    results = {}
    for c in args.configs:
        cfg = CONFIGS[c]
        print(f"[{cfg['name']}] n={cfg['n']} ...", flush=True)
        results[cfg["name"]] = run_config(cfg, args.steps)
        print(json.dumps({cfg["name"]: results[cfg["name"]]}), flush=True)

    out = {"hardware": meta, "results": results}
    print(json.dumps(out))
    if args.write:
        root = os.path.join(os.path.dirname(__file__), "..")
        path = os.path.abspath(os.path.join(root, "BASELINE.json"))
        with open(path) as f:
            base = json.load(f)
        pub = base.get("published") or {}
        pub.setdefault("torch_cpu_measured", {})
        pub["torch_cpu_measured"].update(results)
        pub["torch_cpu_measured"]["hardware"] = meta
        base["published"] = pub
        with open(path, "w") as f:
            json.dump(base, f, indent=2)
        print(f"merged into {path}")


if __name__ == "__main__":
    main()
