"""Render the paper-style result figures into docs/figures/.

The reference ships its results as notebook figures ([U] notebooks/:
kernel-convergence visualization + experiment result plots, SURVEY.md
§2.1 row 10). This is the analog: a deterministic script over the
repo's measured artifacts.

Data sources (all measured, none invented):
  - J-convergence table: docs/CONVERGENCE.md (scripts/j_convergence.py)
  - step-scaling and headline tables: docs/BENCHMARKS.md (bench.py
    sweeps on one TPU v5e core)

Regenerate the underlying numbers with the cited scripts; this script
only draws. Usage: python scripts/make_figures.py
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

BLUE = "#2a78d6"  # categorical slot 1 (validated palette)
INK = "#333333"
MUTED = "#767676"
GRID = "#e3e3e3"

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "figures")


def _style(ax):
    ax.grid(True, color=GRID, linewidth=0.8, zorder=0)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(MUTED)
    ax.tick_params(colors=MUTED, labelsize=9)
    ax.title.set_color(INK)
    ax.xaxis.label.set_color(INK)
    ax.yaxis.label.set_color(INK)


def fig_j_convergence():
    # docs/CONVERGENCE.md (scripts/j_convergence.py, 8 seeds per J)
    J = np.array([1, 2, 5, 10, 20, 50, 100, 200, 500, 1000])
    rmse = np.array([0.25143, 0.17279, 0.11238, 0.07811, 0.05517,
                     0.03423, 0.02453, 0.01849, 0.01081, 0.00783])
    fig, ax = plt.subplots(figsize=(5.2, 3.6), dpi=160)
    guide = rmse[0] / np.sqrt(J)
    ax.plot(J, guide, "--", color=MUTED, linewidth=1.4, zorder=2,
            label=r"$O(1/\sqrt{J})$ guide")
    ax.plot(J, rmse, "-o", color=BLUE, linewidth=2, markersize=5,
            zorder=3, label=r"RMSE$(K_J, K_\infty)$")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("number of projections  J")
    ax.set_ylabel("Gram RMSE to the limit kernel")
    ax.set_title("RPA kernel converges to its closed-form limit\n"
                 r"at the Thm-1 rate (RMSE$\cdot\sqrt{J}\approx$ 0.246)",
                 fontsize=10)
    ax.legend(frameon=False, fontsize=9, labelcolor=INK)
    _style(ax)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "j_convergence.png"))
    plt.close(fig)


def fig_step_scaling():
    # docs/BENCHMARKS.md "Step scaling in n" (bench.py RPAGP_BENCH_N sweep)
    n = np.array([112_500, 450_000, 900_000, 1_800_000])
    ms = np.array([66.7, 167.7, 316.2, 591.0])
    fig, ax = plt.subplots(figsize=(5.2, 3.6), dpi=160)
    guide = ms[-1] * n / n[-1]
    ax.plot(n, guide, "--", color=MUTED, linewidth=1.4, zorder=2,
            label=r"$O(n)$ guide")
    ax.plot(n, ms, "-o", color=BLUE, linewidth=2, markersize=5, zorder=3,
            label="measured ms/step")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("training points  n")
    ax.set_ylabel("MLL value+grad step (ms)")
    ax.set_title("Flagship SKI step is O(n) with a ~35 ms floor\n"
                 "(J=20, m=256, CG 20, one TPU v5e core)", fontsize=10)
    ax.legend(frameon=False, fontsize=9, labelcolor=INK)
    _style(ax)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "step_scaling.png"))
    plt.close(fig)


def fig_headline_progress():
    # docs/BENCHMARKS.md "Headline after round 2" table
    labels = [
        "r1  sorted interp, m=4096",
        "r2a dense XLA plan, m=512",
        "r2b Pallas one-hot, m=512",
        "r2c m=256 (knee-backed)",
        "r2d + precond refresh",
        "r2e + transpose reorder",
    ]
    ms = np.array([22_250.0, 3_840.0, 956.0, 672.0, 615.0, 603.0])
    fig, ax = plt.subplots(figsize=(6.4, 3.4), dpi=160)
    y = np.arange(len(ms))[::-1]
    ax.barh(y, ms, height=0.62, color=BLUE, zorder=3)
    for yi, v in zip(y, ms):
        ax.text(v * 1.15, yi, f"{v:,.0f} ms", va="center", fontsize=8.5,
                color=INK)
    ax.set_yticks(y, labels, fontsize=8.5, color=INK)
    ax.set_xscale("log")
    ax.set_xlim(right=ms.max() * 6)
    ax.set_xlabel("MLL step at n=1.8M (ms, log scale)")
    ax.set_title("Headline step, round 1 → round 2: 37x\n"
                 "(n=1.8M HouseElectric scale, one TPU v5e core)",
                 fontsize=10)
    _style(ax)
    ax.grid(axis="y", visible=False)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "headline_progress.png"))
    plt.close(fig)


def main():
    os.makedirs(OUT, exist_ok=True)
    fig_j_convergence()
    fig_step_scaling()
    fig_headline_progress()
    print("wrote", sorted(os.listdir(OUT)))


if __name__ == "__main__":
    main()
