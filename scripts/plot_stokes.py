"""Plots for the Stokes benchmark CSV (the plot.py equivalent, headless).

Reads errors.csv and produces bar plots of iterations and solver time per
(discretization, solver) and log-y error-vs-iteration convergence curves —
the three plots of /root/reference/plot.py:6-38.  Note: the reference's
plot.py groups by columns 'net_width'/'run_time' that its own run.py never
writes (schema drift, SURVEY.md section 2a); these plots use the columns the
harness actually emits (mesh_size / solver_time).
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd


def plot_iterations(data, ax):
    g = (
        data.groupby(["discretization", "solver"])["iteration"]
        .max()
        .unstack("solver")
    )
    g.plot.bar(ax=ax)
    ax.set_ylabel("iterations")


def plot_run_time(data, ax):
    g = (
        data.groupby(["discretization", "solver"])["solver_time"]
        .first()
        .unstack("solver")
    )
    g.plot.bar(ax=ax)
    ax.set_ylabel("solver time [s]")


def plot_error_over_iterations(data, ax):
    for (disc, solver), grp in data.groupby(["discretization", "solver"]):
        ax.semilogy(grp["iteration"], grp["error"], label=f"{disc} / {solver}")
    ax.set_xlabel("iteration")
    ax.set_ylabel("relative error")
    ax.legend(fontsize=6)


if __name__ == "__main__":
    csv = sys.argv[1] if len(sys.argv) > 1 else "errors.csv"
    data = pd.read_csv(csv)
    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    plot_iterations(data, axes[0])
    plot_run_time(data, axes[1])
    plot_error_over_iterations(data, axes[2])
    fig.tight_layout()
    out = csv.replace(".csv", ".png")
    fig.savefig(out, dpi=120)
    print("wrote", out)
