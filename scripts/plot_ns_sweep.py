"""NS sweep plots — the templates/plot_navier_stokes.py equivalent:
iterations/time vs mesh size (log-x) and vs order, GS on/off comparisons,
from data.csv (headless)."""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd


def plot_iterations_vs_h(data, ax):
    for gs, grp in data.groupby("gauss_seidel_enabled"):
        g = grp.groupby("mesh_size")["iterations"].mean()
        ax.semilogx(g.index, g.values, "o-", label=f"GS={gs}")
    ax.set_xlabel("mesh size")
    ax.set_ylabel("BPCG iterations")
    ax.legend()


def plot_time_vs_h(data, ax):
    for gs, grp in data.groupby("gauss_seidel_enabled"):
        g = grp.groupby("mesh_size")["time"].mean()
        ax.loglog(g.index, g.values, "o-", label=f"GS={gs}")
    ax.set_xlabel("mesh size")
    ax.set_ylabel("solve time [s]")
    ax.legend()


def plot_iterations_vs_order(data, ax):
    for gs, grp in data.groupby("gauss_seidel_enabled"):
        g = grp.groupby("order")["iterations"].mean()
        ax.plot(g.index, g.values, "o-", label=f"GS={gs}")
    ax.set_xlabel("order")
    ax.set_ylabel("BPCG iterations")
    ax.legend()


def plot_time_vs_order(data, ax):
    for gs, grp in data.groupby("gauss_seidel_enabled"):
        g = grp.groupby("order")["time"].mean()
        ax.semilogy(g.index, g.values, "o-", label=f"GS={gs}")
    ax.set_xlabel("order")
    ax.set_ylabel("solve time [s]")
    ax.legend()


if __name__ == "__main__":
    csv = sys.argv[1] if len(sys.argv) > 1 else "data.csv"
    data = pd.read_csv(csv)
    fig, axes = plt.subplots(2, 2, figsize=(11, 8))
    plot_iterations_vs_h(data, axes[0, 0])
    plot_time_vs_h(data, axes[0, 1])
    plot_iterations_vs_order(data, axes[1, 0])
    plot_time_vs_order(data, axes[1, 1])
    fig.tight_layout()
    out = csv.replace(".csv", ".png")
    fig.savefig(out, dpi=120)
    print("wrote", out)
