"""Heat convergence plot: log-log L2 error vs time step with dt^3/dt^4
reference slopes (the /root/reference/plot_heat.py:4-18 equivalent,
headless)."""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

if __name__ == "__main__":
    csv = sys.argv[1] if len(sys.argv) > 1 else "heat_errors.csv"
    errors = pd.read_csv(csv)
    fig, ax = plt.subplots()
    ax.loglog(errors["time_step"], errors["error"], "o-", label="error")
    ts = errors["time_step"]
    ax.loglog(ts, ts**3 * float(errors["error"].iloc[0]) / float(ts.iloc[0]) ** 3,
              "--", label=r"$\Delta t^3$")
    ax.loglog(ts, ts**4 * float(errors["error"].iloc[0]) / float(ts.iloc[0]) ** 4,
              ":", label=r"$\Delta t^4$")
    ax.set_xlabel("time step")
    ax.set_ylabel("L2 error")
    ax.legend()
    out = csv.replace(".csv", ".png")
    fig.savefig(out, dpi=120)
    print("wrote", out)
