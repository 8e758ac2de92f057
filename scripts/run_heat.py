"""Heat-equation convergence study CLI — the /root/reference/heat.py
module-level harness: time steps logspace(-1,-4,7), end time 0.05, order-10
H1 on the unit square, L2 error vs the exact eigenfunction-decay solution,
written to heat_errors.csv (heat.py:151-167 schema)."""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from navier_stokes_tpu.models import heat_convergence_study

if __name__ == "__main__":
    out = next((a for a in sys.argv[1:] if not a.startswith("-")),
               "heat_errors.csv")
    quick = "-q" in sys.argv[1:]
    kwargs = dict(order=6, maxh=0.2) if quick else dict(order=10, maxh=0.1)
    ts = np.logspace(-1, -4 if not quick else -2.5, num=7).tolist()
    errors = heat_convergence_study(time_steps=ts, data_file=out, **kwargs)
    print(errors)
    print("wrote", out)
