"""Stokes benchmark sweep CLI — the run.py equivalent.

Usage: python scripts/run_stokes.py [-p] [out.csv]
  -p        enable jax.profiler trace capture (the reference's pajetrace flag,
            run.py:218-219)
  out.csv   output file (default errors.csv, run.py:222-224)

Active configuration mirrors the reference's module literals
(run.py:265-296): every mixed entry commented out, "HDG BDM 2" + BPCG
active.  Uncomment entries below to widen the sweep to the full catalog.
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

from navier_stokes_tpu.models import stokes as st
from navier_stokes_tpu.models.discretizations import (
    P1_nonconforming_velocity_constant_pressure,
    P2_velocity_constant_pressure,
    P2_velocity_with_cubic_bubbles_linear_pressure,
    bdm_hybrid,
    hcurldiv,
    mini,
    rt_hybrid,
    taylor_hood,
)
from navier_stokes_tpu.mesh.curved import curve_to_circle
from navier_stokes_tpu.models.stokes_hybrid import solve_hybrid
from navier_stokes_tpu.models.stokes_mcs import solve_hcurldiv


def profiling_enabled():
    return "-p" in sys.argv[1:]


def data_file():
    return next(
        (a for a in sys.argv[1:] if not a.startswith("-")), "errors.csv"
    )


mesh_sizes = [0.1]  # , 0.05, 0.025, 0.01]
# the three solve families with the reference's ACTIVE configuration
# (run.py:265-296: every mixed entry commented out, "HDG BDM 2" active,
# MINRES commented out); uncomment entries to widen the sweep
methods = {
    "mixed": {
        "solve": st.solve,
        "discretizations": {
            # "P1nc, P0": P1_nonconforming_velocity_constant_pressure(),
            # "mini": mini(),
            # "P2, P0": P2_velocity_constant_pressure(),
            # "P2+, P1": P2_velocity_with_cubic_bubbles_linear_pressure(),
            # "taylor hood 2": taylor_hood(2),
            # "taylor hood 3": taylor_hood(3),
        },
    },
    "hybrid_dg": {
        # order-3 curved cylinder like the reference (run.py:28)
        "solve": lambda mesh, disc, solver: solve_hybrid(
            mesh, disc, solver,
            geometry=curve_to_circle(mesh, "cyl", (0.2, 0.2), 0.05, 3),
        ),
        "discretizations": {
            "HDG BDM 2": bdm_hybrid(2, 10),
            # "HDG RT 1": rt_hybrid(1, 10),
        },
    },
    "mcs": {
        "solve": lambda mesh, disc, solver: solve_hcurldiv(mesh, disc, solver),
        "discretizations": {
            # "MCS RT 2": hcurldiv(2),
        },
    },
}
solver_factories = {
    "bramble pasciak cg": lambda system: st.solve_with_bramble_pasciak_cg(
        system, tolerance=1e-7, max_steps=10000
    ),
    # "minres": lambda system: st.solve_with_min_res(
    #     system, tolerance=1e-7, max_steps=10000
    # ),
}

if __name__ == "__main__":
    print("profiling_enabled:", profiling_enabled())
    print("data file:", data_file())
    st.run(
        mesh_sizes, methods, solver_factories, data_file(), profiling_enabled()
    )
