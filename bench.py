"""Benchmark: Navier-Stokes initial Stokes solve, wall-clock to residual 1e-8.

The BASELINE.json north-star metric: Krylov iterations/sec and wall-clock to
matched residual on the flagship model (channel-with-cylinder, order 2),
float64, Bramble-Pasciak CG with the two-level additive-Schwarz
preconditioner.  Runs on the default device (TPU under the driver) and
compares against a JAX-CPU run of the identical solve in the same process.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
value = BPCG iterations/sec on the accelerator; vs_baseline = CPU wall-clock
/ accelerator wall-clock for the same solve (>1 means faster than CPU).
"""

import json
import sys
import time

import jax

try:
    jax.config.update("jax_platforms", "axon,cpu")
    jax.devices()
except Exception:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

MAXH = 0.02
TOL = 1e-8
MAXSTEPS = 2000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(dtype):
    from navier_stokes_tpu.mesh import channel_with_cylinder_mesh
    from navier_stokes_tpu.models.navier_stokes import NavierStokes

    def uin(p):
        out = np.zeros((len(p), 2))
        out[:, 0] = 1.5 * 4 * p[:, 1] * (0.41 - p[:, 1]) / 0.41**2
        return out

    mesh = channel_with_cylinder_mesh(MAXH)
    return NavierStokes(
        mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin, timestep=1e-3, order=2, dtype=dtype,
        preconditioner="twolevel",
    )


def measure(device):
    with jax.default_device(device):
        model = build(jnp.float64)
        res = model.SolveInitial(iterative=True, tol=TOL, maxsteps=MAXSTEPS)
        log(
            f"{device.platform} cold: {model.stokes_bpcg_time:.2f}s "
            f"iters={model.stokes_bpcg_iterations} conv={bool(res.converged)}"
        )
        res = model.SolveInitial(iterative=True, tol=TOL, maxsteps=MAXSTEPS)
        iters, t = model.stokes_bpcg_iterations, model.stokes_bpcg_time
        log(f"{device.platform} warm: {t:.3f}s iters={iters}")
        assert bool(res.converged), "solve did not reach tol"
    return iters, t


def main():
    devices = jax.devices()
    main_dev = devices[0]
    log(f"benchmark device: {main_dev}, maxh={MAXH}, tol={TOL}, f64")

    iters, t_main = measure(main_dev)
    ips = iters / t_main

    vs_baseline = 1.0
    if main_dev.platform != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
            _, t_cpu = measure(cpu)
            vs_baseline = t_cpu / t_main
        except Exception as e:
            log("cpu baseline failed:", repr(e))

    print(json.dumps({
        "metric": "ns_initial_stokes_bpcg_to_1e-8",
        "value": round(ips, 2),
        "unit": (
            f"BPCG iterations/sec, f64, channel maxh={MAXH}, "
            f"wall={t_main:.3f}s to rel residual {TOL}"
        ),
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
