"""Benchmark: Bramble-Pasciak CG iteration throughput on the flagship model.

Measures the north-star metric of BASELINE.json — Krylov iterations/sec on
the Navier-Stokes initial Stokes solve (channel-with-cylinder, order 2) —
on the default device (TPU under the driver), against a JAX-CPU baseline of
the same problem in the same process.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import jax

# default platform first (axon TPU under the driver), cpu for the baseline
try:
    jax.config.update("jax_platforms", "axon,cpu")
    jax.devices()
except Exception:  # no TPU tunnel: plain CPU
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(maxh, dtype):
    from navier_stokes_tpu.mesh import channel_with_cylinder_mesh
    from navier_stokes_tpu.models.navier_stokes import NavierStokes

    def uin(p):
        out = np.zeros((len(p), 2))
        out[:, 0] = 1.5 * 4 * p[:, 1] * (0.41 - p[:, 1]) / 0.41**2
        return out

    mesh = channel_with_cylinder_mesh(maxh)
    return NavierStokes(
        mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin, timestep=1e-3, order=2, dtype=dtype,
    )


def bpcg_fixed_iters(model, iters):
    """BPCG with a fixed iteration count (tol=0 disables early exit)."""
    from navier_stokes_tpu.solvers.bpcg import bramble_pasciak_cg_opt

    free = model.free_s
    f_mod = jnp.where(
        free[None], model.f - model._stokesA_raw(model.u_bc), 0.0
    ).reshape(-1)
    g_mod = -model.B_raw(model.u_bc.reshape(-1))

    def run():
        return bramble_pasciak_cg_opt(
            model.A, model.B, model.BT, model.preA, model.preM,
            f_mod, g_mod, tol=0.0, maxsteps=iters, scale_k=2.0,
        )

    jfn = jax.jit(run)
    res = jfn()  # compile + warmup
    jax.block_until_ready(res.x)
    t0 = time.perf_counter()
    res = jfn()
    jax.block_until_ready(res.x)
    dt = time.perf_counter() - t0
    return iters / dt, res


def measure(device, maxh, iters, dtype):
    with jax.default_device(device):
        model = build(maxh, dtype)
        ips, res = bpcg_fixed_iters(model, iters)
    return ips


def main():
    maxh = 0.02
    iters = 300
    devices = jax.devices()
    main_dev = devices[0]
    log(f"benchmark device: {main_dev}, maxh={maxh}")

    ips = measure(main_dev, maxh, iters, jnp.float32)
    log(f"{main_dev.platform}: {ips:.1f} BPCG iterations/sec")

    vs_baseline = 1.0
    if main_dev.platform != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
            cpu_ips = measure(cpu, maxh, 40, jnp.float32)
            log(f"cpu baseline: {cpu_ips:.1f} BPCG iterations/sec")
            vs_baseline = ips / cpu_ips
        except Exception as e:
            log("cpu baseline failed:", e)

    print(json.dumps({
        "metric": "ns_initial_stokes_bpcg_iterations_per_sec",
        "value": round(ips, 2),
        "unit": "iterations/sec (channel maxh=0.02, Taylor-Hood P2/P1, f32)",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
