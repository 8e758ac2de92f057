"""Benchmark: NS initial Stokes solve to f64 relative residual 1e-8.

The BASELINE.json north-star metric (wall-clock + Krylov iterations/sec at
matched residual 1e-8) on the flagship channel-with-cylinder model, solved
the TPU-native way: mixed-precision iterative refinement — float32
Bramble-Pasciak CG inner solves with the two-level additive-Schwarz
preconditioner, float64 outer residuals (TPU v5e emulates f64 ~15x slower,
so refinement replaces one emulated-f64 solve with two to three native-f32
solves).  The identical algorithm runs on the JAX-CPU backend as the
baseline.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
value = inner BPCG iterations/sec; vs_baseline = CPU wall / device wall
for the same solve (>1 means faster than CPU).
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
# persistent compilation cache: cold TPU compiles go through a slow remote
# compile service here (~minutes); cache across bench invocations
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/nstpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

MAXH = 0.015
TOL = 1e-8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def uin(p):
    out = np.zeros((len(p), 2))
    out[:, 0] = 1.5 * 4 * p[:, 1] * (0.41 - p[:, 1]) / 0.41**2
    return out


def build(mesh, dtype, preconditioner):
    from navier_stokes_tpu.models.navier_stokes import NavierStokes

    return NavierStokes(
        mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin, timestep=1e-3, order=2, dtype=dtype,
        preconditioner=preconditioner,
    )


def measure(device, mesh):
    from navier_stokes_tpu.solvers import mixed_precision_saddle_solve

    # TPU f32 matmuls default to bf16 multiplication: the Krylov machinery
    # needs true f32 there.  On CPU 'highest' forces slow emulated paths for
    # f32 (3x slower baseline), so scope the flag per device.
    jax.config.update(
        "jax_default_matmul_precision",
        "highest" if device.platform == "tpu" else None,
    )
    with jax.default_device(device):
        m64 = build(mesh, jnp.float64, "jacobi")  # only A/B/BT used in f64
        m32 = build(mesh, jnp.float32, "twolevel")
        ops64 = dict(A=m64.A, B=m64.B, BT=m64.BT)
        ops32 = dict(A=m32.A, B=m32.B, BT=m32.BT, preA=m32.preA,
                     preM=m32.preM)
        f_mod = jnp.where(
            m64.free_s[None], m64.f - m64._stokesA_raw(m64.u_bc), 0.0
        ).reshape(-1)
        g_mod = -m64.B_raw(m64.u_bc.reshape(-1))

        # identical jitted program on both devices (in-jit Lanczos scaling):
        # a same-code comparison.  (A CPU-tuned variant without the
        # HIGHEST-precision Lanczos reaches ~6.5s; see NOTES_r1.md.)
        @jax.jit
        def solve():
            return mixed_precision_saddle_solve(
                ops64, ops32, f_mod, g_mod, tol=TOL, inner_tol=2e-6,
                inner_maxsteps=1500,
            )

        x, r, steps, inner = solve()  # compile + warmup
        jax.block_until_ready(x)
        log(
            f"{device.platform} cold done: rel_res={float(r):.2e} "
            f"refines={int(steps)} inner_iters={int(inner)}"
        )
        assert float(r) <= TOL, f"did not reach {TOL}: {float(r)}"
        t0 = time.perf_counter()
        x, r, steps, inner = solve()
        jax.block_until_ready(x)
        t = time.perf_counter() - t0
        log(f"{device.platform} warm: {t:.3f}s inner={int(inner)}")
    return int(inner), t


def main():
    from navier_stokes_tpu.mesh import channel_with_cylinder_mesh

    mesh = channel_with_cylinder_mesh(MAXH)
    devices = jax.devices()
    main_dev = devices[0]
    log(f"benchmark device: {main_dev}, maxh={MAXH} ({mesh.ne} elements), tol={TOL}")

    try:
        inner, t_main = measure(main_dev, mesh)
    except Exception as e:
        # accelerator unavailable/crashed: fall back to CPU so the bench
        # always emits its JSON line
        log("device measurement failed, falling back to cpu:", repr(e))
        main_dev = jax.devices("cpu")[0]
        inner, t_main = measure(main_dev, mesh)
    ips = inner / t_main

    vs_baseline = 1.0
    if main_dev.platform != "cpu":
        try:
            # the persistent cache stores CPU AOT results with machine
            # features of the (remote) compile host; reloading them on this
            # host degrades the CPU baseline (and warns of SIGILL) — compile
            # the baseline fresh
            try:
                jax.config.update("jax_compilation_cache_dir", None)
            except Exception:
                pass
            cpu = jax.devices("cpu")[0]
            _, t_cpu = measure(cpu, mesh)
            vs_baseline = t_cpu / t_main
        except Exception as e:
            log("cpu baseline failed:", repr(e))

    print(json.dumps({
        "metric": "ns_initial_stokes_to_residual_1e-8",
        "value": round(ips, 2),
        "unit": (
            f"inner BPCG iterations/sec (f32+f64 refinement), channel "
            f"maxh={MAXH}, wall={t_main:.3f}s to f64 rel residual {TOL} "
            f"on {main_dev.platform}"
        ),
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
