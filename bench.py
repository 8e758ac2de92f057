"""Benchmark: 3D MCS Navier-Stokes initial Stokes solve to f64 rel residual 1e-8.

The BASELINE.json north-star metric (wall-clock + Krylov iterations/sec at
matched residual 1e-8 on the 3D SIMPLE benchmark) measured on the FLAGSHIP
model: NavierStokesMCS on the reference's 3D channel-with-cylinder geometry
(/root/reference/templates/NavierStokesSIMPLE_test_3D.py:8-25), BDM_2
H(div) x tangential facet x H(curl,div) stress with batched static
condensation, solved the TPU-native way:

* phase 1 — float32 MINRES refinement passes on the Jacobi-equilibrated,
  split (compensated) f32 system with the skeleton/edge-star aux-space
  preconditioner; all applies SCATTER-FREE face-block kernels
  (ops/faceblock.py; the round-2 gather/scatter formulation measured
  7.0 ms per A-apply vs 1.0 ms now).
* phase 2 — MINRES refinement passes on the same equilibrated system with
  float64 Krylov vectors and DOUBLE-SINGLE matvecs (three f32 element
  einsums represent the f64 operator product; the round-2 phase 2 paid
  ~0.2 s/iteration in emulated-f64 applies).  MINRES, not BPCG: the
  optimized Bramble-Pasciak recurrence amortizes A*s across the whole
  iteration and the ~1e-7 double-single apply noise makes its internal
  error measure drift from the true residual by ~400x (measured), while
  MINRES tracks it exactly.  Outer residuals use the true emulated-f64
  operator, so the reported residual is exact.

The identical jitted program runs on the JAX-CPU backend as the baseline.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
value = inner Krylov iterations/sec; vs_baseline = CPU wall / device wall
for the same solve (>1 means faster than CPU).
"""

import json
import os
import sys
import time

import jax

try:
    if os.environ.get("BENCH_CPU"):
        raise RuntimeError("BENCH_CPU set")
    jax.config.update("jax_platforms", "axon,cpu")
    jax.devices()
except Exception:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: cold TPU compiles go through a slow remote
# compile service here (~minutes); cache across bench invocations.  CPU-only
# runs must NOT see it: AOT results carry the remote compile host's machine
# features and can SIGILL on this host.
try:
    if jax.devices()[0].platform != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/tmp/nstpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

MAXH = float(os.environ.get("BENCH_MAXH", "0.09"))
# 0.09 -> 243k velocity dofs + 31k pressure (compute-bound regime)
TOL = 1e-8
H = 0.41


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def uin(p):
    out = np.zeros((len(p), 3))
    out[:, 0] = 16 * p[:, 1] * (H - p[:, 1]) * p[:, 2] * (H - p[:, 2]) / H**4
    return out


def build(mesh, dtype, preconditioner):
    from navier_stokes_tpu.models.navier_stokes_mcs import NavierStokesMCS

    return NavierStokesMCS(
        mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin, timestep=2e-3, order=2, dtype=dtype,
        preconditioner=preconditioner,
    )


def measure(device, mesh):
    from navier_stokes_tpu.solvers import equilibrated_f32_ops

    # TPU f32 matmuls default to bf16 multiplication: the Krylov machinery
    # needs true f32 there.  On CPU 'highest' forces slow emulated paths for
    # f32 (3x slower baseline), so scope the flag per device.
    jax.config.update(
        "jax_default_matmul_precision",
        "highest" if device.platform == "tpu" else None,
    )
    from navier_stokes_tpu.solvers.minres import minres
    from navier_stokes_tpu.utils.jaxtools import hoisted_jit

    with jax.default_device(device):
        t0 = time.perf_counter()
        m64 = build(mesh, jnp.float64, "faceblock")  # preA built lazily
        # Jacobi-equilibrated SPLIT f32 inner system + double-single ops
        # for the polish: no f64 operator tables ever ship to the device
        ops32, D, ops_ds = equilibrated_f32_ops(
            m64, gs=False, split=True, with_ds=True
        )
        f_mod = jnp.where(m64.free, m64.f - m64.A_raw(m64.u_bc), 0.0)
        g_mod = -m64.B_raw(m64.u_bc)
        rhs_norm = float(jnp.sqrt(jnp.vdot(f_mod, f_mod) + jnp.vdot(g_mod, g_mod)))
        log(f"{device.platform} setup {time.perf_counter() - t0:.1f}s "
            f"ndof={m64.n}+{m64.Q.ndof}")

        # Device executions are CHUNKED: the axon tunnel kills executions
        # running longer than ~60 s.  With the face-block applies one
        # Krylov iteration is a few ms, so 2000-iteration chunks stay far
        # below the limit.
        def K32(x):
            u, p = x
            return (ops32["A"](u) + ops32["BT"](p), ops32["B"](u))

        def pre32(x):
            return (ops32["preA"](x[0]), ops32["preM"](x[1]))

        CHUNK32 = int(os.environ.get("BENCH_CHUNK32", "2000"))
        z32 = jnp.zeros_like(f_mod, jnp.float32)
        zp32 = jnp.zeros_like(g_mod, jnp.float32)
        minres_chunk = hoisted_jit(
            lambda r0s, r1s, x0, x1: minres(
                K32, (r0s, r1s), pre=pre32, sol=(x0, x1),
                initialize=False, tol=5e-7, maxsteps=CHUNK32,
            ),
            z32, zp32, z32, zp32,
        )
        residual64 = hoisted_jit(
            lambda u0, u1: (
                f_mod - m64.A(u0) - m64.BT(u1), g_mod - m64.B(u0)
            ),
            f_mod, g_mod,
        )
        # phase 2: MINRES on the equilibrated CORRECTION system
        # A~ dz~ = D r0 with f64 vectors, double-single matvecs and the f32
        # skeleton preconditioner applied through casts.  Posed on the
        # residual, every quantity scales with ||r||, so the f32
        # preconditioner noise and the ~1e-7 matvec accumulation noise are
        # RELATIVE — each outer pass contracts the true residual by its
        # inner tolerance.  Solution map: dx0 = D dz~, dx1 = dz1.
        preA32s = ops32["preA"]

        def preA64(r):
            return preA32s(r.astype(jnp.float32)).astype(jnp.float64)

        def preM64(p):
            return ops32["preM"](p.astype(jnp.float32)).astype(jnp.float64)

        def K_ds(x):
            u, p = x
            return (ops_ds["A"](u) + ops_ds["BT"](p), ops_ds["B"](u))

        def pre_ds(x):
            return (preA64(x[0]), preM64(x[1]))

        CHUNK64 = int(os.environ.get("BENCH_CHUNK64", "1500"))
        z64 = jnp.zeros_like(f_mod)
        zp64 = jnp.zeros_like(g_mod)
        minres_ds_chunk = hoisted_jit(
            lambda r0, r1, x0, x1: minres(
                K_ds, (r0, r1), pre=pre_ds, sol=(x0, x1),
                initialize=False, tol=1e-4, maxsteps=CHUNK64,
            ),
            z64, zp64, z64, zp64,
        )

        def true_rel(r0, r1):
            return float(
                jnp.sqrt(jnp.vdot(r0, r0) + jnp.vdot(r1, r1))
            ) / rhs_norm

        def full_solve():
            x0 = jnp.zeros_like(f_mod)
            x1 = jnp.zeros_like(g_mod)
            total_inner = 0
            rel = 1.0
            # phase 1: f32 MINRES refinement passes, chunked
            for _pass in range(8):
                r0, r1 = residual64(x0, x1)
                new_rel = true_rel(r0, r1)
                log(f"  p1 pass {_pass}: rel={new_rel:.3e}")
                if new_rel <= TOL or (_pass > 0 and new_rel > 0.7 * rel):
                    rel = min(rel, new_rel)
                    break
                rel = new_rel
                r0s = (D * r0).astype(jnp.float32)
                r1s = r1.astype(jnp.float32)
                dx0, dx1 = z32, zp32
                for _c in range(3):
                    res = minres_chunk(r0s, r1s, dx0, dx1)
                    dx0, dx1 = res.x
                    total_inner += int(res.iterations)
                    if bool(res.converged):
                        break
                x0 = x0 + D * dx0.astype(jnp.float64)
                x1 = x1 + dx1.astype(jnp.float64)
            # phase 2: double-single MINRES refinement passes on the
            # equilibrated correction system (warm-restarted chunks)
            _outer = 0
            while _outer < 6 and rel > TOL:
                r0, r1 = residual64(x0, x1)
                r0s = D * r0
                dx0, dx1 = z64, zp64
                rounds = 0
                res = None
                while rounds < 6:
                    res = minres_ds_chunk(r0s, r1, dx0, dx1)
                    dx0, dx1 = res.x
                    total_inner += int(res.iterations)
                    rounds += 1
                    if bool(res.converged):
                        break
                x0n = x0 + D * dx0
                x1n = x1 + dx1
                r0n, r1n = residual64(x0n, x1n)
                new_rel = true_rel(r0n, r1n)
                log(f"  p2 outer {_outer}: rel={new_rel:.3e} (+{rounds} chunks)")
                if new_rel >= 0.9 * rel:
                    # stalled at the double-single noise floor — accept the
                    # best iterate (the monotonicity guard keeps x)
                    break
                x0, x1, rel = x0n, x1n, new_rel
                _outer += 1
            return (x0, x1), rel, total_inner

        x, rel, inner = full_solve()  # compile + warmup
        jax.block_until_ready(x)
        log(f"{device.platform} cold done: rel_res={rel:.2e} inner={inner}")
        assert rel <= TOL, f"did not reach {TOL}: {rel}"
        t0 = time.perf_counter()
        x, rel, inner = full_solve()
        jax.block_until_ready(x)
        t = time.perf_counter() - t0
        log(f"{device.platform} warm: {t:.3f}s rel={rel:.2e} inner={inner}")
    return int(inner), t


def main():
    from navier_stokes_tpu.mesh import channel_with_cylinder_mesh_3d

    mesh = channel_with_cylinder_mesh_3d(MAXH)
    devices = jax.devices()
    main_dev = devices[0]
    log(f"benchmark device: {main_dev}, maxh={MAXH} ({mesh.ne} tets), tol={TOL}")

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
        "metric": "mcs3d_initial_stokes_to_residual_1e-8",
        "value": round(ips, 2),
        "unit": (
            f"inner Krylov iterations/sec (split-f32 MINRES refinement + "
            f"double-single BPCG polish), 3D MCS channel maxh={MAXH}, "
            f"wall={t_main:.3f}s to f64 rel residual {TOL} on "
            f"{main_dev.platform}"
        ),
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
