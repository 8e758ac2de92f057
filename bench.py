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
* phase 2 — MINRES refinement passes on the equilibrated correction
  system with COMPENSATED double-single operators: a Pallas
  two_prod/two_sum kernel (ops/pallas_mv.py) that streams the hi/lo f32
  tables at f32 speed while capturing every f32 rounding error — 3e-13
  row-relative accuracy, 3.3 ms vs 34.4 ms for the emulated-f64 apply at
  243k dofs.  (The PLAIN 3x-f32 double-single matvec floors near 1e-6:
  row cancellation in the equilibrated condensed operator amplifies the
  f32 accumulation noise; and BPCG's amortized A*s recurrence drifts
  ~400x from the true residual under that same noise — both measured and
  rejected in round 3.)  Off-TPU the comp operators fall back to native
  f64 einsums.

* transient — DoTimeStep throughput (steps/sec, warm), the reference's
  SIMPLE time loop (NavierStokesSIMPLE_iterative.py:427-438 via
  templates/NavierStokesSIMPLE_test_3D.py:28-31): IMEX steps of the SAME
  jitted program in float32 (explicit upwind convection, diagonal-PCG
  M* solve, Chebyshev-inner divergence projection at fixed relative
  tolerance 1e-5) built from the shared host assembly via
  ``assembly_cache`` — f32 stepping with an f64 initial solve is the
  TPU-native split: per-step fields only need the projection tolerance,
  not 1e-8.

The identical jitted program runs on the JAX-CPU backend as the baseline.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "steps_per_sec": N, "steps_vs_baseline": N}
value = inner Krylov iterations/sec; vs_baseline = CPU wall / device wall
for the same solve (>1 means faster than CPU); steps_per_sec /
steps_vs_baseline = the transient metric on the same geometry.
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
        # cache EVERY compile, not just >5s ones: the setup phase dispatches
        # many small uniquely-shaped programs (upload reshapes, setup-time
        # eager ops) that each cost a ~1-3s round trip through the remote
        # compile service — measured as the bulk of a 390s warm-cache setup
        # when only the big solver programs were cached
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

# bf16-stored smoother table groups (f32 arithmetic), A/B'd per group on
# hardware (round 4): "ext" (harmonic extension + interior) and "inv"
# (edge-star inverse tables) are ITERATION-NEUTRAL (354 inner its with
# both, identical to f32) and together halve ~3GB of the preconditioner's
# upload + HBM stream; "panels" costs +30% iterations (465 vs 354) and
# full-table bf16 ~2x — do not default those.
os.environ.setdefault("NSTPU_SMOOTHER_BF16", "ext,inv")
# stronger multiplicative coarse correction (SPD limit is 2.0; the power
# iteration leaves ~25% margin): 484->458 inner its at maxh=0.09,
# 840->815 at 0.3, 763->736 at 0.45 — measured, monotone across scales.
os.environ.setdefault("NSTPU_COARSE_TARGET", "1.6")

MAXH = float(os.environ.get("BENCH_MAXH", "0.09"))
# 0.09 -> 243k velocity dofs + 31k pressure (compute-bound regime)
TOL = 1e-8
H = 0.41

# Wall-clock budget for the WHOLE bench process.  Round 3's lesson
# (BENCH_r03.json rc=124): the driver kills the process on its own clock and
# a JSON line printed only at the very end records nothing.  Every phase
# after the main device solve checks ``remaining()`` and is skipped (with the
# JSON still printed) rather than running the clock out.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "540"))
T_START = time.perf_counter()


def remaining():
    return BUDGET_S - (time.perf_counter() - T_START)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def uin(p):
    out = np.zeros((len(p), 3))
    out[:, 0] = 16 * p[:, 1] * (H - p[:, 1]) * p[:, 2] * (H - p[:, 2]) / H**4
    return out


def make_geometry(mesh):
    """Order-3 curved cylinder, the reference's mesh.Curve(3)
    (/root/reference/templates/NavierStokesSIMPLE_test_3D.py:16).
    BENCH_STRAIGHT=1 disables; a failed snap (inverted boundary tet) falls
    back to the straight mesh rather than killing the bench."""
    if os.environ.get("BENCH_STRAIGHT"):
        return None
    try:
        from navier_stokes_tpu.mesh.curved import curve_to_cylinder_3d

        geo = curve_to_cylinder_3d(mesh, "cyl", (0.5, 0.2), 0.05, order=3)
        log(f"curved cylinder: {len(geo.curved_elements)} curved tets")
        return geo
    except Exception as e:
        log("curved geometry failed, using straight mesh:", repr(e))
        return None


_CACHE_KEYS = {
    "tabs3d": 5, "tabs3d_curved": 5, "cond": 2, "cond_curved": 2,
}


def load_disk_cache(cache: dict, tag: str):
    """Warm the in-process assembly cache from /tmp — host assembly +
    condensation at maxh=0.09 is ~13 min of single-core numpy per process;
    the tables are deterministic functions of (maxh, geometry)."""
    path = os.environ.get("BENCH_ASM_CACHE",
                          f"/tmp/nstpu_asm_{tag}.npz")
    if not path or not os.path.exists(path):
        return path
    try:
        z = np.load(path)
        for key, n in _CACHE_KEYS.items():
            names = [f"{key}_{i}" for i in range(n)]
            if all(nm in z for nm in names):
                cache[key] = tuple(z[nm] for nm in names)
        log(f"assembly cache loaded: {sorted(cache)} from {path}")
    except Exception as e:
        log("assembly cache load failed:", repr(e))
    return path


def save_disk_cache(cache: dict, path: str):
    if not path:
        return
    try:
        flat = {}
        for key, tup in cache.items():
            if key in _CACHE_KEYS and len(tup) == _CACHE_KEYS[key]:
                for i, a in enumerate(tup):
                    flat[f"{key}_{i}"] = np.asarray(a)
        np.savez(path, **flat)
        log(f"assembly cache saved: {sorted(cache)} -> {path}")
    except Exception as e:
        log("assembly cache save failed:", repr(e))


def build(mesh, dtype, preconditioner, cache=None, geometry=None):
    from navier_stokes_tpu.models.navier_stokes_mcs import NavierStokesMCS

    return NavierStokesMCS(
        mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin, timestep=2e-3, order=2, dtype=dtype,
        preconditioner=preconditioner, assembly_cache=cache,
        geometry=geometry,
    )


def measure_transient(device, mesh, cache, n_steps=None, geometry=None):
    """DoTimeStep throughput (steps/sec, warm) in float32 at fixed relative
    projection tolerance 1e-5 — the SIMPLE time loop of the reference
    (NavierStokesSIMPLE_iterative.py:427-438).  ``cache`` shares the host
    assembly/condensation with the f64 initial-solve model."""
    from navier_stokes_tpu.utils.jaxtools import hoisted_jit

    jax.config.update(
        "jax_default_matmul_precision",
        "highest" if device.platform == "tpu" else None,
    )
    try:
        st = device.memory_stats() or {}
        log(f"{device.platform} transient pre-build HBM: "
            f"{st.get('bytes_in_use', 0)/1e9:.2f} GB in use of "
            f"{st.get('bytes_limit', 0)/1e9:.2f} GB")
    except Exception:
        pass
    with jax.default_device(device):
        t0 = time.perf_counter()
        m32 = build(mesh, jnp.float32, "faceblock", cache=cache,
                    geometry=geometry)
        # hoisted_jit: the step closes over GB-scale tables (convection
        # traces, element blocks); plain jit embeds them as constants in
        # the remote-compile payload, which killed the compile service at
        # bench scale (broken pipe after ~30 min, round 4)
        step = hoisted_jit(m32.make_step_fn(project_tol=1e-5), m32.u)
        u = step(m32.u)  # compile + warm
        jax.block_until_ready(u)
        log(f"{device.platform} transient setup+compile "
            f"{time.perf_counter() - t0:.1f}s")
        try:
            st = device.memory_stats() or {}
            log(f"{device.platform} transient post-compile HBM: "
                f"{st.get('bytes_in_use', 0)/1e9:.2f} GB in use of "
                f"{st.get('bytes_limit', 0)/1e9:.2f} GB")
        except Exception:
            pass
        if n_steps is None:
            # calibrate: aim for ~10 s of measurement, stay under the
            # ~60 s tunnel cap per execution (each step is one execution)
            t0 = time.perf_counter()
            u = step(u)
            jax.block_until_ready(u)
            dt1 = time.perf_counter() - t0
            n_steps = max(3, min(200, int(10.0 / max(dt1, 1e-3))))
        t0 = time.perf_counter()
        for _ in range(n_steps):
            u = step(u)
        jax.block_until_ready(u)
        t = time.perf_counter() - t0
        assert bool(jnp.all(jnp.isfinite(u))), "transient blew up"
        log(f"{device.platform} transient: {n_steps} steps in {t:.2f}s "
            f"({n_steps / t:.2f} steps/s)")
    return n_steps, t


def probe_ops(device, mesh, cache=None, geometry=None):
    """BENCH_PROBE=1: time each hot operator apply at bench scale and exit.
    Tells us where a Krylov iteration's milliseconds go (phase-1 f32 K,
    preA, preM; phase-2 f64 K, congruence preA)."""
    from navier_stokes_tpu.solvers import equilibrated_f32_ops
    from navier_stokes_tpu.utils.jaxtools import hoisted_jit

    jax.config.update(
        "jax_default_matmul_precision",
        "highest" if device.platform == "tpu" else None,
    )
    with jax.default_device(device):
        t0 = time.perf_counter()
        m64 = build(mesh, jnp.float64, "faceblock", cache=cache,
                    geometry=geometry)
        ops32, D = equilibrated_f32_ops(
            m64, gs=bool(int(os.environ.get("BENCH_GS", "1"))), split=True
        )
        log(f"setup {time.perf_counter() - t0:.1f}s ndof={m64.n}+{m64.Q.ndof}")
        u32 = jnp.ones(m64.n, jnp.float32)
        p32 = jnp.ones(m64.Q.ndof, jnp.float32)
        u64 = jnp.ones(m64.n, jnp.float64)
        p64 = jnp.ones(m64.Q.ndof, jnp.float64)
        preA32s = ops32["preA"]

        def preA64(r):
            return D * preA32s((D * r).astype(jnp.float32)).astype(
                jnp.float64)

        probes = [
            ("A32 split", ops32["A"], u32),
            ("BT32*B32", lambda u: ops32["BT"](ops32["B"](u)), u32),
            ("preA32", preA32s, u32),
            ("preM32", ops32["preM"], p32),
            ("A64", m64.A, u64),
            ("BT64*B64", lambda u: m64.BT(m64.B(u)), u64),
            ("preA64 (congruence)", preA64, u64),
            ("preM64", m64.preM, p64),
        ]
        parts = getattr(preA32s, "parts", None)
        if parts:
            lay = parts["layout"]
            xF32 = jnp.ones((lay.nface, lay.nfb), jnp.float32)
            for key in ("pre_skel", "coarse_only", "smooth_only"):
                fn = parts.get(key)
                if fn is not None:
                    probes.append((f"preA32.{key}", fn, xF32))
        for name, fn, x in probes:
            try:
                # MARGINAL per-apply cost: each tunnel execution carries a
                # ~25 ms fixed overhead (dispatch + sync), so a single
                # chain's t/K overstates the apply by several x (the
                # chunked production solve amortizes it over ~2000
                # iterations).  Two chain lengths isolate the slope.
                K1, K2 = 10, 60

                def make_chain(K, fn=fn):
                    # hoisted_jit: the preconditioner closures capture ~GB
                    # operator tables; plain jit embeds them as constants
                    # in the remote-compile payload (HTTP 413)
                    def chain_py(v):
                        def body(i, w):
                            y = fn(w)
                            return y / jnp.maximum(
                                jnp.linalg.norm(y.ravel()[:512]), 1e-30)

                        return jax.lax.fori_loop(0, K, body, v)

                    return hoisted_jit(chain_py, x)

                c1, c2 = make_chain(K1), make_chain(K2)

                def best(chain):
                    y = chain(x)
                    jax.block_until_ready(y)
                    ts = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        y = chain(x)
                        jax.block_until_ready(y)
                        ts.append(time.perf_counter() - t0)
                    return sorted(ts)[1]

                t1, t2 = best(c1), best(c2)
                marg = (t2 - t1) / (K2 - K1)
                log(f"  {name:22s} {marg*1e3:8.3f} ms  "
                    f"(chain{K2} {t2*1e3/K2:7.3f} ms/it)")
            except Exception as e:
                log(f"  {name:22s} FAILED {repr(e)[:120]}")


def measure(device, mesh, cache=None, geometry=None):
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
        m64 = build(mesh, jnp.float64, "faceblock", cache=cache,
                    geometry=geometry)
        log(f"  [setup] model build {time.perf_counter() - t0:.1f}s")
        def attempt():
            # Jacobi-equilibrated SPLIT f32 inner system: no f64 operator
            # tables ever ship to the device.  BENCH_GS=1 swaps the additive
            # skeleton smoother for the symmetric multi-color block-GS sweep
            # (default ON: 628 vs 1600+ inner its on the 3D channel, and the
            # row-panel sweep makes its per-apply cost comparable).
            # ops_ds: COMPENSATED double-single operators for phase 2 (Pallas
            # two_prod/two_sum kernel, ~3e-13 row-relative accuracy at f32
            # streaming speed — 3.3 ms vs 34.4 ms for the emulated-f64 apply).
            t_ph = time.perf_counter()
            ops32, D, ops_ds = equilibrated_f32_ops(
                m64, gs=bool(int(os.environ.get("BENCH_GS", "1"))), split=True,
                with_ds=True,
            )
            log(f"  [setup] equilibrated ops {time.perf_counter() - t_ph:.1f}s")
            t_ph = time.perf_counter()
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
            log(f"  [setup] rhs eval {time.perf_counter() - t_ph:.1f}s")
            t_ph = time.perf_counter()
            minres_chunk = hoisted_jit(
                lambda r0s, r1s, x0, x1, tl: minres(
                    K32, (r0s, r1s), pre=pre32, sol=(x0, x1),
                    initialize=False, tol=tl, maxsteps=CHUNK32,
                    abs_test=False,
                ),
                z32, zp32, z32, zp32, jnp.float32(5e-7),
            )
            log(f"  [setup] trace minres32 {time.perf_counter() - t_ph:.1f}s")
            t_ph = time.perf_counter()
            residual64 = hoisted_jit(
                lambda u0, u1: (
                    f_mod - m64.A(u0) - m64.BT(u1), g_mod - m64.B(u0)
                ),
                f_mod, g_mod,
            )
            # per-pass residuals through the COMPENSATED kernels (~3e-13
            # row-relative, 4 digits below the 1e-8 target): A = D^-1 A~
            # D^-1 etc., so conjugate the equilibrated ds operators by D.
            # The true-f64 apply costs 33+8 ms per residual at 243k dofs
            # (x3-4 passes = ~0.13 s of a 2 s solve); residual64 stays as
            # the one-time verification after the cold solve.
            Dinv = 1.0 / D
            residual_pass = hoisted_jit(
                lambda u0, u1: (
                    f_mod - Dinv * ops_ds["A"](Dinv * u0)
                    - Dinv * ops_ds["BT"](u1),
                    g_mod - ops_ds["B"](Dinv * u0),
                ),
                f_mod, g_mod,
            )
            # phase 2: MINRES on the EQUILIBRATED correction system
            # (D A D) dz~ = D r with COMPENSATED double-single operators and
            # the f32 skeleton preconditioner (plain casts — the system is
            # already scaled).  Posed on the residual, every quantity scales
            # with ||r||, so the f32 preconditioner noise is RELATIVE — each
            # outer pass contracts the true residual by its tolerance, and the
            # comp operator's 3e-13 row-relative accuracy clears the 1e-8
            # target with margin.
            preA32s = ops32["preA"]
            preM32s = ops32["preM"]

            def K_ds(x):
                u, p = x
                return (ops_ds["A"](u) + ops_ds["BT"](p), ops_ds["B"](u))

            def pre_ds(x):
                return (
                    preA32s(x[0].astype(jnp.float32)).astype(jnp.float64),
                    preM32s(x[1].astype(jnp.float32)).astype(jnp.float64),
                )

            CHUNK64 = int(os.environ.get("BENCH_CHUNK64", "1000"))
            z64 = jnp.zeros_like(f_mod)
            zp64 = jnp.zeros_like(g_mod)
            minres_p2_chunk = hoisted_jit(
                lambda r0, r1, x0, x1, tl: minres(
                    K_ds, (r0, r1), pre=pre_ds, sol=(x0, x1),
                    initialize=False, tol=tl, maxsteps=CHUNK64,
                    abs_test=False,
                ),
                z64, zp64, z64, zp64, jnp.float64(1e-4),
            )
            log(f"  [setup] trace residuals+p2 {time.perf_counter() - t_ph:.1f}s")

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
                t_solve0 = time.perf_counter()
                for _pass in range(8):
                    if _pass == 0:
                        r0, r1 = f_mod, g_mod  # x == 0: the residual IS the rhs
                    else:
                        r0, r1 = residual_pass(x0, x1)
                    new_rel = true_rel(r0, r1)
                    log(f"  p1 pass {_pass}: rel={new_rel:.3e} "
                        f"inner={total_inner} "
                        f"t={time.perf_counter() - t_solve0:.2f}s")
                    if new_rel <= TOL or (_pass > 0 and new_rel > 0.7 * rel):
                        rel = min(rel, new_rel)
                        break
                    rel = new_rel
                    # adaptive pass tolerance: the inner f32 preconditioned-
                    # norm recurrence runs ~100x ahead of the true f64
                    # contraction (maxh=0.3: inner tol 5e-7 delivered ~1e-4
                    # true per pass), so when the REMAINING contraction
                    # (TOL/rel) is small, loosen the pass target instead of
                    # driving a full 5e-7 pass ~1e4x past it (326 of 977
                    # inner its wasted on the final pass, measured).
                    tol_pass = jnp.float32(
                        min(1e-3, max(5e-7, (TOL / rel) / 256.0)))
                    r0s = (D * r0).astype(jnp.float32)
                    r1s = r1.astype(jnp.float32)
                    dx0, dx1 = z32, zp32
                    for _c in range(3):
                        res = minres_chunk(r0s, r1s, dx0, dx1, tol_pass)
                        dx0, dx1 = res.x
                        total_inner += int(res.iterations)
                        if bool(res.converged):
                            break
                    x0 = x0 + D * dx0.astype(jnp.float64)
                    x1 = x1 + dx1.astype(jnp.float64)
                # phase 2: compensated double-single MINRES refinement passes
                # on the equilibrated correction system (warm-restarted chunks)
                _outer = 0
                while _outer < 6 and rel > TOL:
                    r0, r1 = residual_pass(x0, x1)
                    # same adaptation for the double-single endgame (its f64
                    # recurrence tracks the true residual much closer; a
                    # 16x safety margin instead of 256x)
                    tol_p2 = jnp.float64(
                        min(1e-3, max(1e-4, (TOL / rel) / 16.0)))
                    dx0, dx1 = z64, zp64
                    rounds = 0
                    res = None
                    while rounds < 6:
                        res = minres_p2_chunk(D * r0, r1, dx0, dx1, tol_p2)
                        dx0, dx1 = res.x
                        total_inner += int(res.iterations)
                        rounds += 1
                        if bool(res.converged):
                            break
                    x0n = x0 + D * dx0
                    x1n = x1 + dx1
                    r0n, r1n = residual_pass(x0n, x1n)
                    new_rel = true_rel(r0n, r1n)
                    log(f"  p2 outer {_outer}: rel={new_rel:.3e} "
                        f"(+{rounds} chunks) inner={total_inner} "
                        f"t={time.perf_counter() - t_solve0:.2f}s")
                    if new_rel >= 0.9 * rel:
                        # stalled at the double-single noise floor — accept the
                        # best iterate (the monotonicity guard keeps x)
                        break
                    x0, x1, rel = x0n, x1n, new_rel
                    _outer += 1
                return (x0, x1), rel, total_inner

            t_c = time.perf_counter()
            x, rel, inner = full_solve()  # compile + warmup
            jax.block_until_ready(x)
            t_cold = time.perf_counter() - t_c
            # one-time verification of the compensated-kernel residual
            # against the TRUE f64 operator (the solve's own control flow
            # runs on residual_pass; its ~3e-13 accuracy must show here)
            r0v, r1v = residual64(x[0], x[1])
            rel_true = true_rel(r0v, r1v)
            log(f"{device.platform} cold done: rel_res={rel:.2e} "
                f"(true f64 {rel_true:.2e}) inner={inner}")
            assert rel_true <= 1.01 * TOL, (
                f"did not reach {TOL}: true {rel_true} (ds {rel})")
            if os.environ.get("BENCH_COLD_ONLY"):
                # iteration-count A/Bs (e.g. bf16 table groups): the cold
                # wall includes compiles — only ``inner`` is meaningful
                return int(inner), t_cold
            t_w = time.perf_counter()
            x, rel, inner = full_solve()
            jax.block_until_ready(x)
            t = time.perf_counter() - t_w
            log(f"{device.platform} warm: {t:.3f}s rel={rel:.2e} inner={inner}")
            return int(inner), t

        # a Mosaic/Pallas lowering failure on a NEW kernel shape must not
        # dump the device measurement to the CPU fallback — retry once on
        # the SAME device with the Pallas paths disabled (NSTPU_PALLAS=0;
        # ops/pallas_mv.make_table_apply and refinement.equilibrated_f32_ops
        # both honor it at build time).  Transient tunnel faults (HTTP 500
        # from the remote compile service, brief UNAVAILABLE) get one plain
        # same-config retry first.
        pallas_disabled = False
        transient_retried = False
        for _try in range(3):
            try:
                return attempt()
            except Exception as e:
                msg = repr(e).lower()
                if device.platform == "cpu":
                    raise
                if (not pallas_disabled
                        and ("mosaic" in msg or "pallas" in msg)):
                    log("Pallas path failed on device; retrying with "
                        "NSTPU_PALLAS=0:", repr(e)[:300])
                    os.environ["NSTPU_PALLAS"] = "0"
                    pallas_disabled = True
                    continue
                if (not transient_retried
                        and ("http 500" in msg or "unavailable" in msg)):
                    log("transient tunnel fault; retrying same config:",
                        repr(e)[:200])
                    transient_retried = True
                    time.sleep(20)
                    continue
                raise


BASELINE_ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_CPU.json")


def _baseline_config(geo_tag):
    return {
        "metric": "mcs3d_initial_stokes_to_residual_1e-8",
        "maxh": MAXH,
        "tol": TOL,
        "geom": geo_tag,
        "gs": int(os.environ.get("BENCH_GS", "1")),
    }


def load_baseline(geo_tag):
    """Measured CPU baseline, cached as a repo artifact.  ``vs_baseline`` is
    a MEASURED ratio: the artifact is written only by ``write_baseline``
    (this same program on the jax-CPU backend) and is keyed on the full
    bench config — a config mismatch discards it."""
    try:
        with open(BASELINE_ARTIFACT) as fh:
            art = json.load(fh)
        if art.get("config") == _baseline_config(geo_tag):
            return art
        log("baseline artifact config mismatch — ignoring",
            art.get("config"), _baseline_config(geo_tag))
    except FileNotFoundError:
        pass
    except Exception as e:
        log("baseline artifact load failed:", repr(e))
    return None


def write_baseline(mesh, cache, geo, geo_tag):
    """BENCH_WRITE_BASELINE=1: measure the CPU baseline (same jitted program,
    jax-CPU backend — the actual NGSolve reference is unavailable in this
    environment, see BASELINE.md) and cache it as the repo artifact."""
    import datetime
    import platform as _plat

    try:
        jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass
    cpu = jax.devices("cpu")[0]
    inner, t_cpu = measure(cpu, mesh, cache, geometry=geo)
    art = {
        "config": _baseline_config(geo_tag),
        "solve_wall_s": round(t_cpu, 3),
        "solve_inner": int(inner),
        "provenance": (
            "same jitted program on the jax-CPU backend (warm wall, compile "
            "excluded); measured by `BENCH_WRITE_BASELINE=1 BENCH_CPU=1 "
            "python bench.py`"
        ),
        "measured_utc": datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds"),
        "host": _plat.node() or "unknown",
        "cpu_count": os.cpu_count(),
    }
    if not os.environ.get("BENCH_NO_TRANSIENT"):
        try:
            # >= 3 measured steps (VERDICT round-4 weak 7: a headline-
            # adjacent ratio must not rest on a single-step timing); a CPU
            # step at bench scale is ~2-3 min, so this phase is the long
            # pole of the baseline regen and stays budget-gated by the
            # caller's BENCH_BUDGET_S.
            n_c, t_c = measure_transient(cpu, mesh, cache, n_steps=3,
                                         geometry=geo)
            art["transient_steps_per_sec"] = float(f"{n_c / t_c:.4g}")
            art["transient_n_steps"] = int(n_c)
        except Exception as e:
            log("cpu transient baseline failed:", repr(e))
    with open(BASELINE_ARTIFACT, "w") as fh:
        json.dump(art, fh, indent=1)
        fh.write("\n")
    log(f"baseline artifact written: {BASELINE_ARTIFACT}")
    return art


def main():
    from navier_stokes_tpu.mesh import channel_with_cylinder_mesh_3d

    mesh = channel_with_cylinder_mesh_3d(MAXH)
    devices = jax.devices()
    main_dev = devices[0]
    log(f"benchmark device: {main_dev}, maxh={MAXH} ({mesh.ne} tets), tol={TOL}")
    cache: dict = {}  # host assembly shared across all model builds
    geo = make_geometry(mesh)
    tag = f"{MAXH}_{'straight' if geo is None else 'curved'}"
    cache_path = load_disk_cache(cache, tag)
    had_cache = bool(cache)

    if os.environ.get("BENCH_PROBE"):
        probe_ops(main_dev, mesh, cache, geometry=geo)
        if not had_cache:
            save_disk_cache(cache, cache_path)
        return

    if os.environ.get("BENCH_WRITE_BASELINE"):
        write_baseline(mesh, cache, geo, tag)
        if not had_cache:
            save_disk_cache(cache, cache_path)
        return

    try:
        inner, t_main = measure(main_dev, mesh, cache, geometry=geo)
        if not had_cache:
            save_disk_cache(cache, cache_path)
            had_cache = True
    except Exception as e:
        # accelerator unavailable/crashed: fall back to CPU so the bench
        # always emits its JSON line
        log("device measurement failed, falling back to cpu:", repr(e))
        main_dev = jax.devices("cpu")[0]
        inner, t_main = measure(main_dev, mesh, cache, geometry=geo)
    ips = inner / t_main

    # transient SIMPLE throughput — budgeted: setup+compile for the f32 step
    # model is ~1-2 min; skip (and say so) rather than run out the driver's
    # clock before the JSON line prints.
    steps_per_sec = None
    if not os.environ.get("BENCH_NO_TRANSIENT"):
        if remaining() > float(os.environ.get("BENCH_TRANSIENT_MIN_S", "150")):
            try:
                n_steps, t_steps = measure_transient(main_dev, mesh, cache,
                                                     geometry=geo)
                steps_per_sec = n_steps / t_steps
            except Exception as e:
                log("transient measurement failed:", repr(e))
        else:
            log(f"transient skipped: {remaining():.0f}s left of "
                f"{BUDGET_S:.0f}s budget")

    # Baselines come from the measured-and-cached artifact (see
    # load_baseline).  If it is missing and enough budget remains, measure
    # it now and cache it; never delay the JSON line past the budget for it.
    vs_baseline = 1.0
    baseline_note = ""
    steps_vs_baseline = None
    if main_dev.platform != "cpu" and not os.environ.get("BENCH_NO_CPU"):
        art = load_baseline(tag)
        if art is None and remaining() > float(
                os.environ.get("BENCH_CPU_MIN_S", "420")):
            try:
                art = write_baseline(mesh, cache, geo, tag)
            except Exception as e:
                log("cpu baseline measurement failed:", repr(e))
        if art is not None:
            vs_baseline = art["solve_wall_s"] / t_main
            baseline_note = (
                f"; vs_baseline = measured CPU wall {art['solve_wall_s']}s "
                f"(same jitted program, jax-CPU backend, cached artifact "
                f"BASELINE_CPU.json measured {art['measured_utc']}Z) / "
                f"device wall"
            )
            if steps_per_sec is not None and art.get("transient_steps_per_sec"):
                steps_vs_baseline = (
                    steps_per_sec / art["transient_steps_per_sec"])
        else:
            vs_baseline = 0.0
            baseline_note = "; vs_baseline UNKNOWN (no measured CPU baseline)"

    out = {
        "metric": "mcs3d_initial_stokes_to_residual_1e-8",
        "value": round(ips, 2),
        "unit": (
            f"inner Krylov iterations/sec (split-f32 MINRES refinement + "
            f"compensated double-single polish), 3D MCS channel maxh={MAXH}, "
            f"wall={t_main:.3f}s to f64 rel residual {TOL} on "
            f"{main_dev.platform}"
            + (
                f"; transient SIMPLE loop {steps_per_sec:.4g} steps/s "
                f"(f32, proj tol 1e-5"
                + (f", x{steps_vs_baseline:.1f} vs measured 1-step CPU "
                   f"baseline" if steps_vs_baseline is not None else "")
                + ")"
                if steps_per_sec is not None else ""
            )
            + baseline_note
        ),
        "vs_baseline": round(vs_baseline, 3),
    }
    if steps_per_sec is not None:
        out["steps_per_sec"] = float(f"{steps_per_sec:.4g}")
        if steps_vs_baseline is not None:
            out["steps_vs_baseline"] = round(steps_vs_baseline, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
