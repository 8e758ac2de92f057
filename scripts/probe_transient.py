"""Per-piece wall-clock probe of the fused SIMPLE transient step (VERDICT r5
task 1): 38.8 s/step was recorded in round 4 when the per-piece ITERATION
counts (mstar CG ~29, projection CG ~26) predict ~1 s.  This probe times the
pieces of ONE step at bench scale, each as its own hoisted-jitted program,
and reports iteration counts from inside the fused regime (f32, the same
tolerances bench.measure_transient uses).

Run:  python scripts/probe_transient.py           (bench scale maxh=0.09)
      BENCH_MAXH=0.3 python scripts/probe_transient.py   (small smoke)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (configures jax platforms/x64/caches)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from navier_stokes_tpu.solvers.cg import cg  # noqa: E402
from navier_stokes_tpu.utils.jaxtools import hoisted_jit  # noqa: E402

log = bench.log


def timeit(name, fn, *args, reps=3):
    try:
        y = fn(*args)
        jax.block_until_ready(y)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            y = fn(*args)
            jax.block_until_ready(y)
            ts.append(time.perf_counter() - t0)
        log(f"  {name:34s} {sorted(ts)[len(ts)//2]*1e3:10.1f} ms")
        return y
    except Exception as e:
        log(f"  {name:34s} FAILED {repr(e)[:200]}")
        return None


def main():
    from navier_stokes_tpu.mesh import channel_with_cylinder_mesh_3d

    mesh = channel_with_cylinder_mesh_3d(bench.MAXH)
    dev = jax.devices()[0]
    log(f"probe device: {dev}, maxh={bench.MAXH} ({mesh.ne} tets)")
    cache: dict = {}
    geo = bench.make_geometry(mesh)
    tag = f"{bench.MAXH}_{'straight' if geo is None else 'curved'}"
    bench.load_disk_cache(cache, tag)

    jax.config.update("jax_default_matmul_precision",
                      "highest" if dev.platform == "tpu" else None)
    with jax.default_device(dev):
        t0 = time.perf_counter()
        m = bench.build(mesh, jnp.float32, "faceblock", cache=cache,
                        geometry=geo)
        log(f"f32 model build {time.perf_counter() - t0:.1f}s "
            f"ndof={m.n}+{m.Q.ndof}")
        t0 = time.perf_counter()
        m._mass_chebyshev()
        log(f"cheb setup {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        m._pre_proj_twolevel()
        log(f"twolevel setup {time.perf_counter() - t0:.1f}s")

        u = m.u
        free, f = m.free, m.f
        conv, A_raw = m.convection, m.A_raw
        # build the lazy convection tables EAGERLY: first touch inside a
        # trace caches tracer-backed closures (leaks on any second trace)
        jax.block_until_ready(conv(u))
        Minv = m._mass_chebyshev()
        pre2 = m._pre_proj_twolevel()

        # --- piece 1: explicit rhs (convection + A_raw) ---
        rhs_fn = hoisted_jit(
            lambda u: jnp.where(free, conv(u) + f - A_raw(u), 0.0), u)
        temp = timeit("rhs = conv+f-A_raw", rhs_fn, u)

        conv_fn = hoisted_jit(conv, u)
        timeit("conv alone", conv_fn, u)
        araw_fn = hoisted_jit(A_raw, u)
        timeit("A_raw alone", araw_fn, u)

        # --- piece 2: mstar CG (tol 1e-4, the step's own setting) ---
        mstar_cg = hoisted_jit(
            lambda r: cg(m.mstar, r, pre=m.preMstar, tol=1e-4,
                         maxsteps=2000), temp)
        res = timeit("mstar CG (tol 1e-4)", mstar_cg, temp)
        log(f"    mstar its={int(res.iterations)} "
            f"converged={bool(res.converged)}")
        temp2 = res.x

        # --- piece 3: single applies inside the projection ---
        timeit("Minv (cheb deg16)", hoisted_jit(Minv, temp2), temp2)
        p0 = m.B_raw(u)
        timeit("B_raw", hoisted_jit(m.B_raw, temp2), temp2)
        timeit("BT", hoisted_jit(m.BT, p0), p0)
        S_fn = hoisted_jit(lambda p: m.B(Minv(m.BT(p))), p0)
        timeit("S apply (B Minv BT)", S_fn, p0)
        timeit("twolevel pre", hoisted_jit(pre2, p0), p0)

        # --- piece 4: projection CG (tol 1e-5, the step's own setting) ---
        def proj_cg_py(uv):
            def S(p):
                return m.B(Minv(m.BT(p)))
            rhs = m.B_raw(uv)
            return cg(S, rhs, pre=pre2, tol=1e-5, maxsteps=2000)

        proj_cg = hoisted_jit(proj_cg_py, temp2)
        res = timeit("projection CG (tol 1e-5)", proj_cg, temp2)
        log(f"    proj its={int(res.iterations)} "
            f"converged={bool(res.converged)} err0={float(res.err0):.3e}")

        # --- piece 5: the fused step, as bench runs it ---
        step = hoisted_jit(m.make_step_fn(project_tol=1e-5), u)
        timeit("FUSED STEP", step, u, reps=3)

        # --- piece 6: fused step but with iteration counts surfaced ---
        def step_counts(u):
            temp = jnp.where(free, conv(u) + f - A_raw(u), 0.0)
            r1 = cg(m.mstar, temp, pre=m.preMstar, tol=1e-4, maxsteps=2000)

            def S(p):
                return m.B(Minv(m.BT(p)))

            r2 = cg(S, m.B_raw(r1.x), pre=pre2, tol=1e-5, maxsteps=2000)
            return r1.iterations, r2.iterations, r1.converged, r2.converged

        sc = hoisted_jit(step_counts, u)
        out = sc(u)
        jax.block_until_ready(out)
        log(f"  in-step counts: mstar={int(out[0])} (conv={bool(out[2])}) "
            f"proj={int(out[1])} (conv={bool(out[3])})")


if __name__ == "__main__":
    main()
