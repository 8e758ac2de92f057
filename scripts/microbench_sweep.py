"""Microbenchmark: where the GS sweep's preA milliseconds go.

Round-5 perf work (VERDICT.md round-4 item 2): the row-panel multi-color
GS preconditioner costs ~3.9 ms per apply at bench scale while its table
streams sum to ~1.1 GB (~1.4 ms at the v5e's ~819 GB/s) — this script
times every constituent of the sweep separately ON THE REAL CHIP at
exact bench shapes so the overhead (color-step small-op latency, gather
throughput, kernel efficiency) is attributed, not guessed.

Pieces timed (marginal slope between chain lengths, like BENCH_PROBE):
  preA          the full preconditioner
  pre_skel      the symmetric sweep (fwd colors + S residual + coarse +
                bwd colors)
  fwd_sweep     forward color loop only
  one_color     a single mid-sweep color-step (residual panels + merged
                solve + slot gather)
  P_only        the color's panel table stream alone
  solve_only    the color's merged padded block-solve stream alone
  S_faces       the full skeleton operator apply (mid-sweep residual)
  coarse        damped aux-space coarse correction

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_sweep.py [maxh]
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "axon,cpu")
jax.config.update("jax_enable_x64", True)
try:
    if jax.devices()[0].platform != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/tmp/nstpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("NSTPU_SMOOTHER_BF16", "ext,inv")
os.environ.setdefault("NSTPU_COARSE_TARGET", "1.6")

from navier_stokes_tpu.mesh import channel_with_cylinder_mesh_3d  # noqa: E402
from navier_stokes_tpu.models.navier_stokes_mcs import NavierStokesMCS  # noqa: E402
from navier_stokes_tpu.solvers import equilibrated_f32_ops  # noqa: E402
from navier_stokes_tpu.utils.jaxtools import hoisted_jit  # noqa: E402

MAXH = float(sys.argv[1]) if len(sys.argv) > 1 else 0.09
H = 0.41


def uin(p):
    out = np.zeros((len(p), 3))
    out[:, 0] = 16 * p[:, 1] * (H - p[:, 1]) * p[:, 2] * (H - p[:, 2]) / H**4
    return out


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    mesh = channel_with_cylinder_mesh_3d(MAXH)
    geo = None
    try:
        from navier_stokes_tpu.mesh.curved import curve_to_cylinder_3d

        geo = curve_to_cylinder_3d(mesh, "cyl", (0.5, 0.2), 0.05, order=3)
    except Exception as e:
        print("no curved geometry:", repr(e), file=sys.stderr)
    cache: dict = {}
    path = f"/tmp/nstpu_asm_{MAXH}_{'straight' if geo is None else 'curved'}.npz"
    if os.path.exists(path):
        z = np.load(path)
        for key, n in (("tabs3d", 5), ("tabs3d_curved", 5), ("cond", 2),
                       ("cond_curved", 2)):
            names = [f"{key}_{i}" for i in range(n)]
            if all(nm in z for nm in names):
                cache[key] = tuple(z[nm] for nm in names)
    t0 = time.perf_counter()
    m64 = NavierStokesMCS(
        mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin, timestep=2e-3, order=2, dtype=jnp.float64,
        preconditioner="faceblock", assembly_cache=cache, geometry=geo,
    )
    ops32, D = equilibrated_f32_ops(m64, gs=True, split=True)
    print(f"setup {time.perf_counter() - t0:.1f}s ndof={m64.n}",
          file=sys.stderr)
    preA = ops32["preA"]
    parts = preA.parts
    lay = parts["layout"]
    sm = parts["smoother"]
    groups = parts["groups"]
    S_faces = parts["S_faces"]
    coarse = parts["coarse_only"]
    pre_skel = parts["pre_skel"]
    nface, nfb = lay.nface, lay.nfb
    rng = np.random.default_rng(3)
    xF = jnp.asarray(rng.standard_normal((nface, nfb)), jnp.float32)
    xF = jnp.where(sm.freeF, xF, 0.0)
    u32 = jnp.ones(m64.n, jnp.float32)

    gmid = groups[len(groups) // 2]

    def _padT(x):
        return jnp.concatenate(
            [x, jnp.zeros((1, nfb), x.dtype)]).T

    def fwd_sweep(x):
        xPT = _padT(x)
        y = None
        for g in groups:
            dy = sm.solve_color_rows(g, xPT, y)
            y = dy if y is None else y + dy
        return y.T[:-1]

    def one_color(x):
        xPT = _padT(x)
        return sm.solve_color_rows(gmid, xPT, xPT).T[:-1]

    # color constituents at the mid color's exact shapes
    _fc, _rowA, colA, P_apply, _rowB, colB, solve, _rowD, _colD = gmid
    NP, NB = colA.shape[1], colB.shape[1]
    ye2 = jnp.asarray(
        rng.standard_normal((2 * lay.n_skel, NP)), jnp.float32)
    xb = jnp.asarray(
        rng.standard_normal((colB.shape[0], NB)), jnp.float32)

    probes = [
        ("preA", preA, u32),
        ("pre_skel", pre_skel, xF),
        ("fwd_sweep", fwd_sweep, xF),
        ("one_color", one_color, xF),
        ("P_only", P_apply, ye2),
        ("solve_only", solve, xb),
        ("S_faces", S_faces, xF),
        ("coarse", coarse, xF),
    ]
    print(f"ncolors={len(groups)} NP(mid)={NP} NB(mid)={NB}")
    for name, fn, x in probes:
        try:
            K1, K2 = 10, 60

            def make_chain(K, fn=fn, x=x):
                # scalar carry (not the output fed back): works for
                # non-square pieces (P_only maps (NP, 2n_skel) ->
                # (NP, nfb)) and still serializes the chain through a
                # data dependency
                def chain_py(v):
                    def body(i, s):
                        y = fn(v * s)
                        n = jnp.linalg.norm(y.ravel()[:512])
                        return 1.0 + 1e-30 * jnp.minimum(n, 1.0)

                    return jax.lax.fori_loop(
                        0, K, body, jnp.asarray(1.0, v.dtype))

                return hoisted_jit(chain_py, x)

            c1, c2 = make_chain(K1), make_chain(K2)

            def best(chain, x=x):
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
            print(f"  {name:12s} {marg*1e3:8.3f} ms")
        except Exception as e:
            print(f"  {name:12s} FAILED {repr(e)[:150]}")


if __name__ == "__main__":
    main()
