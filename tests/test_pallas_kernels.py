"""Pallas kernels (interpreter mode on the CPU test backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.ops.pallas_kernels import batched_local_matvec


@pytest.mark.parametrize("ne,nb", [(500, 6), (1000, 21), (77, 12)])
def test_batched_local_matvec(ne, nb):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((ne, nb, nb)))
    u = jnp.asarray(rng.standard_normal((ne, nb)))
    y1 = np.asarray(batched_local_matvec(A, u))
    y2 = np.einsum("eij,ej->ei", np.asarray(A), np.asarray(u))
    assert np.abs(y1 - y2).max() < 1e-12


def test_apply_local_matrices_pallas_path():
    from navier_stokes_tpu.fem.spaces import H1
    from navier_stokes_tpu.mesh import unit_square_mesh
    from navier_stokes_tpu.ops import assembly as asm

    mesh = unit_square_mesh(0.25)
    V = H1(mesh, 2)
    t = asm.make_tables(V)
    K = asm.stiffness_local(t)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(V.ndof))
    y1 = asm.apply_local_matrices(K, t.eldofs, V.ndof, u, use_pallas=True)
    y2 = asm.apply_local_matrices(K, t.eldofs, V.ndof, u)
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() < 1e-11
