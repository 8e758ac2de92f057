"""Parity of the face-level coarse transfer with the full-space embedding.

The skeleton preconditioner's coarse correction runs entirely in face-block
layout (``hybrid_h1_face_transfer``); the slow path uses the full-space
vector-P1 embedding (``hybrid_h1_embedding_3d``).  On the FACE rows the two
must agree exactly (the face transfer is the face-row restriction of the
embedding), and the transpose must be the exact adjoint.
"""

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def space():
    # build the velocity space directly (no model assembly/condensation:
    # the transfer only needs the space tables)
    from navier_stokes_tpu.fem.hdiv3d import HDiv3D
    from navier_stokes_tpu.mesh.generators import channel_with_cylinder_mesh_3d
    from navier_stokes_tpu.models.stokes_hybrid3d import (
        HybridVelocitySpace3D,
        VectorFacet3D,
    )

    mesh = channel_with_cylinder_mesh_3d(0.6)
    V = HDiv3D(mesh, 2, dirichlet="inlet|wall|cyl")
    F = VectorFacet3D(mesh, 1, dirichlet="inlet|wall|cyl|outlet")
    return HybridVelocitySpace3D(V, F)


def test_face_transfer_matches_embedding_face_rows(space):
    from navier_stokes_tpu.models.auxspace3d import (
        hybrid_h1_embedding_3d,
        hybrid_h1_face_transfer,
    )
    from navier_stokes_tpu.ops.faceblock import FaceBlockLayout

    V = space
    lay = FaceBlockLayout(V)
    TF, TFt = hybrid_h1_face_transfer(V, lay, jnp.float64)
    T, TT = hybrid_h1_embedding_3d(V, jnp.float64)

    rng = np.random.default_rng(11)
    nv = V.mesh.nv
    z = jnp.asarray(rng.standard_normal((nv, 3)))

    # embedding T takes the COMPONENT-MAJOR flat coarse vector (3, nv)
    yF = TF(z)
    y_full = T(jnp.asarray(np.asarray(z).T.reshape(-1)))
    yF_ref, _ = lay.split(y_full)
    rel = float(jnp.linalg.norm(yF - yF_ref) / jnp.linalg.norm(yF_ref))
    assert rel < 1e-12, f"face rows deviate from the embedding: {rel:.3e}"


def test_face_transfer_transpose_is_adjoint(space):
    from navier_stokes_tpu.models.auxspace3d import hybrid_h1_face_transfer
    from navier_stokes_tpu.ops.faceblock import FaceBlockLayout

    V = space
    lay = FaceBlockLayout(V)
    TF, TFt = hybrid_h1_face_transfer(V, lay, jnp.float64)

    rng = np.random.default_rng(12)
    nv = V.mesh.nv
    z = jnp.asarray(rng.standard_normal((nv, 3)))
    rF = jnp.asarray(rng.standard_normal((lay.nface, lay.nfb)))

    lhs = float(jnp.vdot(TF(z), rF))
    rhs = float(jnp.vdot(z, TFt(rF)))
    assert abs(lhs - rhs) < 1e-10 * max(abs(lhs), 1.0)
