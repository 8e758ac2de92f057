"""Pallas TPU kernels for the element-batched compute core.

The hot inner op of every matrix-free apply is the batched local matvec
y[e] = A[e] @ u[e] over all elements (the MXU-shaped heart of
gather -> local matvec -> scatter).  This kernel tiles the element axis into
VMEM-resident blocks and runs the contraction per tile; on non-TPU backends
it runs in interpreter mode so the same code path is testable on CPU.

Usage is opt-in (ops.assembly.apply_local_matrices(..., use_pallas=True));
XLA's native lowering of the einsum is already decent, so this kernel is
the scaffolding for further fusion work (gather/scatter DMA pipelining per
the double-buffering pattern) rather than a guaranteed win at small sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_E = 256


def _matvec_kernel(a_ref, u_ref, o_ref):
    # a: (TILE_E, nb, nb), u: (TILE_E, nb) -> o: (TILE_E, nb)
    o_ref[:] = jnp.einsum(
        "eij,ej->ei", a_ref[:], u_ref[:],
        preferred_element_type=o_ref.dtype,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_local_matvec(a_local, ue, interpret: bool | None = None):
    """(ne, nb, nb) x (ne, nb) -> (ne, nb) via a Pallas grid over element
    tiles.  ``interpret=None`` auto-selects interpreter mode off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ne, nb, _ = a_local.shape
    pad = (-ne) % TILE_E
    if pad:
        a_local = jnp.concatenate(
            [a_local, jnp.zeros((pad, nb, nb), a_local.dtype)]
        )
        ue = jnp.concatenate([ue, jnp.zeros((pad, nb), ue.dtype)])
    ne_p = ne + pad
    grid = (ne_p // TILE_E,)
    out = pl.pallas_call(
        _matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((ne_p, nb), ue.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_E, nb, nb), lambda i: (i, 0, 0)),
            pl.BlockSpec((TILE_E, nb), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_E, nb), lambda i: (i, 0)),
        interpret=interpret,
    )(a_local, ue)
    return out[:ne]
