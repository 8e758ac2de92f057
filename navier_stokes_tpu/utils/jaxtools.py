"""JAX plumbing utilities for the remote-TPU execution path."""

from __future__ import annotations

import jax


def hoisted_jit(fn, *example_args):
    """``jax.jit`` with closure constants hoisted to runtime arguments.

    Jitting a closure over multi-hundred-MB device arrays (assembled
    element matrices, block inverses) embeds them as CONSTANTS in the
    serialized module; the axon remote-compile service rejects such
    payloads (HTTP 413 'length limit exceeded') and XLA warns about
    captured constants.  ``jax.make_jaxpr`` exposes every captured array
    as ``ClosedJaxpr.consts``; re-evaluating the jaxpr with the consts
    passed as ARGUMENTS keeps them as runtime device buffers, so the
    compile payload stays small (362 MB of operator tables measured ->
    consts-as-args compiles fine where the direct jit 413s).

    Returns a callable with the same signature as ``fn``; the consts are
    bound once at build time.
    """
    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example_args)
    treedef = jax.tree_util.tree_structure(out_shape)
    jaxpr = closed.jaxpr
    consts = closed.consts

    @jax.jit
    def run(consts, *args):
        flat_args = []
        for a in args:
            flat_args.extend(jax.tree_util.tree_leaves(a))
        out = jax.core.eval_jaxpr(jaxpr, consts, *flat_args)
        return jax.tree_util.tree_unflatten(treedef, out)

    return lambda *args: run(consts, *args)
