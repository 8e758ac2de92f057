"""Profiling hooks: the TaskManager(pajetrace=...) equivalent.

The reference captures Paje traces via NGSolve's TaskManager gated on a -p
flag (run.py:218-219,239).  The TPU equivalent is jax.profiler.trace; scopes
can be annotated with jax.named_scope inside jitted code.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def maybe_profile(enabled: bool, logdir: str = "/tmp/nstpu_profile"):
    """Capture a jax.profiler trace when enabled, else no-op."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield
    print(f"profile trace written to {logdir}")
