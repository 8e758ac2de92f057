"""Wall-clock timers with device fencing.

Replaces ngsolve.ngstd.Timer (SURVEY.md section 5 'Tracing/profiling'):
named scopes whose Stop() fences with block_until_ready so asynchronous
dispatch cannot hide device work, feeding the same CSV metrics the reference
emits (run.py:34-40, bramble_pasciak_cg.py:68-72).
"""

from __future__ import annotations

import time

import jax


class Timer:
    """Named wall-clock timer; .time accumulates across Start/Stop pairs."""

    def __init__(self, name: str = ""):
        self.name = name
        self.time = 0.0
        self._t0 = None

    def Start(self):
        self._t0 = time.perf_counter()
        return self

    def Stop(self, *fence):
        """Stop timing; any arrays passed are block_until_ready'd first."""
        for x in fence:
            jax.block_until_ready(x)
        self.time += time.perf_counter() - self._t0
        return self.time

    def __enter__(self):
        return self.Start()

    def __exit__(self, *exc):
        self.Stop()
        return False
