"""Structured per-stage timing (SURVEY.md §5.1/§5.5).

The reference prints wall-clock per step via printf; here stages are named
contexts collected into a dict for the CLI's structured report. For deep
kernel profiling use jax.profiler:

    with jax.profiler.trace("/tmp/jax-trace"):
        run_bm5d(...)
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class StageTimer:
    def __init__(self):
        self._times: dict[str, float] = {}

    @contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self._times[name] = self._times.get(name, 0.0) + time.time() - t0

    def seconds(self, name: str) -> float:
        return self._times.get(name, 0.0)

    def items(self):
        return self._times.items()


_FENCE = None


def device_fence(x) -> None:
    """Block until x's computation REALLY finished.

    Measurement fence for this machine's axon remote platform, where
    ``jax.block_until_ready`` has been observed returning immediately on
    freshly dispatched results (a pallas-call output reported "ready" in
    0.04 ms when the kernel takes 54 ms; pipeline dispatch loops report
    enqueue time, not compute). A scalar fetch round-trips the stream, so
    it is the one reliable fence. The probe jit is compiled once and is
    shape-polymorphic via reshape(-1)[0]; the fetched bytes are 4.

    Use in every timing harness:  t0 = time(); out = f(...);
    device_fence(out); dt = time() - t0.
    """
    import jax

    global _FENCE
    while isinstance(x, (tuple, list)):
        x = x[-1]
    if not isinstance(x, jax.Array):
        return
    if _FENCE is None:
        import jax.numpy as jnp

        _FENCE = jax.jit(lambda v: jnp.reshape(v, (-1,))[0])
    float(_FENCE(x))
