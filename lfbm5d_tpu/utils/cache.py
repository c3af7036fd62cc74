"""Persistent XLA compilation cache (SURVEY.md §5.1 tooling follow-up).

The flagship fused-kernel programs compile in ~50-200 s per fresh process
on this machine (remote compile service; BASELINE.md compile columns), and
every entry point (bench.py, the CLI, experiments) historically paid it
again per process. JAX ships a persistent on-disk compilation cache keyed
on the HLO + compile options + platform; enabling it turns repeat
compilations of unchanged programs into a disk read.

Opt-out via LFBM5D_NO_COMPILE_CACHE=1 (e.g. to measure true cold-compile
times); override the location with LFBM5D_COMPILE_CACHE_DIR or
JAX_COMPILATION_CACHE_DIR.

Platform caveat, measured round 5 (BASELINE.md "Cold-start attribution"):
on THIS machine's axon remote-compile backend the cache never engages for
the big kernel programs — compilation happens inside the remote service,
outside jax's local cache layer (a warmed 264-entry cache logs zero
hit/miss events and fresh processes still queue 35-620 s). Keep the cache
enabled anyway: it is correct and effective on standard host-attached
TPUs, and it does serve the small host-side programs here.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "lfbm5d_tpu", "xla_cache"
)


def enable_persistent_compilation_cache(directory: str | None = None) -> str | None:
    """Enable JAX's on-disk compilation cache; returns the dir (None = off).

    Safe to call multiple times. Honors LFBM5D_NO_COMPILE_CACHE=1 and, if
    jax already has a cache dir configured (e.g. via env), leaves it alone.
    """
    if os.environ.get("LFBM5D_NO_COMPILE_CACHE") == "1":
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    directory = (
        directory
        or os.environ.get("LFBM5D_COMPILE_CACHE_DIR")
        or _DEFAULT_DIR
    )
    try:
        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        # Cache every program regardless of compile time / size: the whole
        # point here is the multi-minute fused-kernel compiles, but the
        # pipeline also dispatches many small helper programs whose combined
        # fresh-process compile time is tens of seconds.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - config name drift across versions
        return None
    return directory
