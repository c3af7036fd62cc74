"""Test harness configuration.

Tests run on CPU with 8 virtual devices (SURVEY.md §4.2.6): fast, deterministic,
and lets sharding/streaming tests exercise a real multi-device mesh without
TPU hardware. The benchmark harness (bench.py) is what runs on the real chip.

Note: this machine's sitecustomize pre-imports jax and presets
JAX_PLATFORMS=axon, so the platform must be overridden via jax.config (env
vars are captured before conftest runs).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Allow float64 in tests (oracle comparisons); library code pins its own dtypes.
jax.config.update("jax_enable_x64", True)
