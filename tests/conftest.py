"""Test harness configuration.

Tests run on CPU with 8 virtual devices (SURVEY.md §4.2.6): fast, deterministic,
and lets sharding/streaming tests exercise a real multi-device mesh without
TPU hardware. The benchmark harness (bench.py) is what runs on the real chip.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Allow float64 in tests (oracle comparisons); library code pins its own dtypes.
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

