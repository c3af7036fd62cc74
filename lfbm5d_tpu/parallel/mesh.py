"""Device-mesh helpers for multi-chip scaling.

The reference has no distributed backend at all (SURVEY.md §2: single
process, OpenMP only). The TPU-native scaling story (SURVEY.md §5.8) is:

  * Streaming throughput (driver config 5): whole light fields are
    embarrassingly parallel — shard the LF batch axis over a 1D ICI mesh
    ('lf' axis) with shard_map; zero collectives inside a light field.
  * A single LF never crosses chips at target sizes; the halo-exchange SAI
    sharding reserved for that case would ride `ppermute` over the same mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "lf") -> Mesh:
    """A 1D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devs)} "
                "(for CPU simulation set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N)"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))
