"""Batched multi-LF streaming throughput (driver config 5).

Shards a batch of light fields over the device mesh: each device runs the
full two-step pipeline on its sub-batch (vmap over the local shard inside
shard_map). No cross-chip communication is needed inside a light field
(SURVEY.md §5.8) — collectives appear only if a reduction over the batch is
requested by the caller.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lfbm5d_tpu.config import DenoiseParams
from lfbm5d_tpu.pipeline.denoise import _sigma_channels, build_denoise_fn


def denoise_batch(
    lfs,
    params: DenoiseParams,
    mesh: Mesh | None = None,
    dtype: str = "float32",
    engine: str = "xla",
):
    """Denoise a batch of LFs [B, aH, aW, H, W, C].

    With a mesh, the batch axis is sharded over the mesh's single axis
    (B must be divisible by the axis size). Returns (basic, final) batches.
    engine defaults to the XLA path: the Pallas kernels are per-LF programs
    and are not yet vmap/shard_map-batchable.
    """
    lfs = jnp.asarray(np.asarray(lfs), jnp.dtype(dtype))
    b, a_h, a_w, h, w, c = lfs.shape
    fn = build_denoise_fn(params, a_h, a_w, h, w, c, dtype, engine)
    sigma_c = _sigma_channels(params.sigma, params.color_space, c, dtype)

    if engine == "pallas":
        # Pallas programs are per-LF and not vmap-batchable; stream the
        # batch sequentially through one compiled program instead.
        if mesh is not None:
            raise ValueError(
                "engine='pallas' streams sequentially; mesh sharding uses "
                "the XLA engine (engine='xla')"
            )
        jfn = jax.jit(fn)
        outs = [jfn(lfs[i], sigma_c) for i in range(b)]
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
        )

    vfn = jax.vmap(lambda lf: fn(lf, sigma_c))

    if mesh is None:
        return jax.jit(vfn)(lfs)

    (axis,) = mesh.axis_names
    if b % mesh.size:
        raise ValueError(f"batch {b} not divisible by mesh size {mesh.size}")
    # check_vma=False: the per-LF pipeline uses no collectives, and its scan
    # carries are initialized replicated (vma tracking would reject them).
    sharded = shard_map(
        vfn,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    lfs = jax.device_put(lfs, NamedSharding(mesh, P(axis)))
    return jax.jit(sharded)(lfs)
