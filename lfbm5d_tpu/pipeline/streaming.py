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

    Engine batching: the XLA path vmaps over the local shard. The Pallas
    kernel engine is a per-LF grid program (not vmap-batchable), and
    wrapping it in lax.map degrades the per-LF body ~2.8x (measured:
    6.2 s/LF scanned vs 2.2 s/LF dispatched at 5x5x192x256) — so the
    kernel engine streams as a HOST loop over batch chunks, each chunk one
    shard_map call running ONE LF per device. Whole LFs stay embarrassingly
    parallel over the mesh with zero collectives inside an LF
    (SURVEY.md §5.8); per-chunk dispatch overhead is milliseconds.
    """
    lfs = jnp.asarray(np.asarray(lfs), jnp.dtype(dtype))
    b, a_h, a_w, h, w, c = lfs.shape
    fn = build_denoise_fn(params, a_h, a_w, h, w, c, dtype, engine)
    sigma_c = _sigma_channels(params.sigma, params.color_space, c, dtype)

    kernel_engine = engine.startswith("pallas") or (
        engine == "auto" and jax.default_backend() == "tpu"
    )

    if mesh is None:
        if kernel_engine:
            jfn = jax.jit(fn)
            outs = [jfn(lfs[i], sigma_c) for i in range(b)]
            return (
                jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]),
            )
        return jax.jit(jax.vmap(lambda lf: fn(lf, sigma_c)))(lfs)

    (axis,) = mesh.axis_names
    if b % mesh.size:
        raise ValueError(f"batch {b} not divisible by mesh size {mesh.size}")

    if kernel_engine:
        # one LF per device per call; host loop over B / mesh.size chunks
        def one_per_device(shard):
            basic, final = fn(shard[0], sigma_c)
            return basic[None], final[None]

        sharded_one = jax.jit(shard_map(
            one_per_device, mesh=mesh, in_specs=P(axis),
            out_specs=(P(axis), P(axis)), check_vma=False,
        ))
        outs = []
        for j in range(0, b, mesh.size):
            chunk = jax.device_put(
                lfs[j : j + mesh.size], NamedSharding(mesh, P(axis))
            )
            outs.append(sharded_one(chunk))
        return (
            jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]),
        )

    # check_vma=False: the per-LF pipeline uses no collectives, and its scan
    # carries are initialized replicated (vma tracking would reject them).
    sharded = shard_map(
        jax.vmap(lambda lf: fn(lf, sigma_c)),
        mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    lfs = jax.device_put(lfs, NamedSharding(mesh, P(axis)))
    return jax.jit(sharded)(lfs)
