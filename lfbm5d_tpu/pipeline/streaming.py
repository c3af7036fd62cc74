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

    Engine batching: the XLA path vmaps over the local shard; the Pallas
    kernel engine is a per-LF grid program (not vmap-batchable), so its
    shard streams through `lax.map` — one compiled program per device, LFs
    in sequence, full kernel throughput per LF. Either form shards over the
    mesh with shard_map (SURVEY.md §5.8: whole LFs are embarrassingly
    parallel; no collectives inside an LF).
    """
    lfs = jnp.asarray(np.asarray(lfs), jnp.dtype(dtype))
    b, a_h, a_w, h, w, c = lfs.shape
    fn = build_denoise_fn(params, a_h, a_w, h, w, c, dtype, engine)
    sigma_c = _sigma_channels(params.sigma, params.color_space, c, dtype)

    if engine.startswith("pallas") or (
        engine == "auto" and jax.default_backend() == "tpu"
    ):
        def vfn(shard):
            return jax.lax.map(lambda lf: fn(lf, sigma_c), shard)
    else:
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
