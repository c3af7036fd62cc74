"""Pipelined-DMA row gather (HBM table -> dense rows).

The angular-BM disparity maps are sampled at every (similar patch, stack
slot) position: a gather of ~T*N rows from a [V, 128] HBM table with
TRACED (data-dependent) indices. XLA lowers that gather at ~0.3 GB/s
(measured 490 ms/ref at default flagship parameters = 40% of launched
device time; the same-shaped gather with STATIC indices runs at 52 ms, so
this is an XLA lowering pathology, not a hardware bound). This kernel
issues one row DMA per index with a rotating semaphore window so `depth`
copies stay in flight, paying DMA issue rate instead of serialized row
latency.

Constraints (Mosaic): the table's minor dim must be a whole lane tile
(multiple of 128) — callers pad the lane axis first; indices arrive as
SMEM blocks of `s_chunk` per grid step.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@lru_cache(maxsize=None)
def _build(V: int, W: int, S_pad: int, s_chunk: int, depth: int, dtype: str,
           interpret: bool = False):
    n_chunks = S_pad // s_chunk
    dt = jnp.dtype(dtype)

    def kernel(idx_ref, table_ref, out_ref, sems):
        def copy(s):
            i = idx_ref[s]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(i, 1), :],
                out_ref.at[pl.ds(s, 1), :],
                sems.at[s % depth],
            )

        def body(s, _):
            @pl.when(s >= depth)
            def _():
                copy(s - depth).wait()

            copy(s).start()
            return 0

        jax.lax.fori_loop(0, s_chunk, body, 0)

        def drain(s, _):
            copy(s).wait()
            return 0

        jax.lax.fori_loop(max(0, s_chunk - depth), s_chunk, drain, 0)

    def gather(table, idx_pad):
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((s_chunk,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((s_chunk, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S_pad, W), dt),
            scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
            interpret=interpret,
        )(idx_pad, table)

    return gather


def gather_rows(table, idx, s_chunk: int = 4096, depth: int = 16,
                interpret: bool = False):
    """out[s] = table[idx[s]] for a [V, W] table (W a multiple of 128).

    idx: 1-D int32 of traced row indices in [0, V). Returns [len(idx), W].
    """
    V, W = table.shape
    if W % 128:
        raise ValueError(f"table minor dim must be lane-aligned, got {W}")
    S = idx.shape[0]
    s_chunk = min(s_chunk, max(depth, S))
    S_pad = -(-S // s_chunk) * s_chunk
    idx_pad = jnp.pad(idx, (0, S_pad - S)).astype(jnp.int32)
    fn = _build(V, W, S_pad, s_chunk, depth, str(table.dtype), interpret)
    return fn(table, idx_pad)[:S]
