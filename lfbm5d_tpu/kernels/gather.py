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
def _build_doff(n_tiles: int, refs: int, cpt: int, sc: int, bh: int, bw: int,
                th: int, tw: int, l: int, c_ang: int, interpret: bool):
    n_meta = n_tiles * refs

    def kernel(org_ref, rs_ref, qyx_ref, tab_ref, out_ref, slab, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        t = i // refs
        r = i % refs
        toy = org_ref[t, 0]
        # engine.py aligns tile x-origins to sublane multiples; the (//8)*8
        # here is a no-op on values but lets Mosaic PROVE the slab DMA's
        # dim-2 slice offset is tile-aligned ("Failed to prove that a tile
        # index in dimension 2 is divisible by the tiling (8)" otherwise —
        # a traced SMEM scalar has no divisibility facts by itself)
        tox = (org_ref[t, 1] // 8) * 8

        # one slab DMA per (tile, ref): the tile's band region of ref r's
        # disparity table, at the STATIC band origin (contiguous rows at
        # full HBM bandwidth — the whole point vs the per-row gather)
        @pl.when(j == 0)
        def _():
            cp = pltpu.make_async_copy(
                tab_ref.at[r, pl.ds(toy, bh), pl.ds(tox, bw), :], slab, sem
            )
            cp.start()
            cp.wait()

        rsai = rs_ref[r]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1)

        def body(s, _):
            v = qyx_ref[0, j, s]
            qy = v // 2048
            qx = v - qy * 2048
            # clamp binds only for pad/dummy slots, whose rows are either
            # masked to the sentinel (fused) or zero-weighted (two-kernel)
            dy = jnp.clip(qy - toy, 0, bh - 1)
            dx = jnp.clip(qx - tox, 0, bw - 1)
            row = slab[pl.ds(dy, 1), pl.ds(dx, 1), :].reshape(1, l)
            # the reference SAI's own lane always holds the centered
            # disparity (engine.py ref_pass: an[..., ri] = c_ang)
            row = jnp.where(lane == rsai, c_ang, row)
            out_ref[0, 0, pl.ds(s, 1), :] = row
            return 0

        jax.lax.fori_loop(0, sc, body, 0)

    def call(origins, ref_sais, qyx, tables):
        return pl.pallas_call(
            kernel,
            grid=(n_meta, cpt),
            in_specs=[
                pl.BlockSpec((n_tiles, 2), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((refs,), lambda i, j: (0,),
                             memory_space=pltpu.SMEM),
                # full last-two dims (cpt, sc): Mosaic requires SMEM block
                # trailing dims divisible by (8, 128) or equal to the array
                # dims; one (tile, ref)'s whole slot table is a few KB
                pl.BlockSpec((1, cpt, sc), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, sc, l), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_meta, cpt, sc, l), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((bh, bw, l), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(origins, ref_sais, qyx, tables)

    return call


def sample_doff(tables, qyx, origins, ref_sais, *, bh: int, bw: int,
                c_ang: int, interpret: bool = False):
    """Sample per-ref disparity tables directly into tile-layout doff.

    The engine's BM-map sampling is a gather of one [1, L] table row per
    (slot, ref). This kernel DMAs each tile's whole band region of the
    table once (contiguous, bandwidth-bound) and reads per-slot rows from
    VMEM with the same dynamic-slice idiom as the fused kernel's extract:
    measured 48 ns/slot, 2.6x the standalone XLA take (the per-row DMA
    gather_rows above measured 0.7x — issue latency). End-to-end it is
    throughput-neutral (the in-pipeline gather was ~57 ms/launch, not the
    profiled 3.44 s — that was select_similar's sorted-row gather, see
    DESIGN_NOTES), but it keeps the ang_p/doff_all intermediates (3.1 GB
    at 9x9 defaults) out of HBM, so it is the compiled default.

    tables:   [R, TH, TW, L] int32 per-ref disparity maps, padded so that
              every tile band [toy:toy+bh, tox:tox+bw] is in bounds and
              dead lanes carry c_ang.
    qyx:      [n_tiles*R, cpt, sc] int32 packed ABSOLUTE similar-patch
              positions (qy * 2048 + qx).
    origins:  [n_tiles, 2] int32 tile band origins (toy, tox). tox MUST be
              a multiple of 8: the slab DMA slices the sublane-tiled TW
              axis, and the kernel rounds tox down by (//8)*8 to make the
              alignment provable — an unaligned tox would silently shift
              the band (engine.py aligns tile x-origins at build time).
    ref_sais: [R] int32 SAI index of each reference in the block.
    Returns [n_tiles*R, cpt, sc, L] int32 — the kernels' doff layout.
    """
    r, th, tw, l = tables.shape
    n_meta, cpt, sc = qyx.shape
    n_tiles = n_meta // r
    assert n_meta == n_tiles * r
    assert interpret or l % 128 == 0
    assert th >= bh and tw >= bw
    fn = _build_doff(n_tiles, r, cpt, sc, bh, bw, th, tw, l, c_ang,
                     interpret)
    return fn(origins.astype(jnp.int32), ref_sais.astype(jnp.int32),
              qyx.astype(jnp.int32), tables)


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
