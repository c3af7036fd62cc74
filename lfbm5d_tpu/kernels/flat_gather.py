"""Banded per-lane gather kernel (the 5D group-build hot path).

Why this exists (measured on TPU v5e, see experiments/pallas_microbench.py and
the session notes in SURVEY.md §7): XLA's general advanced-indexing gather
runs at ~60 MB/s effective and per-lane `take_along_axis` at ~0.3 GB/s —
thousands of times off HBM speed. Mosaic, however, lowers 2D shape-matched
`take_along_axis(x, idx, axis=0)` to the hardware `tpu.dynamic_gather`, which
runs at vector-register speed: every lane of every sublane row independently
selects a row of its own lane column.

Layout contract ("A-on-lanes"): the light field is stored as flat pixel
tables [P, L] where P = flattened band pixels and L = lane axis holding the
angular (SAI) grid (padded to 128). A 5D group slot (t, n, a) reads pixel
rows (y, x) that differ per lane a only through the small disparity offset,
so one gathered row [*, L] fetches the same patch pixel of EVERY SAI at its
own per-SAI position — 81 patches per row of gather.

The kernel is banded: grid = (n_tiles, chunks_per_tile); each tile's band
(flat [R, L]) stays resident across its chunks; idx/out stream through. The
shape-match rule of tpu.dynamic_gather forces band, idx and out blocks to the
same [R, L] shape — callers pad the band and chunk rows to a common R.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(band_ref, idx_ref, out_ref):
    out_ref[0, 0] = jnp.take_along_axis(band_ref[0], idx_ref[0, 0], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def banded_gather(bands, idx, interpret: bool = False):
    """bands: [n_tiles, R, L] float; idx: [n_tiles, n_chunks, R, L] int32
    (row indices into the tile's band; every lane gathers from its own
    column). Returns [n_tiles, n_chunks, R, L] gathered values.

    Set interpret=True on CPU (tests); on TPU the Mosaic path is used.
    """
    n_tiles, r, l = bands.shape
    n_chunks = idx.shape[1]
    grid = (n_tiles, n_chunks)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, l), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r, l), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, r, l), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_chunks, r, l),
                                       bands.dtype),
        interpret=interpret,
    )(bands, idx)
