"""Banded scatter-add kernel: Kaiser-weighted aggregation (SURVEY.md §3.1).

The TPU has no scatter unit (neither XLA — measured < 1 GB/s — nor a Mosaic
primitive), so aggregation runs as a sequential-grid Pallas kernel that
read-modify-writes VMEM band accumulators: the TPU grid executes one program
at a time per core, so overlapping patch writes are race-free by
construction (SURVEY.md §5.2's "deterministic aggregation" requirement).

Inverse of kernels/extract.py: each slot's pre-weighted patch rows
[k*k, L] are expanded back to the (k+2nd)^2 superpatch footprint with
per-lane masked placement (each SAI lane at its own disparity offset), then
added into the tile's accumulator band at the slot's position. The band
output block is revisited across all slot chunks of a tile (index unchanged
along the chunk grid axis) and zeroed on the first chunk.

The caller sums overlapping tile bands into the global accumulator planes
(tiles carry halos, so bands overlap; that combine is dense XLA work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lfbm5d_tpu.kernels.mux import mux_dydx as _mux_dydx
from lfbm5d_tpu.kernels.mux import mux_place as _mux_place


def _make_kernel(k: int, nd: int, sc: int, l: int, planes: int):
    sk = k + 2 * nd
    nsel = 2 * nd + 1
    sent = nsel * nsel

    def kernel(sy_ref, sx_ref, vals_ref, doff_ref, acc_ref):
        i = pl.program_id(0) // planes  # tile index: planes share metadata
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(s, _):
            y = sy_ref[i, j, s]
            x = sx_ref[i, j, s]
            patch = vals_ref[0, pl.ds(s * k * k, k * k), :].reshape(k, k, l)
            d = doff_ref[0, s, :]
            dy, dx = _mux_dydx(d, nsel, sent)
            sup = _mux_place(patch, dy, dx, k, sk, nsel)
            cur = acc_ref[0, pl.ds(y, sk), pl.ds(x, sk), :]
            acc_ref[0, pl.ds(y, sk), pl.ds(x, sk), :] = cur + sup
            return 0

        jax.lax.fori_loop(0, sc, body, 0)

    return kernel


def _make_fused_kernel(k: int, nd: int, sc: int, l: int, planes: int,
                       refs: int):
    sk = k + 2 * nd
    nsel = 2 * nd + 1
    sent = nsel * nsel

    def kernel(sy_ref, sx_ref, wv_ref, vals_ref, doff_ref, kai_ref,
               num_ref, den_ref):
        ip = pl.program_id(0)  # grid dim0 ordered (tile, plane, ref)
        i = (ip // (refs * planes)) * refs + ip % refs  # (tile, ref) metadata
        j = pl.program_id(1)

        # the output bands are revisited across the ref axis AND the chunk
        # axis: zero only on the very first (ref, chunk) program of a band
        @pl.when((ip % refs == 0) & (j == 0))
        def _():
            num_ref[...] = jnp.zeros_like(num_ref)
            den_ref[...] = jnp.zeros_like(den_ref)

        def body(s, _):
            y = sy_ref[i, j, s]
            x = sx_ref[i, j, s]
            d = doff_ref[0, s, :]
            dy, dx = _mux_dydx(d, nsel, sent)
            pn = vals_ref[0, pl.ds(s * k * k, k * k), :].reshape(k, k, l)
            # den patch is lane-invariant (weight x kaiser): built in-register
            # from the per-slot scalar weight (SMEM) instead of a group-sized
            # HBM tensor (saves a full vals round-trip + a second kernel pass)
            pd = jnp.broadcast_to(
                (wv_ref[ip, j, s] * kai_ref[...]).astype(pn.dtype), (k, k, l)
            )
            sup_n = _mux_place(pn, dy, dx, k, sk, nsel)
            sup_d = _mux_place(pd, dy, dx, k, sk, nsel)
            cur_n = num_ref[0, pl.ds(y, sk), pl.ds(x, sk), :]
            num_ref[0, pl.ds(y, sk), pl.ds(x, sk), :] = cur_n + sup_n
            cur_d = den_ref[0, pl.ds(y, sk), pl.ds(x, sk), :]
            den_ref[0, pl.ds(y, sk), pl.ds(x, sk), :] = cur_d + sup_d
            return 0

        jax.lax.fori_loop(0, sc, body, 0)

    return kernel


def accumulate_groups_fused(
    vals, wvals, kaiser, sy, sx, doff, bh: int, bw: int, k: int = 8,
    nd: int = 2, planes: int = 1, refs: int = 1, interpret: bool = False,
):
    """Fused num+den aggregation: one pass over the group values.

    Like accumulate_groups for the numerator `vals`, but also accumulates the
    denominator bands from per-slot scalar weights `wvals` [nb, n_chunks, Sc]
    times the `kaiser` window [k, k] (the den patch is lane-invariant, so it
    never needs materializing as a group tensor). `kaiser` is the [k, k]
    window as a host numpy array, shipped as a [k, k, 1] broadcast input
    block (Pallas forbids captured array constants, and a [1, k*k] lane
    vector cannot be shape-cast to sublanes in Mosaic); the per-slot weights
    ride scalar prefetch (SMEM) next to sy/sx. This wrapper is deliberately
    NOT jitted (call it inside a trace).

    refs: reference-SAI batch — vals/wvals rows are ordered (tile, plane,
    ref) and sy/sx/doff rows (tile, ref); all `refs` contributions to a
    (tile, plane) band accumulate IN-KERNEL (the band block is revisited
    across the ref axis), so the returned band count is refs-independent.
    Returns (num_bands, den_bands), each [n_tiles*planes, bh, bw, L].
    """
    import numpy as _np

    nb2, n_chunks, rows, l = vals.shape
    n_meta, _, sc = sy.shape
    n_tiles = nb2 // (planes * refs)
    nb = n_tiles * planes
    assert nb2 == n_tiles * planes * refs and n_meta == n_tiles * refs
    kernel = _make_fused_kernel(k, nd, sc, l, planes, refs)
    kai_in = jnp.asarray(
        _np.asarray(kaiser, dtype=vals.dtype).reshape(k, k, 1)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb2, n_chunks),
        in_specs=[
            pl.BlockSpec((1, rows, l), lambda i, j, *_: (i * n_chunks + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, sc, l),
                lambda i, j, *_: (
                    ((i // (refs * planes)) * refs + i % refs) * n_chunks + j,
                    0, 0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((k, k, 1), lambda i, j, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bh, bw, l), lambda i, j, *_: (i // refs, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, bw, l), lambda i, j, *_: (i // refs, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nb, bh, bw, l), vals.dtype),
            jax.ShapeDtypeStruct((nb, bh, bw, l), vals.dtype),
        ],
        interpret=interpret,
    )(
        sy, sx, wvals,
        vals.reshape(nb2 * n_chunks, rows, l),
        doff.reshape(n_meta * n_chunks, sc, l),
        kai_in,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "nd", "bh", "bw", "planes", "interpret")
)
def accumulate_groups(
    vals, sy, sx, doff, bh: int, bw: int, k: int = 8, nd: int = 2,
    planes: int = 1, interpret: bool = False,
):
    """Scatter-add pre-weighted patch rows into per-tile accumulator bands.

    vals: [n_tiles*planes, n_chunks, Sc*k*k, L] — each slot's weighted patch
      values (slot-major rows of k*k pixels, SAIs on lanes); `planes`
      consecutive value-planes share one tile's slot metadata.
      Invalid/padded slots must carry zero values.
    sy/sx: [n_tiles, n_chunks, Sc] int32 — superpatch origins, band-relative.
    doff:  [n_tiles, n_chunks, Sc, L] int32 — per-lane flat disparity index.
      Sentinel indices (>= (2nd+1)^2) are clamped to the last offset, so
      sentinel lanes must carry zero values (the engine zero-weights masked
      slots; placement never crosses lanes, so angular padding lanes can
      only pollute themselves and are discarded downstream).
    Returns acc bands [n_tiles*planes, bh, bw, L].
    """
    nb, n_chunks, rows, l = vals.shape
    n_tiles, _, sc = sy.shape
    assert nb == n_tiles * planes
    kernel = _make_kernel(k, nd, sc, l, planes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, n_chunks),
        in_specs=[
            pl.BlockSpec((1, rows, l), lambda i, j, *_: (i * n_chunks + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, sc, l),
                lambda i, j, *_: ((i // planes) * n_chunks + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, bh, bw, l), lambda i, j, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        out_shape=jax.ShapeDtypeStruct((nb, bh, bw, l), vals.dtype),
        interpret=interpret,
    )(
        sy, sx,
        vals.reshape(nb * n_chunks, rows, l),
        doff.reshape(n_tiles * n_chunks, sc, l),
    )
