"""Superpatch extract-mux kernel: builds 5D group rows from A-stacked bands.

Measured context (see experiments/pallas_microbench.py and SURVEY.md §7):
XLA's gathers are 100-5000x off roofline for this access pattern, and
Mosaic's hardware dynamic_gather only addresses within a single vreg, so
arbitrary-row gathers are impossible. What IS fast on the VPU: dynamic
slicing at per-slot (uniform) offsets plus per-LANE selection between
statically shifted copies. This kernel exploits that:

  * The light field is laid out A-on-lanes: band[y, x, a] with the angular
    grid on the 128-lane axis (padded). One band slab covers all SAIs.
  * For each group slot (reference-patch t, stack index n), the kernel loads
    the (k+2nd) x (k+2nd) "superpatch" at the similar-patch position — the
    union of every SAI's disparity-shifted k x k patch — with ONE dynamic
    slice, then resolves each lane's (dy, dx) disparity offset with
    (2nd+1)-way masked selects of statically shifted slices (vector ops,
    fully lane-parallel). Output: group rows [slot*k*k, L], each row one
    patch pixel across every SAI.

Slot positions arrive via scalar-prefetch (SMEM); per-lane disparity indices
via a VMEM block. The grid is (n_tiles, n_slot_chunks); each tile's band is
revisited across its slot chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lfbm5d_tpu.kernels.mux import mux_select as _mux_select


def _make_kernel(k: int, nd: int, sc: int, l: int, planes: int, refs: int):
    sk = k + 2 * nd
    nsel = 2 * nd + 1
    sent = nsel * nsel

    def kernel(sy_ref, sx_ref, band_ref, doff_ref, out_ref):
        ip = pl.program_id(0)  # grid dim0 ordered (tile, plane, ref)
        i = (ip // (refs * planes)) * refs + ip % refs  # (tile, ref) metadata
        j = pl.program_id(1)

        def body(s, _):
            y = sy_ref[i, j, s]
            x = sx_ref[i, j, s]
            sup = band_ref[0, pl.ds(y, sk), pl.ds(x, sk), :]  # [sk, sk, L]
            d = doff_ref[0, s, :]  # [L] flat disparity index; >= sent -> 0
            patch = _mux_select(sup, d, k, nsel, sent)
            out_ref[0, pl.ds(s * k * k, k * k), :] = patch.reshape(k * k, l)
            return 0

        jax.lax.fori_loop(0, sc, body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "nd", "planes", "refs", "interpret")
)
def extract_groups(
    bands, sy, sx, doff, k: int = 8, nd: int = 2, planes: int = 1,
    refs: int = 1, interpret: bool = False,
):
    """Extract group rows from A-stacked bands.

    bands: [n_tiles*planes, BH, BW, L] float32 — per-(tile, plane) pixel
      slabs, SAIs on lanes; `planes` consecutive bands (e.g. channels) share
      one tile's slot metadata.
    sy/sx: [n_tiles*refs, n_chunks, Sc] int32 — superpatch origins
      (band-relative; the superpatch spans [sy, sy+k+2nd) x [sx, sx+k+2nd)).
    doff:  [n_tiles*refs, n_chunks, Sc, L] int32 — per-lane flat disparity
      index (row-major over the (2nd+1)^2 window, as
      ops.distances.displacements).
    refs:  reference-SAI batch — `refs` metadata rows per (tile, plane)
      share ONE band block. The grid is ordered (tile, plane, ref) so the
      band block is revisited across the ref axis (fetched once per R refs).
    Returns [n_tiles*planes*refs, n_chunks, Sc*k*k, L] group rows, rows
    ordered (tile, plane, ref).
    """
    nb, bh, bw, l = bands.shape
    n_meta, n_chunks, sc = sy.shape
    n_tiles = nb // planes
    assert nb == n_tiles * planes and n_meta == n_tiles * refs
    nb2 = n_tiles * planes * refs
    kernel = _make_kernel(k, nd, sc, l, planes, refs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb2, n_chunks),
        in_specs=[
            pl.BlockSpec((1, bh, bw, l), lambda i, j, *_: (i // refs, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, sc, l),
                lambda i, j, *_: (
                    ((i // (refs * planes)) * refs + i % refs) * n_chunks + j,
                    0, 0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, sc * k * k, l), lambda i, j, *_: (i * n_chunks + j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nb2 * n_chunks, sc * k * k, l), bands.dtype
        ),
        interpret=interpret,
    )(
        sy, sx, bands,
        doff.reshape(n_meta * n_chunks, sc, l),
    )
    return out.reshape(nb2, n_chunks, sc * k * k, l)
