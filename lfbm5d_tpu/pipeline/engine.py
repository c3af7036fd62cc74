"""Kernel-backed filtering engine: the TPU-native group path.

Same contract as pipeline.denoise._build_step (one HT or Wiener pass over
all reference SAIs, returning padded numerator/denominator accumulators),
with the group build / transform / shrinkage / aggregation stage on Pallas
kernels instead of XLA gathers/scatters. Round-2 structure:

  per block of R reference SAIs (lax.scan):
    block matching: self-similarity via ops.distances displacement maps +
      top-N (ops.match); angular disparity argmin via kernels.bm
      (VMEM-resident displacement loop; XLA scan in interpret mode)
    per tile RANGE (lax.scan, range size set by the SMEM prefetch budget):
      kernels.fused — ONE Pallas program doing extract (superpatch mux
      from A-on-lanes bands) -> 2D/4D/5D forward matmul chain -> HT/
      Wiener/SD shrink + weights -> inverse chain -> race-free banded
      scatter-add aggregation, entirely in VMEM; bands and per-slot
      disparity tables are sliced/gathered per range (all-tile
      materializations OOM HBM at 9x9 defaults)
      dense band add into the global A-on-lanes accumulators

Angular grids > 128 SAIs keep the round-1 two-kernel banked path
(kernels.extract + XLA flat transforms + kernels.accumulate): the fused
kernel's in-kernel angular matmul needs the full lane axis in one program.

Tiles bucket REFERENCE patches (static grid => static shapes, no sorting);
every slot's similar-patch superpatch lies within the tile band of height
(tile extent + 2(n_search+n_disp) + k + 2*n_disp), padded to sublane
multiples. Per-tile slot tables are compile-time constants. With
launch_blocks set, the builder returns a partial-launch fn so big configs
execute as many bounded device launches (see build_kernel_step).

The result is bit-identical to the XLA path (same BM decisions by the
quantized-distance spec, same arithmetic order per group) up to float
reassociation in the transforms; f64 interpret mode is oracle-exact.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from lfbm5d_tpu.config import StepParams
from lfbm5d_tpu.kernels.accumulate import accumulate_groups_fused
from lfbm5d_tpu.kernels.bm import cross_argmin_all_kernel, self_distances_kernel
from lfbm5d_tpu.kernels.extract import extract_groups
from lfbm5d_tpu.kernels.gather import gather_rows, sample_doff
from lfbm5d_tpu.kernels.fused import fused_group_step, fused_group_step_banked
from lfbm5d_tpu.lf.pad import ind_initialize, ref_sai_grid
from lfbm5d_tpu.ops.distances import (
    center_index,
    cross_argmin,
    displacements,
    self_distances,
)
from lfbm5d_tpu.ops.flat import flat_ref_mask
from lfbm5d_tpu.ops.match import select_similar
from lfbm5d_tpu.transforms import matrices as tm
from lfbm5d_tpu.transforms.flat import FlatTransforms, forward_flat, inverse_flat

_LANES = 128



def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@lru_cache(maxsize=None)
def build_kernel_step(
    sp: StepParams,
    lambda_3d: float,
    a_h: int,
    a_w: int,
    h: int,
    w: int,
    c: int,
    wiener: bool,
    dtype: str = "float32",
    interpret: bool = False,
    rows_per_tile: int = 4,
    cols_per_tile: int = 24,
    sc: int = 64,
    fused: bool | None = None,
    group_dtype: str | None = None,
    launch_blocks: int | None = None,
    doff_mode: str = "",
):
    """Returns raw fn(noisy_p, match_p, sigma_c, basic_p) -> (num, den).

    num/den are returned in the SAI-flattened layout [A, Hp, Wp, C] (matching
    pipeline.denoise._build_step) so _finalize applies unchanged.

    launch_blocks=N instead returns a PARTIAL-LAUNCH fn
      fn(noisy_p, match_p, sigma_c, basic_p, num, den, block0) -> (num, den)
    that processes ref-blocks [block0, block0+N) and accumulates into the
    INTERNAL accumulator layout [C, Hp2, Wp2, A_pad] (see
    `accumulator_shape`); block0 is a traced scalar so one compilation
    serves every launch, and blocks beyond the real count behave as fully
    masked dummies. Use `finalize_accumulators` to convert the final
    accumulators to the [A, Hp, Wp, C] contract. This bounds single device
    launches in time and transient memory (full-size default-parameter runs
    fault the device in one program).

    fused=None resolves to the fully fused single-kernel group stage
    (kernels/fused.py) whenever the angular grid fits one 128-lane bank;
    grids >128 SAIs run the two-kernel banked path (the in-kernel angular
    matmul needs the full lane axis in one program).

    group_dtype (e.g. "bfloat16") runs the GROUP PATH — bands, extract mux,
    transform matmuls (f32 accumulation), weighted rows, aggregation mux —
    in that dtype while BM, shrink/weight math, and the band accumulators
    stay float32. Fused path only.
    """
    k, n, nd, n_sim, pad = sp.k, sp.n_search, sp.n_disp, sp.n_sim, sp.pad
    a = a_h * a_w
    if fused is None:
        # Default: single-bank grids only. The banked-fused kernel (up to
        # 3 banks, 1.3x the two-kernel path at 17x17) is proven on-chip in
        # SEPARATE per-step programs, but both the combined two-step program
        # built by build_denoise_fn AND the launched (launch_blocks=1) form
        # hit a compiled-schedule fault (DESIGN_NOTES bisect matrix) — so
        # >128-SAI grids default to the proven two-kernel banked path
        # everywhere; fused=True stays an explicit opt-in for debugging.
        fused = a <= _LANES
    if group_dtype is not None and not fused:
        raise ValueError("group_dtype requires the fused engine (a <= 128)")
    # Adaptive lane width: padding the angular axis all the way to 128 lanes
    # inflates every group-tensor pass by 128/A (5x for a 5x5 LF); round up
    # to a sublane multiple instead. Angular grids beyond 128 SAIs (17x17
    # HCI = 289) split into 128-lane BANKS: Mosaic cannot compile unaligned
    # dynamic sublane slices once the minor dim spans >1 lane tile (measured:
    # "cannot statically prove index in dimension 2 is a multiple of 8"), so
    # the kernels run per (tile, bank) slab — reusing their `planes` metadata
    # mapping unchanged — and the banks join on the lane axis in XLA for the
    # angular transform.
    #
    # The FUSED kernel's in-kernel matmuls require 128-lane minors when
    # compiled (experiments/mosaic_capability_probe.py: 88/96 SIGABRT), so it
    # runs the whole pipeline at 128 lanes on TPU. Lane width is vreg-
    # quantized anyway (a [*, 32] op costs the same vector work as [*, 128]),
    # so this only costs band VMEM/bandwidth, which fusion more than repays.
    # Interpret mode (CPU tests) keeps the narrow adaptive width.
    if fused and a > 3 * _LANES:
        raise ValueError("fused engine requires a <= 384 SAIs (3 banks)")
    if a <= _LANES:
        banks = 1
        kl = _LANES if (fused and not interpret) else max(8, _round_up(a, 8))
    else:
        banks = _cdiv(a, _LANES)
        kl = _LANES
    a_pad = banks * kl
    # keep the streamed out/vals VMEM blocks (sc*k*k x kl) bounded
    while sc > n_sim and sc * k * k * kl * 4 > 2_200_000:
        sc //= 2
    if sc % n_sim:
        sc = n_sim * max(1, sc // n_sim)
    hp, wp = h + 2 * pad, w + 2 * pad
    sk = k + 2 * nd
    c_ang = center_index(nd)
    dt = jnp.dtype(dtype)

    ys = ind_initialize(h, k, sp.p) + pad
    xs = ind_initialize(w, k, sp.p) + pad
    t_count = len(ys) * len(xs)

    # --- static tiling of the reference grid, sized to the VMEM budget:
    # the band block (tile extent + 2(n+nd) + k + 2nd each way) must leave
    # room for the streaming idx/out blocks and their double buffers.
    halo = 2 * (n + nd) + k + 2 * nd
    # banked fused holds `banks` band slabs (+ 2*banks outs + 2*banks
    # scratches) per program. A flat 4.5MB/banks budget shrank 17x17 tiles
    # to 3 patches (cols_per_tile=1) and the per-program band DMA + slot
    # padding made launched banked-fused ~13x slower than two-kernel
    # (round-3 measurement); the kernel runs under a 110MB VMEM limit, so
    # give banked-fused a real slab budget instead.
    # (wiener holds 2x band slabs + its basic-group chain temporaries: the
    # 12M/banks budget measured 119M of the 110M VMEM limit at 17x17
    # wiener — 9M over; 9M/banks keeps it under)
    # Round-5: the matched-flagship profile attributed ~25% of device time
    # to per-(tile, ref) FIXED costs (band slab slices + chunk padding +
    # the scan glue), not slot work — bigger single-bank tiles divide all
    # of them, and 9 MB band slabs still leave the wiener working set
    # (2 band slabs + outs + scratch, double-buffered) well under the
    # 110 MB VMEM limit. Measured numbers in BASELINE.md round-5 section;
    # LFBM5D_BAND_BUDGET overrides for probes.
    band_budget = (
        (9_000_000 if wiener else 12_000_000) if banks > 1
        else int(os.environ.get("LFBM5D_BAND_BUDGET", 9_000_000))
    ) // (banks if fused else 1)  # bytes

    def band_bytes(r, cc):
        bhh = _round_up((r - 1) * sp.p + halo, 8)
        bww = _round_up((cc - 1) * sp.p + halo + 7, 8)  # +7: origin alignment
        return bhh * bww * kl * 4  # per-bank band slab

    # the budget loops below only SHRINK from the initial tile dims; the
    # env knobs raise the starting point for tile-size probes
    rows_per_tile = int(os.environ.get("LFBM5D_TILE_ROWS", rows_per_tile))
    cols_per_tile = int(os.environ.get("LFBM5D_TILE_COLS", cols_per_tile))
    while cols_per_tile > 1 and band_bytes(rows_per_tile, cols_per_tile) > band_budget:
        cols_per_tile -= 1
    while rows_per_tile > 1 and band_bytes(rows_per_tile, cols_per_tile) > band_budget:
        rows_per_tile -= 1
    rows_per_tile = min(rows_per_tile, len(ys))
    cols_per_tile = min(cols_per_tile, len(xs))

    n_ty = _cdiv(len(ys), rows_per_tile)
    n_tx = _cdiv(len(xs), cols_per_tile)
    n_tiles = n_ty * n_tx
    tt = rows_per_tile * cols_per_tile  # groups per tile (padded)
    gpc = sc // n_sim  # groups per chunk
    cpt = _cdiv(tt, gpc)  # chunks per tile
    tt_pad = cpt * gpc

    span_y = (rows_per_tile - 1) * sp.p + halo
    span_x = (cols_per_tile - 1) * sp.p + halo
    bh = _round_up(span_y, 8)
    # +7: tile x-origins are aligned DOWN to sublane multiples below, which
    # can shift a tile's patches up to 7 columns into the band
    bw = _round_up(span_x + 7, 8)
    assert bh < 2048 and bw < 2048  # packed y*2048+x slot origins

    # --- reference-SAI set: p_ang > 1 subsamples which SAIs serve as
    # reference (strided angular grid with boundary flush); groups still
    # span/aggregate into every SAI, so only the scan length changes.
    ref_sais = ref_sai_grid(a_h, a_w, sp.p_ang)
    n_refs = len(ref_sais)
    ref_sais_c = jnp.asarray(ref_sais)

    # --- reference-SAI batching: R refs share one scan pass; their group
    # slots ride the kernels' `refs` grid axis (band blocks revisited across
    # refs, cross-ref band accumulation in-kernel), dividing the per-step
    # dispatch count by R. The ref axis is padded to n_blocks*R with masked
    # dummy refs (zero weights).
    # Banked-fused ref blocks are dominated by a per-block FIXED cost (the
    # whole tile grid's band slabs are re-sliced per block: launch-cost fit
    # at 17x17x128x128 gave 0.78 s fixed + 0.055 s/ref), so bigger blocks
    # amortize it; the fused path's SMEM is governed by tiles_per_call
    # below, not the two-kernel accumulate-prefetch clamp.
    # Single-bank fused r_cap raised 8 -> 16 in round 5: the cost model then
    # packs e.g. 9 reference SAIs into ONE block (r_batch=9) instead of two
    # 5-ref blocks with a fully-masked dummy ref that still paid full kernel
    # mux/matmul work (~10% of the matched flagship's group stage).
    # LFBM5D_R_CAP overrides every case (probe knob; the 17x17 launched
    # probes sweep it — bigger ref blocks amortize the per-block band
    # re-slicing that dominates launched banked execution).
    # LAUNCHED banked-fused default 32: the round-5 17x17 robust sweep
    # measured 20.4 / 19.7 / 19.8 s/LF at caps 16/32/48 (BASELINE.md
    # round-5). The non-launched banked-fused tier (17x17 matched: one
    # program) keeps 16 — the configuration its 0.727 s row was measured
    # with.
    _r_cap_env = os.environ.get("LFBM5D_R_CAP")
    r_cap = int(_r_cap_env) if _r_cap_env else (
        (32 if (banks > 1 and launch_blocks is not None) else 16)
        if fused else 8
    )
    r_batch, _best = 1, None
    for _rc in range(1, min(r_cap, n_refs) + 1):
        _cost = _cdiv(n_refs, _rc) * (_rc + 2.0)  # R BM units + dispatch wt 2
        if _best is None or _cost < _best:
            r_batch, _best = _rc, _cost
    # SMEM cap: ONE (tile, ref-batch) worth of prefetch rows must fit the
    # 1MB SMEM budget even at tiles_per_batch=1 — Mosaic roughly doubles the
    # raw prefetch bytes. 17x17x128x128 RGB default overflowed at r_batch=8
    # (1.41M of 1.00M, accumulate kernel); tiles_per_batch cannot go below
    # one, so the ref batch is the only remaining knob. (Two-kernel path
    # only: the fused path's scalar prefetch is sized by tiles_per_call.)
    if not fused:
        while r_batch > 1 and (
            (2 + c) * cpt * sc * 4 * banks * r_batch > 330_000
        ):
            r_batch -= 1
    n_blocks = _cdiv(n_refs, r_batch)

    # Fused-call tile batching: packed origins + lvl ride scalar prefetch,
    # and one (tile, ref) row costs cpt*(sc + gpc)*4 bytes of SMEM against a
    # ~120 KB payload budget (measured: a 330 KB prefetch set compiled to
    # 1.29 MB SMEM use — Mosaic roughly doubles it and needs grid-state
    # headroom). The fused path runs a lax.scan over tile RANGES of this
    # size (one traced kernel call total), so the tile count is padded to a
    # range multiple with fully-masked dummy tiles.
    smem_row = cpt * (sc + gpc) * 4
    tiles_per_call = min(
        n_tiles, max(1, 120_000 // max(r_batch * smem_row, 1))
    )
    if fused:
        n_tiles = _round_up(n_tiles, tiles_per_call)
    n_ranges = n_tiles // tiles_per_call if fused else 0

    tile_oy = np.zeros(n_tiles, np.int32)
    tile_ox = np.zeros(n_tiles, np.int32)
    tile_groups = np.full((n_tiles, tt_pad), t_count, np.int32)  # pad -> T
    for tyi in range(n_ty):
        for txi in range(n_tx):
            ti = tyi * n_tx + txi
            ry = range(tyi * rows_per_tile, min((tyi + 1) * rows_per_tile, len(ys)))
            rx = range(txi * cols_per_tile, min((txi + 1) * cols_per_tile, len(xs)))
            tile_oy[ti] = ys[ry.start] - (n + nd)
            # x-origins aligned DOWN to the sublane tile (8): sample_doff's
            # band-slab DMA slices the [R, TH, TW, L] table on the sublane-
            # tiled TW axis, and Mosaic requires provably 8-aligned starts
            # there ("tile index in dimension 2 divisible by the tiling").
            # The shipped single-bank configs were aligned by accident
            # (cols_per_tile * p was a multiple of 8); the banked-fused
            # path's auto-shrunk cols_per_tile = 1 exposed it (round 3,
            # 17x17 bisect). bw carries the +7 cover; slot positions are
            # band-relative so results are unchanged.
            tile_ox[ti] = (xs[rx.start] - (n + nd)) // 8 * 8
            g = [iy * len(xs) + ix for iy in ry for ix in rx]
            tile_groups[ti, : len(g)] = g

    # extra bottom/right zero margin so every band slice is in-bounds
    hp2 = int(max(tile_oy.max() + bh, hp))
    wp2 = int(max(tile_ox.max() + bw, wp))

    pos_y = jnp.asarray(np.repeat(ys, len(xs)).astype(np.int32))
    pos_x = jnp.asarray(np.tile(xs, len(ys)).astype(np.int32))
    disp_self = jnp.asarray(displacements(n))
    tile_oy_c = jnp.asarray(tile_oy)
    tile_ox_c = jnp.asarray(tile_ox)
    origins_c = jnp.asarray(
        np.stack([tile_oy, tile_ox], axis=1).astype(np.int32)
    )  # [nT, 2] band origins for the direct doff sampler
    # flat slot index per (tile, chunk, slot): group_id * N + n — static, so
    # all per-ref-SAI slot metadata is fetched with ONE fast row-gather in
    # tile order instead of per-tile advanced indexing (XLA's generic gather
    # runs at per-element speed on TPU).
    slot_n_np = np.tile(np.arange(n_sim, dtype=np.int32), tt_pad)
    slot_flat = (
        np.repeat(tile_groups, n_sim, axis=1) * n_sim + slot_n_np[None, :]
    )  # [nT, tt_pad * n_sim]

    # per-ref gather tables: entry (ti, r, slot) indexes ref r's padded
    # metadata tables (T+1 rows each), flattened across the ref-batch axis
    tnp1 = t_count + 1
    roff = np.arange(r_batch, dtype=np.int64)
    slot_flat_c = jnp.asarray(
        (slot_flat[:, None, :] + (roff * (tnp1 * n_sim))[None, :, None])
        .astype(np.int32).reshape(-1)
    )  # [nT*R*cpt*sc]
    tile_groups_ec = jnp.asarray(
        (tile_groups[:, None, :] + (roff * tnp1)[None, :, None])
        .astype(np.int32).reshape(-1)
    )  # [nT*R*tt_pad]
    # group_dtype (bf16) applies to the TRANSFORM CHAIN only: the fused
    # kernel runs its matmuls in the matrices' dtype with f32 accumulation,
    # while bands / mux / kaiser weighting / accumulators stay in dt
    # (full-bf16 muxing measured 1.75x slower; see docs/DESIGN_NOTES.md).
    gdt = jnp.dtype(group_dtype) if group_dtype else dt
    # Stack-axis transform inside the fused kernel: Haar/Hadamard run as
    # lvl-gated butterflies (kernels/fused.py) — the matmul form pads the
    # N=8/16 contraction to the MXU's 128, costing as much as the dense
    # angular matmul for 16x fewer true FLOPs. LFBM5D_STACK_MODE=matmul
    # forces the matmul form for A/B.
    stack_mode = sp.tau_5d if sp.tau_5d in ("haar", "hadamard") else "matmul"
    if os.environ.get("LFBM5D_STACK_MODE") == "matmul":
        stack_mode = "matmul"
    kaiser_np = np.asarray(tm.kaiser_window(k))  # host copy for the fused kernel
    kaiser_flat = jnp.asarray(kaiser_np.reshape(-1), dtype=dt)  # [64]
    kaiser_3d = jnp.asarray(kaiser_np.reshape(k, k, 1), dtype=dt)
    ft = FlatTransforms.build(sp, a_h, a_w, a_pad, dtype=gdt)
    sdt = jnp.float64 if dt == jnp.float64 else jnp.float32
    sent = (2 * nd + 1) ** 2  # masked-slot sentinel disparity index
    # Angular BM via the Pallas kernel (kernels/bm.py) in compiled mode: the
    # XLA displacement scan round-trips ~10 MB of plane intermediates per
    # displacement through HBM (~3.3 s of a 35.7 s fast-preset run); the
    # kernel keeps the whole loop in VMEM (measured 123 us/pair vs ~230 us,
    # plus the scan overhead disappears). Interpret mode keeps the scan —
    # its reduce_window summation order is what the f64 oracle tests pin.
    use_bm_kernel = (not interpret) and (k & (k - 1)) == 0
    ys_t = tuple(int(v) for v in ys)  # static coords for the self-BM kernel
    xs_t = tuple(int(v) for v in xs)
    wq_bm = _round_up(wp + 2 * nd, _LANES)
    v1k = wq_bm - 2 * nd - k + 1  # kernel BM map width (>= v1)
    # Angular-table width: the disparity-map row-gather is DRAM-random-
    # access bound (42 ms/ref at width 128), so the tables run at the LIVE
    # lane width (a rounded to sublanes, e.g. 88 for 9x9) and the fused
    # branch pads to the kernel's 128 lanes per tile range. Banked grids
    # need the full bank structure, so they keep a_pad.
    #
    # Round 3: the BM-map sampling has three implementations, selected by
    # LFBM5D_DOFF_MODE:
    #   direct (compiled default) — kernels/gather.py sample_doff: per-tile
    #     band-slab DMA + in-kernel per-slot reads, produces doff in tile
    #     layout directly. End-to-end throughput-NEUTRAL vs take (the
    #     in-pipeline gather was never the flagship bottleneck — see
    #     DESIGN_NOTES "attribution was WRONG"; the real 40% was
    #     select_similar's sorted-row gather, since removed), but it keeps
    #     the ang_p / all-tile doff intermediates (3.1 GB at 9x9 defaults)
    #     out of HBM;
    #   take — the original jnp.take row-gather (interpret default: its
    #     summation/selection order is what the f64 oracle tests pin);
    #   dma — the per-row pipelined-DMA kernel (gather_rows; measured 0.7x
    #     jnp.take standalone — kept for A/B).
    _mode = doff_mode or os.environ.get("LFBM5D_DOFF_MODE", "")
    if interpret:
        use_direct = _mode == "direct"
    else:
        use_direct = _mode not in ("take", "dma")
    use_dma_gather = (not interpret) and _mode == "dma"
    if use_direct or use_dma_gather or banks > 1:
        ang_w = a_pad
    else:
        # take-mode gathers the live angular width only (e.g. 88 rounded
        # up to 8 sublanes for 9x9 grids, vs the 128-lane pad). The
        # round-3 re-measurement closed the question: the suspect 40% of
        # default-parameter device time was select_similar's sorted-row
        # gather (since removed, the "tau-count fix"), not this table —
        # the live-width take path is correct and throughput-neutral.
        ang_w = max(8, _round_up(a, 8))
    # flat-region chunk skipping (StepParams.flat_tau + ops/flat.py): live
    # groups are compacted to the front chunks of each (tile, ref) and the
    # fused kernel skips fully-dead chunks via a prefetched live-chunk
    # count. Single-bank fused path only; elsewhere flat refs are plain
    # sentinel-masked (correct, no speedup).
    use_cskip = sp.flat_tau > 0 and fused and banks == 1
    n_planes = (2 if wiener else 1) * c  # extract planes per tile
    # tiles per kernel batch, bounded by transient group memory (~6 live
    # copies of the per-tile group tensor across extract/transform/vals)
    tile_group_bytes = n_planes * tt_pad * n_sim * 64 * a_pad * 4 * r_batch
    # scalar-prefetch (sy/sx + per-plane den weights) lives in 1MB SMEM;
    # cap the batch accordingly
    smem_per_tile = (2 + c) * cpt * sc * 4 * banks * r_batch
    # HBM transient budget: XLA keeps ~8 group-sized tensors live across
    # extract/transform/shrink/inverse/vals per batch (measured 24.8G at a
    # 1.45G group tensor), so cap the per-batch group tensor at ~1.3G of
    # the chip's 16G
    tiles_per_batch = min(
        n_tiles,
        max(1, int(1.3e9 / max(tile_group_bytes, 1))),
        max(1, 350_000 // max(smem_per_tile, 1)),
    )

    def to_table(xp):
        """[A, Hp, Wp, C] -> A-on-lanes tables [C, Hp2, Wp2, L].

        Bands stay in the pipeline dtype even in bf16 mode: the kernel's
        dynamic superpatch slice requires f32 (sublane-tile alignment);
        the cast to the group dtype happens in-kernel after the load."""
        t = jnp.transpose(xp, (3, 1, 2, 0)).astype(dt)
        return jnp.pad(
            t, ((0, 0), (0, hp2 - hp), (0, wp2 - wp), (0, a_pad - a))
        )

    def prepare(noisy_p, match_p, basic_p):
        """Per-STEP constants (ref-block-invariant): A-on-lanes tables,
        BM planes, and the two-kernel band batches. Factored out of the
        per-launch body: launched execution was rebuilding these every
        launch (round-3 measurement at 17x17x128x128: the table/band
        rebuilds dwarfed each launch's compute), so the launched runner
        computes them ONCE per step and feeds them to every launch."""
        match0 = match_p[..., 0]
        # flat_tau classifies on the NOISY LF in both steps (ops/flat.py:
        # the basic estimate's residual noise is far below sigma, which
        # breaks the threshold's anchor); zeros placeholder when off
        noisy0 = noisy_p[..., 0] if sp.flat_tau > 0 else match0
        tab = to_table(noisy_p)
        tab_b = to_table(basic_p) if wiener else tab  # placeholder slot
        if use_bm_kernel:
            # every SAI plane zero-extended by nd and lane-padded, built
            # once per step (shared by every ref's BM kernel call)
            others_ext = jnp.pad(
                match0, ((0, 0), (nd, nd), (nd, wq_bm - wp - nd))
            )
        else:
            others_ext = match0  # placeholder slot

        # bands are ref-SAI-invariant. The FUSED path slices them per tile
        # range inside its scan (an all-tile materialization OOMs HBM at
        # 9x9 defaults); the two-kernel path prebuilds per-batch inputs.
        bands_by_batch = ()
        if not fused:
            bands_by_batch = []
            for b0 in range(0, n_tiles, tiles_per_batch):
                b1 = min(n_tiles, b0 + tiles_per_batch)
                band_list = []
                for ti in range(b0, b1):
                    oy, ox = int(tile_oy[ti]), int(tile_ox[ti])
                    for bk in range(banks):
                        l0 = bk * kl
                        band_list.append(
                            tab[:, oy : oy + bh, ox : ox + bw, l0 : l0 + kl]
                        )
                        if wiener:
                            band_list.append(
                                tab_b[:, oy : oy + bh, ox : ox + bw, l0 : l0 + kl]
                            )
                bands_by_batch.append(jnp.concatenate(band_list, axis=0))
            bands_by_batch = tuple(bands_by_batch)
        return match0, noisy0, tab, tab_b, others_ext, bands_by_batch

    def step_impl(prepared, sigma_c, num0, den0, idx_blocks):
        match0, noisy0, tab, tab_b, others_ext, bands_by_batch = prepared
        sigma_c = sigma_c.astype(dt)

        fmask = None
        if sp.flat_tau > 0:
            # angular-redundancy mask (ops/flat.py): ref-SAI-independent,
            # one field per step, computed on the NOISY planes. Redundant
            # positions build no group; their pixels take the angular-mean
            # 2D fallback at finalize (pipeline/denoise._finalize).
            fmask = flat_ref_mask(noisy0, ys, xs, k, sp.flat_tau,
                                  sigma_c[0])

        v1 = wp - k + 1

        def ref_pass(carry, idx):
            """One pass over a block of R reference SAIs (idx: [R] positions
            into the ref-SAI grid; entries >= n_refs are masked dummies,
            clamped for BM)."""
            num, den = carry
            valid = idx < n_refs
            rs = ref_sais_c[jnp.minimum(idx, n_refs - 1)]

            # BM runs per ref in an inner scan, in the exact single-ref form
            # (batched/vmapped BM forms measured 1.5-1.6x slower on this
            # chip, twice); only the group stage is ref-batched.
            def bm_one(_, ri):
                im = match0[ri]
                if use_bm_kernel:
                    # VMEM-resident self-BM (kernels/bm.py): the XLA
                    # displacement scan round-trips full-plane intermediates
                    # through HBM per displacement — 12% of the matched-
                    # preset flagship device time at n=16. Same quantized-
                    # distance contract; interpret mode keeps the scan
                    # (f64 oracle tests pin its summation order).
                    d_self = self_distances_kernel(im, ys_t, xs_t, k, n)
                else:
                    d_self = self_distances(im, ys, xs, k, n)
                order, lv, mk = select_similar(d_self, n, sp.tau_match, n_sim)
                if sp.flat_tau > 0:
                    mk = mk & ~fmask[:, None]
                offs = disp_self[order]
                sy = pos_y[:, None] + offs[..., 0]  # [T, N]
                sx = pos_x[:, None] + offs[..., 1]

                if use_bm_kernel:
                    ref_ext = jnp.pad(im, ((0, 2 * nd), (0, wq_bm - wp)))
                    bidx = cross_argmin_all_kernel(
                        ref_ext, others_ext, k, nd
                    )  # [A, V0, V1k] (cols >= v1 junk, never sampled)
                    stride = v1k
                else:
                    def per_a(_, ai):
                        return _, cross_argmin(im, match0[ai], k, nd)

                    _, bidx = lax.scan(per_a, 0, jnp.arange(a))  # [A,V0,V1]
                    stride = v1
                if use_direct:
                    # Pixel-coordinate [V0, V1, lanes] table, padded to the
                    # band cover [hp2, wp2]: sample_doff DMAs each tile's
                    # band region once and reads per-slot rows in VMEM, so
                    # the an/ang_p intermediates never materialize and the
                    # ~0.5 GB/s traced row-gather disappears.
                    t3 = jnp.transpose(bidx, (1, 2, 0))[:hp2, :wp2, :]
                    t3 = jnp.pad(
                        t3,
                        ((0, hp2 - t3.shape[0]), (0, wp2 - t3.shape[1]),
                         (0, a_pad - a)),
                        constant_values=c_ang,
                    )
                    return _, (sy, sx, lv, mk, lax.optimization_barrier(t3))
                # Pad the angular axis to the lane width on the MAJOR dim
                # before transposing (a minor-dim pad afterwards measured
                # ~1 GB/s), then ONE row-gather at the similar-patch
                # positions for every SAI.
                bidx_f = jnp.pad(
                    bidx.reshape(a, -1), ((0, ang_w - a), (0, 0)),
                    constant_values=c_ang,
                ).T  # [V, ang_w]
                bidx_f = lax.optimization_barrier(bidx_f)
                fp = (sy * stride + sx).reshape(-1)  # [T*N]
                if use_dma_gather:
                    an = gather_rows(bidx_f, fp).reshape(
                        t_count, n_sim, ang_w
                    )
                else:
                    an = jnp.take(bidx_f, fp, axis=0).reshape(
                        t_count, n_sim, ang_w
                    )
                an = jnp.where(
                    jnp.arange(ang_w)[None, None, :] == ri, c_ang, an
                )
                return _, (sy, sx, lv, mk, an)

            _, (sim_y, sim_x, lvl, mask, ang) = lax.scan(bm_one, 0, rs)
            mask = mask & valid[:, None, None]  # dummy refs contribute zero

            # dummy slot at index T for tile padding (per ref)
            sim_y_p = jnp.concatenate(
                [sim_y, jnp.full((r_batch, 1, n_sim), pad, jnp.int32)], axis=1
            )
            sim_x_p = jnp.concatenate(
                [sim_x, jnp.full((r_batch, 1, n_sim), pad, jnp.int32)], axis=1
            )
            lvl_p = jnp.concatenate(
                [lvl, jnp.zeros((r_batch, 1), lvl.dtype)], axis=1
            )
            mask_p = jnp.concatenate(
                [mask, jnp.zeros((r_batch, 1, n_sim), bool)], axis=1
            )
            if not use_direct:
                ang_p = jnp.concatenate(
                    [ang, jnp.full((r_batch, 1, n_sim, ang_w), c_ang,
                                   ang.dtype)],
                    axis=1,
                )

            if use_cskip:
                # order live groups first within each (tile, ref): metadata
                # indices become data (stable argsort on the flat flag), and
                # the per-(tile, ref) live-chunk count rides scalar prefetch
                # so the kernel can skip fully-dead chunks.
                flat_p = jnp.concatenate(
                    [jnp.broadcast_to(fmask[None], (r_batch, t_count)),
                     jnp.ones((r_batch, 1), bool)], axis=1
                )  # dummy slot index T counts as dead
                flat_e = jnp.take(flat_p.reshape(-1), tile_groups_ec).reshape(
                    n_tiles, r_batch, tt_pad
                )
                order_g = jnp.argsort(
                    flat_e.astype(jnp.int32), axis=-1, stable=True
                )
                tge_used = jnp.take_along_axis(
                    tile_groups_ec.reshape(n_tiles, r_batch, tt_pad),
                    order_g, axis=-1,
                )
                sfc_used = (
                    tge_used[..., None] * n_sim
                    + jnp.arange(n_sim, dtype=jnp.int32)
                ).reshape(-1)
                tge_used = tge_used.reshape(-1)
                n_live = jnp.sum(
                    ~flat_e, axis=-1, dtype=jnp.int32
                )  # [nT, R]
                n_live = jnp.where(valid[None, :], n_live, 0)
                nlc_k = ((n_live + gpc - 1) // gpc).reshape(-1)  # [n_meta]
            else:
                sfc_used, tge_used, nlc_k = slot_flat_c, tile_groups_ec, None

            # one row-gather per ref-BLOCK fetches every (tile, ref) slot's
            # metadata (the gather tables carry per-ref offsets)
            qy_all = jnp.take(sim_y_p.reshape(-1), sfc_used).reshape(
                n_tiles, r_batch, cpt, sc
            )
            qx_all = jnp.take(sim_x_p.reshape(-1), sfc_used).reshape(
                n_tiles, r_batch, cpt, sc
            )
            if use_direct:
                rs_i32 = rs.astype(jnp.int32)
                qyx_pack = (qy_all * 2048 + qx_all).astype(jnp.int32)
            if not fused:
                # fused path gathers doff per tile RANGE inside its scan:
                # the all-tile table is [nT, R, cpt, sc, L] — 3.1 GB at 9x9
                # defaults, a main contributor to the HBM OOM device fault
                if use_direct:
                    doff_all = sample_doff(
                        ang, qyx_pack.reshape(n_tiles * r_batch, cpt, sc),
                        origins_c, rs_i32, bh=bh, bw=bw, c_ang=c_ang,
                        interpret=interpret,
                    ).reshape(n_tiles, r_batch, cpt, sc, ang_w)
                else:
                    doff_all = jnp.take(
                        ang_p.reshape(-1, ang_w), slot_flat_c, axis=0
                    ).reshape(n_tiles, r_batch, cpt, sc, ang_w)
            glvl_all = jnp.take(lvl_p.reshape(-1), tge_used).reshape(
                n_tiles, r_batch, tt_pad
            )
            smask_all = jnp.take(
                mask_p.reshape(-1, n_sim), tge_used, axis=0
            ).reshape(n_tiles, r_batch, tt_pad, n_sim)

            # positions relative to each (static) tile origin
            sy_all = jnp.clip(
                qy_all - nd - tile_oy_c[:, None, None, None], 0, bh - sk
            )
            sx_all = jnp.clip(
                qx_all - nd - tile_ox_c[:, None, None, None], 0, bw - sk
            )

            if fused:
                # --- fused kernel over tile ranges: extract -> transform ->
                # shrink -> inverse -> aggregate entirely in VMEM
                # (kernels/fused.py). Masked slots are encoded by the
                # sentinel disparity index, so the kernel needs no mask
                # input and extraction yields exact zeros for them. Ranges
                # are sized by the scalar-prefetch SMEM budget and walked by
                # a lax.scan, so the kernel is TRACED ONCE regardless of the
                # tile count (at 9x9 defaults an unrolled loop would put
                # >100 pallas calls in the graph and blow up compile time).
                n_meta = n_tiles * r_batch
                tpc = tiles_per_call
                syx_k = (sy_all * 2048 + sx_all).reshape(
                    n_meta, cpt, sc
                ).astype(jnp.int32)
                lvl_k = glvl_all.reshape(n_meta, cpt, gpc).astype(jnp.int32)
                smask_s = smask_all.reshape(n_tiles, r_batch, cpt, sc)
                sig_k = sigma_c.astype(sdt)
                # per-range gather sources (materialized so the in-scan
                # takes hit the fast row-gather path)
                if not use_direct:
                    ang_flat = lax.optimization_barrier(
                        ang_p.reshape(-1, ang_w)
                    )
                sfc_2d = sfc_used.reshape(n_tiles, r_batch * cpt * sc)

                def range_body(nd_c, rid):
                    num, den = nd_c
                    t0 = rid * tpc
                    m0 = t0 * r_batch

                    def dsl(x, start, size):
                        return lax.dynamic_slice_in_dim(x, start, size, 0)

                    # bands and the per-slot disparity table are built PER
                    # RANGE (an all-tile materialization is 7.6 GB of bands
                    # + 3.1 GB of doff at 9x9 defaults -> HBM OOM; traffic
                    # is unchanged since bands were re-read per block)
                    def get_bands(tab_):
                        zero = jnp.int32(0)
                        slabs = []
                        for i in range(tpc):
                            oy = tile_oy_c[t0 + i].astype(jnp.int32)
                            ox = tile_ox_c[t0 + i].astype(jnp.int32)
                            slabs.append(lax.dynamic_slice(
                                tab_, (zero, oy, ox, zero),
                                (c, bh, bw, a_pad),
                            ))
                        full = jnp.concatenate(slabs, axis=0)
                        if banks == 1:
                            return full
                        return [full[..., b * kl:(b + 1) * kl]
                                for b in range(banks)]

                    if use_direct:
                        doff_rng = sample_doff(
                            ang,
                            dsl(qyx_pack, t0, tpc).reshape(
                                tpc * r_batch, cpt, sc
                            ),
                            dsl(origins_c, t0, tpc),
                            rs_i32, bh=bh, bw=bw, c_ang=c_ang,
                            interpret=interpret,
                        ).reshape(tpc, r_batch, cpt, sc, a_pad)
                    else:
                        sfc = dsl(sfc_2d, t0, tpc).reshape(-1)
                        doff_rng = jnp.take(ang_flat, sfc, axis=0).reshape(
                            tpc, r_batch, cpt, sc, ang_w
                        )
                        if ang_w < a_pad:
                            # live-width tables -> kernel lane width; dead
                            # lanes get c_ang (they read zero band lanes;
                            # masked rows go fully sentinel via the where
                            # below)
                            doff_rng = jnp.pad(
                                doff_rng,
                                ((0, 0),) * 4 + ((0, a_pad - ang_w),),
                                constant_values=c_ang,
                            )
                    smask_rng = dsl(smask_s, t0, tpc)
                    doff_rng = jnp.where(
                        smask_rng[..., None], doff_rng, sent
                    ).reshape(tpc * r_batch, cpt, sc, a_pad).astype(jnp.int32)

                    common = dict(
                        bh=bh, bw=bw, k=k, nd=nd, n_sim=n_sim,
                        lambda_3d=lambda_3d, wiener=wiener,
                        use_sd=sp.use_sd, a_live=a, planes=c,
                        refs=r_batch, interpret=interpret,
                        stack_mode=stack_mode,
                    )
                    if banks == 1:
                        nb_out, db_out = fused_group_step(
                            get_bands(tab),
                            get_bands(tab_b) if wiener else None,
                            dsl(syx_k, m0, tpc * r_batch),
                            dsl(lvl_k, m0, tpc * r_batch),
                            sig_k,
                            doff_rng,
                            ft.k2f, ft.k2i, ft.k4f, ft.k4i,
                            ft.stack_f, ft.stack_i, kaiser_3d,
                            nlc=(
                                dsl(nlc_k, m0, tpc * r_batch)
                                if use_cskip else None
                            ),
                            **common,
                        )
                    else:
                        nbs, dbs = fused_group_step_banked(
                            get_bands(tab),
                            get_bands(tab_b) if wiener else None,
                            dsl(syx_k, m0, tpc * r_batch),
                            dsl(lvl_k, m0, tpc * r_batch),
                            sig_k,
                            doff_rng.reshape(
                                tpc * r_batch, cpt, sc, banks, kl
                            ),
                            ft.k2f, ft.k2i, ft.k4f, ft.k4i,
                            ft.stack_f, ft.stack_i, kaiser_3d,
                            **common,
                        )
                        nb_out = jnp.concatenate(nbs, axis=-1)
                        db_out = jnp.concatenate(dbs, axis=-1)
                    nb_out = nb_out.reshape(tpc, c, bh, bw, a_pad)
                    db_out = db_out.reshape(tpc, c, bh, bw, a_pad)

                    def add_tile(i, nd_):
                        num_, den_ = nd_
                        zero = jnp.int32(0)
                        oy = tile_oy_c[t0 + i].astype(jnp.int32)
                        ox = tile_ox_c[t0 + i].astype(jnp.int32)
                        pos = (zero, oy, ox, zero)
                        sz = (c, bh, bw, a_pad)
                        num_ = lax.dynamic_update_slice(
                            num_, lax.dynamic_slice(num_, pos, sz) + nb_out[i],
                            pos,
                        )
                        den_ = lax.dynamic_update_slice(
                            den_, lax.dynamic_slice(den_, pos, sz) + db_out[i],
                            pos,
                        )
                        return num_, den_

                    num, den = lax.fori_loop(0, tpc, add_tile, (num, den))
                    return (num, den), None

                (num, den), _ = lax.scan(
                    range_body, (num, den), jnp.arange(n_ranges)
                )
                return (num, den), None

            # --- tile batches: one extract / transform / accumulate call per
            # batch (static band slices, no per-tile loop — the per-iteration
            # dispatch overhead of a fori over tiles dominated the runtime)
            for bi, b0 in enumerate(range(0, n_tiles, tiles_per_batch)):
                b1 = min(n_tiles, b0 + tiles_per_batch)
                tb = b1 - b0
                tbr = tb * r_batch
                # serialize the unrolled batches: without this barrier XLA
                # schedules every batch's extract upfront and holds all
                # group tensors live at once (measured 24.8G at 9x9)
                sy_b, sx_b, doff_b, num, den = lax.optimization_barrier(
                    (sy_all[b0:b1], sx_all[b0:b1], doff_all[b0:b1], num, den)
                )
                # kernel metadata rows ordered (tile, bank, ref): positions
                # repeat across banks; the disparity table splits along lanes
                sy_k = jnp.broadcast_to(
                    sy_b[:, None], (tb, banks, r_batch, cpt, sc)
                ).reshape(tb * banks * r_batch, cpt, sc)
                sx_k = jnp.broadcast_to(
                    sx_b[:, None], (tb, banks, r_batch, cpt, sc)
                ).reshape(tb * banks * r_batch, cpt, sc)
                doff_k = jnp.transpose(
                    doff_b.reshape(tb, r_batch, cpt, sc, banks, kl),
                    (0, 4, 1, 2, 3, 5),
                ).reshape(tb * banks * r_batch, cpt, sc, kl)

                grp = extract_groups(
                    bands_by_batch[bi], sy_k, sx_k, doff_k, k, nd,
                    planes=n_planes, refs=r_batch, interpret=interpret,
                )  # rows (tile, bank, plane, ref): [.., cpt, sc*64, kl]
                # join banks back onto the lane axis for the angular matmuls.
                # The batch axis keeps the kernel's native (tile, plane, ref)
                # order end-to-end: every downstream reorder is then a
                # broadcast or a singleton move (free for banks == 1) — a
                # (tile, ref)-major order was measured ~10% slower from the
                # two genuine group-tensor transposes it forces.
                grp = jnp.moveaxis(
                    grp.reshape(
                        tb, banks, n_planes, r_batch, tt_pad, n_sim, k * k, kl
                    ),
                    1, 6,
                ).reshape(tb, n_planes, r_batch, tt_pad, n_sim, k * k, a_pad)

                glvl = glvl_all[b0:b1]  # [tb, R, tt_pad]
                lvl_b = jnp.broadcast_to(
                    glvl[:, None], (tb, c, r_batch, tt_pad)
                ).reshape(-1)
                sig_b = jnp.broadcast_to(
                    sigma_c[None, :, None, None], (tb, c, r_batch, tt_pad)
                ).reshape(-1)[:, None, None, None]
                gb = tb * c * r_batch * tt_pad
                spec = forward_flat(
                    grp[:, :c].reshape(gb, n_sim, k * k, a_pad), lvl_b, ft,
                )
                if wiener:
                    spec_b = forward_flat(
                        grp[:, c:].reshape(gb, n_sim, k * k, a_pad),
                        lvl_b, ft,
                    )
                    b2 = spec_b**2
                    wien = b2 / (b2 + sig_b**2)
                    filt = spec * wien
                    wsum = jnp.sum(wien**2, axis=(1, 2, 3))
                    wgt = jnp.where(
                        wsum > 0,
                        1.0
                        / (sig_b[:, 0, 0, 0] ** 2 * jnp.maximum(wsum, 1e-30)),
                        1.0,
                    )
                else:
                    thr = lambda_3d * sig_b
                    keep = jnp.abs(spec) >= thr
                    filt = spec * keep
                    nnz = jnp.sum(keep, axis=(1, 2, 3)).astype(dt)
                    wgt = jnp.where(
                        nnz > 0,
                        1.0
                        / (sig_b[:, 0, 0, 0] ** 2 * jnp.maximum(nnz, 1.0)),
                        1.0,
                    )
                est = inverse_flat(filt, lvl_b, ft)
                est = est.reshape(
                    tb, c, r_batch, tt_pad, n_sim, k * k, a_pad
                )
                if sp.use_sd:
                    cnt = ((1 << glvl) * a * k * k).astype(dt)[:, None]
                    s1 = jnp.sum(est, axis=(4, 5, 6))
                    s2 = jnp.sum(est**2, axis=(4, 5, 6))
                    mean = s1 / cnt
                    var = s2 / cnt - mean**2
                    wgt = jnp.where(var > 0, 1.0 / jnp.maximum(var, 1e-30), 1.0)

                wgt = wgt.reshape(tb, c, r_batch, tt_pad)
                smask = smask_all[b0:b1].astype(dt)  # [tb, R, tt_pad, N]
                wk = (
                    wgt[..., None, None]
                    * smask[:, None, ..., None]
                    * kaiser_flat[None, None, None, None, None, :]
                )  # [tb, c, R, tt_pad, N, 64]
                # vals rows ordered (tile, bank, plane, ref) for the fused
                # accumulate (whose bands are revisited across refs)
                num_vals = jnp.moveaxis(
                    (est * wk[..., None]).reshape(
                        tb, c, r_batch, tt_pad, n_sim, k * k, banks, kl
                    ),
                    6, 1,
                ).reshape(tb * banks * c * r_batch, cpt, sc * k * k, kl)
                # den patches are lane-invariant (weight x kaiser): the fused
                # kernel rebuilds them in-register from per-slot scalar
                # weights, so the den side never exists as a group tensor
                # (the den vals materialization was the hottest per-batch
                # fusion in the device trace)
                ws = (wgt[..., None] * smask[:, None]).reshape(
                    tb, c, r_batch, cpt, sc
                )
                wv = jnp.broadcast_to(
                    ws[:, None], (tb, banks, c, r_batch, cpt, sc)
                ).reshape(tb * banks * c * r_batch, cpt, sc)
                nb_out, db_out = accumulate_groups_fused(
                    num_vals, wv, kaiser_np, sy_k, sx_k, doff_k, bh, bw,
                    k, nd, planes=c, refs=r_batch, interpret=interpret,
                )
                nb_out = jnp.moveaxis(
                    nb_out.reshape(tb, banks, c, bh, bw, kl), 1, 4
                ).reshape(tb, c, bh, bw, a_pad)
                db_out = jnp.moveaxis(
                    db_out.reshape(tb, banks, c, bh, bw, kl), 1, 4
                ).reshape(tb, c, bh, bw, a_pad)

                for i, ti in enumerate(range(b0, b1)):
                    oy, ox = int(tile_oy[ti]), int(tile_ox[ti])
                    num = num.at[:, oy : oy + bh, ox : ox + bw, :].add(
                        nb_out[i]
                    )
                    den = den.at[:, oy : oy + bh, ox : ox + bw, :].add(
                        db_out[i]
                    )
            return (num, den), None

        (num, den), _ = lax.scan(ref_pass, (num0, den0), idx_blocks)
        return num, den

    kai_1d = tuple(float(v) for v in tm.kaiser_window_1d(k))

    def _kaiser_conv(wf):
        """Deferred-den finalize (fused kernels): den = conv(W, kaiser).

        The fused kernels scatter only the per-slot weight scalar at each
        placed patch origin (see kernels/fused.py agg_body); the k x k
        Kaiser spread every slot shares is applied HERE, once per step, as
        a separable 2*k-tap shifted-add over the global accumulator — a few
        ms of HBM traffic replacing a k x k placed-patch mux + RMW per slot
        inside the kernel."""
        for axis in (1, 2):
            acc = wf * kai_1d[0]
            for i in range(1, k):
                sl = [slice(None)] * 4
                sl[axis] = slice(0, wf.shape[axis] - i)
                pc = [(0, 0)] * 4
                pc[axis] = (i, 0)
                acc = acc + jnp.pad(wf[tuple(sl)], pc) * kai_1d[i]
            wf = acc
        return wf

    def _finalize_acc(num, den):
        """Internal [C, Hp2, Wp2, A_pad] -> the [A, Hp, Wp, C] contract."""
        if fused:
            den = _kaiser_conv(den)
        num = jnp.transpose(num[:, :hp, :wp, :a], (3, 1, 2, 0))
        den = jnp.transpose(den[:, :hp, :wp, :a], (3, 1, 2, 0))
        return num, den

    acc_shape = (c, hp2, wp2, a_pad)

    if launch_blocks is None:
        def step(noisy_p, match_p, sigma_c, basic_p):
            z = jnp.zeros(acc_shape, dt)
            idx = jnp.arange(
                n_blocks * r_batch, dtype=jnp.int32
            ).reshape(n_blocks, r_batch)
            num, den = step_impl(
                prepare(noisy_p, match_p, basic_p), sigma_c, z, z, idx
            )
            return _finalize_acc(num, den)
    else:
        def step(prepared, sigma_c, num, den, block0):
            """Process ref-blocks [block0, block0+launch_blocks); block0 is
            traced, so one compilation serves every launch, and `prepared`
            = step.prepare(noisy_p, match_p, basic_p) is computed ONCE per
            step by the caller (jitted separately) — every launch reuses
            the tables/bands instead of rebuilding them. Refs beyond the
            real count are masked dummies (idx >= A)."""
            idx = (
                block0 * r_batch
                + jnp.arange(launch_blocks * r_batch, dtype=jnp.int32)
            ).reshape(launch_blocks, r_batch)
            return step_impl(prepared, sigma_c, num, den, idx)

        step.prepare = prepare

    step.acc_shape = acc_shape
    step.acc_dtype = dt
    step.finalize = _finalize_acc
    step.n_blocks = n_blocks
    return step
