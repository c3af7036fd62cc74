"""Pallas angular block-matching kernel (hot loop B, SURVEY.md §3.1).

The XLA form of cross_argmin (ops/distances.py) is bandwidth-bound: each of
the (2nd+1)^2 displacement iterations round-trips ~10 MB of full-plane
intermediates through HBM (dynamic slice, squared diff, two reduce_window
passes, compare/select) — measured ~3.3 s of a 35.7 s two-step run at the
9x9 fast preset. Both planes fit VMEM (~1.4 MB each), so this kernel keeps
the whole displacement loop on-chip:

  per (ref SAI, other SAI) program:
    for each displacement (dy, dx) in row-major order:
      e = (ref - shifted other)^2            — static sublane/lane slices
      box = k x k window sum via DOUBLING-TREE shifted adds (log2(k) adds
            per axis instead of k; k must be a power of two)
      q = round(box * QUANT / k^2)           — the quantized-distance spec
      running first-occurrence argmin        — strict < keeps scan order

Traffic per pair collapses from ~10 MB x (2nd+1)^2 to one plane in + one
index map out. Summation ORDER differs from reduce_window's, which the
distance-quantization spec (ops/distances.py docstring) exists to absorb;
the engine uses this kernel only in compiled mode and keeps the XLA scan in
interpret mode, where the float64 oracle-exactness tests run.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lfbm5d_tpu.ops.distances import DIST_QUANT


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _box_doubling(e, k: int, axis: int):
    """Sum of k consecutive elements along axis via log2(k) shifted adds.

    e: [H, W]. Returns same-shape array whose leading (dim-k+1) entries along
    `axis` hold the window sums; the tail is garbage the caller never reads.
    """
    acc = e
    span = e.shape[axis]
    sh = 1
    while sh < k:
        if axis == 0:
            acc = acc[: span - sh, :] + acc[sh:span, :]
            span -= sh
        else:
            acc = acc[:, : span - sh] + acc[:, sh:span]
            span -= sh
        sh *= 2
    return acc


def _make_kernel(k: int, nd: int, hp: int, wq: int, quant: float):
    nsel = 2 * nd + 1
    wv = wq - 2 * nd
    v0, v1k = hp - k + 1, wv - k + 1
    imax = np.int32(np.iinfo(np.int32).max)

    def kernel(ref_ref, oth_ref, out_ref):
        # ref arrives ORIGIN-aligned (not nd-embedded): offset-0 slices keep
        # Mosaic layouts clean (misaligned-offset vectors broke the final
        # concat/pad form with "offset mismatch on non-concat dimension")
        ref = ref_ref[0, :hp, :wv]
        best = jnp.full((v0, v1k), imax, jnp.int32)
        bidx = jnp.zeros((v0, v1k), jnp.int32)
        for m in range(nsel * nsel):
            myi, mxi = m // nsel, m % nsel
            sh = oth_ref[0, myi : myi + hp, mxi : mxi + wv]
            e = (ref - sh) * (ref - sh)
            box = _box_doubling(_box_doubling(e, k, 0), k, 1)
            q = jnp.round(box * quant).astype(jnp.int32)
            better = q < best
            best = jnp.where(better, q, best)
            bidx = jnp.where(better, jnp.int32(m), bidx)
        out_ref[0, :v0, :v1k] = bidx

    return kernel


def _make_self_kernel(k: int, n: int, hp8: int, wq: int, hpe: int,
                      typ: int, txp: int, quant: float, dt):
    """Self-similarity distances: one program per x-shift, STATIC unrolled
    loop over y-shifts (dynamic sublane-range slices on a tiled dim are not
    expressible in Mosaic — the same constraint that shaped the angular BM
    kernel). The k x k box sum AND the ref-grid sampling are fused into two
    BANDED 0/1 selection matmuls (Sy_box[r, y] = 1 for y in [ys_r, ys_r+k)):
    box filtering is a matmul with a banded matrix, so the MXU does the
    window sums and the cross-lane compaction in one pass and the VPU only
    pays for the squared difference. (An earlier shrink-pad-matmul form
    computed garbage compiled: in-kernel pad of a sliced-down array is the
    'offset mismatch' Mosaic pattern the angular kernel already avoids.)"""
    nsel = 2 * n + 1
    acc_dt = jnp.float64 if jnp.dtype(dt) == jnp.float64 else jnp.float32

    def kernel(ref_ref, sh_ref, sy_ref, sx_ref, out_ref):
        ref = ref_ref[0]  # [hp8, wq]
        for dyi in range(nsel):
            sh = sh_ref[0, dyi : dyi + hp8, :]
            e = (ref - sh) * (ref - sh)
            # Sy_box [TyP, hp8] @ e [hp8, wq] @ Sx_box [wq, TxP]. precision
            # HIGHEST: e carries [0,255]^2-scale energies (up to 65k), and
            # the MXU's default single-pass bf16 truncation of them measured
            # ~0.4% relative error — hundreds of quantization units
            # (the transform kernels get away with default precision only
            # because their operands are O(255) pixels and O(1) matrices).
            t1 = jax.lax.dot_general(
                sy_ref[...], e, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt,
                precision=jax.lax.Precision.HIGHEST,
            )
            t2 = jax.lax.dot_general(
                t1.astype(dt), sx_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt,
                precision=jax.lax.Precision.HIGHEST,
            )
            q = jnp.round(t2 * quant).astype(jnp.int32)
            out_ref[0, dyi * typ : (dyi + 1) * typ, :] = q

    return kernel


@functools.partial(
    jax.jit, static_argnames=("ys", "xs", "k", "n", "interpret")
)
def self_distances_kernel(plane, ys: tuple, xs: tuple, k: int, n: int,
                          interpret: bool = False):
    """Kernel form of ops.distances.self_distances (hot loop A).

    The XLA displacement scan is bandwidth-bound: each of the (2n+1)^2
    iterations round-trips full-plane intermediates through HBM (dynamic
    slice, squared diff, two reduce_window passes, sampling) — 12% of the
    matched-preset flagship device time at n=16 (1089 displacements). The
    plane fits VMEM, so this kernel keeps the loop on-chip: grid over the
    2n+1 x-shifts (lane shifts are precomputed plane copies — dynamic lane
    offsets are not expressible in Mosaic), in-kernel fori over the 2n+1
    y-shifts (dynamic sublane slices are), doubling-tree box sums, and the
    ref-grid sampling fused in as two 0/1 selection matmuls.

    plane: [Hp, Wp] padded channel-0 SAI. ys/xs: STATIC reference-grid
    coordinate tuples (padded coords, as ops.distances.self_distances).
    Returns [len(ys)*len(xs), (2n+1)^2] int32 quantized distances in
    row-major displacement order — same contract as self_distances; values
    agree up to quantization-boundary flips (MXU banded-matmul vs
    reduce_window summation order; the distance-quantization spec exists to
    absorb this, ops/distances.py docstring — worst-case f32 box-sum error
    ~0.25 in [0,255]^2 pixel units vs the 8-unit quantization bucket).
    Compiled mode only; interpret mode is for kernel tests — the engine
    keeps the XLA scan there, where the f64 oracle-exactness tests run.
    """
    if k & (k - 1):
        raise ValueError(f"self-BM kernel needs power-of-two k, got {k}")
    hp, wp = plane.shape
    dt = plane.dtype
    nsel = 2 * n + 1
    hp8 = _round_up(hp, 8)
    wq = _round_up(wp + 2 * n, 128)
    hpe = hp8 + 2 * n
    ty, tx = len(ys), len(xs)
    typ = _round_up(ty, 8)
    txp = _round_up(tx, 128)

    # ref origin-aligned; x-shifted copies of the zero-extended plane (the
    # lane axis of each copy is the shift window's column dx)
    ref = jnp.pad(plane, ((0, hp8 - hp), (0, wq - wp)))
    ext = jnp.pad(plane, ((n, n + hp8 - hp), (n, n)))  # [hpe, wp + 2n]
    shifts = jnp.stack(
        [
            jnp.pad(ext[:, dx : dx + wp], ((0, 0), (0, wq - wp)))
            for dx in range(nsel)
        ],
        axis=0,
    )  # [nsel, hpe, wq]

    # banded selection-plus-box matrices: row r sums plane rows
    # [ys_r, ys_r + k); column c sums plane cols [xs_c, xs_c + k)
    sy = np.zeros((typ, hp8), np.float64)
    for r, y0 in enumerate(ys):
        sy[r, y0 : y0 + k] = 1.0
    sx = np.zeros((wq, txp), np.float64)
    for c, x0 in enumerate(xs):
        sx[x0 : x0 + k, c] = 1.0

    kernel = _make_self_kernel(
        k, n, hp8, wq, hpe, typ, txp, float(DIST_QUANT / (k * k)), dt
    )
    out = pl.pallas_call(
        kernel,
        grid=(nsel,),
        in_specs=[
            pl.BlockSpec((1, hp8, wq), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpe, wq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((typ, hp8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wq, txp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nsel * typ, txp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsel, nsel * typ, txp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(ref[None], shifts, jnp.asarray(sy, dt), jnp.asarray(sx, dt))
    # [dx, dy*TyP, TxP] -> [T, D] in row-major (dy outer, dx inner) order
    out = out.reshape(nsel, nsel, typ, txp)[:, :, :ty, :tx]
    out = jnp.transpose(out, (1, 0, 2, 3)).reshape(nsel * nsel, ty * tx)
    return out.T


@functools.partial(jax.jit, static_argnames=("k", "nd", "interpret"))
def cross_argmin_all_kernel(ref_ext, others_ext, k: int, nd: int,
                            interpret: bool = False):
    """First-occurrence disparity argmin maps of one ref SAI vs every SAI.

    ref_ext:    [Hp + 2nd, Wq] — the reference plane ORIGIN-aligned at
      [0:Hp, 0:Wp], zero rows/cols beyond (sublane-padded to match
      others_ext row count; the nd embedding is only for `others`).
    others_ext: [A, Hp + 2nd, Wq] — every SAI plane zero-extended by nd
      (plane at [nd:nd+Hp, nd:nd+Wp]) and lane-padded to Wq (128 multiple).
    Returns [A, Hp - k + 1, Wq - 2nd - k + 1] int32 flat displacement
    indices; only [:, :V0, :V1] is meaningful (V0/V1 per ops.distances).
    """
    if k & (k - 1):
        raise ValueError(f"BM kernel needs power-of-two k, got {k}")
    a, hpe, wq = others_ext.shape
    hp = hpe - 2 * nd
    kernel = _make_kernel(k, nd, hp, wq, float(DIST_QUANT / (k * k)))
    out = pl.pallas_call(
        kernel,
        grid=(a,),
        in_specs=[
            pl.BlockSpec((1, hpe, wq), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpe, wq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hp, wq), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a, hp, wq), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(ref_ext[None], others_ext)
    return out[:, :, : wq - 2 * nd - k + 1][:, : hp - k + 1]
