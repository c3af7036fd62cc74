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
