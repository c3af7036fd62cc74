"""Flat-region detection and the per-SAI 2D fallback filter.

The flat-region per-SAI fallback (BASELINE.md "Reformulations" item 4, the
last unshipped idea from the original list; StepParams.flat_tau) skips the 5D
group machinery for reference patches whose local variance says there is no
structure to match — in flat regions BM degenerates (everything matches
everything) and the full per-slot extract/transform/aggregate cost buys
nothing over a plain per-SAI shrinkage. Pixels left uncovered (den == 0 at
finalize) take a per-SAI k x k transform-domain estimate instead.

Spec choices (mirrored literally by the float64 oracle, oracle/oracle.py):

* Flatness metric: POPULATION variance of the k x k channel-0 reference
  patch on the BM image (noisy for HT, basic for Wiener), quantized to
  1/DIST_QUANT units of [0,255]^2 exactly like BM distances, so the
  classification is bit-identical across dtypes/implementations.
  A patch is flat iff  round(var * Q) <= round(flat_tau * sigma_c0^2 * Q).
* Fallback estimate (LF-aware): flat means locally disparity-invariant, so
  the ANGULAR MEAN over all A SAIs is unbiased there and cuts the noise by
  sqrt(A) for free. The fallback averages the LF over the angular axes,
  pads to k-multiples by symmetric reflection, partitions into
  non-overlapping k x k blocks, applies the step's tau_2d transform,
  shrinks (HT at lambda*sigma_c/sqrt(A) keeping DC, or Wiener against the
  angular-mean basic pilot with noise power sigma_c^2/A), inverts, crops,
  and broadcasts to every SAI. (The reference-list idea is a per-SAI
  fallback; the angular mean dominates it on light fields — in flat
  regions all views agree by definition.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lfbm5d_tpu.ops.distances import DIST_QUANT, _box_sum


def flat_ref_mask(plane, ys, xs, k: int, flat_tau: float, sigma0):
    """True where the reference patch at the grid position is FLAT.

    plane: [Hp, Wp] channel-0 BM image (padded). ys/xs: static reference
    grids (padded coords). sigma0: channel-0 sigma (traced scalar OK).
    Returns bool [len(ys)*len(xs)].
    """
    ysj = jnp.asarray(np.asarray(ys), jnp.int32)
    xsj = jnp.asarray(np.asarray(xs), jnp.int32)
    s1 = _box_sum(plane, k)
    s2 = _box_sum(plane * plane, k)
    m1 = jnp.take(jnp.take(s1, ysj, 0), xsj, 1) / (k * k)
    m2 = jnp.take(jnp.take(s2, ysj, 0), xsj, 1) / (k * k)
    qvar = jnp.round((m2 - m1 * m1) * DIST_QUANT)
    thr_q = jnp.round(flat_tau * sigma0 * sigma0 * DIST_QUANT)
    return (qvar <= thr_q).reshape(-1)


def _blockify(x, k: int):
    """[..., H, W, C] -> ([..., by, bx, k, k, C], H, W) with symmetric pad."""
    h, w = x.shape[-3], x.shape[-2]
    ph, pw = (-h) % k, (-w) % k
    if ph or pw:
        pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        x = jnp.pad(x, pad, mode="symmetric")
    lead = x.shape[:-3]
    hp, wp, c = x.shape[-3:]
    b = x.reshape(*lead, hp // k, k, wp // k, k, c)
    return jnp.moveaxis(b, -4, -3), h, w  # [..., by, bx, k, k, C]


def fallback_shrink_2d(x, sigma_c, f2, i2, lambda_3d: float, pilot=None):
    """Angular-mean k x k blockwise transform shrinkage (the den==0 fallback).

    x: [aH, aW, H, W, C] noisy LF. sigma_c: [C] per-channel sigma.
    f2/i2: k x k tau_2d transform pair. pilot: basic-estimate LF ->
    Wiener shrinkage against its angular mean; None -> HT at
    lambda_3d * sigma_c / sqrt(A) with the DC coefficient always kept.
    Returns [aH, aW, H, W, C] (the shrunk mean broadcast to every SAI).
    """
    k = f2.shape[0]
    a_h, a_w = x.shape[:2]
    a = a_h * a_w
    sig_m = sigma_c / jnp.sqrt(jnp.asarray(float(a), sigma_c.dtype))
    xb, h, w = _blockify(jnp.mean(x, axis=(0, 1)), k)
    spec = jnp.einsum("uq,...qvc->...uvc", f2, xb)
    spec = jnp.einsum("vq,...uqc->...uvc", f2, spec)
    if pilot is None:
        keep = jnp.abs(spec) >= lambda_3d * sig_m
        dc = jnp.zeros(spec.shape[-3:-1], bool).at[0, 0].set(True)
        keep = keep | dc[..., None]
        filt = spec * keep
    else:
        pb, _, _ = _blockify(jnp.mean(pilot, axis=(0, 1)), k)
        sb = jnp.einsum("uq,...qvc->...uvc", f2, pb)
        sb = jnp.einsum("vq,...uqc->...uvc", f2, sb)
        b2 = sb * sb
        filt = spec * (b2 / (b2 + sig_m * sig_m))
    est = jnp.einsum("uq,...qvc->...uvc", i2, filt)
    est = jnp.einsum("vq,...uqc->...uvc", i2, est)
    est = jnp.moveaxis(est, -3, -4)  # [by, k, bx, k, C]
    hp = est.shape[-5] * k
    wp = est.shape[-3] * k
    est = est.reshape(hp, wp, est.shape[-1])[:h, :w, :]
    return jnp.broadcast_to(est, (a_h, a_w, h, w, est.shape[-1]))
