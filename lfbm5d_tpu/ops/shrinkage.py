"""Coefficient shrinkage and aggregation weights (SURVEY.md §2.10.7-8).

Operates on 5D spectra [B, N, aH, aW, k, k, C]. Padded stack slots (beyond a
group's power-of-two size) carry exactly-zero coefficients by construction
(zero rows of the padded stack matrix), so they never pass the hard threshold,
contribute 0 to Wiener coefficient energy, and need no masking here.
"""

from __future__ import annotations

import jax.numpy as jnp

_GROUP_AXES = (1, 2, 3, 4, 5)


def ht_shrink(spec, sigma_c, lambda_3d: float):
    """Hard threshold at lambda * sigma_c per channel.

    Returns (filtered spectrum, weight [B, C]) with weight
    1/(sigma_c^2 * N_nz), or 1.0 for an all-zero group.
    """
    thr = lambda_3d * sigma_c  # [C]
    keep = jnp.abs(spec) >= thr
    filt = spec * keep
    nnz = jnp.sum(keep, axis=_GROUP_AXES).astype(spec.dtype)  # [B, C]
    w = jnp.where(nnz > 0, 1.0 / (sigma_c**2 * jnp.maximum(nnz, 1.0)), 1.0)
    return filt, w


def wiener_shrink(spec_noisy, spec_basic, sigma_c):
    """Empirical Wiener filter w = B^2/(B^2 + sigma_c^2) from the basic
    spectrum, applied to the noisy spectrum.

    Returns (filtered spectrum, weight [B, C]) with weight
    1/(sigma_c^2 * sum(w^2)), or 1.0 when the filter is identically zero.
    """
    b2 = spec_basic**2
    wien = b2 / (b2 + sigma_c**2)
    filt = spec_noisy * wien
    wsum = jnp.sum(wien**2, axis=_GROUP_AXES)
    w = jnp.where(wsum > 0, 1.0 / (sigma_c**2 * jnp.maximum(wsum, 1e-30)), 1.0)
    return filt, w


def sd_weight(est, lvl, a: int, k: int):
    """SD-based aggregation weight (use_sd=1): 1/var over the live group values.

    est: filtered-and-inverted group [B, N, aH, aW, k, k, C]; invalid stack
    slots are exactly zero and excluded via the live-value count.
    """
    cnt = ((1 << lvl) * a * k * k).astype(est.dtype)[:, None]  # [B, 1]
    s1 = jnp.sum(est, axis=_GROUP_AXES)
    s2 = jnp.sum(est**2, axis=_GROUP_AXES)
    mean = s1 / cnt
    var = s2 / cnt - mean**2
    return jnp.where(var > 0, 1.0 / jnp.maximum(var, 1e-30), 1.0)
