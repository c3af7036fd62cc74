"""Resampling operators shared by the SR pipeline and its oracle.

The reference SR branch (ICIP18, SURVEY.md §2.10) upscales each SAI
(bicubic), then alternates LFBM5D filtering with iterative back-projection
against the LR light field under a fixed blur/decimation model. Spec choices
for this rebuild (shared verbatim by the float64 oracle so parity is exact):

  * `upsample`: per-SAI bicubic via jax.image.resize(method='cubic').
  * `downsample`: exact alpha x alpha box average (reshape-mean) — the
    decimation model of the back-projection loop.
"""

from __future__ import annotations

import jax.image
import jax.numpy as jnp


def upsample(lf, scale: int, method: str = "cubic"):
    """[aH, aW, H, W, C] -> [aH, aW, scale*H, scale*W, C], per-SAI."""
    a_h, a_w, h, w, c = lf.shape
    return jax.image.resize(
        lf, (a_h, a_w, h * scale, w * scale, c), method=method
    )


def downsample(lf, scale: int):
    """Box-average decimation: [aH, aW, H, W, C] -> [..., H/s, W/s, C]."""
    a_h, a_w, h, w, c = lf.shape
    if h % scale or w % scale:
        raise ValueError(f"extent {(h, w)} not divisible by scale {scale}")
    x = lf.reshape(a_h, a_w, h // scale, scale, w // scale, scale, c)
    return jnp.mean(x, axis=(3, 5))
