"""Padding and reference-patch grids.

`symmetric_pad` mirrors the reference's `symetrize` (utilities.cpp): each SAI
is reflected symmetrically (edge-inclusive, numpy 'symmetric' mode) by the
search margin before filtering, so every block-matching window is full-size.

`ind_initialize` reproduces the reference-grid semantics (SURVEY.md §2.10.2):
patch top-left positions every `p` pixels from 0, PLUS a final position
flushed to the boundary (size - k) if the stepped grid does not land on it.
"""

from __future__ import annotations

import numpy as np


def ind_initialize(size: int, k: int, p: int) -> np.ndarray:
    """Reference-patch top-left coordinates along one axis of an unpadded SAI."""
    last = size - k
    if last < 0:
        raise ValueError(f"image extent {size} smaller than patch size {k}")
    ind = list(range(0, last + 1, p))
    if ind[-1] != last:
        ind.append(last)
    return np.asarray(ind, dtype=np.int32)


def symmetric_pad(img, pad: int):
    """Symmetric (mirror, edge-inclusive) padding of the last-2 spatial axes
    for [..., H, W] or the middle spatial axes for [..., H, W, C] arrays.

    Channel-last arrays are detected by a trailing axis of size <= 4.
    """
    import jax.numpy as jnp

    xp = jnp if not isinstance(img, np.ndarray) else np
    nd = img.ndim
    widths = [(0, 0)] * nd
    if img.shape[-1] <= 4 and nd >= 3:
        widths[-2] = (pad, pad)
        widths[-3] = (pad, pad)
    else:
        widths[-1] = (pad, pad)
        widths[-2] = (pad, pad)
    return xp.pad(img, widths, mode="symmetric")


def pad_lf(lf, pad: int):
    """Pad every SAI of an [aH, aW, H, W, C] light field symmetrically."""
    return symmetric_pad(lf, pad)
