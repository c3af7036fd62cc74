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


def ref_sai_grid(a_h: int, a_w: int, p_ang: int = 1) -> np.ndarray:
    """Flattened indices of the SAIs that serve as references.

    p_ang == 1 reproduces the reference semantics (every SAI is a reference
    once, SURVEY.md §2.10.3). p_ang > 1 subsamples the reference role onto
    a strided angular grid with boundary flush (`ind_initialize` with k=1)
    — the angular analog of the spatial reference-patch step p. Groups
    still span/aggregate into all SAIs (see config.StepParams.p_ang).
    """
    ss = ind_initialize(a_h, 1, p_ang)
    ts = ind_initialize(a_w, 1, p_ang)
    return (ss[:, None] * a_w + ts[None, :]).reshape(-1).astype(np.int32)


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
