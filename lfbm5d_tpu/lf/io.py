"""Light-field I/O: a LF on disk is a directory of per-SAI images.

Reproduces the reference's `load_LF`/`save_LF` contract (SURVEY.md §2 #5,
§3.5): a printf-style name pattern with two angular indices (e.g.
``SAI_%02d_%02d.png``), an angular extent aH x aW, and an index offset for
datasets where only the central sub-grid is usable (EPFL Lytro: stored 15x15,
central 9x9 used). 8-bit and 16-bit images are supported; pixels are
normalized to the float [0, 255] scale internally (16-bit divided by 257), and
written back at the requested depth.

PNG decode/encode is host-side via PIL (SURVEY.md §2 native-mapping table:
the libpng wrapper's TPU-native equivalent is host Python feeding HBM).
"""

from __future__ import annotations

import os

import numpy as np


def _pattern_name(pattern: str, s: int, t: int) -> str:
    return pattern % (s, t)


def load_lf(
    directory: str,
    pattern: str,
    a_h: int,
    a_w: int,
    s_offset: int = 0,
    t_offset: int = 0,
) -> np.ndarray:
    """Load an LF as float64 [aH, aW, H, W, C] in [0, 255] units."""
    from PIL import Image

    sais = []
    for s in range(a_h):
        row = []
        for t in range(a_w):
            path = os.path.join(
                directory, _pattern_name(pattern, s + s_offset, t + t_offset)
            )
            img = Image.open(path)
            arr = np.asarray(img)
            if arr.dtype == np.uint16:
                arr = arr.astype(np.float64) / 257.0
            else:
                arr = arr.astype(np.float64)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            row.append(arr)
        sais.append(row)
    lf = np.stack([np.stack(r, axis=0) for r in sais], axis=0)
    return lf


def save_lf(
    lf: np.ndarray,
    directory: str,
    pattern: str,
    s_offset: int = 0,
    t_offset: int = 0,
    bit_depth: int = 8,
) -> None:
    """Write an [aH, aW, H, W, C] float LF (in [0,255]) as per-SAI images."""
    from PIL import Image

    os.makedirs(directory, exist_ok=True)
    a_h, a_w = lf.shape[:2]
    for s in range(a_h):
        for t in range(a_w):
            arr = np.asarray(lf[s, t], dtype=np.float64)
            if bit_depth == 16:
                out = np.clip(np.round(arr * 257.0), 0, 65535).astype(np.uint16)
            else:
                out = np.clip(np.round(arr), 0, 255).astype(np.uint8)
            if out.shape[-1] == 1:
                out = out[:, :, 0]
            path = os.path.join(
                directory, _pattern_name(pattern, s + s_offset, t + t_offset)
            )
            Image.fromarray(out).save(path)
