"""Quality metrics on [0, 255]-scale arrays (reference `compute_psnr`)."""

from __future__ import annotations

import numpy as np


def rmse(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def psnr(a, b, peak: float = 255.0) -> float:
    r = rmse(a, b)
    if r == 0:
        return float("inf")
    return float(20.0 * np.log10(peak / r))
