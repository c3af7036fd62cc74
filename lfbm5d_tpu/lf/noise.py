"""AWGN synthesis with pinned RNG (reference: mt19937ar.c + add_noise).

The reference adds i.i.d. Gaussian noise of std sigma (on the [0,255] scale)
to a clean LF for experiments. We provide a numpy version (pinned
`np.random.Generator`, used by the oracle and tests) and a jax version
(threefry key, used on-device). Exact bitwise parity with the C Mersenne
Twister is impossible to verify (empty reference mount, SURVEY.md §0) and is
not required: tests pin their own RNG.
"""

from __future__ import annotations

import numpy as np


def add_noise_np(
    lf: np.ndarray, sigma: float, seed: int = 0, rng_kind: str = "pcg64"
) -> np.ndarray:
    """AWGN of std `sigma`. rng_kind='mt19937' uses the Mersenne Twister
    (the reference's RNG family, component #7) for lineage parity; the
    default PCG64 is numpy's modern generator."""
    if rng_kind == "mt19937":
        rng = np.random.Generator(np.random.MT19937(seed))
    else:
        rng = np.random.default_rng(seed)
    out = np.asarray(lf, dtype=np.float64) + sigma * rng.standard_normal(lf.shape)
    return out


def add_noise(key, lf, sigma: float):
    import jax
    import jax.numpy as jnp

    noise = sigma * jax.random.normal(key, lf.shape, dtype=jnp.float32)
    return lf.astype(jnp.float32) + noise
