"""Content-adaptive preset selection (round-3 extension of BASELINE.json:5).

The round-3 knee sweeps established that every aggressive speed knob
(p_ang >= 2, p = 8, N = 8) is CONTENT-dependent: on disparity-rich light
fields the `matched` preset sits at-or-above reference-default quality at
~90x the speed, while on low-disparity content (a static background across
all SAIs — maximal angular redundancy) the same preset loses up to ~0.4 dB
and only the `robust` preset stays inside the 0.05 dB budget (BASELINE.md
content-robustness table). The discriminating content property is "how much
of the image is angularly static", and that is cheap to probe.

Probe (one pass over two SAIs, numpy):

  1. 8x8 block means of channel 0 of the two extreme corner SAIs — block
     averaging suppresses the AWGN variance 64x, and the corner pair has the
     longest angular baseline, so a plane of disparity d is displaced by
     d * (angular extent) ~ 8d pixels between them.
  2. d = (m0 - m1)^2 per block; g = max squared difference of m0 against its
     4 one-block-shifted neighbors (the content's own energy at the
     one-block displacement scale, which is what a disparity-1 plane looks
     like).
  3. blocks with g above the noise floor are "informative"; an informative
     block is STATIC if d stays within the noise floor or a small fraction
     of g. static_fraction = static / informative.

Measured landscape on the synthetic-content families (tests pin it):
all-planes-moving content sits at ~0.53-0.56, content with a static
MINORITY plane at ~0.65-0.69, content with a static background (the regime
where aggressive presets measurably fail, BASELINE.md) at >= 0.86.

Decision: static_fraction >= THRESHOLD -> 'robust', else 'matched'. The
threshold sits at 0.60, BELOW the static-minority class: on-chip PSNR
measurement (9x9x224x320, seed 4, disp 1/0 — a static foreground covering
~35% of the frame; BASELINE.md adaptive-preset row) put the matched preset
at -0.067 dB vs that content's own default anchor (31.437 vs 31.504 dB) —
OUTSIDE the 0.05 dB budget — while robust measured +0.304 dB at 4x default
speed. Any content with a significantly static plane therefore routes to
'robust'; only the all-moving class (where matched measured at-or-above
default, BASELINE.md flagship table) routes to 'matched'.
"""

from __future__ import annotations

import numpy as np

from lfbm5d_tpu.config import DenoiseParams, preset_denoise_params

# Decision threshold on the static block fraction (see module docstring for
# the measured class landscape and the PSNR measurements that place it).
STATIC_FRACTION_THRESHOLD = 0.60
# A block's one-block-shift content energy must exceed this multiple of the
# block-mean noise variance (2 sigma^2 / 64) to count as informative.
_INFORMATIVE_FACTOR = 8.0
# An informative block is static when the extreme-pair difference is below
# max(_STATIC_NOISE_FACTOR * noise, _STATIC_CONTENT_FRACTION * g).
_STATIC_NOISE_FACTOR = 6.0
_STATIC_CONTENT_FRACTION = 0.15


def content_stats(lf, sigma: float, block: int = 8) -> dict:
    """Angular-redundancy probe of a (noisy) light field.

    lf: [aH, aW, H, W, C] array-like in [0, 255]; sigma: AWGN std on the
    [0,255] scale (the CLI/bench always know it).

    Returns {static_fraction, n_informative, n_blocks, noise_var_block}.
    """
    lf = np.asarray(lf)
    a_h, a_w = lf.shape[:2]
    b = block
    p0 = lf[0, 0, :, :, 0].astype(np.float64)
    p1 = lf[a_h - 1, a_w - 1, :, :, 0].astype(np.float64)
    hb, wb = (p0.shape[0] // b) * b, (p0.shape[1] // b) * b
    vb = 2.0 * sigma * sigma / (b * b)
    if hb == 0 or wb == 0 or (a_h == 1 and a_w == 1):
        return {"static_fraction": 1.0, "n_informative": 0, "n_blocks": 0,
                "noise_var_block": vb}

    def block_means(p):
        return p[:hb, :wb].reshape(hb // b, b, wb // b, b).mean(axis=(1, 3))

    m0 = block_means(p0)
    m1 = block_means(p1)
    d = (m0 - m1) ** 2
    g = np.zeros_like(m0)
    g[:-1, :] = np.maximum(g[:-1, :], (m0[:-1, :] - m0[1:, :]) ** 2)
    g[1:, :] = np.maximum(g[1:, :], (m0[1:, :] - m0[:-1, :]) ** 2)
    g[:, :-1] = np.maximum(g[:, :-1], (m0[:, :-1] - m0[:, 1:]) ** 2)
    g[:, 1:] = np.maximum(g[:, 1:], (m0[:, 1:] - m0[:, :-1]) ** 2)
    informative = g > _INFORMATIVE_FACTOR * vb
    n_inf = int(informative.sum())
    if n_inf < 8:
        # featureless content: angularly redundant by definition
        return {"static_fraction": 1.0, "n_informative": n_inf,
                "n_blocks": int(d.size), "noise_var_block": vb}
    static = d[informative] < np.maximum(
        _STATIC_NOISE_FACTOR * vb,
        _STATIC_CONTENT_FRACTION * g[informative],
    )
    return {
        "static_fraction": float(static.mean()),
        "n_informative": n_inf,
        "n_blocks": int(d.size),
        "noise_var_block": vb,
    }


def select_preset(lf, sigma: float) -> tuple[str, dict]:
    """('matched' | 'robust', probe stats) for a noisy LF at known sigma."""
    stats = content_stats(lf, sigma)
    name = (
        "robust"
        if stats["static_fraction"] >= STATIC_FRACTION_THRESHOLD
        else "matched"
    )
    return name, stats


def adaptive_denoise_params(lf, sigma: float, **kw) -> tuple[DenoiseParams, str, dict]:
    """DenoiseParams chosen by the content probe, plus (name, stats)."""
    name, stats = select_preset(lf, sigma)
    return preset_denoise_params(name, sigma, **kw), name, stats
