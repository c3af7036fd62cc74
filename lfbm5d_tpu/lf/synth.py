"""Synthetic light-field generator for tests and benchmarks.

No LF datasets ship with this machine (no network, SURVEY.md §0), so tests and
the benchmark harness generate light fields with genuine LF structure: a
textured background plane and a textured foreground plane, each shifted per
sub-aperture image by disparity * (angular offset from center). This gives the
disparity-compensated angular block matching something real to find.

Returns float64 arrays in [0, 255], shape [aH, aW, H, W, C].
"""

from __future__ import annotations

import numpy as np


def _smooth_texture(rng: np.random.Generator, h: int, w: int, blur: int) -> np.ndarray:
    """Low-pass filtered uniform noise in [0,1] via separable box filters."""
    t = rng.random((h, w))
    for _ in range(2):
        # separable box blur with wraparound (cheap, dependency-free)
        k = np.ones(blur) / blur
        t = np.apply_along_axis(lambda v: np.convolve(v, k, mode="same"), 0, t)
        t = np.apply_along_axis(lambda v: np.convolve(v, k, mode="same"), 1, t)
    t = t - t.min()
    m = t.max()
    if m > 0:
        t = t / m
    return t


def synthetic_lf(
    a_h: int = 3,
    a_w: int = 3,
    h: int = 32,
    w: int = 40,
    channels: int = 1,
    disp_bg: int = 1,
    disp_fg: int = 2,
    seed: int = 0,
    flat_frac: float = 0.0,
) -> np.ndarray:
    """Two-plane textured light field with integer per-plane disparity.

    flat_frac > 0 replaces the LEFT flat_frac of the background texture's
    columns with a constant (its mean there): a genuinely flat region that
    stays flat in every view while keeping the plane's disparity structure —
    the content class the flat-region fallback (StepParams.flat_tau)
    targets. 0 (default) reproduces the historical generator exactly.
    """
    rng = np.random.default_rng(seed)
    max_disp = max(abs(disp_bg), abs(disp_fg)) * max(a_h, a_w)
    ch, cw = h + 2 * max_disp + 2, w + 2 * max_disp + 2

    lf = np.zeros((a_h, a_w, h, w, channels), dtype=np.float64)
    cy, cx = (a_h - 1) / 2.0, (a_w - 1) / 2.0

    # foreground occupies a centered ellipse of the frame (channel-invariant;
    # hoisted out of the loop — values identical to the original per-channel
    # recomputation)
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((yy - h / 2) / (h / 3.0)) ** 2 + ((xx - w / 2) / (w / 3.0)) ** 2 < 1.0

    for c in range(channels):
        bg = _smooth_texture(rng, ch, cw, blur=3) * 220.0 + 20.0
        fg = _smooth_texture(rng, ch, cw, blur=2) * 200.0 + 40.0
        if flat_frac > 0.0:
            cols = int(cw * flat_frac)
            bg[:, :cols] = bg[:, :cols].mean()
        # per-channel contiguous buffer: writing each SAI into the strided
        # lf[s, t, :, :, c] view measured ~12 s at flagship size
        chan = np.empty((a_h, a_w, h, w), dtype=np.float64)
        for s in range(a_h):
            for t in range(a_w):
                dy_bg = int(round(disp_bg * (s - cy)))
                dx_bg = int(round(disp_bg * (t - cx)))
                dy_fg = int(round(disp_fg * (s - cy)))
                dx_fg = int(round(disp_fg * (t - cx)))
                o = max_disp + 1
                bg_view = bg[o + dy_bg : o + dy_bg + h, o + dx_bg : o + dx_bg + w]
                fg_view = fg[o + dy_fg : o + dy_fg + h, o + dx_fg : o + dx_fg + w]
                np.copyto(chan[s, t], np.where(mask, fg_view, bg_view))
        lf[..., c] = chan
    np.clip(lf, 0.0, 255.0, out=lf)  # in-place: the copying clip was ~10 s
    return lf
