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


_ROUND_JITS: dict = {}


def fetch_rounded(lf, bit_depth: int = 8) -> np.ndarray:
    """Fetch a device-resident LF as save-ready values, quantized ON the
    accelerator so the device->host transfer moves uint8/uint16 instead of
    float32 (4x/2x fewer bytes — the axon tunnel downloads at ~3 MB/s, so
    a flagship float LF costs ~85 s and its uint8 form ~21 s).

    Returns float32 values that are fixed points of save_lf's own
    round/clamp (half-up, the native io_png convention), so
    ``save_lf(fetch_rounded(x, d), ..., bit_depth=d)`` writes exactly what
    ``save_lf(np.asarray(x), ..., bit_depth=d)`` would. Host arrays pass
    through unchanged (already on the host, nothing to save)."""
    import jax

    if not isinstance(lf, jax.Array):
        return np.asarray(lf)
    import jax.numpy as jnp

    key = int(bit_depth)
    if key not in _ROUND_JITS:
        if bit_depth == 16:
            def _q(x):
                v = jnp.clip(x.astype(jnp.float32), 0.0, 255.0)
                return jnp.floor(v * 257.0 + 0.5).astype(jnp.uint16)
        else:
            def _q(x):
                v = jnp.clip(x.astype(jnp.float32), 0.0, 255.0)
                return jnp.floor(v + 0.5).astype(jnp.uint8)
        _ROUND_JITS[key] = jax.jit(_q)
    q = np.asarray(_ROUND_JITS[key](lf))
    if bit_depth == 16:
        # q/257 round-trips exactly through save_lf's round(v*257)
        return (q.astype(np.float64) / 257.0).astype(np.float32)
    return q.astype(np.float32)


def load_lf(
    directory: str,
    pattern: str,
    a_h: int,
    a_w: int,
    s_offset: int = 0,
    t_offset: int = 0,
    use_native: str = "auto",
) -> np.ndarray:
    """Load an LF as float [aH, aW, H, W, C] in [0, 255] units.

    use_native: 'auto' tries the C++ parallel PNG decoder
    (lfbm5d_tpu.native) and falls back to PIL; 'never' forces PIL;
    'always' raises if the native path is unavailable.
    """
    from PIL import Image

    if use_native in ("auto", "always"):
        paths = [
            os.path.join(directory, _pattern_name(pattern, s + s_offset, t + t_offset))
            for s in range(a_h)
            for t in range(a_w)
        ]
        if all(p.lower().endswith(".png") for p in paths):
            try:
                from lfbm5d_tpu import native

                if native.available():
                    probe = np.asarray(Image.open(paths[0]))
                    h, w = probe.shape[:2]
                    c = 1 if probe.ndim == 2 else probe.shape[2]
                    return native.load_lf_native(paths, a_h, a_w, h, w, min(c, 3))
            except Exception:
                if use_native == "always":
                    raise
        elif use_native == "always":
            raise RuntimeError("native loader handles PNG inputs only")

    def _read_one(path):
        # PIL silently degrades 16-bit multi-channel PNGs; prefer OpenCV.
        try:
            import cv2

            arr = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if arr is None:
                raise FileNotFoundError(path)
            if arr.ndim == 3:
                arr = arr[:, :, :3][:, :, ::-1]  # strip alpha, BGR -> RGB
        except ImportError:
            arr = np.asarray(Image.open(path))
            if arr.ndim == 3 and arr.shape[2] > 3:
                arr = arr[:, :, :3]  # strip alpha, matching cv2/native paths
        if arr.dtype == np.uint16:
            arr = arr.astype(np.float64) / 257.0
        else:
            arr = arr.astype(np.float64)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr

    sais = []
    for s in range(a_h):
        row = []
        for t in range(a_w):
            path = os.path.join(
                directory, _pattern_name(pattern, s + s_offset, t + t_offset)
            )
            row.append(_read_one(path))
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
    """Write an [aH, aW, H, W, C] float LF (in [0,255]) as per-SAI images.

    Uses the thread-pooled native libpng encoder when available (writing
    81+ SAIs serially through PIL starves the streaming driver the same way
    serial decode did); falls back to PIL/OpenCV. The native writer rounds
    half-up (the reference io_png convention); the fallback uses np.round
    — they differ only on exact .5 sample values.
    """
    from PIL import Image

    os.makedirs(directory, exist_ok=True)
    a_h, a_w = lf.shape[:2]
    if lf.ndim == 5 and lf.shape[-1] in (1, 3) and bit_depth in (8, 16):
        try:
            from lfbm5d_tpu import native

            if native.available():
                paths = [
                    os.path.join(
                        directory,
                        _pattern_name(pattern, s + s_offset, t + t_offset),
                    )
                    for s in range(a_h)
                    for t in range(a_w)
                ]
                native.save_lf_native(np.asarray(lf), paths, bit_depth)
                return
        except RuntimeError as e:
            # Encoder unavailable (build/symbol failure) -> PIL/OpenCV path.
            # Genuine encode errors (IOError) propagate: a partial write must
            # not be silently retried with a different rounding convention.
            import logging

            logging.getLogger(__name__).info(
                "native PNG encoder unavailable (%s); falling back to PIL", e
            )
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
            if bit_depth == 16 and out.ndim == 3:
                # PIL has no 16-bit multi-channel PNG mode; use OpenCV (BGR)
                import cv2

                cv2.imwrite(path, out[:, :, ::-1])
            else:
                Image.fromarray(out).save(path)
