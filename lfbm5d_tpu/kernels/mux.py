"""Per-lane disparity mux helpers shared by the Pallas group kernels.

The A-on-lanes layout (SAIs on the 128 vector lanes) makes extraction and
aggregation a per-lane (dy, dx) shift of k x k patches within a
(k+2*nd)-wide superpatch — the TPU has no per-lane sublane gather, so the
shift is a chain of vselects over row/column-shifted views (the round-1
extract-kernel design, kernels/extract.py).

Round-4 select-level diet: the last (dy, dx) level serves as the nested-
select DEFAULT instead of a zero initializer, cutting 2*nsel select levels
to 2*(nsel-1) (+1 cheap sentinel mask on the extract side). The saved
levels act on the WIDE [k, sk, L] operand, so the vreg saving exceeds the
level count (~19% of extract-mux vselect traffic at nd=1). Outputs are
bitwise-identical: after clamping, every lane matches exactly one level,
and sentinel lanes are either explicitly zeroed (extract) or carry
exact-zero values whose placement is invisible (aggregate — the engine
zeroes masked slots' values and weights before the kernel).

Reference parity: this is pure instruction scheduling of SURVEY.md §2.10's
group gather/scatter semantics; no arithmetic changes.
"""

from __future__ import annotations

import jax.numpy as jnp


def mux_dydx(d, nsel, sent):
    """Per-lane (dy, dx) from the clamped disparity index (sentinel ->
    nsel-1/nsel-1; callers zero sentinel lanes separately where needed)."""
    dm = jnp.minimum(d, sent - 1)
    dy = (dm // nsel)[None, None, :]
    dx = (dm - (dm // nsel) * nsel)[None, None, :]
    return dy, dx


def mux_select(sup, d, k, nsel, sent):
    """Per-lane patch selection from a superpatch [sk, sk, L] -> [k, k, L].

    Sentinel lanes (d == sent) produce exact zeros — load-bearing for the
    butterfly stack transform and the nnz weight counts."""
    dy, dx = mux_dydx(d, nsel, sent)
    acc = sup[nsel - 1 : nsel - 1 + k, :, :]
    for m in range(nsel - 2, -1, -1):
        acc = jnp.where(dy == m, sup[m : m + k, :, :], acc)
    patch = acc[:, nsel - 1 : nsel - 1 + k, :]
    for m in range(nsel - 2, -1, -1):
        patch = jnp.where(dx == m, acc[:, m : m + k, :], patch)
    return jnp.where(d[None, None, :] < sent, patch,
                     jnp.zeros((), patch.dtype))


def mux_place(patch, dy, dx, k, sk, nsel):
    """Inverse of mux_select: per-lane placement of [k, k, L] into a zero-
    padded [sk, sk, L] superpatch. Sentinel lanes (clamped by mux_dydx to
    the default level) must carry exact-zero values."""
    accx = jnp.pad(patch, ((0, 0), (nsel - 1, sk - k - nsel + 1), (0, 0)))
    for m in range(nsel - 2, -1, -1):
        shifted = jnp.pad(patch, ((0, 0), (m, sk - k - m), (0, 0)))
        accx = jnp.where(dx == m, shifted, accx)
    sup = jnp.pad(accx, ((nsel - 1, sk - k - nsel + 1), (0, 0), (0, 0)))
    for m in range(nsel - 2, -1, -1):
        shifted = jnp.pad(accx, ((m, sk - k - m), (0, 0), (0, 0)))
        sup = jnp.where(dy == m, shifted, sup)
    return sup
