"""Similar-patch selection: dense top-N with tau threshold and pow2 truncation.

Reproduces the oracle's candidate ordering exactly (SURVEY.md §2.10.4 plus the
self-first tie-break documented in lfbm5d_tpu.oracle): candidates sorted by
(distance, is-not-self, row-major window index). jnp.argsort is stable, so
setting the self candidate's key to -1 (its true distance is 0, and
tau_match >= 0 always admits it) yields that exact order with one sort.
"""

from __future__ import annotations

import jax.numpy as jnp

from lfbm5d_tpu.ops.distances import DIST_QUANT, center_index


def select_similar(dists, n_search: int, tau_match: float, n_sim: int):
    """dists: [T, (2n+1)^2] quantized int32 SSDs (units of 1/DIST_QUANT in
    k^2-normalized scale), row-major candidate order.

    Returns (order [T, n_sim] int32 window-candidate indices sorted by the
    spec order, lvl [T] int32 with stack size = 2**lvl, mask [T, n_sim] bool
    marking the live stack slots).
    """
    t, ds = dists.shape
    self_idx = center_index(n_search)
    adj = dists.at[:, self_idx].set(-1)
    order_full = jnp.argsort(adj, axis=1)  # stable
    tau_q = round(tau_match * DIST_QUANT)
    # The tau count is permutation-invariant, so it comes from the UNSORTED
    # distances: the round-3 launched profile showed the sorted-row gather
    # (take_along_axis over the full (2n+1)^2-wide rows, 32M elements per
    # ref at default parameters) was 40% of flagship device time — and its
    # only consumer was this sum.
    count = jnp.sum(dists <= tau_q, axis=1)  # >= 1 (self SSD is 0)
    count = jnp.minimum(count, n_sim)
    lvl = jnp.zeros((t,), dtype=jnp.int32)
    s = 2
    while s <= n_sim:
        lvl = lvl + (count >= s).astype(jnp.int32)
        s *= 2
    order = order_full[:, :n_sim].astype(jnp.int32)
    mask = jnp.arange(n_sim)[None, :] < (1 << lvl)[:, None]
    return order, lvl, mask
