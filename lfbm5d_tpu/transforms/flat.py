"""Separable 5D transforms on the flat A-on-lanes group layout.

Group tensor: [B, N, 64, L] — B groups (channel-major batches), N-deep
similarity stack, 64 = k*k spatial pixels row-major, L = 128-lane axis
carrying the flattened angular grid (aH*aW = A live lanes, rest zero).

Each separable factor becomes ONE well-shaped matmul (measured: the naive
small-axis einsums of transforms/apply.py run at ~11 GFLOP/s on TPU; these
layouts hit the MXU properly):

  * spatial tau_2D:  kron(F2, F2) [64, 64]   -> dot_general, K=N=64
  * angular tau_4D:  kron(F4s, F4t) padded to [L, L] -> [*, L] x [L, L]
    (zero pad rows/cols also scrub the dead lanes)
  * stack tau_5D:    per-group power-of-two matrices [N, N], batched.

The kron trades 2x-4x more FLOPs for full MXU utilization — a large net win
at these sizes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Any

import numpy as np
import jax.numpy as jnp

from lfbm5d_tpu.config import StepParams
from lfbm5d_tpu.transforms import matrices as tm


@dataclass(frozen=True)
class FlatTransforms:
    k2f: Any  # [64, 64]
    k2i: Any
    k4f: Any  # [L, L]
    k4i: Any
    stack_f: Any  # [depth, N, N]
    stack_i: Any

    @staticmethod
    def build(params: StepParams, a_h: int, a_w: int, l: int = 128,
              dtype=jnp.float32) -> "FlatTransforms":
        k = params.k
        a = a_h * a_w
        f2, i2 = tm.transform_pair(params.tau_2d, k)
        k2f = np.kron(f2, f2)
        k2i = np.kron(i2, i2)
        if params.tau_4d == "id":
            f4 = np.eye(a)
            i4 = np.eye(a)
        else:
            f4s, i4s = tm.transform_pair(params.tau_4d, a_h)
            f4t, i4t = tm.transform_pair(params.tau_4d, a_w)
            f4 = np.kron(f4s, f4t)
            i4 = np.kron(i4s, i4t)
        k4f = np.zeros((l, l))
        k4f[:a, :a] = f4
        k4i = np.zeros((l, l))
        k4i[:a, :a] = i4
        sf, si = tm.stack_matrices(params.tau_5d, params.n_sim)

        def j(x):
            return jnp.asarray(np.asarray(x), dtype=dtype)

        return FlatTransforms(
            k2f=j(k2f), k2i=j(k2i), k4f=j(k4f), k4i=j(k4i),
            stack_f=j(sf), stack_i=j(si),
        )


def forward_flat(g, lvl, t: FlatTransforms):
    """g: [B, N, 64, L]; lvl: [B] int32. Returns the 5D spectrum."""
    g = jnp.einsum("pq,bnqL->bnpL", t.k2f, g)
    g = jnp.einsum("QL,bnpL->bnpQ", t.k4f, g)
    m = t.stack_f[lvl]  # [B, N, N]
    g = jnp.einsum("bnm,bmpL->bnpL", m, g)
    return g


def inverse_flat(g, lvl, t: FlatTransforms):
    m = t.stack_i[lvl]
    g = jnp.einsum("bnm,bmpL->bnpL", m, g)
    g = jnp.einsum("QL,bnpL->bnpQ", t.k4i, g)
    g = jnp.einsum("pq,bnqL->bnpL", t.k2i, g)
    return g
