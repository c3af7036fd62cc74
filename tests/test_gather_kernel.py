"""Pipelined-DMA row-gather kernel (kernels/gather.py), interpret mode.

Compiled-mode performance and exactness vs jnp.take are validated on-chip
by experiments/gather_kernel_probe.py; here the DMA semantics are checked
in the interpreter (small sizes — interpreted DMAs are slow).
"""

import numpy as np
import jax.numpy as jnp

from lfbm5d_tpu.kernels.gather import gather_rows


def test_gather_rows_matches_take():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.integers(0, 99, (500, 128)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 500, (77,)), jnp.int32)
    out = gather_rows(t, idx, s_chunk=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(t)[np.asarray(idx)])


def test_gather_rows_wide_table_and_exact_chunk():
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.standard_normal((200, 256)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 200, (64,)), jnp.int32)  # == s_chunk
    out = gather_rows(t, idx, s_chunk=64, depth=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(t)[np.asarray(idx)])
