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


def test_sample_doff_matches_reference():
    """Band-DMA tile-layout sampler == per-slot table lookup + ref-lane fix."""
    from lfbm5d_tpu.kernels.gather import sample_doff

    rng = np.random.default_rng(2)
    n_tiles, refs, cpt, sc, l = 3, 2, 2, 16, 128
    bh, bw, th, tw = 24, 32, 64, 80
    c_ang = 12
    tables = rng.integers(0, 25, (refs, th, tw, l)).astype(np.int32)
    origins = np.array(
        [[0, 0], [16, 24], [40, 48]], np.int32
    )  # toy+bh<=th, tox+bw<=tw
    ref_sais = np.array([5, 9], np.int32)
    # absolute in-band positions per (tile, ref, chunk, slot)
    qy = np.zeros((n_tiles, refs, cpt, sc), np.int32)
    qx = np.zeros((n_tiles, refs, cpt, sc), np.int32)
    for t in range(n_tiles):
        qy[t] = origins[t, 0] + rng.integers(0, bh, (refs, cpt, sc))
        qx[t] = origins[t, 1] + rng.integers(0, bw, (refs, cpt, sc))
    qyx = (qy * 2048 + qx).reshape(n_tiles * refs, cpt, sc)

    out = sample_doff(
        jnp.asarray(tables), jnp.asarray(qyx), jnp.asarray(origins),
        jnp.asarray(ref_sais), bh=bh, bw=bw, c_ang=c_ang, interpret=True,
    )

    want = np.zeros((n_tiles, refs, cpt, sc, l), np.int32)
    for t in range(n_tiles):
        for r in range(refs):
            want[t, r] = tables[r, qy[t, r], qx[t, r]]
            want[t, r, ..., ref_sais[r]] = c_ang
    np.testing.assert_array_equal(
        np.asarray(out).reshape(n_tiles, refs, cpt, sc, l), want
    )


def test_sample_doff_clamps_out_of_band_slots():
    """Pad/dummy slots outside the band clamp instead of faulting."""
    from lfbm5d_tpu.kernels.gather import sample_doff

    rng = np.random.default_rng(3)
    tables = rng.integers(0, 25, (1, 32, 40, 128)).astype(np.int32)
    origins = np.array([[8, 8]], np.int32)
    bh, bw = 16, 24
    qy = np.array([[[31, 8, 0, 23, 8, 8, 8, 8]]], np.int32)  # some out of band
    qx = np.array([[[39, 8, 0, 31, 8, 8, 8, 8]]], np.int32)
    qyx = qy * 2048 + qx
    out = np.asarray(sample_doff(
        jnp.asarray(tables), jnp.asarray(qyx), jnp.asarray(origins),
        jnp.asarray([3], jnp.int32), bh=bh, bw=bw, c_ang=99, interpret=True,
    ))
    cy = np.clip(qy - 8, 0, bh - 1) + 8
    cx = np.clip(qx - 8, 0, bw - 1) + 8
    want = tables[0, cy[0], cx[0]]
    want[..., 3] = 99
    np.testing.assert_array_equal(out[0], want)
