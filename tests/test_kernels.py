"""Unit tests for the Pallas group kernels (interpret mode on CPU).

The same kernels were validated on real TPU hardware (v5 lite) during
development; these tests pin the semantics via the Pallas interpreter.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lfbm5d_tpu.kernels.accumulate import accumulate_groups
from lfbm5d_tpu.kernels.extract import extract_groups

K, ND = 8, 2
SK = K + 2 * ND
NSEL = 2 * ND + 1


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    n_t, bh, bw, l = 2, 32, 40, 128
    n_c, sc = 2, 8
    bands = rng.random((n_t, bh, bw, l)).astype(np.float32)
    sy = rng.integers(0, bh - SK, (n_t, n_c, sc)).astype(np.int32)
    sx = rng.integers(0, bw - SK, (n_t, n_c, sc)).astype(np.int32)
    doff = rng.integers(0, NSEL**2, (n_t, n_c, sc, l)).astype(np.int32)
    return bands, sy, sx, doff


def test_extract_matches_numpy(case):
    bands, sy, sx, doff = case
    n_t, bh, bw, l = bands.shape
    n_c, sc = sy.shape[1], sy.shape[2]
    out = np.asarray(
        extract_groups(
            jnp.asarray(bands), jnp.asarray(sy), jnp.asarray(sx),
            jnp.asarray(doff), K, ND, interpret=True,
        )
    )
    for t in range(n_t):
        for c in range(n_c):
            for s in range(sc):
                y, x = sy[t, c, s], sx[t, c, s]
                for lane in (0, 63, 127):
                    d = doff[t, c, s, lane]
                    dy, dx = d // NSEL, d % NSEL
                    want = bands[t, y + dy : y + dy + K, x + dx : x + dx + K, lane]
                    got = out[t, c, s * 64 : (s + 1) * 64, lane].reshape(K, K)
                    np.testing.assert_allclose(got, want)


def test_accumulate_matches_numpy(case):
    bands, sy, sx, doff = case
    n_t, bh, bw, l = bands.shape
    n_c, sc = sy.shape[1], sy.shape[2]
    rng = np.random.default_rng(1)
    vals = rng.random((n_t, n_c, sc * 64, l)).astype(np.float32)
    acc = np.asarray(
        accumulate_groups(
            jnp.asarray(vals), jnp.asarray(sy), jnp.asarray(sx),
            jnp.asarray(doff), bh, bw, K, ND, interpret=True,
        )
    )
    ref = np.zeros((n_t, bh, bw, l))
    for t in range(n_t):
        for c in range(n_c):
            for s in range(sc):
                y, x = sy[t, c, s], sx[t, c, s]
                p = vals[t, c, s * 64 : (s + 1) * 64].reshape(K, K, l)
                for lane in range(l):
                    d = doff[t, c, s, lane]
                    dy, dx = d // NSEL, d % NSEL
                    ref[t, y + dy : y + dy + K, x + dx : x + dx + K, lane] += (
                        p[:, :, lane]
                    )
    np.testing.assert_allclose(acc, ref, rtol=1e-5, atol=1e-4)


def test_extract_accumulate_roundtrip(case):
    """accumulate(extract(x)) touches each source pixel with multiplicity
    equal to its coverage; a constant band stays piecewise-proportional."""
    bands, sy, sx, doff = case
    n_t, bh, bw, l = bands.shape
    ones = jnp.ones_like(jnp.asarray(bands))
    grp = extract_groups(ones, jnp.asarray(sy), jnp.asarray(sx),
                         jnp.asarray(doff), K, ND, interpret=True)
    acc = accumulate_groups(grp, jnp.asarray(sy), jnp.asarray(sx),
                            jnp.asarray(doff), bh, bw, K, ND, interpret=True)
    # total mass conserved: every extracted pixel scattered exactly once
    assert float(jnp.sum(acc)) == pytest.approx(
        sy.shape[0] * sy.shape[1] * sy.shape[2] * 64 * l, rel=1e-6
    )


def test_fused_accumulate_refs_matches_two_call_reference(case):
    """accumulate_groups_fused with refs>1 == per-ref plain accumulate
    calls summed (num) + the materialized den path, bit-for-bit."""
    from lfbm5d_tpu.kernels.accumulate import accumulate_groups_fused
    from lfbm5d_tpu.transforms import matrices as tm

    bands, sy, sx, doff = case
    n_t, bh, bw, l = bands.shape
    n_c, sc = sy.shape[1], sy.shape[2]
    refs, planes = 2, 1
    rng = np.random.default_rng(2)
    # metadata per (tile, ref); vals/weights per (tile, plane, ref)
    sy_r = rng.integers(0, bh - SK, (n_t * refs, n_c, sc)).astype(np.int32)
    sx_r = rng.integers(0, bw - SK, (n_t * refs, n_c, sc)).astype(np.int32)
    doff_r = rng.integers(0, NSEL**2, (n_t * refs, n_c, sc, l)).astype(np.int32)
    vals = rng.random((n_t * planes * refs, n_c, sc * 64, l)).astype(np.float32)
    wv = rng.random((n_t * planes * refs, n_c, sc)).astype(np.float32)
    kaiser = np.asarray(tm.kaiser_window(K), dtype=np.float32)

    num_f, den_f = accumulate_groups_fused(
        jnp.asarray(vals), jnp.asarray(wv), kaiser, jnp.asarray(sy_r),
        jnp.asarray(sx_r), jnp.asarray(doff_r), bh, bw, K, ND,
        planes=planes, refs=refs, interpret=True,
    )
    num_f, den_f = np.asarray(num_f), np.asarray(den_f)
    assert num_f.shape == (n_t * planes, bh, bw, l)

    # reference: one plain accumulate per ref, summed; den via materialized
    # weight*kaiser vals (lane-broadcast)
    num_ref = np.zeros((n_t * planes, bh, bw, l), np.float32)
    den_ref = np.zeros((n_t * planes, bh, bw, l), np.float32)
    kf = kaiser.reshape(-1)
    for r in range(refs):
        v_r = vals.reshape(n_t, planes, refs, n_c, sc * 64, l)[:, :, r]
        w_r = wv.reshape(n_t, planes, refs, n_c, sc)[:, :, r]
        dv = np.broadcast_to(
            w_r[..., None, None] * kf[None, None, None, None, :, None],
            (n_t, planes, n_c, sc, 64, l),
        ).reshape(n_t * planes, n_c, sc * 64, l).astype(np.float32)
        m = slice(r, n_t * refs, refs)  # ref r's metadata rows
        num_ref += np.asarray(accumulate_groups(
            jnp.asarray(v_r.reshape(n_t * planes, n_c, sc * 64, l)),
            jnp.asarray(sy_r[m]), jnp.asarray(sx_r[m]), jnp.asarray(doff_r[m]),
            bh, bw, K, ND, planes=planes, interpret=True,
        ))
        den_ref += np.asarray(accumulate_groups(
            jnp.asarray(dv), jnp.asarray(sy_r[m]), jnp.asarray(sx_r[m]),
            jnp.asarray(doff_r[m]), bh, bw, K, ND, planes=planes,
            interpret=True,
        ))
    np.testing.assert_allclose(num_f, num_ref, rtol=1e-6)
    np.testing.assert_allclose(den_f, den_ref, rtol=1e-6)
