"""Direct unit tests for the shared per-lane (dy, dx) mux (kernels/mux.py).

The mux is the round-4 select-level diet shared by every group kernel
(fused, banked-fused, extract, accumulate); until now it was covered only
indirectly through kernel-vs-oracle parity. These tests pin its contract
against a brute-force per-lane reference: for every lane l with disparity
index d[l] = dy*nsel + dx, selection reads the k x k window at offset
(dy, dx) of the superpatch and placement writes it back there; sentinel
lanes (d == sent = nsel*nsel) produce/carry exact zeros.

Reference parity: SURVEY.md section 2.10 (group gather/scatter semantics);
the mux is pure instruction scheduling of that spec.
"""

import numpy as np
import pytest

from lfbm5d_tpu.kernels.mux import mux_dydx, mux_place, mux_select


def _ref_select(sup, d, k, nsel, sent):
    sk, _, L = sup.shape
    out = np.zeros((k, k, L), sup.dtype)
    for l in range(L):
        if d[l] >= sent:
            continue
        dy, dx = d[l] // nsel, d[l] % nsel
        out[:, :, l] = sup[dy:dy + k, dx:dx + k, l]
    return out


def _ref_place(patch, d, k, sk, nsel, sent):
    L = patch.shape[-1]
    out = np.zeros((sk, sk, L), patch.dtype)
    for l in range(L):
        # sentinel lanes clamp to the default level (nsel-1, nsel-1);
        # the contract requires their values to be exact zeros, so the
        # placement position is invisible
        dd = min(d[l], sent - 1)
        dy, dx = dd // nsel, dd % nsel
        out[dy:dy + k, dx:dx + k, l] = patch[:, :, l]
    return out


@pytest.mark.parametrize("k,nsel", [(8, 3), (8, 5), (4, 3), (16, 2), (8, 1)])
def test_mux_select_matches_bruteforce(k, nsel):
    rng = np.random.default_rng(0)
    sent = nsel * nsel
    sk = k + nsel - 1
    L = max(24, sent + 2)
    sup = rng.normal(size=(sk, sk, L)).astype(np.float32)
    # cover every (dy, dx) level plus sentinel lanes
    d = rng.integers(0, sent + 1, size=L).astype(np.int32)
    d[:sent + 1] = np.arange(sent + 1)
    got = np.asarray(mux_select(sup, d, k, nsel, sent))
    np.testing.assert_array_equal(got, _ref_select(sup, d, k, nsel, sent))


@pytest.mark.parametrize("k,nsel", [(8, 3), (8, 5), (4, 3), (8, 1)])
def test_mux_place_matches_bruteforce(k, nsel):
    rng = np.random.default_rng(1)
    sent = nsel * nsel
    sk = k + 2 * (nsel - 1)  # aggregate-side superpatch is wider
    L = max(24, sent + 2)
    patch = rng.normal(size=(k, k, L)).astype(np.float32)
    d = rng.integers(0, sent + 1, size=L).astype(np.int32)
    d[:sent + 1] = np.arange(sent + 1)
    # contract: sentinel lanes carry exact-zero values
    patch[:, :, d >= sent] = 0.0
    dy, dx = mux_dydx(d, nsel, sent)
    got = np.asarray(mux_place(patch, dy, dx, k, sk, nsel))
    np.testing.assert_array_equal(got, _ref_place(patch, d, k, sk, nsel, sent))


def test_mux_roundtrip_identity_on_live_lanes():
    """place(select(sup)) restores each live lane's window; select(place(p))
    is exactly p for every non-sentinel lane."""
    rng = np.random.default_rng(2)
    k, nsel = 8, 3
    sent = nsel * nsel
    sk = k + 2 * (nsel - 1)
    L = 16
    patch = rng.normal(size=(k, k, L)).astype(np.float32)
    d = (np.arange(L) % (sent + 1)).astype(np.int32)
    patch[:, :, d >= sent] = 0.0
    dy, dx = mux_dydx(d, nsel, sent)
    sup = np.asarray(mux_place(patch, dy, dx, k, sk, nsel))
    back = np.asarray(mux_select(sup, d, k, nsel, sent))
    np.testing.assert_array_equal(back, patch)


def test_mux_dydx_sentinel_clamps_to_default_level():
    nsel = 3
    sent = nsel * nsel
    d = np.array([0, 4, sent, sent], np.int32)
    dy, dx = mux_dydx(d, nsel, sent)
    assert dy.shape == (1, 1, 4) and dx.shape == (1, 1, 4)
    np.testing.assert_array_equal(np.ravel(dy), [0, 1, nsel - 1, nsel - 1])
    np.testing.assert_array_equal(np.ravel(dx), [0, 1, nsel - 1, nsel - 1])
