"""Flat (A-on-lanes) transform layout vs the reference einsum layout."""

import numpy as np
import jax.numpy as jnp

from lfbm5d_tpu.config import StepParams
from lfbm5d_tpu.transforms import GroupTransforms
from lfbm5d_tpu.transforms.apply import forward_5d, inverse_5d
from lfbm5d_tpu.transforms.flat import FlatTransforms, forward_flat, inverse_flat


def test_flat_matches_reference_layout():
    params = StepParams(n_sim=8, k=4, tau_2d="dct", tau_4d="dct", tau_5d="haar")
    a_h, a_w, k, n = 3, 3, 4, 8
    lanes = 16  # a = 9 -> rounded to sublane multiple
    rng = np.random.default_rng(0)
    b = 5
    g_ref = rng.standard_normal((b, n, a_h, a_w, k, k, 1))
    lvl = jnp.asarray(np.array([0, 1, 2, 3, 3], dtype=np.int32))

    gt = GroupTransforms.build(params, a_h, a_w, dtype=jnp.float64)
    spec_ref = np.asarray(forward_5d(jnp.asarray(g_ref), lvl, gt))

    # same data in flat layout [B, N, k*k, lanes]
    g_flat = np.zeros((b, n, k * k, lanes))
    g_flat[..., : a_h * a_w] = (
        g_ref[..., 0].transpose(0, 1, 4, 5, 2, 3).reshape(b, n, k * k, a_h * a_w)
    )
    ft = FlatTransforms.build(params, a_h, a_w, lanes, dtype=jnp.float64)
    spec_flat = np.asarray(forward_flat(jnp.asarray(g_flat), lvl, ft))

    want = (
        spec_ref[..., 0].transpose(0, 1, 4, 5, 2, 3).reshape(b, n, k * k, -1)
    )
    np.testing.assert_allclose(spec_flat[..., : a_h * a_w], want, atol=1e-10)
    np.testing.assert_allclose(spec_flat[..., a_h * a_w :], 0.0, atol=1e-10)

    back = np.asarray(inverse_flat(jnp.asarray(spec_flat), lvl, ft))
    for bi, l in enumerate(np.asarray(lvl)):
        s = 1 << int(l)
        np.testing.assert_allclose(
            back[bi, :s, :, : a_h * a_w], g_flat[bi, :s, :, : a_h * a_w],
            atol=1e-10,
        )
