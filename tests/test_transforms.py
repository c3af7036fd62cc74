"""Transform library unit tests (SURVEY.md §4.2.2): forward∘inverse = identity,
orthonormality, known-vector checks against scipy.fft.dct."""

import numpy as np
import pytest
import scipy.fft

from lfbm5d_tpu.transforms import (
    bior15_matrix,
    dct_matrix,
    hadamard_matrix,
    haar_matrix,
    kaiser_window,
    stack_matrices,
    transform_pair,
)


@pytest.mark.parametrize("n", [2, 4, 8, 9, 16, 81])
def test_dct_matches_scipy(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    np.testing.assert_allclose(
        dct_matrix(n) @ x, scipy.fft.dct(x, norm="ortho"), atol=1e-12
    )


@pytest.mark.parametrize("name,n", [
    ("dct", 8), ("dct", 9), ("haar", 8), ("haar", 16),
    ("hadamard", 8), ("hadamard", 16),
])
def test_orthonormal(name, n):
    f, i = transform_pair(name, n)
    np.testing.assert_allclose(f @ f.T, np.eye(n), atol=1e-12)
    np.testing.assert_allclose(i, f.T, atol=1e-12)


@pytest.mark.parametrize("name,n", [
    ("dct", 8), ("haar", 8), ("hadamard", 16), ("bior", 8), ("id", 5),
])
def test_perfect_reconstruction(name, n):
    f, i = transform_pair(name, n)
    np.testing.assert_allclose(i @ f, np.eye(n), atol=1e-10)


def test_haar_structure(self=None):
    h = haar_matrix(4)
    np.testing.assert_allclose(h[0], 0.5 * np.ones(4), atol=1e-12)  # DC row
    # row 1 = scaled [1,1,-1,-1]
    np.testing.assert_allclose(h[1], [0.5, 0.5, -0.5, -0.5], atol=1e-12)


def test_hadamard_entries():
    h = hadamard_matrix(8)
    np.testing.assert_allclose(np.abs(h), 1 / np.sqrt(8), atol=1e-12)


def test_bior15_energy_dc():
    # A constant signal concentrates all energy in the single approximation
    # coefficient of the full-depth decomposition.
    f, _ = bior15_matrix(8)
    y = f @ np.ones(8)
    assert abs(y[0]) > 1.0
    np.testing.assert_allclose(y[1:], 0.0, atol=1e-10)


def test_stack_matrices_variable_size():
    fwd, inv = stack_matrices("haar", 16)
    assert fwd.shape == (5, 16, 16)
    rng = np.random.default_rng(1)
    for lvl, s in enumerate([1, 2, 4, 8, 16]):
        x = np.zeros(16)
        x[:s] = rng.standard_normal(s)
        garbage = x.copy()
        garbage[s:] = 1e6  # invalid slots must be killed by zero columns
        y = fwd[lvl] @ garbage
        np.testing.assert_allclose(y[s:], 0.0, atol=1e-9)
        back = inv[lvl] @ y
        np.testing.assert_allclose(back[:s], x[:s], atol=1e-10)
        np.testing.assert_allclose(back[s:], 0.0, atol=1e-9)


def test_kaiser_window_beta2():
    w = kaiser_window(8, 2.0)
    assert w.shape == (8, 8)
    # corner value of the IPOL BM3D k=8 beta=2 table: 0.1924 (SURVEY §2.10.8)
    assert w[0, 0] == pytest.approx(0.1924, abs=1e-3)
    np.testing.assert_allclose(w, w.T, atol=1e-15)


def test_group_transform_roundtrip_jax():
    import jax.numpy as jnp

    from lfbm5d_tpu.config import StepParams
    from lfbm5d_tpu.transforms import GroupTransforms
    from lfbm5d_tpu.transforms.apply import forward_5d, inverse_5d

    params = StepParams(n_sim=8, k=4, tau_2d="dct", tau_4d="dct", tau_5d="haar")
    t = GroupTransforms.build(params, a_h=3, a_w=3, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    g = rng.standard_normal((5, 8, 3, 3, 4, 4, 2))
    lvl = np.array([0, 1, 2, 3, 3], dtype=np.int32)
    gj = jnp.asarray(g)
    coeff = forward_5d(gj, jnp.asarray(lvl), t)
    back = np.asarray(inverse_5d(coeff, jnp.asarray(lvl), t))
    for b, l in enumerate(lvl):
        s = 1 << int(l)
        np.testing.assert_allclose(back[b, :s], g[b, :s], atol=1e-8)
        np.testing.assert_allclose(back[b, s:], 0.0, atol=1e-8)
