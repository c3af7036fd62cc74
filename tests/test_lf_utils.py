"""Unit tests for L1-equivalents: color, padding, grids, metrics, io, synth."""

import jax.numpy as jnp
import numpy as np
import pytest

from lfbm5d_tpu.lf import (
    channel_sigma_scales,
    color_matrix,
    ind_initialize,
    load_lf,
    pad_lf,
    psnr,
    rgb_to_space,
    rmse,
    save_lf,
    space_to_rgb,
    symmetric_pad,
    synthetic_lf,
)
from lfbm5d_tpu.lf.noise import add_noise_np


class TestColor:
    def test_opp_rows_unit_norm(self):
        m = color_matrix("opp")
        np.testing.assert_allclose(np.linalg.norm(m, axis=1), 1.0, atol=1e-12)
        np.testing.assert_allclose(channel_sigma_scales("opp"), 1.0, atol=1e-12)

    @pytest.mark.parametrize("space", ["opp", "yuv", "ycbcr", "rgb"])
    def test_roundtrip(self, space):
        rng = np.random.default_rng(0)
        x = rng.random((2, 2, 5, 7, 3)) * 255
        y = space_to_rgb(rgb_to_space(x, space), space)
        np.testing.assert_allclose(y, x, atol=1e-9)

    def test_noise_std_preserved_opp(self):
        rng = np.random.default_rng(1)
        noise = rng.standard_normal((100000, 3)) * 25.0
        t = rgb_to_space(noise, "opp")
        np.testing.assert_allclose(t.std(axis=0), 25.0, rtol=0.02)

    def test_grayscale_passthrough(self):
        x = np.ones((2, 2, 4, 4, 1))
        assert rgb_to_space(x, "opp") is x


class TestPad:
    def test_ind_initialize_flush(self):
        # size 20, k 8 -> last position 12; step 5 gives 0,5,10 then flush 12
        np.testing.assert_array_equal(ind_initialize(20, 8, 5), [0, 5, 10, 12])
        # exact landing: no duplicate flush
        np.testing.assert_array_equal(ind_initialize(20, 8, 4), [0, 4, 8, 12])
        np.testing.assert_array_equal(ind_initialize(8, 8, 3), [0])

    def test_symmetric_pad_2d(self):
        x = np.arange(12, dtype=float).reshape(3, 4)
        y = symmetric_pad(x, 2)
        assert y.shape == (7, 8)
        # numpy 'symmetric' reflects edge-inclusive
        np.testing.assert_array_equal(y[2:-2, 2:-2], x)
        assert y[1, 2] == x[0, 0] and y[0, 2] == x[1, 0]

    def test_pad_lf_channel_last(self):
        lf = synthetic_lf(2, 2, 12, 14, channels=3, seed=0)
        y = pad_lf(lf, 3)
        assert y.shape == (2, 2, 18, 20, 3)
        np.testing.assert_array_equal(y[:, :, 3:-3, 3:-3, :], lf)


class TestMetrics:
    def test_psnr_rmse(self):
        a = np.zeros((10, 10))
        b = np.full((10, 10), 10.0)
        assert rmse(a, b) == pytest.approx(10.0)
        assert psnr(a, b) == pytest.approx(20 * np.log10(25.5))
        assert psnr(a, a) == float("inf")

    def test_psnr_device_matches_host(self):
        from lfbm5d_tpu.lf.metrics import psnr_device

        rng = np.random.default_rng(3)
        clean = rng.random((2, 2, 64, 96, 3)) * 255.0
        pred = clean + rng.normal(0, 12.0, clean.shape)  # incl. out-of-range
        host = psnr(np.clip(pred, 0, 255), clean)
        dev = psnr_device(jnp.asarray(pred, jnp.float32), clean)
        assert dev == pytest.approx(host, abs=2e-3)
        assert psnr_device(jnp.asarray(clean, jnp.float32), clean) == float(
            "inf"
        )


class TestNoiseSynthIO:
    def test_add_noise_pinned(self):
        lf = synthetic_lf(2, 2, 64, 64, seed=3)
        n1 = add_noise_np(lf, 20.0, seed=7)
        n2 = add_noise_np(lf, 20.0, seed=7)
        np.testing.assert_array_equal(n1, n2)
        assert (n1 - lf).std() == pytest.approx(20.0, rel=0.05)

    def test_synthetic_lf_disparity(self):
        # background plane shifts by disp_bg per angular step: corner regions
        # of adjacent SAIs should correlate under that shift.
        lf = synthetic_lf(3, 3, 48, 48, disp_bg=2, disp_fg=4, seed=0)
        a = lf[1, 1, 2:10, 2:10, 0]
        b = lf[1, 2, 2:10, 0:8, 0]  # shifted by disp_bg * 1 = 2 in x
        np.testing.assert_allclose(a, b, atol=1e-9)

    def test_synthetic_lf_multi_layers(self):
        from lfbm5d_tpu.lf.synth import synthetic_lf_multi

        lf = synthetic_lf_multi(3, 3, 48, 64, 3, disps=(1.0, 2.0, 3.0),
                                seed=0, blob_frac=0.25)
        assert lf.shape == (3, 3, 48, 64, 3)
        assert lf.min() >= 0.0 and lf.max() <= 255.0
        # the three layers shift differently, so no single global shift can
        # align adjacent SAIs: residual after the BG shift must be nonzero
        # exactly where foreground blobs live, zero elsewhere
        a = lf[1, 1, :, 1:-1, 0]
        b = lf[1, 2, :, 0:-2, 0]  # undo bg disparity 1
        resid = np.abs(a - b)
        assert (resid < 1e-9).mean() > 0.1  # background visible somewhere
        assert (resid > 1e-9).mean() > 0.1  # occluders moved somewhere

    def test_synthetic_lf_multi_static_and_flat(self):
        from lfbm5d_tpu.lf.synth import synthetic_lf_multi

        # zero-disparity scene is identical across views
        lf = synthetic_lf_multi(3, 3, 24, 24, 1, disps=(0.0,), seed=1)
        np.testing.assert_array_equal(lf[0, 0], lf[2, 2])
        # texture gradient lowers contrast on the left
        lf_g = synthetic_lf_multi(3, 3, 32, 96, 1, disps=(1.0,), seed=2,
                                  texture_grad=0.8)
        left = lf_g[1, 1, :, :24, 0].std()
        right = lf_g[1, 1, :, -24:, 0].std()
        assert left < right * 0.6
        # flat_frac produces a genuinely flat strip in every view
        lf_f = synthetic_lf_multi(3, 3, 32, 64, 1, disps=(1.0,), seed=3,
                                  flat_frac=0.5)
        strip = lf_f[0, 2, :, :8, 0]
        assert strip.std() < 1e-9

    def test_synthetic_lf_multi_reproducible(self):
        from lfbm5d_tpu.lf.synth import synthetic_lf_multi

        a = synthetic_lf_multi(2, 2, 16, 16, 2, seed=5)
        b = synthetic_lf_multi(2, 2, 16, 16, 2, seed=5)
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("depth", [8, 16])
    def test_fetch_rounded_save_parity(self, tmp_path, depth):
        from lfbm5d_tpu.lf import fetch_rounded

        lf = synthetic_lf(2, 2, 16, 24, channels=3, seed=5)
        lf = lf + np.random.default_rng(0).random(lf.shape)  # fractional
        dev = jnp.asarray(lf, jnp.float32)
        d_ref, d_q = str(tmp_path / "ref"), str(tmp_path / "q")
        save_lf(np.asarray(dev), d_ref, "SAI_%02d_%02d.png", bit_depth=depth)
        save_lf(fetch_rounded(dev, depth), d_q, "SAI_%02d_%02d.png",
                bit_depth=depth)
        a = load_lf(d_ref, "SAI_%02d_%02d.png", 2, 2)
        b = load_lf(d_q, "SAI_%02d_%02d.png", 2, 2)
        np.testing.assert_array_equal(a, b)
        # host arrays pass through untouched
        np.testing.assert_array_equal(fetch_rounded(lf, depth), lf)

    def test_psnr_grid_device_matches_host(self):
        from lfbm5d_tpu.lf import psnr_grid_device

        rng = np.random.default_rng(4)
        clean = rng.random((2, 3, 24, 32, 3)) * 255.0
        pred = clean + rng.normal(0, 10.0, clean.shape)
        grid = psnr_grid_device(jnp.asarray(pred, jnp.float32), clean)
        assert grid.shape == (2, 3)
        for s in range(2):
            for t in range(3):
                host = psnr(np.clip(pred[s, t], 0, 255), clean[s, t])
                assert grid[s, t] == pytest.approx(host, abs=2e-3)

    @pytest.mark.parametrize("depth,channels", [(8, 3), (16, 1)])
    def test_io_roundtrip(self, tmp_path, depth, channels):
        lf = synthetic_lf(2, 3, 9, 11, channels=channels, seed=2)
        save_lf(lf, str(tmp_path), "SAI_%02d_%02d.png", 3, 4, bit_depth=depth)
        back = load_lf(str(tmp_path), "SAI_%02d_%02d.png", 2, 3, 3, 4)
        assert back.shape == lf.shape
        tol = 0.51 if depth == 8 else 0.51 / 256
        assert np.abs(back - lf).max() <= tol
