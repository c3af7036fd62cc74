"""Sanity tests for the float64 oracle (the correctness anchor, SURVEY §4.2)."""

import numpy as np
import pytest

from lfbm5d_tpu.config import DenoiseParams, StepParams
from lfbm5d_tpu.lf import psnr, synthetic_lf
from lfbm5d_tpu.lf.noise import add_noise_np
from lfbm5d_tpu.lf.pad import pad_lf
from lfbm5d_tpu.oracle import oracle_block_match, oracle_denoise, oracle_ht_step

TINY = dict(n_sim=8, n_search=4, n_disp=1, k=8, p=3)


def tiny_params(sigma=20.0, **kw):
    ht = StepParams(tau_match=2500.0, **TINY)
    wien = StepParams(tau_match=400.0, **TINY)
    return DenoiseParams(sigma=sigma, ht=ht, wiener=wien, **kw)


class TestOracle:
    def test_denoise_improves_psnr(self):
        clean = synthetic_lf(2, 2, 20, 24, channels=1, seed=0)
        noisy = add_noise_np(clean, 20.0, seed=1)
        params = tiny_params(sigma=20.0)
        basic, final = oracle_denoise(noisy, params)
        p_noisy = psnr(np.clip(noisy, 0, 255), clean)
        p_basic = psnr(np.clip(basic, 0, 255), clean)
        p_final = psnr(np.clip(final, 0, 255), clean)
        assert p_basic > p_noisy + 3.0, (p_noisy, p_basic)
        assert p_final > p_noisy + 3.0, (p_noisy, p_final)

    def test_constant_lf_fixed_point(self):
        clean = np.full((2, 2, 18, 18, 1), 100.0)
        params = tiny_params(sigma=10.0)
        sigma_c = np.ones((1,)) * 10.0
        basic = oracle_ht_step(clean, sigma_c, params.ht, params.lambda_3d)
        # DC coefficient survives the threshold; constant signal is preserved.
        np.testing.assert_allclose(basic, 100.0, atol=1e-8)

    def test_rgb_roundtrip_shapes(self):
        clean = synthetic_lf(2, 2, 18, 20, channels=3, seed=2)
        noisy = add_noise_np(clean, 25.0, seed=3)
        params = tiny_params(sigma=25.0)
        basic, final = oracle_denoise(noisy, params)
        assert basic.shape == clean.shape
        assert final.shape == clean.shape
        assert psnr(np.clip(final, 0, 255), clean) > psnr(
            np.clip(noisy, 0, 255), clean
        )


class TestOracleBlockMatch:
    def test_angular_match_recovers_disparity(self):
        # Clean two-plane LF with integer disparity 1 on the background:
        # the best angular match for a background patch in SAI (s,t) sits at
        # the co-located position shifted by disparity * angular offset.
        clean = synthetic_lf(3, 3, 32, 32, channels=1, disp_bg=1, disp_fg=1, seed=4)
        sp = StepParams(n_sim=4, n_search=2, n_disp=2, k=8, p=3)
        padded = pad_lf(clean, sp.pad)
        # patch in the corner (background region), away from the ellipse
        y = x = sp.pad + 1
        sim_pos, ang_pos = oracle_block_match(padded, 1, 1, y, x, sp)
        assert 1 <= sim_pos.shape[0] <= 4
        # ref SAI entry equals the similar-patch position itself
        np.testing.assert_array_equal(ang_pos[0, 1, 1], [y, x])
        # neighbors: disparity 1 per angular step (sign per synth convention)
        dy = ang_pos[0, 2, 1][0] - y
        dx = ang_pos[0, 1, 2][1] - x
        assert abs(dy) == 1 and abs(dx) == 1

    def test_tau_match_truncates_stack(self):
        rng = np.random.default_rng(5)
        lf = rng.random((1, 1, 24, 24, 1)) * 255  # pure noise, no structure
        sp = StepParams(n_sim=8, n_search=3, n_disp=1, k=8, p=3, tau_match=1e-6)
        padded = pad_lf(lf, sp.pad)
        sim_pos, ang_pos = oracle_block_match(padded, 0, 0, sp.pad, sp.pad, sp)
        # only the self patch survives a vanishing threshold
        assert sim_pos.shape[0] == 1
        np.testing.assert_array_equal(sim_pos[0], [sp.pad, sp.pad])
