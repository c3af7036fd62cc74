"""Kernel-vs-oracle parity tests (SURVEY.md §4.2.3) for the dense pipeline.

Parity caveat: exact-tie ambiguity near mirrored borders (see
lfbm5d_tpu/ops/distances.py docstring) lets a handful of angular matches
differ between any two floating-point implementations, so pixelwise parity is
asserted in quantiles plus a PSNR band, not as a max-norm.
"""

import numpy as np
import pytest

from lfbm5d_tpu.config import DenoiseParams, StepParams
from lfbm5d_tpu.lf import psnr, synthetic_lf
from lfbm5d_tpu.lf.noise import add_noise_np
from lfbm5d_tpu.oracle import oracle_denoise, oracle_ht_step
from lfbm5d_tpu.pipeline import ht_step, run_bm5d

TINY = dict(n_sim=8, n_search=4, n_disp=1, k=8, p=3)


def tiny_params(sigma=20.0, **kw):
    return DenoiseParams(
        sigma=sigma,
        ht=StepParams(tau_match=2500.0, **TINY),
        wiener=StepParams(tau_match=400.0, **TINY),
        chunk=32,
        **kw,
    )


@pytest.fixture(scope="module")
def tiny_case():
    clean = synthetic_lf(2, 2, 20, 24, channels=1, seed=0)
    noisy = add_noise_np(clean, 20.0, seed=1)
    params = tiny_params()
    oracle = oracle_denoise(noisy, params)
    return clean, noisy, params, oracle


class TestParity:
    def test_f64_matches_oracle(self, tiny_case):
        """With quantized BM distances the pipeline is exactly the oracle."""
        clean, noisy, params, (ob, of) = tiny_case
        tb, tf = run_bm5d(noisy, params, dtype="float64")
        for o, t in [(ob, np.asarray(tb)), (of, np.asarray(tf))]:
            assert np.abs(o - t).max() < 1e-9

    def test_f32_psnr_band(self, tiny_case):
        clean, noisy, params, (ob, of) = tiny_case
        tb, tf = run_bm5d(noisy, params, dtype="float32")
        p_o = psnr(np.clip(of, 0, 255), clean)
        p_t = psnr(np.clip(np.asarray(tf), 0, 255), clean)
        assert abs(p_o - p_t) < 0.05, (p_o, p_t)
        p_noisy = psnr(np.clip(noisy, 0, 255), clean)
        assert p_t > p_noisy + 3.0

    @pytest.mark.slow
    def test_config1_ht_only_3x3(self):
        """Driver config 1: 3x3 grayscale, sigma=20, HT only, DCT + Haar."""
        clean = synthetic_lf(3, 3, 24, 24, channels=1, seed=2)
        noisy = add_noise_np(clean, 20.0, seed=3)
        sp = StepParams(tau_match=2500.0, tau_2d="dct", tau_5d="haar", **{
            k: v for k, v in TINY.items() if k not in ("k",)
        })
        sigma_c = np.ones((1,)) * 20.0
        basic_o = oracle_ht_step(noisy, sigma_c, sp, 2.7)
        basic_t = np.asarray(ht_step(noisy, 20.0, sp, 2.7, "rgb", 32))
        p_o = psnr(np.clip(basic_o, 0, 255), clean)
        p_t = psnr(np.clip(basic_t, 0, 255), clean)
        assert p_t > psnr(np.clip(noisy, 0, 255), clean) + 3.0
        assert abs(p_o - p_t) < 0.05, (p_o, p_t)

    def test_rgb_opp_two_step(self):
        clean = synthetic_lf(2, 2, 18, 20, channels=3, seed=4)
        noisy = add_noise_np(clean, 25.0, seed=5)
        params = tiny_params(sigma=25.0)
        tb, tf = run_bm5d(noisy, params)
        ob, of = oracle_denoise(noisy, params)
        p_o = psnr(np.clip(of, 0, 255), clean)
        p_t = psnr(np.clip(np.asarray(tf), 0, 255), clean)
        assert abs(p_o - p_t) < 0.05, (p_o, p_t)


class TestBMDecisions:
    def test_candidate_sets_match_oracle(self):
        """Self-BM decisions match the oracle exactly; angular matches agree
        except for mirror-tie ambiguity (< 1%)."""
        import jax.numpy as jnp

        from lfbm5d_tpu.lf.pad import ind_initialize, pad_lf
        from lfbm5d_tpu.oracle.oracle import oracle_block_match
        from lfbm5d_tpu.ops.distances import (
            cross_argmin,
            displacements,
            self_distances,
        )
        from lfbm5d_tpu.ops.match import select_similar

        clean = synthetic_lf(2, 2, 20, 24, channels=1, seed=0)
        noisy = add_noise_np(clean, 20.0, seed=1)
        sp = StepParams(tau_match=2500.0, **TINY)
        padded = pad_lf(noisy, sp.pad)
        ys = ind_initialize(20, sp.k, sp.p) + sp.pad
        xs = ind_initialize(24, sp.k, sp.p) + sp.pad
        disp = displacements(sp.n_search)
        dispa = displacements(sp.n_disp)

        plane = jnp.asarray(padded[0, 0, :, :, 0])
        d = np.asarray(self_distances(plane, ys, xs, sp.k, sp.n_search))
        order, lvl, _ = select_similar(
            jnp.asarray(d), sp.n_search, sp.tau_match, sp.n_sim
        )
        order, lvl = np.asarray(order), np.asarray(lvl)
        bidx = np.asarray(
            cross_argmin(plane, jnp.asarray(padded[1, 1, :, :, 0]), sp.k, sp.n_disp)
        )

        mism_sim = tot = mism_ang = tot_ang = 0
        i = 0
        for y in ys:
            for x in xs:
                sim_o, ang_o = oracle_block_match(padded, 0, 0, int(y), int(x), sp)
                ng = 1 << int(lvl[i])
                off = disp[order[i, :ng]]
                sim_j = np.stack([y + off[:, 0], x + off[:, 1]], 1)
                tot += 1
                if sim_o.shape[0] != ng or not np.array_equal(sim_o, sim_j):
                    mism_sim += 1
                else:
                    for j in range(ng):
                        yj, xj = sim_j[j]
                        sel = dispa[bidx[yj, xj]]
                        tot_ang += 1
                        if (yj + sel[0], xj + sel[1]) != tuple(ang_o[j, 1, 1]):
                            mism_ang += 1
                i += 1
        assert mism_sim == 0, f"{mism_sim}/{tot} self-BM mismatches"
        assert mism_ang / max(tot_ang, 1) < 0.01, f"{mism_ang}/{tot_ang}"
