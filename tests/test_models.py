"""High-level model API tests."""

import numpy as np

from lfbm5d_tpu.config import DenoiseParams, SRParams, StepParams
from lfbm5d_tpu.lf import synthetic_lf
from lfbm5d_tpu.lf.noise import add_noise_np
from lfbm5d_tpu.models import LFDenoiser, LFSuperResolver

TINY = dict(n_sim=8, n_search=4, n_disp=1, k=8, p=3)


def test_denoiser_model():
    clean = synthetic_lf(2, 2, 20, 24, channels=1, seed=0)
    noisy = add_noise_np(clean, 20.0, seed=1)
    den = LFDenoiser(DenoiseParams(
        sigma=20.0, ht=StepParams(**TINY),
        wiener=StepParams(tau_match=400.0, **TINY), chunk=32))
    rep = den.evaluate(noisy, clean)
    assert rep["psnr_final_db"] > rep["psnr_noisy_db"] + 3.0
    out = den.denoise(noisy)
    assert out.shape == clean.shape and isinstance(out, np.ndarray)


def test_sr_model():
    import jax.numpy as jnp

    from lfbm5d_tpu.lf.resize import downsample

    clean = synthetic_lf(2, 2, 32, 32, channels=1, seed=1)
    lr = np.asarray(downsample(jnp.asarray(clean), 2))
    sr = LFSuperResolver(SRParams(
        scale=2, n_iter=2, sigma_init=6.0, sigma_final=2.0,
        ht=StepParams(**TINY), wiener=StepParams(tau_match=400.0, **TINY),
        chunk=32))
    hr = sr.upscale(lr)
    assert hr.shape == clean.shape
