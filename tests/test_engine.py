"""Pallas-engine vs XLA-path equivalence (interpret mode on CPU).

The engines share BM decisions exactly (quantized-distance spec); outputs
differ only by float reassociation in the kron-vs-separable transforms.
"""

import numpy as np
import pytest

from lfbm5d_tpu.config import DenoiseParams, StepParams
from lfbm5d_tpu.lf import psnr, synthetic_lf
from lfbm5d_tpu.lf.noise import add_noise_np
from lfbm5d_tpu.pipeline import run_bm5d

TINY = dict(n_sim=8, n_search=4, n_disp=1, k=8, p=3)


def params(sigma=20.0, **kw):
    return DenoiseParams(
        sigma=sigma,
        ht=StepParams(tau_match=2500.0, **TINY),
        wiener=StepParams(tau_match=400.0, **TINY),
        chunk=32,
        **kw,
    )


@pytest.mark.slow
def test_pallas_engine_f64_matches_oracle():
    """The kernel path is oracle-exact, not merely xla-path-equivalent."""
    from lfbm5d_tpu.oracle import oracle_denoise

    clean = synthetic_lf(2, 2, 20, 24, channels=1, seed=0)
    noisy = add_noise_np(clean, 20.0, seed=1)
    p = params()
    ob, of = oracle_denoise(noisy, p)
    bp, fp = run_bm5d(noisy, p, dtype="float64", engine="pallas")
    assert np.abs(ob - np.asarray(bp)).max() < 1e-9
    assert np.abs(of - np.asarray(fp)).max() < 1e-9


@pytest.mark.slow
def test_engines_agree_gray():
    clean = synthetic_lf(2, 2, 20, 24, channels=1, seed=0)
    noisy = add_noise_np(clean, 20.0, seed=1)
    p = params()
    bx, fx = run_bm5d(noisy, p, engine="xla")
    bp, fp = run_bm5d(noisy, p, engine="pallas")
    for a, b in [(bx, bp), (fx, fp)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


@pytest.mark.slow
def test_engines_agree_rgb_opp():
    clean = synthetic_lf(2, 2, 18, 20, channels=3, seed=2)
    noisy = add_noise_np(clean, 25.0, seed=3)
    p = params(sigma=25.0)
    _, fx = run_bm5d(noisy, p, engine="xla")
    _, fp = run_bm5d(noisy, p, engine="pallas")
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fp), atol=2e-3)
    clean_psnr = psnr(np.clip(np.asarray(fp), 0, 255), clean)
    assert clean_psnr > psnr(np.clip(noisy, 0, 255), clean) + 2.0


@pytest.mark.slow
def test_engine_bior_hadamard_variant():
    """Config-3 transform stack through the kernel engine."""
    clean = synthetic_lf(2, 2, 20, 20, channels=1, seed=4)
    noisy = add_noise_np(clean, 20.0, seed=5)
    var = dict(TINY, **{})
    p = DenoiseParams(
        sigma=20.0,
        ht=StepParams(tau_match=2500.0, tau_2d="bior", tau_5d="hadamard", **var),
        wiener=StepParams(tau_match=400.0, tau_2d="bior", tau_5d="hadamard", **var),
        chunk=32,
    )
    _, fx = run_bm5d(noisy, p, engine="xla")
    _, fp = run_bm5d(noisy, p, engine="pallas")
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fp), atol=5e-3)


@pytest.mark.slow
def test_engines_agree_banked_beyond_128_sais():
    """Angular grids >128 SAIs run lane-BANKED through the kernels (the
    17x17 HCI shape, SURVEY.md §5.7): extract/accumulate per 128-lane bank,
    banks joined on the lane axis for the angular transform. In f64 the
    banked path must agree with the XLA path to reassociation-free
    precision."""
    tiny = dict(n_sim=4, n_search=2, n_disp=1, k=4, p=3)
    p = DenoiseParams(
        sigma=20.0,
        ht=StepParams(tau_match=2500.0, **tiny),
        wiener=StepParams(tau_match=400.0, **tiny),
        chunk=32,
    )
    clean = synthetic_lf(12, 12, 14, 14, channels=1, seed=0)  # 144 SAIs
    noisy = add_noise_np(clean, 20.0, seed=1)
    bx, fx = run_bm5d(noisy, p, dtype="float64", engine="xla")
    bp, fp = run_bm5d(noisy, p, dtype="float64", engine="pallas")
    assert np.abs(np.asarray(bx) - np.asarray(bp)).max() < 1e-9
    assert np.abs(np.asarray(fx) - np.asarray(fp)).max() < 1e-9


@pytest.mark.slow
def test_fused_engine_matches_unfused_3x3_f64():
    """The fused single-kernel path vs the two-kernel path, f64-exact.

    Uses a 3x3 angular grid: angular DCT matrices are asymmetric for grids
    beyond 2x2, which catches transposed-matrix bugs in the in-kernel
    matmul chain (a real round-2 bug: every 2x2-grid test passed while 3x3
    diverged), plus multiple tiles/chunks and a dummy ref block (9 SAIs do
    not divide the ref batch).
    """
    import jax.numpy as jnp

    from lfbm5d_tpu.pipeline.denoise import (
        _build_step, _flat_pad, _sigma_channels,
    )
    from lfbm5d_tpu.pipeline.engine import build_kernel_step

    sp = StepParams(tau_match=2500.0, n_sim=8, n_search=4, n_disp=1, k=8, p=3)
    ah, aw, h, w, c = 3, 3, 48, 64, 1
    clean = synthetic_lf(ah, aw, h, w, channels=1, seed=0)
    noisy = add_noise_np(clean, 25.0, seed=1)
    xp = _flat_pad(jnp.asarray(noisy, jnp.float64), sp.pad)
    sig = _sigma_channels(25.0, "rgb", c, "float64")

    fx = _build_step(sp, 2.7, ah, aw, h, w, c, 32, False, "float64")
    args = (sp, 2.7, ah, aw, h, w, c, False, "float64")
    f_fused = build_kernel_step(*args, interpret=True, fused=True)
    f_two = build_kernel_step(*args, interpret=True, fused=False)
    nx, dx = fx(xp, xp, sig, None)
    nf, df = f_fused(xp, xp, sig, None)
    nt, dt_ = f_two(xp, xp, sig, None)
    assert np.abs(np.asarray(nx) - np.asarray(nf)).max() < 1e-9
    assert np.abs(np.asarray(dx) - np.asarray(df)).max() < 1e-12
    assert np.abs(np.asarray(nt) - np.asarray(nf)).max() < 1e-9


@pytest.mark.slow
def test_direct_doff_sampler_matches_take_f64():
    """doff via the band-DMA sampler (kernels/gather.py sample_doff) vs the
    jnp.take formulation, exact in f64 on both engine paths.

    Same 3x3 shape as the fused/unfused test: multiple tiles/chunks, a
    dummy ref block, and pad slots — the cases where the sampler's clamped
    out-of-band reads must stay invisible (sentinel/zero-weight masked)."""
    import jax.numpy as jnp

    from lfbm5d_tpu.pipeline.denoise import _flat_pad, _sigma_channels
    from lfbm5d_tpu.pipeline.engine import build_kernel_step

    sp = StepParams(tau_match=2500.0, n_sim=8, n_search=4, n_disp=1, k=8, p=3)
    ah, aw, h, w, c = 3, 3, 48, 64, 1
    clean = synthetic_lf(ah, aw, h, w, channels=1, seed=0)
    noisy = add_noise_np(clean, 25.0, seed=1)
    xp = _flat_pad(jnp.asarray(noisy, jnp.float64), sp.pad)
    sig = _sigma_channels(25.0, "rgb", c, "float64")

    args = (sp, 2.7, ah, aw, h, w, c, False, "float64")
    for fused in (True, False):
        f_take = build_kernel_step(*args, interpret=True, fused=fused)
        f_dir = build_kernel_step(*args, interpret=True, fused=fused,
                                  doff_mode="direct")
        nt, dt_ = f_take(xp, xp, sig, None)
        nd_, dd = f_dir(xp, xp, sig, None)
        assert np.abs(np.asarray(nt) - np.asarray(nd_)).max() < 1e-12
        assert np.abs(np.asarray(dt_) - np.asarray(dd)).max() < 1e-12


@pytest.mark.slow
def test_fused_engine_wiener_3x3_f64():
    """Two-step fused vs XLA on a 3x3 grid in f64 (Wiener + dual groups)."""
    p = params()
    clean = synthetic_lf(3, 3, 20, 24, channels=1, seed=6)
    noisy = add_noise_np(clean, 20.0, seed=7)
    bx, fx = run_bm5d(noisy, p, dtype="float64", engine="xla")
    bp, fp = run_bm5d(noisy, p, dtype="float64", engine="pallas")
    assert np.abs(np.asarray(bx) - np.asarray(bp)).max() < 1e-9
    assert np.abs(np.asarray(fx) - np.asarray(fp)).max() < 1e-9


@pytest.mark.slow
def test_bf16_group_path_psnr():
    """pallas_bf16: bands/mux/matmuls in bfloat16, BM + shrink math +
    accumulators in f32. Interpret mode; quality bar: within 0.1 dB of the
    f32 engine on a small LF (the 0.05 dB budget is checked on-chip at
    bench scale, BASELINE.md)."""
    clean = synthetic_lf(3, 3, 32, 40, channels=3, seed=8)
    noisy = add_noise_np(clean, 25.0, seed=9)
    p = params(sigma=25.0)
    _, f32 = run_bm5d(noisy, p, engine="pallas")
    _, bf16 = run_bm5d(noisy, p, engine="pallas_bf16")
    ps_f32 = psnr(np.clip(np.asarray(f32), 0, 255), clean)
    ps_bf16 = psnr(np.clip(np.asarray(bf16), 0, 255), clean)
    assert abs(ps_f32 - ps_bf16) < 0.1, (ps_f32, ps_bf16)


@pytest.mark.slow
def test_launched_execution_matches_single_program():
    """Multi-launch execution (one ref-block per device launch,
    device-resident accumulators) must equal the single-program path —
    the mode big configs use because one program covering a full-size
    default-parameter run faults the device."""
    from lfbm5d_tpu.pipeline.denoise import _run_bm5d_launched

    clean = synthetic_lf(3, 3, 32, 40, channels=3, seed=12)
    noisy = add_noise_np(clean, 25.0, seed=13)
    p = params(sigma=25.0)
    import jax.numpy as jnp

    # f64: the two paths are semantically identical (same BM decisions,
    # same per-slot arithmetic); in f32 their different jit boundaries
    # reassociate the cross-ref accumulations at ~3e-4 relative (seen when
    # the round-5 r_cap change regrouped the ref blocks), which is float
    # noise, not divergence — f64 pins the identity exactly.
    b1, f1 = run_bm5d(noisy, p, dtype="float64", engine="pallas")
    b2, f2 = _run_bm5d_launched(jnp.asarray(noisy, jnp.float64), p,
                                "float64", None)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-9)


@pytest.mark.slow
def test_unfused_banked_path_still_exact():
    """The two-kernel banked path (now the fallback for >384-SAI grids)
    stays f64-exact when selected explicitly."""
    import jax.numpy as jnp

    from lfbm5d_tpu.pipeline.denoise import (
        _build_step, _flat_pad, _sigma_channels,
    )
    from lfbm5d_tpu.pipeline.engine import build_kernel_step

    sp = StepParams(tau_match=2500.0, n_sim=4, n_search=2, n_disp=1, k=4, p=3)
    ah, aw, h, w, c = 12, 12, 14, 14, 1  # 144 SAIs = 2 banks
    clean = synthetic_lf(ah, aw, h, w, channels=1, seed=0)
    noisy = add_noise_np(clean, 20.0, seed=1)
    xp = _flat_pad(jnp.asarray(noisy, jnp.float64), sp.pad)
    sig = _sigma_channels(20.0, "rgb", c, "float64")
    fx = _build_step(sp, 2.7, ah, aw, h, w, c, 32, False, "float64")
    f_two = build_kernel_step(
        sp, 2.7, ah, aw, h, w, c, False, "float64",
        interpret=True, fused=False,
    )
    nx, dx = fx(xp, xp, sig, None)
    nt, dt_ = f_two(xp, xp, sig, None)
    assert np.abs(np.asarray(nx) - np.asarray(nt)).max() < 1e-9


@pytest.mark.slow
def test_p_ang_ref_subsampling_oracle_exact():
    """p_ang > 1 (reference-SAI subsampling, the round-3 algorithmic
    reformulation): both engines must match the f64 oracle exactly, and the
    ref grid must keep the boundary-flush semantics (3x3 grid at p_ang=2 ->
    corners+edges+center = 2x2 ref grid positions {0,2})."""
    from lfbm5d_tpu.lf.pad import ref_sai_grid
    from lfbm5d_tpu.oracle import oracle_denoise

    np.testing.assert_array_equal(ref_sai_grid(3, 3, 2), [0, 2, 6, 8])
    np.testing.assert_array_equal(ref_sai_grid(3, 3, 1), np.arange(9))
    np.testing.assert_array_equal(ref_sai_grid(4, 3, 3), [0, 2, 9, 11])

    tiny2 = dict(TINY, p_ang=2)
    p = DenoiseParams(
        sigma=20.0,
        ht=StepParams(tau_match=2500.0, **tiny2),
        wiener=StepParams(tau_match=400.0, **tiny2),
        chunk=32,
    )
    clean = synthetic_lf(3, 3, 20, 24, channels=1, seed=10)
    noisy = add_noise_np(clean, 20.0, seed=11)
    ob, of = oracle_denoise(noisy, p)
    bx, fx = run_bm5d(noisy, p, dtype="float64", engine="xla")
    bp, fp = run_bm5d(noisy, p, dtype="float64", engine="pallas")
    assert np.abs(ob - np.asarray(bx)).max() < 1e-9
    assert np.abs(of - np.asarray(fx)).max() < 1e-9
    assert np.abs(ob - np.asarray(bp)).max() < 1e-9
    assert np.abs(of - np.asarray(fp)).max() < 1e-9
    # subsampled refs still cover every SAI's output (den > 0 everywhere
    # away from boundary effects): the denoised LF must beat noisy PSNR
    assert psnr(np.clip(np.asarray(fp), 0, 255), clean) > psnr(
        np.clip(noisy, 0, 255), clean
    )


@pytest.mark.slow
def test_banked_fused_runner_matches_xla_f64():
    """_run_bm5d_banked_fused (per-step jits around the banked-FUSED
    kernel, the on-TPU routing for 129..384-SAI grids) must reproduce the
    XLA path exactly in f64, including the color/pad/finalize glue it
    dispatches between the step programs."""
    import jax.numpy as jnp

    from lfbm5d_tpu.pipeline.denoise import _run_bm5d_banked_fused

    tiny = dict(n_sim=4, n_search=2, n_disp=1, k=4, p=3)
    p = DenoiseParams(
        sigma=20.0,
        ht=StepParams(tau_match=2500.0, **tiny),
        wiener=StepParams(tau_match=400.0, **tiny),
        chunk=32,
    )
    clean = synthetic_lf(12, 12, 14, 14, channels=3, seed=14)  # 144 SAIs
    noisy = add_noise_np(clean, 20.0, seed=15)
    bx, fx = run_bm5d(noisy, p, dtype="float64", engine="xla")
    bb, fb = _run_bm5d_banked_fused(
        jnp.asarray(noisy, jnp.float64), p, "float64"
    )
    assert np.abs(np.asarray(bx) - np.asarray(bb)).max() < 1e-9
    assert np.abs(np.asarray(fx) - np.asarray(fb)).max() < 1e-9


@pytest.mark.slow
def test_banked_fused_p_ang_matches_xla_f64():
    """Banked grid × p_ang subsampling — the exact configuration class the
    17×17 `matched` headline row runs (BASELINE.md round-3 preset table:
    one banked-fused program at 51k slots/step). The banked runner with
    p_ang=4 must reproduce the XLA path (itself oracle-exact) in f64."""
    import jax.numpy as jnp

    from lfbm5d_tpu.pipeline.denoise import _run_bm5d_banked_fused

    tiny = dict(n_sim=4, n_search=2, n_disp=1, k=4, p=3, p_ang=4)
    p = DenoiseParams(
        sigma=20.0,
        ht=StepParams(tau_match=2500.0, **tiny),
        wiener=StepParams(tau_match=400.0, **tiny),
        chunk=32,
    )
    clean = synthetic_lf(12, 12, 14, 14, channels=1, seed=16)  # 144 SAIs
    noisy = add_noise_np(clean, 20.0, seed=17)
    bx, fx = run_bm5d(noisy, p, dtype="float64", engine="xla")
    bb, fb = _run_bm5d_banked_fused(
        jnp.asarray(noisy, jnp.float64), p, "float64"
    )
    assert np.abs(np.asarray(bx) - np.asarray(bb)).max() < 1e-9
    assert np.abs(np.asarray(fx) - np.asarray(fb)).max() < 1e-9
    # subsampled refs still cover every SAI on the banked grid
    assert psnr(np.clip(np.asarray(fb), 0, 255), clean) > psnr(
        np.clip(noisy, 0, 255), clean
    )


@pytest.mark.slow
def test_banked_fused_engine_exact_f64_experimental():
    """EXPERIMENTAL banked-fused kernel (one program across 128-lane banks,
    probed in experiments/fused_banked_probe.py): f64-exact vs the XLA path
    in interpret mode. Compiled mode currently faults the TPU worker (why
    it is not the default); this test pins the numerics for round 3."""
    import jax.numpy as jnp

    from lfbm5d_tpu.pipeline.denoise import (
        _build_step, _flat_pad, _sigma_channels,
    )
    from lfbm5d_tpu.pipeline.engine import build_kernel_step

    sp = StepParams(tau_match=2500.0, n_sim=4, n_search=2, n_disp=1, k=4, p=3)
    ah, aw, h, w, c = 12, 12, 14, 14, 1  # 144 SAIs = 2 banks
    clean = synthetic_lf(ah, aw, h, w, channels=1, seed=0)
    noisy = add_noise_np(clean, 20.0, seed=1)
    xp = _flat_pad(jnp.asarray(noisy, jnp.float64), sp.pad)
    sig = _sigma_channels(20.0, "rgb", c, "float64")
    fx = _build_step(sp, 2.7, ah, aw, h, w, c, 32, False, "float64")
    f_bk = build_kernel_step(
        sp, 2.7, ah, aw, h, w, c, False, "float64",
        interpret=True, fused=True,
    )
    nx, dx = fx(xp, xp, sig, None)
    nb_, db_ = f_bk(xp, xp, sig, None)
    assert np.abs(np.asarray(nx) - np.asarray(nb_)).max() < 1e-9


@pytest.mark.slow
def test_bm_source_noisy_oracle_exact():
    """Wiener bm_source='noisy' (the cross-step BM-reuse semantics,
    config.StepParams.bm_source): BM for the Wiener step runs on the NOISY
    LF with the HT threshold instead of on the basic estimate. Both engines
    must match the f64 oracle exactly — this pins the semantics the engine's
    table-reuse fast path must reproduce bit-for-bit."""
    from lfbm5d_tpu.oracle import oracle_denoise

    clean = synthetic_lf(2, 2, 20, 24, channels=1, seed=0)
    noisy = add_noise_np(clean, 20.0, seed=1)
    p = DenoiseParams(
        sigma=20.0,
        ht=StepParams(tau_match=2500.0, **TINY),
        wiener=StepParams(tau_match=2500.0, bm_source="noisy", **TINY),
        chunk=32,
    )
    ob, of = oracle_denoise(noisy, p)
    bx, fx = run_bm5d(noisy, p, dtype="float64", engine="xla")
    bp, fp = run_bm5d(noisy, p, dtype="float64", engine="pallas")
    assert np.abs(ob - np.asarray(bx)).max() < 1e-9
    assert np.abs(of - np.asarray(fx)).max() < 1e-9
    assert np.abs(ob - np.asarray(bp)).max() < 1e-9
    assert np.abs(of - np.asarray(fp)).max() < 1e-9
    # the mode is a real change: it must differ from reference semantics
    _, of_ref = oracle_denoise(
        noisy, p.replace(wiener=StepParams(tau_match=2500.0, **TINY))
    )
    assert np.abs(of - of_ref).max() > 1e-6
