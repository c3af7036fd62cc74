"""Multi-device streaming tests on the 8-way virtual CPU mesh (SURVEY §4.2.6)."""

import numpy as np
import pytest

from lfbm5d_tpu.config import DenoiseParams, StepParams
from lfbm5d_tpu.lf import synthetic_lf
from lfbm5d_tpu.lf.noise import add_noise_np
from lfbm5d_tpu.parallel import denoise_batch, make_mesh
from lfbm5d_tpu.pipeline import run_bm5d

TINY = dict(n_sim=4, n_search=3, n_disp=1, k=8, p=4)


def params():
    return DenoiseParams(
        sigma=20.0,
        ht=StepParams(tau_match=2500.0, **TINY),
        wiener=StepParams(tau_match=400.0, **TINY),
        chunk=32,
    )


@pytest.fixture(scope="module")
def batch():
    lfs = []
    for s in range(4):
        clean = synthetic_lf(2, 2, 16, 16, channels=1, seed=s)
        lfs.append(add_noise_np(clean, 20.0, seed=100 + s))
    return np.stack(lfs)


def test_mesh_creation():
    import jax

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(4)
    assert mesh.size == 4 and mesh.axis_names == ("lf",)
    with pytest.raises(ValueError):
        make_mesh(99)


@pytest.mark.slow
def test_batch_matches_single(batch):
    p = params()
    _, f_batch = denoise_batch(batch, p)
    _, f_single = run_bm5d(batch[1], p)
    np.testing.assert_allclose(
        np.asarray(f_batch)[1], np.asarray(f_single), atol=1e-4
    )


def test_sharded_matches_unsharded(batch):
    p = params()
    mesh = make_mesh(4)
    b_u, f_u = denoise_batch(batch, p)
    b_s, f_s = denoise_batch(batch, p, mesh=mesh)
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(b_s), np.asarray(b_u), atol=1e-4)


def test_batch_not_divisible_raises(batch):
    with pytest.raises(ValueError):
        denoise_batch(batch[:3], params(), mesh=make_mesh(4))


@pytest.mark.slow
def test_sharded_pallas_engine_matches_unsharded(batch):
    """Config 5 with the KERNEL engine: lax.map streams each device's shard
    through the per-LF Pallas program inside shard_map (VERDICT round-1
    item 5: the kernel engine and the multi-chip story must compose)."""
    p = params()
    mesh = make_mesh(4)
    b_u, f_u = denoise_batch(batch, p, engine="pallas")
    b_s, f_s = denoise_batch(batch, p, mesh=mesh, engine="pallas")
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(b_s), np.asarray(b_u), atol=1e-4)
    # and the kernel engine agrees with the sharded XLA engine
    _, f_x = denoise_batch(batch, p, mesh=make_mesh(2), engine="xla")
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_x), atol=2e-3)


def test_retry_per_lf_isolates_fault(batch, monkeypatch):
    """SURVEY §5.3 / VERDICT r3 item 5: one faulted LF must not poison the
    batch — the failing device call is retried, then degraded to the
    identity estimate, and the report names the bad LF."""
    import lfbm5d_tpu.pipeline.streaming as S

    p = params()
    # reference output without faults (host-loop kernel-engine path)
    _, f_ref = denoise_batch(batch, p, engine="pallas")

    calls = {"n": 0}
    real_jit = S._jit_per_lf.__wrapped__  # undecorated builder

    def flaky_jit(fn):
        jfn = real_jit(fn)

        def wrapper(lf, sigma_c):
            calls["n"] += 1
            # LF index 2's first TWO attempts fault (host loop calls
            # per-LF in order: attempts 3 and 4 are both index 2)
            if calls["n"] in (3, 4):
                raise RuntimeError("injected device fault")
            return jfn(lf, sigma_c)

        return wrapper

    monkeypatch.setattr(S, "_jit_per_lf", flaky_jit)

    # retries=1 is not enough for a double fault -> identity fallback
    (b_out, f_out), report = denoise_batch(
        batch, p, engine="pallas", retries=1, on_fail="identity",
        return_report=True,
    )
    assert [r["index"] for r in report] == [2]
    assert report[0]["attempts"] == 2
    np.testing.assert_allclose(
        np.asarray(f_out)[2], np.asarray(batch)[2], atol=1e-5
    )  # degraded LF = identity (noisy input), not garbage
    for i in (0, 1, 3):  # the rest of the batch is untouched
        np.testing.assert_allclose(
            np.asarray(f_out)[i], np.asarray(f_ref)[i], atol=1e-4
        )

    # a single-fault LF recovers exactly via retry
    calls["n"] = 0

    def flaky_once(fn):
        jfn = real_jit(fn)

        def wrapper(lf, sigma_c):
            calls["n"] += 1
            if calls["n"] == 3:
                raise RuntimeError("transient fault")
            return jfn(lf, sigma_c)

        return wrapper

    monkeypatch.setattr(S, "_jit_per_lf", flaky_once)
    (b2, f2), report2 = denoise_batch(
        batch, p, engine="pallas", retries=1, on_fail="identity",
        return_report=True,
    )
    assert report2 == []
    np.testing.assert_allclose(
        np.asarray(f2), np.asarray(f_ref), atol=1e-4
    )


def test_default_behavior_still_raises(batch, monkeypatch):
    import lfbm5d_tpu.pipeline.streaming as S

    def always_fail(fn):
        def wrapper(lf, sigma_c):
            raise RuntimeError("hard fault")

        return wrapper

    monkeypatch.setattr(S, "_jit_per_lf", always_fail)
    with pytest.raises(RuntimeError, match="hard fault"):
        denoise_batch(batch, params(), engine="pallas")


def test_stream_denoise_dirs_roundtrip(batch, tmp_path):
    """Disk->disk streaming driver: decode -> denoise -> encode with
    prefetch overlap; outputs match the in-memory batch path after
    save-quantization."""
    from lfbm5d_tpu.lf.io import load_lf, save_lf
    from lfbm5d_tpu.pipeline.stream_io import stream_denoise_dirs

    p = params()
    jobs = []
    for i in range(3):
        d_in = tmp_path / f"in_{i}"
        d_out = tmp_path / f"out_{i}"
        save_lf(np.clip(batch[i], 0, 255), str(d_in), "SAI_%02d_%02d.png")
        jobs.append((str(d_in), str(d_out)))

    report = stream_denoise_dirs(jobs, p, 2, 2, engine="pallas")
    assert report.n_done == 3 and report.n_failed == 0
    assert report.seconds_total > 0 and len(report.lf_seconds) == 3

    # parity vs the in-memory path on the SAVED inputs (save quantizes)
    quant = np.stack(
        [load_lf(j[0], "SAI_%02d_%02d.png", 2, 2) for j in jobs]
    )
    _, f_ref = denoise_batch(quant, p, engine="pallas")
    for i, j in enumerate(jobs):
        got = load_lf(j[1], "SAI_%02d_%02d.png", 2, 2)
        want = np.clip(np.round(np.asarray(f_ref)[i]), 0, 255)
        np.testing.assert_allclose(got, want, atol=1.0)


def test_stream_denoise_dirs_fault_isolation(batch, tmp_path):
    from lfbm5d_tpu.lf.io import save_lf
    from lfbm5d_tpu.pipeline.stream_io import (
        _default_run,
        stream_denoise_dirs,
    )

    p = params()
    jobs = []
    for i in range(3):
        d_in = tmp_path / f"fin_{i}"
        d_out = tmp_path / f"fout_{i}"
        save_lf(np.clip(batch[i], 0, 255), str(d_in), "SAI_%02d_%02d.png")
        jobs.append((str(d_in), str(d_out)))

    calls = {"n": 0}

    def flaky(fn, lf_dev, sigma_c):
        calls["n"] += 1
        # job 1 faults on BOTH attempts (calls 2 and 3 with retries=1)
        if calls["n"] in (2, 3):
            raise RuntimeError("injected stream fault")
        return _default_run(fn, lf_dev, sigma_c)

    report = stream_denoise_dirs(
        jobs, p, 2, 2, engine="pallas", retries=1, on_fail="skip",
        _run=flaky,
    )
    assert report.n_done == 2 and report.n_failed == 1
    assert report.failures[0]["job"] == jobs[1]
    assert report.failures[0]["attempts"] == 2
    import os

    assert not os.path.exists(jobs[1][1])  # skip: no output for the bad LF
    assert os.path.exists(jobs[0][1]) and os.path.exists(jobs[2][1])


@pytest.mark.slow
def test_sharded_banked_fused_tier_matches_unsharded(batch, monkeypatch):
    """VERDICT r4 weak #6: multi-chip correctness must cover the execution
    tiers real 17x17 streaming uses. A >128-SAI grid routes to the
    banked-FUSED per-step-program tier (run_bm5d routing); with
    LFBM5D_ROUTE_ON_CPU=1 the tier applies on the CPU mesh too, and
    denoise_batch round-robins the LFs over mesh devices per LF."""
    import jax

    from lfbm5d_tpu.pipeline.denoise import execution_tier

    monkeypatch.setenv("LFBM5D_ROUTE_ON_CPU", "1")
    tiny = dict(n_sim=4, n_search=2, n_disp=1, k=4, p=3)
    p = DenoiseParams(
        sigma=20.0,
        ht=StepParams(tau_match=2500.0, **tiny),
        wiener=StepParams(tau_match=400.0, **tiny),
        chunk=32,
    )
    lfs = []
    for s in range(2):
        clean = synthetic_lf(12, 12, 14, 14, channels=1, seed=s)  # 144 SAIs
        lfs.append(add_noise_np(clean, 20.0, seed=50 + s))
    big = np.stack(lfs)
    assert execution_tier(p, 12, 12, 14, 14, "pallas") == "banked_fused"

    b_u, f_u = denoise_batch(big, p, engine="pallas", dtype="float64")
    mesh = make_mesh(2)
    b_s, f_s = denoise_batch(big, p, mesh=mesh, engine="pallas",
                             dtype="float64")
    assert np.abs(np.asarray(f_s) - np.asarray(f_u)).max() < 1e-9
    assert np.abs(np.asarray(b_s) - np.asarray(b_u)).max() < 1e-9
    # and the tiered outputs agree with the plain XLA engine
    _, f_x = denoise_batch(big, p, engine="xla", dtype="float64")
    assert np.abs(np.asarray(f_s) - np.asarray(f_x)).max() < 1e-9
    del jax  # only imported for parity with other tests


@pytest.mark.slow
def test_sharded_launched_tier_matches_unsharded(batch, monkeypatch):
    """Same as above for the LAUNCHED tier (bounded multi-dispatch
    execution, the default/robust 17x17 regime): slot limit forced to 1 so
    the tiny batch routes through launched execution under the mesh."""
    import lfbm5d_tpu.pipeline.denoise as D

    from lfbm5d_tpu.pipeline.denoise import execution_tier

    monkeypatch.setenv("LFBM5D_ROUTE_ON_CPU", "1")
    monkeypatch.setattr(D, "_LAUNCH_SLOT_LIMIT", 1)
    p = params()
    assert execution_tier(p, 2, 2, 16, 16, "pallas") == "launched"

    b_u, f_u = denoise_batch(batch, p, engine="pallas", dtype="float64")
    mesh = make_mesh(4)
    b_s, f_s = denoise_batch(batch, p, mesh=mesh, engine="pallas",
                             dtype="float64")
    assert np.abs(np.asarray(f_s) - np.asarray(f_u)).max() < 1e-9
    assert np.abs(np.asarray(b_s) - np.asarray(b_u)).max() < 1e-9
    # launched == the single-program path (tier forced off)
    monkeypatch.setattr(D, "_LAUNCH_SLOT_LIMIT", 6_000_000)
    _, f_single = denoise_batch(batch, p, engine="pallas", dtype="float64")
    assert np.abs(np.asarray(f_s) - np.asarray(f_single)).max() < 1e-9


@pytest.mark.slow
def test_stream_denoise_dirs_heavy_tier(batch, tmp_path, monkeypatch):
    """Disk->disk streaming must route heavy-tier shapes through run_bm5d's
    slot tiering (a single build_denoise_fn program faults the device at
    17x17 scale) and still match the single-program output exactly."""
    import lfbm5d_tpu.pipeline.denoise as D
    from lfbm5d_tpu.lf.io import load_lf, save_lf
    from lfbm5d_tpu.pipeline.stream_io import stream_denoise_dirs

    monkeypatch.setenv("LFBM5D_ROUTE_ON_CPU", "1")
    p = params()
    jobs = []
    for i in range(2):
        d_in = tmp_path / f"hin_{i}"
        save_lf(np.clip(batch[i], 0, 255), str(d_in), "SAI_%02d_%02d.png")
        jobs.append((str(d_in), str(tmp_path / f"hout_{i}")))

    # single-program reference on the SAVED (quantized) inputs
    quant = np.stack(
        [load_lf(j[0], "SAI_%02d_%02d.png", 2, 2) for j in jobs]
    )
    _, f_ref = denoise_batch(quant, p, engine="pallas")

    monkeypatch.setattr(D, "_LAUNCH_SLOT_LIMIT", 1)  # force launched tier
    assert D.execution_tier(p, 2, 2, 16, 16, "pallas") == "launched"
    report = stream_denoise_dirs(jobs, p, 2, 2, engine="pallas")
    assert report.n_done == 2 and report.n_failed == 0
    for i, j in enumerate(jobs):
        got = load_lf(j[1], "SAI_%02d_%02d.png", 2, 2)
        want = np.clip(np.round(np.asarray(f_ref)[i]), 0, 255)
        np.testing.assert_allclose(got, want, atol=1.0)
