"""Streaming driver tests: batching, fault isolation, retry (SURVEY §5.3)."""

import numpy as np

from lfbm5d_tpu.config import DenoiseParams, StepParams
from lfbm5d_tpu.lf import load_lf, save_lf, synthetic_lf
from lfbm5d_tpu.lf.noise import add_noise_np
from lfbm5d_tpu.parallel import make_mesh
from lfbm5d_tpu.pipeline.driver import stream_directories

TINY = dict(n_sim=4, n_search=3, n_disp=1, k=8, p=4)


def params():
    return DenoiseParams(
        sigma=20.0, ht=StepParams(**TINY),
        wiener=StepParams(tau_match=400.0, **TINY), chunk=32,
    )


def test_stream_ok_and_fault_isolation(tmp_path):
    ins, outs = [], []
    for i in range(4):
        d = tmp_path / f"in{i}"
        clean = synthetic_lf(2, 2, 16, 16, channels=1, seed=i)
        save_lf(add_noise_np(clean, 20.0, seed=i), str(d), "SAI_%02d_%02d.png")
        ins.append(str(d))
        outs.append(str(tmp_path / f"out{i}"))
    # corrupt LF #2: delete one SAI
    (tmp_path / "in2" / "SAI_01_00.png").unlink()

    mesh = make_mesh(2)
    status = stream_directories(
        ins, outs, "SAI_%02d_%02d.png", 2, 2, params(), mesh=mesh
    )
    assert [s["ok"] for s in status] == [True, True, False, True]
    assert "error" in status[2]
    for i in (0, 1, 3):
        out = load_lf(outs[i], "SAI_%02d_%02d.png", 2, 2)
        assert out.shape == (2, 2, 16, 16, 1)


def test_mt19937_rng_kind():
    lf = np.zeros((1, 1, 8, 8, 1))
    a = add_noise_np(lf, 10.0, seed=5, rng_kind="mt19937")
    b = add_noise_np(lf, 10.0, seed=5, rng_kind="mt19937")
    c = add_noise_np(lf, 10.0, seed=5)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)  # different generator family
