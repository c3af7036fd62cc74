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
