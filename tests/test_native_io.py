"""Native (C++) parallel PNG loader vs the PIL/OpenCV fallback path."""

import numpy as np
import pytest

from lfbm5d_tpu.lf import load_lf, save_lf, synthetic_lf

native = pytest.importorskip("lfbm5d_tpu.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native io_accel not buildable here"
)


@pytest.mark.parametrize("depth,channels", [(8, 3), (8, 1), (16, 1), (16, 3)])
def test_native_matches_fallback(tmp_path, depth, channels):
    lf = synthetic_lf(2, 3, 24, 28, channels=channels, seed=depth + channels)
    save_lf(lf, str(tmp_path), "SAI_%02d_%02d.png", bit_depth=depth)
    a = load_lf(str(tmp_path), "SAI_%02d_%02d.png", 2, 3, use_native="never")
    b = load_lf(str(tmp_path), "SAI_%02d_%02d.png", 2, 3, use_native="always")
    assert b.dtype == np.float32
    np.testing.assert_allclose(a, b, atol=3e-3)
    tol = 0.51 if depth == 8 else 0.01
    assert np.abs(b - lf).max() <= tol


def test_native_missing_file(tmp_path):
    lf = synthetic_lf(2, 2, 16, 16, channels=1, seed=0)
    save_lf(lf, str(tmp_path), "SAI_%02d_%02d.png")
    (tmp_path / "SAI_01_01.png").unlink()
    with pytest.raises(IOError):
        load_lf(str(tmp_path), "SAI_%02d_%02d.png", 2, 2, use_native="always")


def test_native_save_roundtrip(tmp_path):
    """Thread-pooled native PNG encoder (write-side twin of the native
    loader): save -> load must be exact up to quantization at both bit
    depths; skipped when the toolchain is unavailable."""
    import numpy as np
    import pytest

    from lfbm5d_tpu import native
    from lfbm5d_tpu.lf import synthetic_lf
    from lfbm5d_tpu.lf.io import load_lf, save_lf

    if not native.available():
        pytest.skip("native io_accel unavailable")
    lf = synthetic_lf(2, 2, 32, 40, channels=3, seed=4)
    for bd, tol in ((8, 0.51), (16, 0.51 / 257)):
        d = str(tmp_path / f"bd{bd}")
        save_lf(lf, d, "S_%02d_%02d.png", bit_depth=bd)
        back = load_lf(d, "S_%02d_%02d.png", 2, 2)
        assert np.abs(back - np.clip(lf, 0, 255)).max() <= tol
