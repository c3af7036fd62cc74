from lfbm5d_tpu.parallel.mesh import (  # noqa: F401
    ensure_virtual_devices,
    make_mesh,
)
from lfbm5d_tpu.pipeline.streaming import denoise_batch  # noqa: F401
