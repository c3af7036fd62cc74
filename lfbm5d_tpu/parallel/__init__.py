from lfbm5d_tpu.parallel.mesh import make_mesh  # noqa: F401
from lfbm5d_tpu.pipeline.streaming import denoise_batch  # noqa: F401
