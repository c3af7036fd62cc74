from lfbm5d_tpu.kernels.extract import extract_groups  # noqa: F401
from lfbm5d_tpu.kernels.accumulate import accumulate_groups  # noqa: F401
