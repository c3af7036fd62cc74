from lfbm5d_tpu.lf.color import (  # noqa: F401
    color_matrix,
    channel_sigma_scales,
    rgb_to_space,
    space_to_rgb,
)
from lfbm5d_tpu.lf.pad import ind_initialize, pad_lf, symmetric_pad  # noqa: F401
from lfbm5d_tpu.lf.metrics import (  # noqa: F401
    psnr,
    psnr_device,
    psnr_grid_device,
    rmse,
)
from lfbm5d_tpu.lf.noise import add_noise, add_noise_np  # noqa: F401
from lfbm5d_tpu.lf.synth import synthetic_lf  # noqa: F401
from lfbm5d_tpu.lf.io import fetch_rounded, load_lf, save_lf  # noqa: F401
