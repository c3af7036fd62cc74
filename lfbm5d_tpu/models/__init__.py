from lfbm5d_tpu.models.denoiser import LFDenoiser  # noqa: F401
from lfbm5d_tpu.models.sr import LFSuperResolver  # noqa: F401
