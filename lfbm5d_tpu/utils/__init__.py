from lfbm5d_tpu.utils.timing import StageTimer  # noqa: F401
