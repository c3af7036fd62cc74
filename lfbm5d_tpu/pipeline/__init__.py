from lfbm5d_tpu.pipeline.denoise import run_bm5d, ht_step, wiener_step  # noqa: F401
