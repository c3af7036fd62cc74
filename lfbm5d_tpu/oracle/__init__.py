from lfbm5d_tpu.oracle.oracle import (  # noqa: F401
    oracle_denoise,
    oracle_ht_step,
    oracle_wiener_step,
    oracle_block_match,
)
