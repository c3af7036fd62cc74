from lfbm5d_tpu.ops.distances import (  # noqa: F401
    displacements,
    self_distances,
    cross_argmin,
)
from lfbm5d_tpu.ops.match import select_similar  # noqa: F401
from lfbm5d_tpu.ops.shrinkage import ht_shrink, wiener_shrink, sd_weight  # noqa: F401
