from lfbm5d_tpu.transforms.matrices import (  # noqa: F401
    dct_matrix,
    haar_matrix,
    hadamard_matrix,
    bior15_matrix,
    transform_pair,
    stack_matrices,
    kaiser_window,
)
from lfbm5d_tpu.transforms.apply import forward_5d, inverse_5d, GroupTransforms  # noqa: F401
