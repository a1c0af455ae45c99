from optimalinterpolation_tpu.ops.kernels import (  # noqa: F401
    Kernel,
    matern12,
    matern32,
    matern52,
    squared_exponential,
    kernel_matrix,
    cross_kernel,
    kernel_diag,
)
from optimalinterpolation_tpu.ops.linalg import (  # noqa: F401
    masked_psd_matrix,
    masked_cholesky,
    chol_solve,
    tri_solve,
)
