from optimalinterpolation_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    cell_sharding,
)
