"""TPU-native Gaussian-process optimal interpolation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``William-gregory/OptimalInterpolation`` (local exact-GP interpolation of
CryoSat-2 + Sentinel-3 radar freeboards; Gregory et al. 2021), re-designed
TPU-first: the reference's per-grid-cell serial scipy/LAPACK loop farmed over
MPI ranks becomes batched, masked, vmapped/sharded tensor programs.

Layer map (mirrors SURVEY.md section 1):
  ops/       kernels (Matern family, SE), masked linalg, smoothing, Pallas
  models/    exact GP, batched hyperparameter optimization, Nystrom, SVGP
  data/      readers, window flattening, padded neighborhood gather, synthetic
  pipeline/  two-pass daily field production, season batching
  parallel/  device mesh + sharding over the cells/days axes
  io/        reference-compatible pickle + quicklook NetCDF
  native/    C++ data-plane (along-track binner, neighbor gather)
"""

__version__ = "0.1.0"

from optimalinterpolation_tpu import ops, models  # noqa: F401
from optimalinterpolation_tpu.models.exact_gp import (  # noqa: F401
    HYPER_INIT_LOG,
    N_HYPERS,
    PredictResult,
    neg_log_marginal_likelihood,
    predict,
)
from optimalinterpolation_tpu.models.exact_gp_batch import predict_batch  # noqa: F401
from optimalinterpolation_tpu.models.optimizer import (  # noqa: F401
    OptimizeConfig,
    OptimizeResult,
    optimize_mll,
    optimize_mll_batch,
)
from optimalinterpolation_tpu.models.nystroem import nystroem_nll, nystroem_predict  # noqa: F401
from optimalinterpolation_tpu.models.svgp import (  # noqa: F401
    SVGPConfig,
    svgp_fit,
    svgp_init,
    svgp_predict,
)
from optimalinterpolation_tpu.ops.kernels import Kernel, kernel_matrix, cross_kernel  # noqa: F401
from optimalinterpolation_tpu.data.reader import ObsDataset, read_freeboard_season  # noqa: F401
from optimalinterpolation_tpu.data.neighbors import gather_neighborhoods  # noqa: F401
from optimalinterpolation_tpu.data.prior import background_prior, constant_fyi_prior  # noqa: F401
from optimalinterpolation_tpu.data.regrid import bilinear_regrid, regrid_field  # noqa: F401
from optimalinterpolation_tpu.data.synthetic import make_synthetic_season  # noqa: F401
from optimalinterpolation_tpu.pipeline.daily import (  # noqa: F401
    DailyConfig,
    DailyResult,
    interpolate_daily,
)
from optimalinterpolation_tpu.pipeline.season import (  # noqa: F401
    SeasonConfig,
    run_season,
    seasonal_average_hypers,
)
from optimalinterpolation_tpu.parallel.mesh import cell_sharding, day_cell_mesh, make_mesh  # noqa: F401
from optimalinterpolation_tpu.validation import PointObs, validate_fields  # noqa: F401
