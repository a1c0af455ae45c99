from optimalinterpolation_tpu.models.exact_gp import (  # noqa: F401
    neg_log_marginal_likelihood,
    predict,
    PredictResult,
    HYPER_INIT_LOG,
    N_HYPERS,
)
from optimalinterpolation_tpu.models.optimizer import (  # noqa: F401
    OptimizeConfig,
    optimize_mll,
    optimize_mll_batch,
)
