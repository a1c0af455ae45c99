from optimalinterpolation_tpu.data.reader import ObsDataset, read_freeboard_season  # noqa: F401
from optimalinterpolation_tpu.data.window import flatten_window, TrainingVectors  # noqa: F401
from optimalinterpolation_tpu.data.neighbors import (  # noqa: F401
    NeighborhoodBatch,
    gather_neighborhoods,
)
from optimalinterpolation_tpu.data.synthetic import make_synthetic_season  # noqa: F401
from optimalinterpolation_tpu.data.prior import constant_fyi_prior, background_prior  # noqa: F401
