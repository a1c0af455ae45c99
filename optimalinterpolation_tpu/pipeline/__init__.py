from optimalinterpolation_tpu.pipeline.daily import (  # noqa: F401
    DailyConfig,
    DailyResult,
    interpolate_daily,
)
