"""A/B env knobs must be resolved at USE time, not import time.

VERDICT r4 weak #4: several knobs (OI_OPT_N_MAX, OI_CASCADE_SKIP_TOL,
OI_SEG_SCHEDULE, bucket knobs) were read into module/class attributes at
import, so setting the env var after `import optimalinterpolation_tpu`
silently did nothing — a footgun for A/B harnesses that import the package
before configuring the variant. Every test here sets the env var AFTER the
modules are imported and observes the effect.
"""

import numpy as np

from optimalinterpolation_tpu.data.neighbors import (
    DEFAULT_BUCKETS,
    default_buckets,
)
from optimalinterpolation_tpu.models.optimizer import _seg_schedule
from optimalinterpolation_tpu.pipeline import daily
from optimalinterpolation_tpu.pipeline.daily import DailyConfig


def test_opt_n_max_env_after_import(monkeypatch):
    assert DailyConfig().opt_n_max == 1024  # documented default
    monkeypatch.setenv("OI_OPT_N_MAX", "512")
    assert DailyConfig().opt_n_max == 512
    # explicit value still wins over the env default
    assert DailyConfig(opt_n_max=0).opt_n_max == 0


def test_cascade_skip_tol_env_after_import(monkeypatch):
    assert DailyConfig().cascade_skip_tol == 0.05
    monkeypatch.setenv("OI_CASCADE_SKIP_TOL", "0.0")
    assert DailyConfig().cascade_skip_tol == 0.0


def test_bucket_env_after_import(monkeypatch):
    assert default_buckets() == DEFAULT_BUCKETS == (512, 1024, 2048, 4096)
    assert tuple(DailyConfig().buckets) == DEFAULT_BUCKETS
    monkeypatch.setenv("OI_BUCKET_128", "1")
    monkeypatch.setenv("OI_BUCKET_256", "1")
    assert default_buckets() == (128, 256, 512, 1024, 2048, 4096)
    assert tuple(DailyConfig().buckets) == (128, 256, 512, 1024, 2048, 4096)


def test_seg_schedule_env_after_import(monkeypatch):
    assert _seg_schedule() == (1, 4)
    monkeypatch.setenv("OI_SEG_SCHEDULE", "2,8,16")
    assert _seg_schedule() == (2, 8, 16)


def test_cascade_nys_m_env_after_import(monkeypatch):
    assert daily._cascade_nys_m() == 0
    monkeypatch.setenv("OI_CASCADE_NYS_M", "256")
    assert daily._cascade_nys_m() == 256


def test_gather_neighborhoods_default_buckets_resolve_at_call(monkeypatch):
    from optimalinterpolation_tpu.data.neighbors import gather_neighborhoods
    from optimalinterpolation_tpu.data.window import TrainingVectors

    rng = np.random.default_rng(0)
    n = 200
    xyt = np.column_stack(
        [rng.uniform(0, 1e5, n), rng.uniform(0, 1e5, n), rng.uniform(0, 9, n)]
    )
    train = TrainingVectors(
        x=xyt[:, 0], y=xyt[:, 1], t=xyt[:, 2], z=rng.normal(size=n)
    )
    cells = np.array([[5e4, 5e4]])
    monkeypatch.setenv("OI_BUCKET_128", "1")
    batches = gather_neighborhoods(
        train, cells, t_star=4.0, radius_m=3e4, batch_multiple=1
    )
    # ~n*pi*(3e4)^2/(1e5)^2 ~ 56 neighbors -> the 128 bucket, which only
    # exists because the env knob was honored at call time
    assert [b.capacity for b in batches] == [128]
