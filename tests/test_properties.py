"""Property-based checks (SURVEY.md §5.3): range-split additivity of
read_range and resample/re-aggregate consistency, over randomized
boundaries inside one materialized fixture series."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tstables_spark.tstable import TimeSeriesTable

UTC = timezone.utc
BASE = datetime(2024, 6, 1, tzinfo=UTC)
N_MINUTES = 3 * 24 * 60  # three days of minute ticks

SCHEMA = T.StructType(
    [T.StructField("ts", T.TimestampType()), T.StructField("v", T.DoubleType())]
)


@pytest.fixture(scope="module")
def series(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("prop"))
    t = TimeSeriesTable.create(spark, root, "s", SCHEMA)
    rows = [(BASE + timedelta(minutes=i), float(i % 97)) for i in range(N_MINUTES)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    return t


minutes = st.integers(min_value=0, max_value=N_MINUTES - 1)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.tuples(minutes, minutes, minutes).map(sorted))
def test_range_split_additivity(series, bounds):
    """read_range(a,b) ∪ read_range(b+1m,c) == read_range(a,c) — the
    inclusive-bounds contract means adjacent ranges must tile with no
    overlap and no gap."""
    a, b, c = (BASE + timedelta(minutes=m) for m in bounds)
    whole = series.read_range(a, c).count()
    left = series.read_range(a, b).count()
    right = series.read_range(b + timedelta(minutes=1), c).count()
    assert left + right == whole


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(minutes, st.sampled_from([60, 180, 720]))
def test_resample_reaggregate_consistency(series, start_min, bucket_minutes):
    """Sum over coarse buckets == sum over the raw rows of the same span
    (resample must neither drop nor duplicate rows)."""
    start = BASE + timedelta(minutes=start_min)
    end = start + timedelta(hours=20)
    df = series.read_range(start, end)
    raw_sum = df.agg(F.sum("v")).collect()[0][0] or 0.0
    bucketed = (
        df.groupBy(F.window("ts", f"{bucket_minutes} minutes"))
        .agg(F.sum("v").alias("s"))
        .agg(F.sum("s"))
        .collect()[0][0]
        or 0.0
    )
    assert abs(raw_sum - bucketed) < 1e-6
