"""Driver-shaped differential test: every registered query vs its DuckDB
oracle at sf0.01 (override with PARITY_SF_DIR). Rows-only queries are
smoke-checked for schema stability and row production."""

from __future__ import annotations

import pytest

import tstables_spark.plans  # noqa: F401 — registers all queries
from tstables_spark.plans.registry import ORACLES, QUERIES

from tests.parity import run_parity

ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, sf_dir, name):
    res = run_parity(spark, duck, name, QUERIES[name], ORACLES[name], sf_dir)
    assert res.ok, str(res)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert len(df.schema.fields) > 0
    assert df.count() >= 0


def test_tz_aware_vs_naive_is_schema_mismatch():
    """Regression for the r5 stream_sliding driver failure: DuckDB
    ``to_timestamp()`` returns TIMESTAMPTZ while Spark emits naive
    TIMESTAMP. The driver treats that as a schema mismatch; the local
    harness must too (it used to normalize it away and shipped green)."""
    import pandas as pd

    from tests.parity import compare

    naive = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 00:00:00"])})
    aware = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 00:00:00"]).tz_localize("UTC")}
    )
    res = compare("tz_regression", naive, aware)
    assert not res.ok
    assert any("dtype differs" in p for p in res.problems), str(res)
    # Same instant, both tz-aware: still fine.
    res2 = compare("tz_aware_both", aware.copy(), aware.copy())
    assert res2.ok, str(res2)
