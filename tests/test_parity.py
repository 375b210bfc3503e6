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
