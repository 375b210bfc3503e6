"""Local replica of the driver's DuckDB differential oracle.

Mirrors the contract in ``__spark_entry__.py``: run the Spark query and
the oracle SQL over the same parquet, sort columns by name, compare
row count + schema + order-insensitive values. Values are compared
EXACTLY (with a float near-miss report) — if a query only matches within
tolerance, the query must gain rounding on both sides, because the
driver's value-hash has no tolerance.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns + normalize dtypes for order-insensitive compare.

    Deliberately does NOT strip timezones: the driver's schema check
    treats tz-aware (DuckDB TIMESTAMPTZ) vs naive (Spark TIMESTAMP) as a
    mismatch, and the r5 ``stream_sliding`` failure shipped exactly
    because an earlier version of this function normalized it away.
    A tz-aware column keeps a distinct dtype string so ``compare``'s
    dtype check fails, mirroring driver strictness.
    """
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                # Keep tz-awareness visible as a dtype difference; only
                # unify the unit and zone label so aware-vs-aware still
                # compares by instant.
                pdf[c] = s.dt.tz_convert("UTC").astype("datetime64[us, UTC]")
                continue
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
        else:
            pdf[c] = s.astype(object)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), na_position="last", kind="mergesort")
    return pdf.reset_index(drop=True)


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    problems: list[str] = field(default_factory=list)
    float_near_misses: int = 0

    def __str__(self) -> str:
        s = f"{self.name}: {'OK' if self.ok else 'FAIL'} ({self.spark_rows} rows)"
        for p in self.problems:
            s += f"\n  - {p}"
        if self.float_near_misses:
            s += f"\n  - WARNING {self.float_near_misses} float near-misses (add rounding!)"
        return s


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> ParityResult:
    res = ParityResult(name, True, len(spark_pdf), len(oracle_pdf))
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        res.ok = False
        res.problems.append(f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}")
        return res
    if len(a) != len(b):
        res.ok = False
        res.problems.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return res
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            res.problems.append(f"dtype differs on {c}: spark={a[c].dtype} oracle={b[c].dtype}")
            res.ok = False
    if not res.ok:
        return res
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x):
            xa, ya = x.to_numpy(), y.to_numpy()
            exact = (xa == ya) | (np.isnan(xa) & np.isnan(ya))
            if not exact.all():
                close = np.isclose(xa, ya, rtol=1e-9, atol=1e-12, equal_nan=True)
                bad = int((~close).sum())
                if bad:
                    res.ok = False
                    idx = int(np.argmax(~close))
                    res.problems.append(
                        f"value mismatch on {c}: {bad} cells, e.g. row {idx}: "
                        f"{xa[idx]!r} vs {ya[idx]!r}"
                    )
                res.float_near_misses += int((close & ~exact).sum())
        else:
            neq = ~((x == y) | (x.isna() & y.isna()))
            if neq.any():
                res.ok = False
                idx = int(np.argmax(neq.to_numpy()))
                res.problems.append(
                    f"value mismatch on {c}: {int(neq.sum())} cells, e.g. row {idx}: "
                    f"{x.iloc[idx]!r} vs {y.iloc[idx]!r}"
                )
    # float near-misses break the driver's exact hash even when np.isclose
    # passes, so they are failures here too.
    if res.float_near_misses:
        res.ok = False
        res.problems.append("float near-misses present — driver hash would differ")
    return res


def run_parity(spark, con, name: str, fn, sql: str, sf_dir: str) -> ParityResult:
    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = con.execute(sql).fetchdf()
    return compare(name, spark_pdf, oracle_pdf)
