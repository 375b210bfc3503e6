"""Shared DuckDB-SQL builders for the portable-hash fingerprint family.

These mirror operators/dedup.py's portable md5-based hashing exactly so
the simhash/minhash plans can be value-checked by the driver's DuckDB
oracle. Kept in a private helper (not a plans module) so importing it
never registers queries and can't perturb the load-bearing registration
order in plans/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash_fp_sql(bits: int = 32) -> str:
    """CTE body computing portable SimHash fingerprints over `documents`
    — the DuckDB twin of operators/dedup.py::simhash_fingerprints.
    Emits CTEs `tok`, `h`, `bit_sums`, `fp(doc_id, simhash)`; prepend
    "WITH" (and append further CTEs with a leading comma)."""
    sums = ",\n             ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
    tok AS (SELECT doc_id, unnest(str_split(lower(text), ' ')) AS token FROM documents),
    h AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h FROM tok),
    bit_sums AS (SELECT doc_id,
             {sums}
           FROM h GROUP BY doc_id),
    fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bit_sums)"""


_CMS_DEPTH, _CMS_WIDTH = 4, 256


def _cms_bucket(col, r: int, width: int = _CMS_WIDTH):
    """Seeded md5 row hash -> bucket (the portable-hash discipline):
    ('0x' || substr(md5(r || ':' || token), 1, 15))::BIGINT % width in
    DuckDB, conv(substr(md5(...), 1, 15), 16, 10) % width here. The ONE
    definition both the sketch build and the point probes use — build
    and probe must hash identically or the sketch silently answers
    garbage."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{r}:"), col)), 1, 15), 16, 10
        ).cast("long")
        % width
    ).cast("int")


def _cms_cells(tok: DataFrame, depth: int = _CMS_DEPTH, width: int = _CMS_WIDTH) -> DataFrame:
    """The count-min sketch relation (sketch_row, bucket, cnt): one
    explode + depth-fanout into a single partial+final hash aggregate
    bounded at depth*width rows."""
    return (
        tok.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("sketch_row"),
                            _cms_bucket(F.col("token"), r, width).alias("bucket"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("c")
        )
        .select("c.*")
        .groupBy("sketch_row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def _cms_oracle(depth: int = _CMS_DEPTH, width: int = _CMS_WIDTH) -> str:
    rows = "\n      UNION ALL ".join(
        f"SELECT {r} AS sketch_row, "
        f"('0x' || substr(md5('{r}:' || token), 1, 15))::BIGINT % {width} AS bucket "
        f"FROM tok"
        for r in range(depth)
    )
    return f"""
    WITH tok AS (SELECT unnest(str_split(lower(text), ' ')) AS token
                 FROM documents),
    cells AS (
      {rows}
    )
    SELECT CAST(sketch_row AS INT) AS sketch_row,
           CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM cells GROUP BY sketch_row, bucket
    """
