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


def epoch_floor_div(expr: str, d: int) -> str:
    """SQL for FLOOR division of an integer epoch expression by ``d``.

    Spark's ``div`` truncates toward zero while DuckDB's ``//`` floors,
    so a bare ``unix_micros(ts) div D`` diverges from the oracle on
    pre-1970 timestamps (negative epochs round toward zero, i.e. UP).
    Subtracting ``pmod`` (always non-negative) first makes the numerator
    an exact multiple of ``d``; the division is then remainder-free, so
    trunc == floor and the bucketing is data-independent cross-engine —
    all in 64-bit integer arithmetic (no double rounding, unlike
    ``floor(x / d)``). Fixture epochs are all positive (2024 dates), but
    the operator surface makes no such precondition."""
    return f"(({expr}) - pmod({expr}, {d})) div {d}"


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


_BLOOM_K, _BLOOM_M = 5, 1 << 20  # 5 seeded hashes into a 2^20-bit space


def _bloom_words(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """The packed Bloom-filter relation ``(word_idx, word)``: each key
    sets ``_BLOOM_K`` seeded-md5 bits (the SAME ``_cms_bucket`` hash
    family the count-min sketch uses, width ``_BLOOM_M``) in a
    2^20-bit space stored as 32-bit words — one explode + a single
    partial+final ``bit_or`` aggregate bounded at M/32 = 32768 output
    rows regardless of corpus size. 32-bit words inside BIGINTs keep
    every mask positive on both engines (a 64-bit word's top bit would
    go sign-negative in Spark and overflow DuckDB's ``<<``).

    ``bit_or`` is the merge monoid: filters from corpus shards merge by
    the very same aggregate, so ONE definition serves the batch build,
    incremental union, the probe side's bit computation, and the
    streaming maintainer (``stream_bloom``). Duplicate keys are
    harmless (insertion is idempotent), so callers need not pay a
    distinct shuffle before building."""
    fan = keys.select(
        F.explode(
            F.array(
                *[
                    _cms_bucket(F.col(key_col), r, _BLOOM_M).cast("int")
                    for r in range(_BLOOM_K)
                ]
            )
        ).alias("bit")
    )
    return (
        fan.select(
            F.shiftright("bit", 5).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), bit % 32)").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def _bloom_bits_sql(keys_cte: str, key_col: str = "key") -> str:
    """DuckDB twin of the per-key bit fanout: a UNION ALL of the
    ``_BLOOM_K`` seeded md5 bit positions over ``keys_cte``."""
    return "\n      UNION ALL ".join(
        f"SELECT ('0x' || substr(md5('{r}:' || {key_col}), 1, 15))::BIGINT "
        f"% {_BLOOM_M} AS bit FROM {keys_cte}"
        for r in range(_BLOOM_K)
    )


def _bloom_words_sql(keys_cte: str, key_col: str = "key") -> str:
    """DuckDB twin of :func:`_bloom_words` (same seeds, same packing)."""
    return f"""(
      SELECT CAST(bit // 32 AS INT) AS word_idx,
             CAST(bit_or(1::BIGINT << CAST(bit % 32 AS INT)) AS BIGINT) AS word
      FROM ({_bloom_bits_sql(keys_cte, key_col)})
      GROUP BY word_idx)"""


# Quantile sketch: a DDSketch-shaped log2 histogram with EXACT integer
# bucketing so build, merge, probe, and the DuckDB twin are all
# hash-identical — no libm log() anywhere (log's rounding is NOT
# IEEE-mandated and may differ between the JVM and DuckDB at bucket
# boundaries). Values are positive BIGINTs (a fixed-point measure such
# as cents or micro-units); the bucket of v keeps its binary length e
# and the top _QS_LEAD_BITS bits:
#   v < 16           -> exact singleton bucket [v, v+1)   (id = v)
#   v >= 16          -> lead = v >> (e-5)  in [16, 32)
#                       bucket [lead << (e-5), (lead+1) << (e-5))
#                       (id = e*32 + lead — monotone in v)
# Relative bucket width is 1/lead <= 1/16, so any rank statistic read
# from the histogram is within 6.25% relative error — the same
# guarantee shape as DDSketch's gamma buckets, but in pure integer
# arithmetic both engines evaluate bit-identically. Bucket count is
# bounded at 16 + 59*16 < 1024 for any BIGINT measure, so the sketch
# relation (one partial+final hash aggregate) is a mergeable
# constant-size summary: shard sketches merge by summing cnt per
# bucket, which is the SAME aggregate as the build.
_QS_LEAD_BITS = 5


def _qsketch_cells(vals: DataFrame, v_col: str = "v") -> DataFrame:
    """The quantile-sketch relation ``(bucket, lo, hi, cnt)`` over a
    positive-BIGINT measure column: one narrow projection (binary
    length + shifts, all codegen'd) into a single partial+final hash
    aggregate bounded at <1024 output rows regardless of input size."""
    e = f"length(bin({v_col}))"
    s = f"CAST({e} - 5 AS INT)"
    lead = f"shiftright({v_col}, {s})"
    # The very top bucket's exclusive bound is exactly 2^63 (e=63,
    # lead=31): Spark's shiftleft would silently wrap negative and
    # DuckDB's << raises — clamp that one bucket's hi to BIGINT max
    # (its bound becomes inclusive; every other bucket is unaffected).
    # DECLARED MEASURE DOMAIN: 0 <= v < 2^63 - 1. Consumers check
    # containment with the uniform exclusive `v < hi` (relational.py
    # in_bucket, the test containment join), so the single value
    # v = 2^63 - 1 would fall outside its own clamped bucket — both
    # engines agree (no parity risk), but the published per-bucket
    # guarantee excludes that one value by contract rather than
    # special-casing every consumer's predicate.
    return (
        vals.selectExpr(
            f"""CASE WHEN {v_col} < 16 THEN {v_col}
                ELSE CAST({e} AS BIGINT) * 32 + {lead} END AS bucket""",
            f"""CASE WHEN {v_col} < 16 THEN {v_col}
                ELSE shiftleft({lead}, {s}) END AS lo""",
            f"""CASE WHEN {v_col} < 16 THEN {v_col} + 1
                WHEN {e} = 63 AND {lead} = 31 THEN 9223372036854775807
                ELSE shiftleft({lead} + 1, {s}) END AS hi""",
        )
        .groupBy("bucket", "lo", "hi")
        .agg(F.count("*").alias("cnt"))
    )


def _qsketch_cells_sql(src_cte: str, v_col: str = "v") -> str:
    """DuckDB twin of :func:`_qsketch_cells` — same integer bucketing
    (DuckDB's ``>>``/``<<`` on the same BIGINTs), emitted as a
    parenthesized relation with columns (bucket, lo, hi, cnt)."""
    e = f"length(bin({v_col}))"
    s = f"({e} - 5)"
    lead = f"({v_col} >> {s})"
    return f"""(
      SELECT CAST(CASE WHEN {v_col} < 16 THEN {v_col}
                  ELSE {e} * 32 + {lead} END AS BIGINT) AS bucket,
             CAST(CASE WHEN {v_col} < 16 THEN {v_col}
                  ELSE {lead} << {s} END AS BIGINT) AS lo,
             CAST(CASE WHEN {v_col} < 16 THEN {v_col} + 1
                  WHEN {e} = 63 AND {lead} = 31 THEN 9223372036854775807
                  ELSE ({lead} + 1) << {s} END AS BIGINT) AS hi,
             CAST(count(*) AS BIGINT) AS cnt
      FROM {src_cte} GROUP BY 1, 2, 3)"""


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


# -- KMV / theta sketch (agg_theta_sketch, stream_theta, soak) --------------
_KMV_K = 256  # sketch size: rel err ~ 1/sqrt(k*J) on intersections
_HEX13 = 4503599627370496.0  # 16^13 = 2^52: first-13-hex-digit hash space


def kmv_batch_hashes(batch: DataFrame) -> DataFrame:
    """Distinct (event_type, day, h) membership hashes of an events
    batch — the ONE hash definition the batch sketch, the streaming
    maintainer and the soak harness all share (the _cms_bucket
    discipline: build and probe must hash identically)."""
    return batch.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.md5(F.col("user_id").cast("string")).alias("h"),
    ).distinct()


def kmv_truncate(df: DataFrame, k: int = _KMV_K) -> DataFrame:
    """Truncate a (event_type, day, h) relation to the k smallest
    hashes per group — KMV's associative, lossy-but-sufficient merge:
    k-smallest(k-smallest(A) ∪ B) = k-smallest(A ∪ B), so folding
    batches through this converges to exactly the batch sketch."""
    from pyspark.sql import Window as Wnd

    return (
        df.dropDuplicates(["event_type", "day", "h"])
        .withColumn(
            "rn",
            F.row_number().over(
                Wnd.partitionBy("event_type", "day").orderBy("h")
            ),
        )
        .where(F.col("rn") <= k)
        .drop("rn")
    )
