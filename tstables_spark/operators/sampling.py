"""Deterministic, engine-portable sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible run-to-run, (b) stable under repartitioning, and
(c) identical across engines auditing the same data. RNG-based
``df.sample``/``sampleBy`` gives none of these — the draw depends on
partitioning and on each engine's RNG. Hash-gating does: a row is kept
iff a cryptographic hash of its key falls under a threshold, so
membership is a pure function of the key. That is how production corpus
pipelines pin their held-out sets (same trick as content-hash bucketing
in CCNet/RefinedWeb-style dedup stacks).

Implementation detail: the gate compares the md5 hex PREFIX as a
string, giving thresholds in 1/256ths (two hex chars) — md5 and string
comparison exist and agree in every engine (Spark, DuckDB, Trino, BQ),
so the oracle twin is the literal same expression. At 100 TB the gate
is a codegen'd scan-level filter: no shuffle, prunes before any join,
and survives any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _gate(key: Column) -> Column:
    """First two md5 hex chars of the key — a uniform draw over 256
    buckets, deterministic in the key value."""
    return F.substring(F.md5(key.cast("string")), 1, 2)


def hash_sample(df: DataFrame, key: str, buckets_of_256: int) -> DataFrame:
    """Keep ~``buckets_of_256``/256 of rows, deterministically by key.

    E.g. ``buckets_of_256=13`` ≈ a 5.08% sample. Same key -> same
    decision, forever, on any engine.
    """
    threshold = format(buckets_of_256, "02x")
    return df.where(_gate(F.col(key)) < F.lit(threshold))


def hash_split(
    df: DataFrame,
    key: str,
    train_buckets: int = 205,
    val_buckets: int = 26,
    split_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by hash bucket: first ``train_buckets``/256
    to train (205 ≈ 80.1%), next ``val_buckets``/256 to val (26 ≈
    10.2%), rest to test. Document-keyed, so a doc can never leak across
    splits between runs."""
    g = _gate(F.col(key))
    t_hi = format(train_buckets, "02x")
    v_hi = format(train_buckets + val_buckets, "02x")
    split = (
        F.when(g < F.lit(t_hi), F.lit("train"))
        .when(g < F.lit(v_hi), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(split_col, split)
