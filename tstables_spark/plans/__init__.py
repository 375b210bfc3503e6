"""Query plan registry — every operator from SURVEY.md §2 Table B.

Importing this package registers all queries; ``registry.QUERIES`` /
``registry.ORACLES`` are what ``__spark_entry__.py`` exposes to the
driver.
"""

from tstables_spark.plans import registry  # noqa: F401


def _load_all() -> None:
    # Import side-effect registers the queries with the registry.
    #
    # ORDER IS LOAD-BEARING: the external verify harness records a fixed
    # window of the FIRST 50 registered queries per round. Modules are
    # imported in priority order — the engine's core identity
    # (time-series, streaming, scalar/udf surface, this round's new ANN
    # queries) first, the already-multiply-verified relational/pipeline
    # tails last — so the queries with the least verification history
    # land inside the window. Do NOT alphabetize.
    from tstables_spark.plans import (  # noqa: F401
        timeseries,
        streaming_q,
        scalars,
        ann,
        analytics,
        filtering,
        relational,
        pipeline,
        llm,
    )

    # Pin the round-3 verification window (first 50 = the harness's
    # correctness window; everything else waits for a later round's
    # rotation). Priority: (a) the engine's core-identity queries that
    # have never appeared in any CORRECTNESS file (the r2 VERDICT's top
    # finding), then (b) hash-green queries whose implementation changed
    # after their last green row (the dedup sizes rewrite). 50 slots
    # cannot hold every never-checked query: ~20 round-3 additions
    # (analytics, editdist/incremental dedup, upsert/evolve/partitions,
    # lm/bpe/corr, forward/multi as-of, interval merge, stream
    # enrich/upsert) and the sim_ivf family (rows-only-checked in r2,
    # Arrow-kernel rewrite since, recall pinned by local tests) sit
    # outside and are the round-4 rotation, recorded in the build notes.
    # Everything displaced is hash-green in r01/r02 with an unchanged
    # implementation or covered by repo-local parity.
    registry.prioritize(
        [
            # (a) time-series/streaming/udf core, never driver-checked
            "ts_range_scan", "ts_min_max", "ts_create_append",
            "sink_parquet_partitioned", "ts_compact", "ts_resample_ohlc",
            "win_lag_lead", "win_rolling", "win_range_frame",
            "ts_fill_forward", "ts_densify", "win_running_total",
            "win_rank", "join_asof", "join_range", "join_range_banded",
            "ts_sessionize", "ts_gaps", "win_ewma", "join_asof_tolerance",
            "ts_vwap", "agg_histogram",
            "stream_ingest", "stream_tumbling", "stream_sliding",
            "stream_session", "stream_dedup", "stream_join",
            "stream_stateful", "stream_append_windows",
            "udtf_apply_in_pandas",
            "sim_ivf_kmeans", "cluster_kmeans", "sim_recall",
            "text_normalize", "repetition_score", "quality_filter",
            "decontaminate", "pii_redact", "dedup_embed_clusters",
            "win_zscore", "ts_interpolate", "embed_normalize",
            "embed_quantize", "sql_tpch_q3", "sql_tpch_q5",
            # (b) changed after their last green row
            "dedup_near", "dedup_near_maxdf", "dedup_minhash",
            "dedup_clusters",
        ]
    )


_load_all()
