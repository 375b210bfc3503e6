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

    # Pin the round-5 verification window (first 50 = the harness's
    # correctness window). Priority: (a) the reference-identity pair,
    # pinned permanently; (b) the 11 queries that ERRed in r3/r4 on the
    # TIMESTAMP_NTZ fixture regression, now fixed — they need their
    # first green rows; (c) the 22 queries that have NEVER appeared in
    # any CORRECTNESS window (r4 VERDICT's top rotation list), including
    # the 4 pytest-only NTZ casualties (ts_upsert, ts_schema_evolve,
    # ts_partitions, stream_upsert); (d) remaining slots go to
    # rows-only-evidence queries so they at least re-run this round.
    # Everything displaced is hash-green in r01/r02/r04 with an
    # unchanged implementation and covered by repo-local parity tests.
    #
    # ROUND-6 ROTATION POOL: the second half of round 5 added ~57 new
    # queries (the tail of SURVEY.md §2 Table B, from sql_tpch_q4
    # through ts_multi_series_align: 11 more TPC-H, the tick-analytics
    # family, storage lifecycle/time-travel, SCD2 build+consume,
    # interval-overlap and runtime-filter joins, corpus dedup reports,
    # PMI/TF-IDF, PQ/radius search, streaming as-of, sketch unions,
    # scalar batteries) — all hash-green in repo pytest at sf0.001,
    # sf0.01 AND sf0.1, but none yet in a driver window. Next round:
    # rotate them into slots 3-50, keeping (a) pinned.
    registry.prioritize(
        [
            # (a) reference identity, pinned
            "ts_range_scan", "ts_min_max",
            # (b) NTZ-fixed this round, need first green rows
            "ts_create_append", "ts_compact", "ts_sessionize", "ts_gaps",
            "join_asof_tolerance",
            "stream_ingest", "stream_tumbling", "stream_sliding",
            "stream_dedup", "stream_join", "stream_append_windows",
            # (c) never in any CORRECTNESS window
            "ts_upsert", "ts_schema_evolve", "ts_partitions",
            "stream_upsert", "stream_enrich",
            "join_asof_forward", "join_asof_multi", "join_asof_nearest",
            "ts_interval_merge",
            "win_corr", "win_drawdown", "agg_corr",
            "dedup_editdist", "dedup_incremental", "dedup_keep_latest",
            "dq_check", "profile_table", "funnel_steps",
            "retention_cohorts", "sample_stratified",
            "lm_unigram_score", "bpe_pair_counts", "embed_dim_stats",
            # (d) changed-this-round (first hash-checked evidence: the
            # portable-hash dedup family) + brand-new r5 queries +
            # rows-only evidence refresh. Displaced to make room, all
            # with current evidence: sim_ivf*/cluster_kmeans/sim_recall
            # (rows-only ran r4, RNG-free), multimodal_schema/frames/
            # agg_approx_distinct (hash-green in BOTH r1 and r2),
            # stream_session (hash-green r4), udtf_python (rows-only r1,
            # implementation unchanged).
            "zorder_layout",
            "sink_parquet_partitioned",
            "dedup_minhash", "dedup_simhash", "dedup_simhash_pairs",
            "ts_downsample_m4", "win_rolling_median",
            "sql_tpch_q7", "sql_tpch_q10",
            "ts_outlier_iqr", "split_temporal", "mix_weights",
            "stream_ohlc", "ts_downsample_lttb",
        ]
    )


_load_all()
