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

    # ROUND-6 verification window (first 50 = the harness's correctness
    # window). Priority: (a) the reference-identity pair, pinned
    # permanently; (b) stream_sliding, whose r5 driver failure was an
    # oracle bug (DuckDB to_timestamp → TIMESTAMPTZ), fixed this round
    # with an explicit CAST — it stays in the window to prove the green;
    # (c) the 4 queries whose oracles were added in r5 but whose last
    # driver run predates them (stale rows-only evidence); (d) 43 of the
    # 60 queries that have NEVER been in any CORRECTNESS window, leading
    # with the reference-adjacent storage/lifecycle set and the 11
    # unchecked TPC-H shapes per the r5 verdict.
    #
    # ROUND-7 ROTATION POOL (17 deferred never-checked + newly gated +
    # new-this-round): fn_struct, agg_unpivot, fn_conditional,
    # fn_surrogate_key, embed_pq, ts_benford, agg_gini,
    # k_anonymity_check, forecast_naive_eval, agg_skew_kurt, agg_mode,
    # agg_hll_sketch_union, agg_string_agg, fn_bitwise,
    # agg_approx_percentile, sample_weighted, dedup_cluster_sizes —
    # plus sim_recall / cluster_kmeans / stream_stateful (tolerance-
    # boolean oracles added r6), the six TPC-H completions
    # (sql_tpch_q2/q9/q11/q20/q21/q22), the four r6 pipeline ops
    # (doc_chunk_overlap, domain_quota_sample, embed_whiten,
    # vocab_oov_rate), lm_bigram_score + ts_watermark_lateness, and the
    # twelve late-r6 additions (sim_knn_graph, ts_tick_bars,
    # ts_calendar_sessions, agg_entropy, agg_markov_transitions,
    # ts_lttb_gate, graph_pagerank, pipeline_corpus_funnel,
    # dedup_prefix, fn_url, drift_ks_test, ts_xcorr_lags): 44 total,
    # fits one 50-slot window with the pinned pair and re-check slots
    # to spare.
    # Everything displaced is hash-green in a prior round with an
    # unchanged implementation and covered by repo-local parity tests.
    registry.prioritize(
        [
            # (a) reference identity, pinned
            "ts_range_scan", "ts_min_max",
            # (b) oracle fixed this round (CAST TIMESTAMPTZ→TIMESTAMP)
            "stream_sliding",
            # (c) stale rows-only — oracles landed r5, never driver-run
            "agg_approx_distinct", "multimodal_schema",
            "multimodal_frames", "udtf_python",
            # (d) never in any CORRECTNESS window — storage/lifecycle
            "ts_catalog", "ts_multi_series_align", "ts_retention_purge",
            "ts_time_travel", "sink_orc_roundtrip",
            # unchecked TPC-H shapes
            "sql_tpch_q4", "sql_tpch_q6", "sql_tpch_q8",
            "sql_tpch_q12", "sql_tpch_q13", "sql_tpch_q14",
            "sql_tpch_q15", "sql_tpch_q16", "sql_tpch_q17",
            "sql_tpch_q18", "sql_tpch_q19",
            # tick-analytics family
            "win_rsi", "ts_rate", "ts_cross_rank",
            "ts_seasonal_profile", "ts_cusum", "ts_state_durations",
            "ts_twap", "ts_peak_detect", "win_streaks", "ts_autocorr",
            "win_minmax_norm", "win_first_last",
            # temporal joins + streaming as-of
            "join_interval_overlap", "join_scd2_pit", "stream_asof",
            "join_existence_prefilter",
            # analytics audits
            "cdc_scd2", "graph_degree_dist", "drift_psi_daily",
            "attribution_last_touch",
            # corpus / similarity tail
            "doc_tfidf", "token_pmi", "sim_matryoshka",
            "multimodal_dedup", "sim_range_search", "dedup_paragraphs",
            "dedup_ngram_coverage",
        ]
    )


_load_all()
