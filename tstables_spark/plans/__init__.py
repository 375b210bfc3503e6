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

    # ROUND-7 verification window (first 50 = the harness's correctness
    # window). Priority: (a) the reference-identity pair, pinned
    # permanently; (b) the 44 oracle-bearing queries that have NEVER
    # been in any CORRECTNESS window — the r6 verdict's staged rotation,
    # executed verbatim: the newly-gated tolerance-boolean trio first,
    # the six TPC-H completions, the 17 deferred-from-r6 tail, the r6
    # pipeline/text additions, and the twelve late-r6 operators; (c)
    # re-check slots for queries whose implementing module changes this
    # round (ts_xcorr_lags / drift_ks_test window distribution,
    # graph_pagerank fixed-point arithmetic, dedup_prefix boundary
    # stitch, dedup_editdist candidate budget are all in (b) already;
    # stream_sliding + dedup_minhash + join_asof + dedup_near fill the
    # spare slots as high-churn-history re-checks).
    #
    # STANDING ROTATION POLICY (r8+): after this window lands, every
    # oracle-bearing query except the twelve ADDED in r7
    # (dedup_containment, ts_rollup_hier, vocab_coverage_curve,
    # ts_robust_zscore, graph_triangles, agg_cms_sketch,
    # join_asof_presorted, mix_temperature, doc_dup_inflation,
    # agg_cms_point, stream_cms, ts_read_at — all
    # local-parity green at three scales, never driver-windowed) has
    # driver evidence; those twelve lead the r8 window.
    # (dedup_suffix was built and REJECTED in r7: the sf0.01 fixture
    # has zero suffix duplicates, so its parity check is vacuous at
    # driver scale — the capability is prefix_dup_flags over reversed
    # text, already gated via dedup_prefix.) The 4 permanently rows-only-by-design queries are
    # sim_ivf, sim_ivf_centroid, sim_ivf_kmeans, ts_downsample_lttb —
    # each indirectly gated by a hash-checked contract query
    # (sim_recall / ts_lttb_gate). From r8 on, the window = the pinned
    # pair + any never-checked new queries + re-check slots for every
    # query whose implementing module changed since its last green row
    # (check `git log -- <module>` against the round markers), then
    # backfill with the oldest-evidence queries.
    # Everything displaced is hash-green in a prior round with an
    # unchanged implementation and covered by repo-local parity tests.
    registry.prioritize(
        [
            # (a) reference identity, pinned
            "ts_range_scan", "ts_min_max",
            # (b) newly gated tolerance-boolean oracles (added r6)
            "sim_recall", "cluster_kmeans", "stream_stateful",
            # TPC-H completions (suite now 22/22)
            "sql_tpch_q2", "sql_tpch_q9", "sql_tpch_q11",
            "sql_tpch_q20", "sql_tpch_q21", "sql_tpch_q22",
            # deferred-from-r6 never-checked tail
            "fn_struct", "agg_unpivot", "fn_conditional",
            "fn_surrogate_key", "embed_pq", "ts_benford", "agg_gini",
            "k_anonymity_check", "forecast_naive_eval", "agg_skew_kurt",
            "agg_mode", "agg_hll_sketch_union", "agg_string_agg",
            "fn_bitwise", "agg_approx_percentile", "sample_weighted",
            "dedup_cluster_sizes",
            # r6 pipeline/text additions
            "doc_chunk_overlap", "domain_quota_sample", "embed_whiten",
            "vocab_oov_rate", "lm_bigram_score", "ts_watermark_lateness",
            # late-r6 operators
            "sim_knn_graph", "ts_tick_bars", "ts_calendar_sessions",
            "agg_entropy", "agg_markov_transitions", "ts_lttb_gate",
            "graph_pagerank", "pipeline_corpus_funnel", "dedup_prefix",
            "fn_url", "drift_ks_test", "ts_xcorr_lags",
            # (c) re-check slots: high churn history / touched this round
            "stream_sliding", "dedup_minhash", "join_asof", "dedup_near",
        ]
    )


_load_all()
