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

    # ROUND-16 verification window (first 50 = the harness's
    # correctness window). Priority per the STANDING ROTATION POLICY
    # (below):
    # (a) the reference-identity pair, pinned permanently;
    # (b) NEW queries: none this round (coverage is complete; r16 is
    #     the two perf threads + machinery wear-in);
    # (c) re-check slots for r16 behavioral changes, per module:
    #     - operators/dedup.py: _pair_overlap's posting lists now
    #       carry (doc_id, n_sh) PACKED into one long (the measured
    #       1.7x pair-expansion win; output bit-identical by design,
    #       so these re-checks are the proof) -> dedup_near,
    #       dedup_near_maxdf, dedup_substring, dedup_clusters,
    #       dedup_cluster_sizes (+ dedup_containment, already in the
    #       r8 cohort below);
    #     - plans/analytics.py: graph_degree_dist runs on a
    #       conf-scoped twin with flat initialPartitionNum (the r15
    #       'unattributed residual', bisected to the r13 global AQE
    #       x8 and fixed) -> graph_degree_dist;
    #     - plans/_staging.py: stream_pin gained the concurrent-stage
    #       winner re-check and in-use refcounts (hold_stream_pins,
    #       bracketing every registry query) -> dedup_minhash
    #       (big-path pins), graph_pagerank (bucketed pin),
    #       graph_triangles_approx (edge pins);
    #     - streaming/replay.py: VersionedPathFold gained the
    #       restart guard + superseded-attempt GC -> stream_theta;
    #     - operators/asof.py: _resolve_epoch_of validates named
    #       granularities against the persisted property ->
    #       ts_epoch_lifecycle, ts_epoch_recovery;
    # (d) the ENTIRE 17-query r8 cohort named by the r15 verdict
    #     (oldest evidence; list in the policy note below);
    # (e) next-oldest backfill to the 50 cut: nineteen r9-latest
    #     entries (alphabetical head of the r9 cohort); the r9
    #     remainder (join_semi, multimodal_frames, pareto_frontier,
    #     set_intersect, set_union, sim_matryoshka, sim_range_search,
    #     sort_limit, token_ngram_novelty, topk_per_group,
    #     vocab_growth) heads the r17 queue.
    #
    # STANDING ROTATION POLICY (r10+): window = pinned pair + any
    # never-checked new queries + re-check slots for every query whose
    # implementing module OR consumed helper changed since its last
    # green row (check `git log -- <module>` against round markers —
    # including helper modules like _staging/_staged_interchange, the
    # r10 blind spot), then backfill with oldest-evidence queries.
    # After this window the oldest remaining oracle-backed evidence is
    # r9 (11 queries) — verified against the CORRECTNESS_r* ledger
    # this round. The r8 cohort in (d): dedup_containment, doc_bm25,
    # doc_dup_inflation, drift_ks_test, embed_pca_power,
    # embed_spectral_outlier, fn_date, fn_math, fn_string,
    # mix_temperature, pack_sequences, stream_bloom, ts_pattern_match,
    # ts_robust_zscore, ts_rollup_hier, vocab_coverage_curve,
    # win_distribution. The 7 permanently
    # rows-only-by-design queries are sim_ivf, sim_ivf_centroid,
    # sim_ivf_kmeans, sim_nsw, sim_nsw_staged, sim_ivfpq,
    # ts_downsample_lttb — each indirectly gated by a hash-checked
    # contract query (sim_recall r13 / ts_lttb_gate r14). Everything
    # displaced from this window is hash-green in a prior round with
    # an unchanged implementation and covered by repo-local parity
    # tests (tests/test_parity.py runs the full oracle differential
    # every suite run).
    registry.prioritize(
        [
            # (a) reference identity, pinned
            "ts_range_scan", "ts_min_max",
            # (c) r16 behavioral-change re-checks (see policy note)
            "dedup_near", "dedup_near_maxdf", "dedup_substring",
            "dedup_clusters", "dedup_cluster_sizes", "dedup_minhash",
            "graph_degree_dist", "graph_pagerank",
            "graph_triangles_approx", "stream_theta",
            "ts_epoch_lifecycle", "ts_epoch_recovery",
            # (d) the full r8 cohort (oldest evidence, x17)
            "dedup_containment", "doc_bm25", "doc_dup_inflation",
            "drift_ks_test", "embed_pca_power", "embed_spectral_outlier",
            "fn_date", "fn_math", "fn_string", "mix_temperature",
            "pack_sequences", "stream_bloom", "ts_pattern_match",
            "ts_robust_zscore", "ts_rollup_hier", "vocab_coverage_curve",
            "win_distribution",
            # (e) r9 backfill to the cut
            "agg_cube", "agg_distinct", "agg_grouping_sets",
            "agg_kll_gate", "agg_percentiles", "agg_pivot",
            "agg_pricing_summary", "agg_rollup", "agg_winsorize",
            "dedup_embed", "join_anti", "join_asof", "join_asof_forward",
            "join_asof_multi", "join_asof_nearest", "join_asof_tolerance",
            "join_full", "join_left", "join_multi",
        ]
    )



_load_all()
