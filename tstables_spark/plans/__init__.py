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

    # ROUND-15 verification window (first 50 = the harness's
    # correctness window). Priority per the STANDING ROTATION POLICY
    # (below):
    # (a) the reference-identity pair, pinned permanently;
    # (b) NEW queries, never driver-checked: ts_epoch_recovery (the
    #     epoch-append crash path promoted from the pytest
    #     crash-injection fixture to one driver hash — stage -> append
    #     -> simulated mid-append kill (marker + missing touched
    #     epoch) -> detection (next append refuses) -> recovery ->
    #     read; r14 verdict #3);
    # (c) re-check slots for r15 behavioral changes, per module:
    #     - operators/asof.py: epoch granularity is auto-picked from
    #       append cadence and persisted per table (r14 verdict #4),
    #       the commit-marker publish is lock-serialized with an
    #       hsync fallback (r14 advice) -> ts_epoch_lifecycle (now
    #       runs knob-free at MONTH granularity — behavior-changed),
    #       join_asof_epochs, stream_asof_epochs (their staging
    #       drives stage/append);
    #     - plans/streaming_q.py: the three driver-held maintainers
    #       moved onto the shared replay helper
    #       (streaming/replay.py, r14 verdict #6) -> stream_theta,
    #       stream_heavy_hitters, stream_kll_gate;
    #     - plans/_staging.py: the staged-pin registry is LRU-bounded
    #       and the conf-twin cache lock-guarded/evicted (r14 verdict
    #       #5 + advice) — consumed by every stream_pin/conf-twin
    #       query; representatives spanning the consumer shapes ->
    #       dedup_near (conf twin), dedup_minhash (big-path pins,
    #       also the operators/dedup.py 5-tuple cache-key fix),
    #       graph_kcore (bucketed pin), graph_triangles_approx and
    #       graph_pagerank (edge pins);
    # (d) the ENTIRE r7-latest backfill queue named by r14 verdict #2
    #     (30 queries: the fn_* battery, the r7 agg tails,
    #     sql_tpch_q20/21/22, cluster_kmeans, pipeline_corpus_funnel,
    #     embed_pq/whiten, lm_bigram_score, sample_weighted,
    #     domain_quota_sample, doc_chunk_overlap, k_anonymity_check,
    #     vocab_oov_rate, ts_benford/calendar_sessions/tick_bars);
    # (e) next-oldest backfill to the 50 cut: six r8-latest entries
    #     (alphabetical head of the r8 cohort: agg_bloom_sketch,
    #     agg_cms_point, agg_cms_sketch, bpe_encode, bpe_train_merges,
    #     dedup_bloom_probe; the rest of the r8 cohort heads the r16
    #     queue).
    #
    # STANDING ROTATION POLICY (r10+): window = pinned pair + any
    # never-checked new queries + re-check slots for every query whose
    # implementing module OR consumed helper changed since its last
    # green row (check `git log -- <module>` against round markers —
    # including helper modules like _staging/_staged_interchange, the
    # r10 blind spot), then backfill with oldest-evidence queries.
    # After this window the oldest remaining oracle-backed evidence is
    # r8 — verified against the CORRECTNESS_r* ledger this round, NOT
    # copied from a prior comment (the removed r14 note misfiled
    # sim_range_search as r7; the ledger says r9). The 17-query r8
    # cohort heading the r16 backfill queue: dedup_containment,
    # doc_bm25, doc_dup_inflation, drift_ks_test, embed_pca_power,
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
            # (b) new this round
            "ts_epoch_recovery",
            # (c) r15 behavioral-change re-checks (see policy note)
            "ts_epoch_lifecycle", "join_asof_epochs", "stream_asof_epochs",
            "stream_theta", "stream_heavy_hitters", "stream_kll_gate",
            "dedup_near", "dedup_minhash", "graph_kcore",
            "graph_triangles_approx", "graph_pagerank",
            # (d) the full r14-named backfill queue (r7-latest x30)
            "agg_approx_percentile", "agg_entropy", "agg_gini",
            "agg_hll_sketch_union", "agg_markov_transitions", "agg_mode",
            "agg_skew_kurt", "agg_string_agg", "agg_unpivot",
            "cluster_kmeans", "doc_chunk_overlap", "domain_quota_sample",
            "embed_pq", "embed_whiten", "fn_bitwise", "fn_conditional",
            "fn_struct", "fn_surrogate_key", "fn_url",
            "k_anonymity_check", "lm_bigram_score",
            "pipeline_corpus_funnel", "sample_weighted",
            "sql_tpch_q20", "sql_tpch_q21", "sql_tpch_q22",
            "ts_benford", "ts_calendar_sessions", "ts_tick_bars",
            "vocab_oov_rate",
            # (e) r8 backfill to the cut
            "agg_bloom_sketch", "agg_cms_point", "agg_cms_sketch",
            "bpe_encode", "bpe_train_merges", "dedup_bloom_probe",
        ]
    )


_load_all()
