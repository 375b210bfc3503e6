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

    # ROUND-14 verification window (first 50 = the harness's
    # correctness window). Priority per the STANDING ROTATION POLICY
    # (below):
    # (a) the reference-identity pair, pinned permanently;
    # (b) NEW queries, never driver-checked: ts_epoch_lifecycle (the
    #     epoch as-of layout's FULL lifecycle — stage -> append x2 ->
    #     expire(1997) -> compact -> read — under one driver hash
    #     against the boundary-filtered batch ASOF JOIN; r13 verdict
    #     #7) and stream_heavy_hitters (the Misra-Gries maintainer,
    #     sixth streaming sketch — per-trigger Arrow-batched summaries
    #     folded into k=64 counters, exact-count gate oracle,
    #     snapshot-per-batch-id replay safety; r13 verdict #5);
    # (c) re-check slots for r14 behavioral changes, per module:
    #     - operators/asof.py: append_asof_epoch_layout gained the
    #       commit marker + recover_asof_epoch_append (crash
    #       detection/recovery, r13 verdict #2) and expire tolerates
    #       foreign partition dirs (r13 advice) -> join_asof_epochs,
    #       stream_asof_epochs (their staging drives the append path);
    #     - plans/analytics.py: graph_kcore auto-selects the staged
    #       big-edge path via _EDGE_STAGE_PAIRS_MIN (r13 verdict #3)
    #       -> graph_kcore;
    #     - plans/llm.py: dedup_near runs on a conf-scoped session twin
    #       (AQE initialPartitionNum flattened per-query, r13 verdict
    #       #4) -> dedup_near;
    #     - plans/streaming_q.py: stream_theta state versioned by an
    #       attempt counter (replay-safe, r13 advice) -> stream_theta;
    #       stream_asof_epochs appends with idempotent=True and
    #       stream_kll_gate folds from per-batch-id snapshots (the two
    #       remaining at-least-once replay holes, closed late-r14) ->
    #       stream_kll_gate takes the slot sql_tpch_q22 held, and
    #       stream_asof's per-batch writer now overwrites its own
    #       bid partition instead of appending (the replay-duplication
    #       hole of mode("append")) -> stream_asof takes sql_tpch_q21's
    #       slot (q21/q22, r7, head the r15 queue — the two TPC-H
    #       tails not refreshed);
    #     - plans/filtering.py: lm_kn_score promotes n1f/n1b to
    #       DECIMAL before multiplying (overflow order, r13 advice)
    #       -> lm_kn_score;
    #     - operators/multimodal.py: PNG chunk-truncation + palette
    #       validation and the lane/carry Average-Paeth rework (r13
    #       advice + verdict #6; default structural path
    #       output-neutral, slots per policy) -> multimodal_schema,
    #       multimodal_phash, dedup_phash_band.
    # (d) the ENTIRE r6-latest backfill queue named by r13 verdict #1
    #     (30 queries: the 11 sql_tpch tails q4/q6/q8/q12-q19, the
    #     five r13-displaced heads, join_interval_overlap,
    #     join_scd2_pit, token_pmi, the ts_* and win_* tails,
    #     udtf_python) PLUS ts_lttb_gate (r7 — the hash gate grading
    #     the rows-only LTTB must not be the oldest ledger entry);
    # (e) next-oldest backfill to the 50 cut: three r7-latest
    #     sql_tpch entries (q2/q9/q11; q20/q21/q22 displaced by the
    #     late join_asof_tolerance_presorted slot and the stream_asof /
    #     stream_kll_gate re-checks, head the r15 queue).
    #
    # STANDING ROTATION POLICY (r10+): window = pinned pair + any
    # never-checked new queries + re-check slots for every query whose
    # implementing module OR consumed helper changed since its last
    # green row (check `git log -- <module>` against round markers —
    # including helper modules like _staging/_staged_interchange, the
    # r10 blind spot), then backfill with oldest-evidence queries.
    # After this window the oldest remaining oracle-backed evidence is
    # r7 (the non-tpch r7 cohort: agg_approx_percentile, agg_entropy,
    # agg_gini, agg_markov_transitions, agg_mode, agg_skew_kurt,
    # agg_string_agg, agg_unpivot, cluster_kmeans, doc_chunk_overlap,
    # domain_quota_sample, embed_pq, embed_whiten, fn_bitwise,
    # fn_conditional, fn_struct, fn_surrogate_key, fn_url,
    # k_anonymity_check, lm_bigram_score, pipeline_corpus_funnel,
    # sample_weighted, sim_range_search, ts_benford,
    # ts_calendar_sessions, ts_tick_bars, vocab_oov_rate, plus
    # sql_tpch_q20/q21/q22 displaced by the late additions and
    # re-checks — the r15 backfill queue head). The 7 permanently rows-only-by-design
    # queries are sim_ivf, sim_ivf_centroid, sim_ivf_kmeans, sim_nsw,
    # sim_nsw_staged, sim_ivfpq, ts_downsample_lttb — each indirectly
    # gated by a hash-checked contract query (sim_recall r13 /
    # ts_lttb_gate, in THIS window). Everything displaced from this
    # window is hash-green in a prior round with an unchanged
    # implementation and covered by repo-local parity tests
    # (tests/test_parity.py runs the full oracle differential every
    # suite run).
    registry.prioritize(
        [
            # (a) reference identity, pinned
            "ts_range_scan", "ts_min_max",
            # (b) new this round (join_asof_tolerance_presorted, a
            # late-r14 addition completing the presorted variant
            # family, takes sql_tpch_q20's slot — q20 joins q21/q22 at
            # the r15 queue head)
            "ts_epoch_lifecycle", "stream_heavy_hitters",
            "join_asof_tolerance_presorted",
            # (c) r14 behavioral-change re-checks (see policy note)
            "join_asof_epochs", "stream_asof_epochs",
            "graph_kcore", "dedup_near", "stream_theta", "lm_kn_score",
            "multimodal_schema", "multimodal_phash", "dedup_phash_band",
            # (d) the full r13-named backfill queue (r6-latest x30)
            # + ts_lttb_gate (r7, the LTTB hash gate)
            "dedup_ngram_coverage", "dedup_paragraphs", "doc_tfidf",
            "drift_psi_daily", "join_existence_prefilter",
            "join_interval_overlap", "join_scd2_pit",
            "sql_tpch_q4", "sql_tpch_q6", "sql_tpch_q8",
            "sql_tpch_q12", "sql_tpch_q13", "sql_tpch_q14",
            "sql_tpch_q15", "sql_tpch_q16", "sql_tpch_q17",
            "sql_tpch_q18", "sql_tpch_q19",
            "token_pmi", "ts_autocorr", "ts_cusum", "ts_peak_detect",
            "ts_rate", "ts_seasonal_profile", "ts_state_durations",
            "udtf_python", "win_first_last", "win_minmax_norm",
            "win_rsi", "win_streaks",
            "ts_lttb_gate",
            # late-r14 re-checks (see (c) note): the KLL fold and
            # the stream_asof per-batch writer changes
            "stream_kll_gate", "stream_asof",
            # (e) r7 sql_tpch tails
            "sql_tpch_q2", "sql_tpch_q9", "sql_tpch_q11",
        ]
    )


_load_all()
