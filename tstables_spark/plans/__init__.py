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

    # ROUND-13 verification window (first 50 = the harness's
    # correctness window). Priority per the STANDING ROTATION POLICY
    # (below):
    # (a) the reference-identity pair, pinned permanently;
    # (b) NEW queries, never driver-checked: join_asof_epochs (the
    #     epoch-partitioned bounded-append as-of layout; its staging
    #     deliberately drives the append path), stream_asof_epochs
    #     (streaming foreachBatch ingest into that layout — per-batch
    #     bounded epoch appends converging to the batch ASOF JOIN),
    #     and the five late-r13 additions: graph_kcore (k-core
    #     peeling over the md5-sparsified co-occurrence graph;
    #     unrolled-SQL oracle, fixpoint-unique), agg_theta_sketch
    #     (portable KMV/theta intersection — estimates themselves
    #     hash-checked, not just tolerance booleans), lm_kn_score
    #     (Kneser-Ney bigram LM scoring, scale-12 fixed point),
    #     dedup_url (URL canonicalization dedup, scan-side HOFs), and
    #     stream_theta (the KMV maintainer — stream-merged ==
    #     batch-built hash by hash, bounded groups×k state);
    # (c) re-check slots for r13 behavioral changes, per module:
    #     - analytics.py: _edge_pin gained per-(app, key) streamed
    #       scratch caching (now via _staging.stream_pin) and
    #       _oriented_census threads the cache key -> graph_pagerank
    #       (deg-pin storage level honors big_nodes in the small-edge
    #       branch too), graph_triangles, graph_triangles_approx (cut
    #       validation + cached pins), graph_triangles_gate;
    #     - operators/dedup.py: minhash_lsh_pairs gained the
    #       two-path pin strategy (streamed scratch tables above an
    #       estimated row bound, the 100x envelope fix) ->
    #       dedup_minhash;
    #     - operators/similarity.py: append_nsw_layout reworked into
    #       three idempotent partition overwrites (crash recovery) ->
    #       sim_nsw_staged (rows-only) + sim_recall (its hash gate);
    #     - streaming_q.py: stream_ohlc re-registered as
    #       watermark+append with the tail-withholding oracle (the
    #       bounded production shape; r12 verdict #5) -> stream_ohlc;
    #     - operators/components.py: the per-round convergence probe
    #       now rides the checkpoint job via observe() (one O(nodes)
    #       scan per round eliminated; same unique min fixpoint; a
    #       deeper 3-way jump was measured and REJECTED — exponential
    #       planning growth, see the kernel comment) -> consumers
    #       dedup_clusters, dedup_cluster_sizes, dedup_embed_clusters;
    #     - operators/multimodal.py: _decode_real opens the image
    #       half (stdlib BMP/PPM/PGM), image_ahash gained use_real ->
    #       consumers multimodal_schema (decode_features),
    #       multimodal_phash, dedup_phash_band (image_ahash; default
    #       paths output-neutral, slots per policy).
    # (d) the legacy rows-only ANN trio (r12 verdict #2): sim_ivf (r2),
    #     sim_ivf_centroid (r2), sim_ivf_kmeans (r4) — the last pre-r5
    #     ledger entries, graded by the sim_recall gate slotted in (c);
    # (e) oldest-evidence backfill (r12 verdict #1): win_ewma (r4, the
    #     single oldest oracle-backed entry), then the ENTIRE r5 cohort
    #     (17 queries incl. the rows-only ts_downsample_lttb, gated by
    #     ts_lttb_gate), then the r6 cohort head to the 50 cut.
    #
    # STANDING ROTATION POLICY (r10+): window = pinned pair + any
    # never-checked new queries + re-check slots for every query whose
    # implementing module OR consumed helper changed since its last
    # green row (check `git log -- <module>` against round markers —
    # including helper modules like _staging/_staged_interchange, the
    # r10 blind spot), then backfill with oldest-evidence queries.
    # After this window the oldest remaining evidence is the r6 tail
    # (17 queries, named beside the (e) slots below) — the r14
    # backfill queue head; every r1-r5 cohort is then re-evidenced
    # r10-r13. The 7 permanently rows-only-by-design queries are
    # sim_ivf, sim_ivf_centroid, sim_ivf_kmeans, sim_nsw,
    # sim_nsw_staged, sim_ivfpq, ts_downsample_lttb — each indirectly
    # gated by a hash-checked contract query (sim_recall /
    # ts_lttb_gate). Everything displaced from this window is
    # hash-green in a prior round with an unchanged implementation and
    # covered by repo-local parity tests (tests/test_parity.py runs
    # the full 272-oracle differential every suite run).
    # LATE-r13 CHANGES, after this window was drawn (none displace a
    # slot — every touched query already holds one): two code reviews
    # landed fixes in append_nsw_layout (delta pin, same-block
    # replacement contract), append_asof_epoch_layout (null-epoch
    # preservation, lock-serialized overwrite toggle, observed epoch
    # set), the epoch staging's NULL-ts split, image_ahash's unknown-
    # mime gate, minhash's cache-first knob, and the CC observe probe.
    # The FULL 50-slot window was re-rehearsed green AFTER the last of
    # these (sf0.01, vanilla session), and the two epoch queries are
    # additionally sf0.1-parity-green. A final late-r13 change DID
    # re-shape the window: stage_asof_layout / append_asof_layout now
    # encode through the shared _encode_asof_sides (output-neutral —
    # the same bytes, now structural), so their three presorted
    # consumers take re-check slots, displacing three more r6-head
    # entries to the r14 queue; the window was re-rehearsed after.
    # LATER STILL (the r13 continuation session): the five (b)-group
    # operator additions (graph_kcore, agg_theta_sketch, lm_kn_score,
    # dedup_url, stream_theta) displaced five more r6-head entries;
    # the FULL 50-slot window was re-rehearsed green at sf0.01 after
    # EACH addition batch AND after the post-landing review fixes and
    # the stdlib PNG decoder (five rehearsal passes total), and every
    # new query is additionally sf0.1-parity-green.
    registry.prioritize(
        [
            # (a) reference identity, pinned
            "ts_range_scan", "ts_min_max",
            # (b) new this round: epoch-partitioned as-of layout +
            # the five late-r13 operator additions
            "join_asof_epochs", "stream_asof_epochs", "graph_kcore",
            "agg_theta_sketch", "lm_kn_score", "dedup_url",
            "stream_theta",
            # (c) r13 behavioral-change re-checks (see policy note)
            "graph_pagerank", "graph_triangles",
            "graph_triangles_approx", "graph_triangles_gate",
            "dedup_minhash",
            "sim_nsw_staged", "sim_recall",
            "stream_ohlc",
            "multimodal_schema", "multimodal_phash", "dedup_phash_band",
            "dedup_clusters", "dedup_cluster_sizes", "dedup_embed_clusters",
            "join_asof_presorted", "join_asof_forward_presorted",
            "join_asof_nearest_presorted",
            # (d) the legacy rows-only ANN trio (last pre-r5 entries)
            "sim_ivf", "sim_ivf_centroid", "sim_ivf_kmeans",
            # (e) oldest-evidence backfill: win_ewma (r4), then the
            # full r5 cohort
            "win_ewma",
            "funnel_steps", "lm_unigram_score", "mix_weights",
            "profile_table", "retention_cohorts", "sample_stratified",
            "split_temporal", "sql_tpch_q10", "sql_tpch_q7",
            "ts_downsample_lttb", "ts_downsample_m4", "ts_gaps",
            "ts_interval_merge", "ts_sessionize", "win_corr",
            "win_drawdown", "win_rolling_median",
            # (e) r6-cohort head, to the 50 cut (tail queued for r14:
            # dedup_ngram_coverage, dedup_paragraphs, doc_tfidf,
            # drift_psi_daily, join_existence_prefilter — displaced
            # by the five late-r13 new-query slots — plus
            # join_interval_overlap, join_scd2_pit,
            # sql_tpch_q12/q13/q14/q15/q16/q17/q18/q19/q4/q6/q8, token_pmi, ts_autocorr,
            # ts_cusum, ts_peak_detect, ts_rate, ts_seasonal_profile,
            # ts_state_durations, udtf_python, win_first_last,
            # win_minmax_norm, win_rsi, win_streaks)
            "agg_approx_distinct", "attribution_last_touch", "cdc_scd2",
        ]
    )


_load_all()
