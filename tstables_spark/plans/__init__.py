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

    # ROUND-12 verification window (first 50 = the harness's correctness
    # window). Priority per the STANDING ROTATION POLICY (below):
    # (a) the reference-identity pair, pinned permanently;
    # (b) NEW queries, never driver-checked: graph_triangles_approx
    #     (DOULION edge-sampled estimator, deterministic md5 coin →
    #     fully hash-checkable) and graph_triangles_gate (exact census
    #     + estimate + within_tol boolean — the sim_recall gate
    #     pattern for the sampled census);
    # (c) re-check slots for r12 behavioral changes, per module:
    #     - analytics.py: graph_pagerank rewritten (per-iteration state
    #       O(nodes) — deg pinned once, ranks broadcast into the edge
    #       scan; the 100x-8g-OOM fix), graph_triangles refactored onto
    #       the shared _oriented_census the estimator reuses;
    #     - similarity.py: ivfpq_topk pq_k clamped to the corpus size
    #       (ADVICE r11) → sim_ivfpq (rows-only) + sim_recall (the
    #       hash gate that grades it); stage_nsw_layout rebuilt as
    #       block-partitioned tables with an incremental
    #       append_nsw_layout path → sim_nsw_staged (rows-only, also
    #       graded by sim_recall);
    #     - operators/components.py: both connected-components pins
    #       switched to serialized MEMORY_AND_DISK (output-neutral pin
    #       discipline) → consumers dedup_clusters, dedup_cluster_sizes,
    #       dedup_embed_clusters;
    #     - multimodal.py: _decode_real now really decodes WAV PCM →
    #       multimodal_audio_energy;
    #     - operators/asof.py: stage_asof_layout's writer factored out
    #       and shared with the new append_asof_layout (output-neutral)
    #       → the three consumers of that layout, join_asof_presorted,
    #       join_asof_forward_presorted, join_asof_nearest_presorted
    #       (join_asof_multi_presorted stages through the untouched
    #       stage_asof_multi_layout — verified, no slot).
    # (d) oldest-evidence backfill — the r11 verdict's #1 item, the
    #     28-query r12 queue, all of it inside this window: the r4-era
    #     tail (ts_densify, ts_interpolate, win_running_total,
    #     ts_resample_ohlc, ts_fill_forward, win_lag_lead, win_rolling,
    #     win_range_frame, win_rank, ts_vwap, ts_outlier_iqr,
    #     agg_histogram, zorder_layout, dedup_near_maxdf, decontaminate,
    #     pii_redact, quality_filter, repetition_score, text_normalize,
    #     embed_normalize, embed_quantize, udtf_apply_in_pandas,
    #     dedup_clusters [slotted above in (c)], join_range,
    #     join_range_banded, sql_tpch_q3, sql_tpch_q5, stream_session),
    #     then the head of the r5 cohort to the 50 cut (agg_corr,
    #     bpe_pair_counts, dedup_incremental, dedup_keep_latest,
    #     dedup_simhash, dq_check, embed_dim_stats).
    #
    # STANDING ROTATION POLICY (r10+): window = pinned pair + any
    # never-checked new queries + re-check slots for every query whose
    # implementing module OR consumed helper changed since its last
    # green row (check `git log -- <module>` against round markers —
    # including helper modules like _staging/_staged_interchange, the
    # r10 blind spot), then backfill with oldest-evidence queries.
    # After this window the oldest remaining evidence is the r5 tail
    # (funnel_steps, lm_unigram_score, mix_weights, profile_table,
    # retention_cohorts, sample_stratified, split_temporal,
    # sql_tpch_q10, sql_tpch_q7, ts_downsample_m4, ts_gaps,
    # ts_interval_merge, ts_sessionize, win_corr, win_drawdown,
    # win_rolling_median) — the r13 backfill queue head (16 queries;
    # every r1-r4 cohort is then re-evidenced r10-r12). The 7
    # permanently rows-only-by-design queries are sim_ivf,
    # sim_ivf_centroid, sim_ivf_kmeans, sim_nsw, sim_nsw_staged,
    # sim_ivfpq, ts_downsample_lttb — each indirectly gated by a
    # hash-checked contract query (sim_recall / ts_lttb_gate).
    # Everything displaced from this window is hash-green in a prior
    # round with an unchanged implementation and covered by repo-local
    # parity tests (tests/test_parity.py runs the full 265-oracle
    # differential every suite run).
    #
    # LATE-r12 CHANGES, after this window was drawn (none displace a
    # slot): (a) graph_pagerank / graph_triangles / the DOULION pair
    # gained the two-knob big-graph strategy (streamed edge staging +
    # strategy stats) — all four already hold slots above, which is
    # exactly what the slots are for; a forced-knob plan test
    # additionally asserts big == small results. (b) registry.wrapped
    # now forwards **kwargs (signature-only, output-neutral for the
    # driver's bare (spark, sf_dir) calls); the full parity suite and
    # a 50/50 window rehearsal ran green AFTER the change. (c)
    # session.py gained G1/AQE confs — the driver runs queries under
    # ITS OWN vanilla session, so the correctness surface is
    # untouched; the bench re-measured in-band under them.
    registry.prioritize(
        [
            # (a) reference identity, pinned
            "ts_range_scan", "ts_min_max",
            # (b) new this round: the sampled triangle census + gate
            "graph_triangles_approx", "graph_triangles_gate",
            # (c) r12 behavioral-change re-checks (see policy note)
            "graph_pagerank", "graph_triangles",
            "sim_ivfpq", "sim_recall", "sim_nsw_staged",
            "dedup_clusters", "dedup_cluster_sizes",
            "dedup_embed_clusters",
            "multimodal_audio_energy",
            "join_asof_presorted", "join_asof_forward_presorted",
            "join_asof_nearest_presorted",
            # (d) the 28-query r12 backfill queue (dedup_clusters
            # already slotted in (c)), oldest evidence first
            "ts_densify", "ts_interpolate", "win_running_total",
            "ts_resample_ohlc", "ts_fill_forward", "win_lag_lead",
            "win_rolling", "win_range_frame", "win_rank", "ts_vwap",
            "ts_outlier_iqr", "agg_histogram", "zorder_layout",
            "dedup_near_maxdf", "decontaminate", "pii_redact",
            "quality_filter", "repetition_score", "text_normalize",
            "embed_normalize", "embed_quantize", "udtf_apply_in_pandas",
            "join_range", "join_range_banded", "sql_tpch_q3",
            "sql_tpch_q5", "stream_session",
            # (d) r5-cohort head, to the 50 cut
            "agg_corr", "bpe_pair_counts", "dedup_incremental",
            "dedup_keep_latest", "dedup_simhash", "dq_check",
            "embed_dim_stats",
        ]
    )


_load_all()
