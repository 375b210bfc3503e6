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

    # ROUND-8 verification window (first 50 = the harness's correctness
    # window). Priority per the standing rotation policy:
    # (a) the reference-identity pair, pinned permanently;
    # (b) the TWELVE queries added in r7 plus the TWENTY-ONE added in
    #     r8 — local-parity green at three scales, never
    #     driver-windowed; their first driver evidence is this round's
    #     headline (-> 251/255 ever-green, the max possible given the
    #     4 rows-only-by-design gates). 2+12+21+12 re-checks = 47 of
    #     50: the window is FULL — any further r8 additions go BELOW
    #     the (c) re-checks and wait for the r9 window.
    #     NOTE the list below intentionally holds MORE than 50 names:
    #     only the first 50 are the window (verified: fn_math is #50);
    #     the tail (fn_array..join_bucketed) is ordered next-in-line
    #     backfill, NOT covered this round — the r9 plan must treat
    #     those as oldest-evidence, not as re-checked. QUEUED FOR r9
    #     (registered after the window filled, never driver-checked,
    #     local-parity green at 3 scales): multimodal_audio_energy;
    # (c) re-check slots for every query whose implementing module
    #     changed since its last green row: the r7 core-lifecycle
    #     hardening (1432c25 + b05b44a touched tstable.py + streaming/
    #     AFTER the r5/r6 greens of ts_create_append, ts_compact,
    #     ts_upsert, ts_time_travel, ts_retention_purge, ts_catalog,
    #     ts_multi_series_align, stream_ingest, stream_upsert) and the
    #     r8 distributed_cumsum de-literalization (operators/packing.py
    #     consumers: drift_ks_test, pack_sequences — the other two
    #     consumers, vocab_coverage_curve and ts_robust_zscore, are
    #     already in (b));
    # (d) oldest-evidence backfill: the r1 scalar/UDF tail and the r2
    #     relational head, green since r1/r2 with unchanged modules.
    #
    # STANDING ROTATION POLICY (r9+): window = pinned pair + any
    # never-checked new queries + re-check slots for every query whose
    # implementing module changed since its last green row (check
    # `git log -- <module>` against round markers), then backfill with
    # oldest-evidence queries (after this window the oldest remaining
    # evidence is the r2 relational tail: join_multi, join_left,
    # join_full, join_semi, join_anti, agg_pricing_summary,
    # agg_distinct, agg_pivot, agg_percentiles, agg_rollup, agg_cube,
    # agg_grouping_sets, sort_limit, topk_per_group, set_union,
    # set_intersect, set_except, sample_hash, split_train_test,
    # vocab_topk, doc_top_terms, embed_centroid, dedup_exact,
    # dedup_embed, sim_topk, text_stats, token_count, lang_id,
    # quality_score, doc_fingerprint).
    # The 4 permanently rows-only-by-design queries are sim_ivf,
    # sim_ivf_centroid, sim_ivf_kmeans, ts_downsample_lttb — each
    # indirectly gated by a hash-checked contract query (sim_recall /
    # ts_lttb_gate). Everything displaced from this window is
    # hash-green in a prior round with an unchanged implementation and
    # covered by repo-local parity tests.
    registry.prioritize(
        [
            # (a) reference identity, pinned
            "ts_range_scan", "ts_min_max",
            # (b) the twelve r7 additions — first driver evidence
            "dedup_containment", "ts_rollup_hier", "vocab_coverage_curve",
            "ts_robust_zscore", "graph_triangles", "agg_cms_sketch",
            "agg_cms_point", "stream_cms", "join_asof_presorted",
            "mix_temperature", "doc_dup_inflation", "ts_read_at",
            # (b) added r8, never checked
            "join_asof_multi_presorted",
            "agg_bloom_sketch", "dedup_bloom_probe", "stream_bloom",
            "ts_seasonal_decompose", "agg_linear_regression",
            "win_distribution", "bpe_train_merges", "embed_pca_power",
            "agg_qsketch", "agg_qsketch_quantiles", "stream_qsketch",
            "embed_spectral_outlier", "assoc_rules", "graph_jaccard",
            "doc_bm25", "join_asof_forward_presorted",
            "join_asof_nearest_presorted", "ts_pattern_match",
            "bpe_encode", "stream_pattern",
            # (c) re-checks: core-lifecycle hardening landed after these
            # queries' last green rows (tstable.py / streaming/)
            "ts_create_append", "ts_compact", "ts_upsert",
            "ts_time_travel", "ts_retention_purge", "ts_catalog",
            "ts_multi_series_align", "stream_ingest", "stream_upsert",
            # (c) re-checks: distributed_cumsum consumers changed r8;
            # sim_recall gates the IVF/LSH paths refactored r8
            "drift_ks_test", "pack_sequences", "sim_recall",
            # (d) oldest-evidence backfill: r1 scalar/UDF tail
            "fn_string", "fn_date", "fn_math", "fn_array", "fn_map",
            "fn_json", "udf_scalar_pandas", "udaf_grouped_agg",
            # (d) oldest-evidence backfill: r2 relational head
            "scan_parquet", "scan_csv", "scan_json", "project_filter",
            "join_broadcast", "join_shuffle", "join_salted",
            "join_bucketed",
        ]
    )


_load_all()
