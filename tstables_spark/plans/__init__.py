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

    # ROUND-10 verification window (first 50 = the harness's correctness
    # window). Priority per the STANDING ROTATION POLICY (see below):
    # (a) the reference-identity pair, pinned permanently;
    # (b) never-driver-checked r10 additions: dedup_substring,
    #     sim_nsw_staged + sim_ivfpq (rows-only by design) and
    #     sim_recall, whose hash-checked output gained the nsw_staged +
    #     ivfpq recall rows (so its r9 green is stale by construction);
    # (c) re-check slots — behavioral change after the query's last
    #     green row (checked commit-by-commit, not just module mtime):
    #     - operators/similarity.py nsw_topk walk re-tuned r10
    #       (30e64cd): sim_nsw (r9);
    #     - operators/heavyhitters.py mg_partitions vectorized r10
    #       (765a75f): agg_heavy_hitters (r9);
    #     - 935401e (r9, post-window): _qsketch_cells domain contract →
    #       agg_qsketch, agg_qsketch_quantiles, stream_qsketch (r8
    #       greens predate it); OLS degenerate-group guard →
    #       agg_linear_regression (r8); RANGE-frame seasonal trend →
    #       ts_seasonal_decompose (r8) — the latter two are the r9
    #       ADVICE medium item, honored here;
    #     - 55486de (r10) epoch_floor_div at ten bucketing sites:
    #       graph_degree_dist (r6), forecast_naive_eval (r7),
    #       graph_pagerank (r7), graph_triangles (r8), graph_jaccard
    #       (r8), ts_cross_rank (r6), ts_twap (r6),
    #       ts_watermark_lateness (r7), ts_xcorr_lags (r7),
    #       ts_motif (r9);
    #     - d2fbce8 (r10) staging-root consolidation rewrote the
    #       scratch-dir/saveAsTable path inside these query bodies:
    #       ts_create_append, sink_parquet_partitioned, ts_compact,
    #       ts_upsert, ts_schema_evolve, ts_partitions,
    #       ts_retention_purge, ts_time_travel, ts_catalog,
    #       ts_multi_series_align, ts_read_at, the staged as-of tables
    #       (join_asof_presorted / _forward / _nearest / _multi),
    #       multimodal_schema, multimodal_dedup, sink_orc_roundtrip,
    #       join_bucketed, stream_ingest, stream_upsert, stream_asof,
    #       stream_kll_gate;
    #     - module-sentinel slots for purely-ADDITIVE r10 changes
    #       (no existing line touched; r9 greens postdate the last
    #       behavioral edit): sim_topk, sim_knn_graph,
    #       dedup_embed_clusters for similarity.py (+stage_nsw_layout /
    #       +ivfpq blocks), dedup_editdist for dedup.py
    #       (+dedup_substring helper). Displaced by the 50 cut, same
    #       rationale, r9-green: sim_range_search, sim_matryoshka,
    #       dedup_embed, dedup_near, dedup_prefix, join_asof family
    #       one-shot variants (asof.py r10 change was docstring-only),
    #       multimodal_frames (no staging in its body),
    #       stream_stateful, multimodal_audio_energy.
    # (d) oldest-evidence backfill: zero slots this round — (c) demand
    #     filled the window. Oldest remaining evidence after this
    #     window: the r4 cohort listed in the rotation note below.
    #
    # STANDING ROTATION POLICY (r10+): window = pinned pair + any
    # never-checked new queries + re-check slots for every query whose
    # implementing module changed since its last green row (check
    # `git log -- <module>` against round markers), then backfill with
    # oldest-evidence queries. After this window the oldest remaining
    # evidence is the r4 cohort (win_lag_lead, win_rolling,
    # win_range_frame, ts_resample_ohlc, ts_fill_forward, ts_densify,
    # ts_interpolate, ts_vwap, win_zscore, win_running_total, ts_outlier_iqr,
    # agg_histogram, zorder_layout hash family, dedup_near_maxdf,
    # decontaminate, pii_redact, quality_filter, repetition_score,
    # text_normalize, embed_normalize, embed_quantize, udtf_apply_in_pandas,
    # cdc_scd2 r6...) plus whatever r2 names miss this window's 50 cut.
    # The 7 permanently rows-only-by-design queries are sim_ivf,
    # sim_ivf_centroid, sim_ivf_kmeans, sim_nsw (r9), sim_nsw_staged
    # (r10), sim_ivfpq (r10), ts_downsample_lttb — each indirectly gated by a
    # hash-checked contract query (sim_recall / ts_lttb_gate). Everything displaced from this window is
    # hash-green in a prior round with an unchanged implementation and
    # covered by repo-local parity tests.
    registry.prioritize(
        [
            # (a) reference identity, pinned
            "ts_range_scan", "ts_min_max",
            # (b) r10 additions, never driver-checked: exact substring
            # dedup, staged NSW read, IVF-PQ — plus the sim_recall gate
            # whose output gained the two new recall rows
            "dedup_substring", "sim_nsw_staged", "sim_ivfpq",
            "sim_recall",
            # (c) behavioral r10 changes after r9 greens: NSW walk
            # re-tune; Misra-Gries partition-pass vectorization
            "sim_nsw", "agg_heavy_hitters",
            # (c) 935401e post-r9-window: qsketch domain contract, OLS
            # degenerate guard, RANGE-frame seasonal trend (the r9
            # ADVICE medium item)
            "agg_qsketch", "agg_qsketch_quantiles", "stream_qsketch",
            "agg_linear_regression", "ts_seasonal_decompose",
            # (c) 55486de epoch_floor_div sites
            "graph_degree_dist", "forecast_naive_eval",
            "graph_pagerank", "graph_triangles", "graph_jaccard",
            "ts_cross_rank", "ts_twap", "ts_watermark_lateness",
            "ts_xcorr_lags", "ts_motif",
            # (c) d2fbce8 staging-root consolidation sites
            "ts_create_append", "sink_parquet_partitioned",
            "ts_compact", "ts_upsert", "ts_schema_evolve",
            "ts_partitions", "ts_retention_purge", "ts_time_travel",
            "ts_catalog", "ts_multi_series_align", "ts_read_at",
            "join_asof_presorted", "join_asof_forward_presorted",
            "join_asof_nearest_presorted", "join_asof_multi_presorted",
            "multimodal_schema", "multimodal_dedup",
            "sink_orc_roundtrip", "join_bucketed",
            "stream_ingest", "stream_upsert", "stream_asof",
            "stream_kll_gate",
            # (c) module-sentinel slots for purely-additive r10 module
            # growth (similarity.py, dedup.py)
            "sim_topk", "sim_knn_graph", "dedup_embed_clusters",
            "dedup_editdist",
        ]
    )


_load_all()
