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

    # ROUND-9 verification window (first 50 = the harness's correctness
    # window). Priority per the STANDING ROTATION POLICY (see below):
    # (a) the reference-identity pair, pinned permanently;
    # (b) never-driver-checked queries: multimodal_audio_energy
    #     (registered after the r8 window filled; the only query with
    #     zero driver evidence) plus any r9 additions, inserted right
    #     after it as they land;
    # (c) re-check slots for every query whose implementing operator
    #     module changed in r8 AFTER its last green row, or whose
    #     module is being changed THIS round:
    #     - operators/dedup.py changed r8 (spread_small_scan streaming
    #       guard) and changes r9 (editdist second blocking key):
    #       dedup_editdist (r5), dedup_near (r7), dedup_prefix (r7 —
    #       also a packing.py/distributed_cumsum consumer, changed r8);
    #     - operators/asof.py grew the directional presorted family in
    #       r8 after the one-shot family's greens, and stream_asof is
    #       rewired through the staged layout in r9: join_asof (r7),
    #       join_asof_tolerance/forward/nearest/multi (r5),
    #       stream_asof (r6);
    #     - operators/similarity.py was heavily refactored in r8 (dim
    #       threading, banded pair generation, probe masks) after:
    #       sim_topk (r2), sim_knn_graph (r7), sim_range_search (r6),
    #       sim_matryoshka (r6), dedup_embed (r2),
    #       dedup_embed_clusters (r4);
    #     - streaming/stateful.py changed r8 (tws twin) + r9
    #       (conditional registration): stream_stateful (r7);
    #     - operators/multimodal.py changed r8 (audio kernel) + r9
    #       (numpy vectorization): multimodal_schema/frames/dedup (r6);
    # (d) oldest-evidence backfill: the r2 relational/pipeline/llm tail
    #     (unchanged modules, green since r2).
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
            # (b) never driver-checked: registered after the r8 window
            # filled; r9 additions insert directly below this line
            "multimodal_audio_energy",
            # (b) added r9: graph-based ANN + its gate (sim_recall's
            # output gained the sim_nsw row, so its r8 green is stale)
            "sim_nsw", "sim_recall",
            # (b) added r9: per-brand skyline (bounded-domain plan),
            # per-doc trigram novelty (fingerprinted-gram shuffles),
            # deterministic KLL quantile-sketch rank gate
            "pareto_frontier", "token_ngram_novelty", "agg_kll_gate",
            # (b) added r9: sort-free exact per-group winsorization,
            # image aHash near-dup clusters, banded motif discovery
            "agg_winsorize", "multimodal_phash", "ts_motif",
            # (b) added r9: streaming KLL fold (lifecycle twin),
            # banded Hamming near-miss pHash pairs, Heaps-law curve,
            # Misra-Gries heavy hitters
            "stream_kll_gate", "dedup_phash_band", "vocab_growth",
            "agg_heavy_hitters",
            # (c) re-checks: dedup.py changed r8+r9
            "dedup_editdist", "dedup_near", "dedup_prefix",
            # (c) re-checks: asof.py changed r8; stream_asof rewired r9
            "join_asof", "join_asof_tolerance", "join_asof_forward",
            "join_asof_nearest", "join_asof_multi", "stream_asof",
            # (c) re-checks: similarity.py refactored r8
            "sim_topk", "sim_knn_graph", "sim_range_search",
            "sim_matryoshka", "dedup_embed", "dedup_embed_clusters",
            # (c) re-checks: stateful.py changed r8+r9
            "stream_stateful",
            # (c) re-checks: multimodal.py changed r8+r9
            "multimodal_schema", "multimodal_frames", "multimodal_dedup",
            # (d) oldest-evidence backfill: the r2 relational tail —
            # green since r2, modules unchanged since
            "join_multi", "join_left", "join_full", "join_semi",
            "join_anti", "agg_pricing_summary", "agg_distinct",
            "agg_pivot", "agg_percentiles", "agg_rollup", "agg_cube",
            "agg_grouping_sets", "sort_limit", "topk_per_group",
            "set_union", "set_intersect", "set_except", "sample_hash",
            "split_train_test", "vocab_topk", "doc_top_terms",
            "embed_centroid", "dedup_exact", "text_stats",
            "token_count", "lang_id", "quality_score",
            "doc_fingerprint",
        ]
    )


_load_all()
