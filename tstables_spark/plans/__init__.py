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

    # ROUND-11 verification window (first 50 = the harness's correctness
    # window). Priority per the STANDING ROTATION POLICY (see below):
    # (a) the reference-identity pair, pinned permanently;
    # (b) re-check slots for r11 behavioral changes:
    #     - ivfpq_topk PQ codebook: seeded from the actual lowest-pq_k
    #       ids + one distributed Lloyd refinement per block (the r10
    #       verdict's id-space-precondition fix) → sim_ivfpq (rows-only)
    #       and sim_recall, whose hash-checked ivfpq row now grades the
    #       refined codebook (recall 0.96/0.96/0.98, was .92 at sf0.1);
    #     - nsw_topk_staged checkpoint default flipped to False (staged
    #       leaves make re-scan cheaper than eager pins; results
    #       asserted identical) → sim_nsw_staged (rows-only);
    #     - module sentinel for similarity.py: sim_nsw (r10 green; its
    #       _nsw_walk core is shared with the changed staged path but
    #       itself untouched — the sentinel catches accidental fallout);
    # (c) re-check slots the r10 window MISSED for d2fbce8's staging
    #     consolidation (the r10 ADVICE items, all three honored here):
    #     scan_csv + scan_json consume _staged_interchange
    #     (relational.py), rewritten r10, last green r2 — they belonged
    #     in the r10 window and head this one; the staged stream source
    #     (_staged_table/_read_stream, streaming_q.py) was also moved by
    #     d2fbce8, so every consumer whose green predates r10 gets a
    #     slot: stream_tumbling (r5), stream_dedup (r5), stream_join
    #     (r5), stream_append_windows (r5), stream_enrich (r5),
    #     stream_ohlc (r5), stream_sliding (r7), stream_cms (r8),
    #     stream_pattern (r8), stream_stateful (r9). (stream_session
    #     reads the batch loader, not the staged source — verified, no
    #     slot needed; stream_ingest/upsert/asof/kll_gate/qsketch were
    #     re-checked green r10.)
    # (d) oldest-evidence backfill (the r10 verdict's named goal for
    #     this round): the full r1 cohort (fn_array, fn_json, fn_map,
    #     udaf_grouped_agg, udf_scalar_pandas), the full remaining r2
    #     cohort (dedup_exact, doc_fingerprint, doc_top_terms,
    #     embed_centroid, join_broadcast, join_salted, join_shuffle,
    #     lang_id, project_filter, quality_score, sample_hash,
    #     scan_parquet, set_except, split_train_test, text_stats,
    #     token_count, vocab_topk), then the r4 cohort up to the 50 cut
    #     (win_lag_lead, win_rolling, win_range_frame, win_rank,
    #     win_zscore, win_running_total, ts_resample_ohlc,
    #     ts_fill_forward, ts_densify, ts_interpolate).
    #
    # STANDING ROTATION POLICY (r10+): window = pinned pair + any
    # never-checked new queries + re-check slots for every query whose
    # implementing module OR consumed helper changed since its last
    # green row (check `git log -- <module>` against round markers —
    # including helper modules like _staging/_staged_interchange, the
    # r10 blind spot), then backfill with oldest-evidence queries.
    # After this window the oldest remaining evidence is the r4 tail
    # (ts_vwap, ts_outlier_iqr, agg_histogram, zorder_layout,
    # dedup_near_maxdf, decontaminate, pii_redact, quality_filter,
    # repetition_score, text_normalize, embed_normalize, embed_quantize,
    # udtf_apply_in_pandas, dedup_clusters, join_range,
    # join_range_banded, sql_tpch_q3, sql_tpch_q5, stream_session) —
    # the r12 backfill queue head. LATE-r11 ADDITION: the two
    # corpus-sized eager pins switched to SERIALIZED MEMORY_AND_DISK
    # (minhash fingerprint pin, operators/dedup.py; assoc_rules basket
    # pin, analytics.py — the 100x-docs OOM fix, SCALE.md r11).
    # Output-neutral, but per this policy both consumers get re-check
    # slots — dedup_minhash (r7) and assoc_rules (r8) displace
    # ts_densify and ts_interpolate to the r12 queue head. The same
    # audit then fixed simhash_pairs' identical unpinned self-join and
    # aligned prefix_dup_flags' corpus-sized pin and editdist's
    # occupancy-guard scan with the serialized-pin discipline, so
    # dedup_simhash_pairs (r5), dedup_prefix (r9) and dedup_editdist
    # (r10) also get slots, displacing win_running_total,
    # ts_resample_ohlc and ts_fill_forward to the r12 queue head.
    # The 100x-events sweep then found the same unpinned-self-join bug
    # in cooccurrence_edges (the shared graph-edge derivation) and
    # OOM-measured graph_pagerank's doubled edge pin, so the pin moved
    # to the half edge list, serialized — graph_degree_dist,
    # graph_pagerank, graph_triangles and graph_jaccard (all r10
    # green, all consumers of the changed derivation) take four more
    # slots, displacing win_lag_lead, win_rolling, win_range_frame
    # and win_rank to the r12 queue head. The r12 backfill queue is
    # therefore: scan-era r4 tail (ts_densify, ts_interpolate,
    # win_running_total, ts_resample_ohlc, ts_fill_forward,
    # win_lag_lead, win_rolling, win_range_frame, win_rank, ts_vwap,
    # ts_outlier_iqr, agg_histogram, zorder_layout, dedup_near_maxdf,
    # decontaminate, pii_redact, quality_filter, repetition_score,
    # text_normalize, embed_normalize, embed_quantize,
    # udtf_apply_in_pandas, dedup_clusters, join_range,
    # join_range_banded, sql_tpch_q3, sql_tpch_q5, stream_session).
    # The 7 permanently
    # rows-only-by-design queries are sim_ivf, sim_ivf_centroid,
    # sim_ivf_kmeans, sim_nsw, sim_nsw_staged, sim_ivfpq,
    # ts_downsample_lttb — each indirectly gated by a hash-checked
    # contract query (sim_recall / ts_lttb_gate). Everything displaced
    # from this window is hash-green in a prior round with an unchanged
    # implementation and covered by repo-local parity tests.
    registry.prioritize(
        [
            # (a) reference identity, pinned
            "ts_range_scan", "ts_min_max",
            # (b) r11 behavioral changes: refined IVF-PQ codebook,
            # staged-NSW checkpoint default, the sim_recall gate that
            # hash-grades both, and the similarity.py sentinel
            "sim_ivfpq", "sim_nsw_staged", "sim_recall", "sim_nsw",
            # (c) d2fbce8 helper-consumer re-checks the r10 window
            # missed (r10 ADVICE): the staged interchange pair, then
            # the staged-stream consumers oldest-green first
            "scan_csv", "scan_json",
            "stream_tumbling", "stream_dedup", "stream_join",
            "stream_append_windows", "stream_enrich", "stream_ohlc",
            "stream_sliding", "stream_cms", "stream_pattern",
            "stream_stateful",
            # (d) oldest-evidence backfill: r1 cohort
            "fn_array", "fn_json", "fn_map",
            "udaf_grouped_agg", "udf_scalar_pandas",
            # (d) r2 cohort
            "dedup_exact", "doc_fingerprint", "doc_top_terms",
            "embed_centroid", "join_broadcast", "join_salted",
            "join_shuffle", "lang_id", "project_filter",
            "quality_score", "sample_hash", "scan_parquet",
            "set_except", "split_train_test", "text_stats",
            "token_count", "vocab_topk",
            # (b-late) pin-discipline re-checks (see policy note):
            # queries whose plans gained or changed eager pins
            "dedup_minhash", "assoc_rules", "dedup_simhash_pairs",
            "dedup_prefix", "dedup_editdist",
            "graph_degree_dist", "graph_pagerank", "graph_triangles",
            "graph_jaccard",
            # (d) r4 cohort, to the 50 cut
            "win_zscore",
        ]
    )


_load_all()
