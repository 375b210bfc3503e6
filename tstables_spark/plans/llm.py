"""LLM-training-data pipeline plans (SURVEY.md §2 Table B phase 5).

Populated in phase 5: dedup_exact/near/minhash, sim_topk/ivf,
text_stats, lang_id, quality_score, doc_fingerprint, multimodal_schema.
"""
