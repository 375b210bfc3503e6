"""Structured Streaming plans (SURVEY.md §2 Table B phase 4).

Populated in phase 4: stream_ingest/tumbling/sliding/session/dedup/
stateful, with batch-equivalence oracles where expressible.
"""
