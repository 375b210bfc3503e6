"""Structured Streaming layer — the reference's append path (A3),
upgraded: instead of rejecting out-of-order rows (tstables append-only
invariant), late data is handled with event-time watermarks, and the
sink preserves the engine's storage contract (date-partitioned parquet,
ts-sorted within files)."""
