"""Batch sources with enforced schemas (CSV / JSON / Parquet).

The reference's only source is its own HDF5 layout (external by charter
— BASELINE.json); the engine's native layout is Parquet
(TimeSeriesTable). These readers cover the interchange formats a
pipeline ingests from, with the two disciplines that matter at scale:

- **explicit schema, never inference** — schema inference reads the
  data twice and silently drifts types between runs; every reader here
  takes a StructType (or uses the target table's).
- **malformed-row policy is explicit** — PERMISSIVE (null out bad
  fields, keep the row in ``_corrupt_record``) vs FAILFAST is a
  pipeline decision, not a default to inherit silently.
"""

from tstables_spark.sources.readers import read_csv, read_json, read_parquet

__all__ = ["read_csv", "read_json", "read_parquet"]
