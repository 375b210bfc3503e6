"""Shared DuckDB-SQL builders for the portable-hash fingerprint family.

These mirror operators/dedup.py's portable md5-based hashing exactly so
the simhash/minhash plans can be value-checked by the driver's DuckDB
oracle. Kept in a private helper (not a plans module) so importing it
never registers queries and can't perturb the load-bearing registration
order in plans/__init__.py.
"""

from __future__ import annotations


def simhash_fp_sql(bits: int = 32) -> str:
    """CTE body computing portable SimHash fingerprints over `documents`
    — the DuckDB twin of operators/dedup.py::simhash_fingerprints.
    Emits CTEs `tok`, `h`, `bit_sums`, `fp(doc_id, simhash)`; prepend
    "WITH" (and append further CTEs with a leading comma)."""
    sums = ",\n             ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
    tok AS (SELECT doc_id, unnest(str_split(lower(text), ' ')) AS token FROM documents),
    h AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h FROM tok),
    bit_sums AS (SELECT doc_id,
             {sums}
           FROM h GROUP BY doc_id),
    fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bit_sums)"""
