"""The canonical text normalization, defined ONCE for every consumer.

``text_normalize``, ``dedup_prefix``, and ``pipeline_corpus_funnel``
(plus their DuckDB oracles) all key on the same normalization —
lowercase, whitespace→space FIRST (so a newline never glues two words
together when punctuation is stripped), drop non-alphanumerics,
collapse runs, trim. Keeping the Spark Column factory and the oracle
SQL fragment next to each other (the ``_exact.py`` pattern) means an
edit to the normalization cannot silently diverge a subset of the six
use sites and break their cross-query exactness claims.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text(col: str = "text") -> Column:
    """Canonical normalization as a Spark Column."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(col), r"\s+", " "), "[^a-z0-9 ]", ""
            ),
            " +",
            " ",
        )
    )


def norm_sql(col: str = "text") -> str:
    """DuckDB twin of :func:`norm_text` (same regexes, same order)."""
    return (
        "trim(regexp_replace(regexp_replace(regexp_replace("
        f"lower({col}), '\\s+', ' ', 'g'), '[^a-z0-9 ]', '', 'g'), "
        "' +', ' ', 'g'))"
    )
