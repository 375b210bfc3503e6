"""Compatibility re-export. The helpers live at ``tstables_spark._exact``
(package root) so that operators/ modules can use them WITHOUT importing
the ``plans`` package — importing ``plans`` runs query registration,
which imports operators back, a cycle that breaks direct imports of
operators modules (see operators/resample.py)."""

from tstables_spark._exact import (  # noqa: F401
    PRECISION,
    SCALE,
    exact_sum,
    exact_sum_distinct,
    exact_wsum,
    sql_sum,
    sql_sum_distinct,
    sql_wsum,
)
