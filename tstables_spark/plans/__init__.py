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
        filtering,
        relational,
        pipeline,
        llm,
    )


_load_all()
