"""Query plan registry — every operator from SURVEY.md §2 Table B.

Importing this package registers all queries; ``registry.QUERIES`` /
``registry.ORACLES`` are what ``__spark_entry__.py`` exposes to the
driver.
"""

from tstables_spark.plans import registry  # noqa: F401


def _load_all() -> None:
    # Import side-effect registers the queries with the registry.
    from tstables_spark.plans import (  # noqa: F401
        llm,
        pipeline,
        relational,
        scalars,
        streaming_q,
        timeseries,
    )


_load_all()
