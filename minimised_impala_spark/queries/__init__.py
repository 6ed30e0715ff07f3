"""Declared query suite: every entry here is a (spark, sf_dir) -> DataFrame
callable registered with the driver contract in ``__spark_entry__.py``,
paired (where SQL-expressible) with a DuckDB oracle SQL string.

Modules self-register on import via ``registry.query``.
"""

from minimised_impala_spark.queries import registry  # noqa: F401


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from minimised_impala_spark.queries import (  # noqa: F401
        tpch,
        tpcds,
        joins,
        aggregates,
        windows,
        scalars,
        parity,
        subqueries,
        nested,
        events,
        udfq,
    )
    from minimised_impala_spark.extensions import (  # noqa: F401
        dedup,
        retrieval,
        similarity,
        text,
        multimodal,
        pipeline_audit,
    )
    from minimised_impala_spark.streaming import windows as stream_windows  # noqa: F401
    from minimised_impala_spark.streaming import stateful as stream_stateful  # noqa: F401
