"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator inventory from
SURVEY.md §2 — implementations live in ``riptable_spark/`` and the
registry in ``riptable_spark/queries.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from riptable_spark import queries2  # noqa: F401 — registers batch-2 queries
from riptable_spark import queries3  # noqa: F401 — registers batch-3 queries
from riptable_spark import queries4  # noqa: F401 — registers batch-4 queries
from riptable_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
