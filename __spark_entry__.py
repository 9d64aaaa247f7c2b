"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator battery from
``ankaflow_spark.operators`` for the driver's DuckDB-oracle correctness
gate (row-count + schema + order-insensitive value-hash at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ankaflow_spark.operators import collect_all

    queries, _ = collect_all()
    return queries["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ankaflow_spark.operators import collect_all

    q, _ = collect_all()
    return q


def oracle_sql() -> dict[str, str]:
    from ankaflow_spark.operators import collect_all

    _, o = collect_all()
    return o
