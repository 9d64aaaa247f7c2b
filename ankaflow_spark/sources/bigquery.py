"""BigQuery connector (reference surface:
ankaflow/connections/bigquery.py — query tap with ranking, load-job
dispositions WRITE_APPEND / WRITE_TRUNCATE / WRITE_EMPTY, field-addition
allowance; behavior studied, fresh implementation).

Spark-native path: the spark-bigquery connector
(``format("bigquery")``). The jar is not in this container, so reads and
writes raise a clear error at use time; the disposition/mode mapping and
remote query synthesis (ranking pushed into BigQuery SQL, exactly as the
reference pushes it) are plain functions, unit-tested without the jar.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from pyspark.sql import DataFrame

from ..models.core import Stage
from ..session import SparkEngine
from .jdbc import build_remote_query

# reference disposition -> Spark SaveMode
DISPOSITION_TO_MODE = {
    "WRITE_APPEND": "append",
    "WRITE_TRUNCATE": "overwrite",
    "WRITE_EMPTY": "errorifexists",
}


def disposition_mode(disposition: Optional[str]) -> str:
    """Map a BigQuery write disposition onto a Spark save mode
    (default append, matching the reference's default)."""
    if not disposition:
        return "append"
    try:
        return DISPOSITION_TO_MODE[disposition.upper()]
    except KeyError:
        raise ValueError(
            f"unknown write disposition {disposition!r}; expected one of "
            f"{sorted(DISPOSITION_TO_MODE)}"
        ) from None


def _bq_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
        )
        return True
    except Exception:
        return False


class BigQueryUnavailable(RuntimeError):
    pass


class BigQueryConnection:
    def __init__(self, engine: SparkEngine, spec: Dict[str, Any], variables: Dict[str, Any]):
        self.engine = engine
        self.spec = spec
        self.variables = variables
        if not _bq_available(engine.spark):
            raise BigQueryUnavailable(
                "spark-bigquery connector jar is not on the classpath; add "
                "com.google.cloud.spark:spark-bigquery-with-dependencies to spark.jars.packages"
            )

    def tap(self, query: Optional[str], stage: Stage) -> DataFrame:
        spec = self.spec
        reader = self.engine.spark.read.format("bigquery")
        opts = dict(spec.get("options") or {})
        if query:
            remote = build_remote_query(query, version=spec.get("version"), keys=spec.get("key"))
            reader = reader.option("query", remote).option("viewsEnabled", "true")
        else:
            reader = reader.option("table", spec.get("table") or spec.get("locator"))
        return reader.options(**opts).load()

    def sink(self, df: DataFrame, stage: Stage) -> None:
        spec = self.spec
        mode = disposition_mode(spec.get("mode") or spec.get("disposition"))
        writer = df.write.format("bigquery").mode(mode)
        opts = dict(spec.get("options") or {})
        if opts.pop("allow_field_addition", False):
            writer = writer.option("allowFieldAddition", "true")
        writer.options(**opts).save(spec.get("table") or spec.get("locator"))

    def execute(self, query: str, stage: Stage) -> None:
        raise NotImplementedError("BigQuery DDL requires the BigQuery client; not in this environment")
