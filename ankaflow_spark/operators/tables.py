"""Test-table loader: registers the driver-provided star schema as temp
views so operator queries can run either via DataFrame API or Spark SQL.

Scale note: these are plain parquet scans — on a cluster the same code
path gets predicate pushdown / column pruning from Catalyst; nothing is
collected or cached driver-side here.
"""

from __future__ import annotations

import os
from typing import Dict

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    """Read every star-schema table and register it as a temp view.

    Works on ANY session, including the driver's vanilla one: pins the
    session to UTC (required for oracle-identical timestamp semantics)
    and normalizes TIMESTAMP(NANOS) parquet columns to TimestampType —
    they surface as timestamp_ntz on a default Spark 4 session, or as
    int64 ns when spark.sql.legacy.parquet.nanosAsLong is set (then
    converted via bigint `div`, never a lossy double round-trip).

    Registration is idempotent and cheap (lazy scans); queries that only
    touch a subset still prune at the source thanks to lazy evaluation.
    """
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # nanos columns fail Spark's parquet converter outright; with the
        # legacy flag they arrive as int64 ns and are converted below
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    dfs: Dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        probe = path
        if os.path.isdir(path):
            import glob

            parts = glob.glob(os.path.join(path, "*.parquet"))
            probe = parts[0] if parts else None
        ns_cols = (
            {field.name for field in pq.read_schema(probe) if str(field.type) == "timestamp[ns]"}
            if probe
            else set()
        )
        for col, dtype in df.dtypes:
            if dtype == "bigint" and col in ns_cols:
                df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
            elif dtype == "timestamp_ntz":
                # parquet timestamps without a timezone (any unit — the
                # driver has shipped both ns and us over rounds) surface as
                # NTZ on a default Spark 4 session; watermarks and
                # unix_micros need TIMESTAMP, and the UTC session pin makes
                # the cast value-identical to DuckDB's naive reading
                df = df.withColumn(col, F.col(col).cast("timestamp"))
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
