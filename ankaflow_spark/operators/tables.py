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

    Registration is idempotent and cheap (lazy scans); queries that only
    touch a subset still prune at the source thanks to lazy evaluation.
    """
    dfs: Dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        # TIMESTAMP(NANOS) columns arrive as int64 ns (nanosAsLong):
        # convert to timestamp with `div` (bigint division — a double
        # round-trip would lose precision above 2^53 ns).
        arrow_schema = pq.read_schema(path)
        for field in arrow_schema:
            if str(field.type) == "timestamp[ns]":
                df = df.withColumn(field.name, F.expr(f"timestamp_micros({field.name} div 1000)"))
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
