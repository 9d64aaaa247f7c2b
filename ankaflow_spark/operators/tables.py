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


# Memo of already-built DataFrames per (session, sf_dir): building them
# costs ~10 parquet footer reads + JVM round-trips, pure driver-side
# fixed overhead when every operator call re-loads the same immutable
# testdata dir. _ACTIVE tracks which sf_dir's views are currently
# registered on a session so switching dirs (bench warms at sf0.001,
# then measures at sf0.1) re-points the views without re-reading.
_DF_CACHE: Dict[tuple, Dict[str, DataFrame]] = {}
_ACTIVE: Dict[int, str] = {}


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
    sf_dir = os.path.abspath(sf_dir)
    key = (id(spark), sf_dir)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        if _ACTIVE.get(id(spark)) != sf_dir:
            for name, df in cached.items():
                df.createOrReplaceTempView(name)
            _ACTIVE[id(spark)] = sf_dir
        return dict(cached)
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # nanos columns fail Spark's parquet converter outright; with the
        # legacy flag they arrive as int64 ns and are converted below
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    utc_pinned = False
    try:
        utc_pinned = spark.conf.get("spark.sql.session.timeZone") == "UTC"
    except Exception:
        pass
    if not utc_pinned:
        import warnings

        warnings.warn(
            "could not pin spark.sql.session.timeZone=UTC; NTZ->timestamp "
            "casts below will shift values by the session timezone offset",
            stacklevel=2,
        )
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
                # the cast value-identical to DuckDB's naive reading.
                # TimestampType() (not the "timestamp" alias): the alias
                # follows spark.sql.timestampType, which a host session may
                # set to TIMESTAMP_NTZ, silently making this cast a no-op.
                from pyspark.sql.types import TimestampType

                df = df.withColumn(col, F.col(col).cast(TimestampType()))
        df.createOrReplaceTempView(name)
        dfs[name] = df
    _DF_CACHE[key] = dfs
    _ACTIVE[id(spark)] = sf_dir
    return dict(dfs)
