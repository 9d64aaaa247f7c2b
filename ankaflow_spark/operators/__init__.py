"""Operator battery: each module registers named queries (Spark-first
DataFrame/SQL implementations) plus a DuckDB oracle SQL string used by the
driver's correctness gate.

Registry convention: every module exposes ``QUERIES: dict[str, fn]`` where
``fn(spark, sf_dir) -> DataFrame`` and ``ORACLES: dict[str, str]``.
``collect_all()`` merges them for ``__spark_entry__``.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

from pyspark.sql import DataFrame, SparkSession


def collect_all() -> Tuple[Dict[str, Callable[[SparkSession, str], DataFrame]], Dict[str, str]]:
    from . import dedup, relational, similarity, streamq, textops, timeseries

    queries: Dict[str, Callable] = {}
    oracles: Dict[str, str] = {}
    for mod in (relational, timeseries, dedup, similarity, textops, streamq):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
