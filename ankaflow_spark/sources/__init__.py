"""Connector registry: maps connection ``kind`` to a connector class.

Spark-native connectors (parquet/csv/json/file/variable) plus stubs that
fail with a clear message when the backing client library is absent in
this environment (delta/clickhouse/bigquery/rest — SURVEY.md §2C scans).
"""

from __future__ import annotations

from typing import Callable, Dict, Type


def get_connector(kind: str):
    from .file import (
        CSVConnection,
        FileConnection,
        JSONConnection,
        ParquetConnection,
        VariableConnection,
    )

    registry: Dict[str, Type] = {
        "parquet": ParquetConnection,
        "csv": CSVConnection,
        "json": JSONConnection,
        "file": FileConnection,
        "variable": VariableConnection,
    }
    if kind.lower() in registry:
        return registry[kind.lower()]
    if kind.lower() == "delta":
        from .delta import DeltaConnection

        return DeltaConnection
    if kind.lower() == "rest":
        from .rest import RestConnection

        return RestConnection
    if kind.lower() in ("jdbc", "clickhouse", "postgres", "mysql"):
        from .jdbc import JDBCConnection

        return JDBCConnection
    if kind.lower() == "sqlgen":
        from .sqlgen import SQLGenConnection

        return SQLGenConnection
    if kind.lower() == "custom":
        from .custom import CustomConnection

        return CustomConnection
    if kind.lower() == "bigquery":
        from .bigquery import BigQueryConnection

        return BigQueryConnection
    raise KeyError(f"unknown connection kind: {kind}")
