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

        if kind.lower() == "clickhouse":
            # two public protocols: jdbc: urls -> generic JDBC (jar),
            # http(s) endpoints -> the jar-free HTTP interface
            def _pick_clickhouse(engine, spec, variables):
                opts = spec.get("options") or {}
                url = spec.get("endpoint") or opts.get("url") or spec.get("locator") or ""
                if str(url).startswith(("http://", "https://")):
                    from .clickhouse_http import ClickHouseHttpConnection

                    return ClickHouseHttpConnection(engine, spec, variables)
                return JDBCConnection(engine, spec, variables)

            return _pick_clickhouse
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
