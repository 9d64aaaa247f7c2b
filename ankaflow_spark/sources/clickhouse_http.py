"""Jar-free ClickHouse path over the public HTTP interface.

The reference's ClickHouse connector speaks the native TCP protocol via
clickhouse-driver (reference ankaflow/connections/clickhouse.py:
stream_query for taps, columnar INSERT for sinks). The JDBC route in
sources/jdbc.py needs the ClickHouse JDBC jar; this module adds the
other first-class public protocol — the HTTP interface on port 8123 —
with stdlib urllib only:

* ``query``   -> POST <endpoint>?database=...  body: SELECT ... FORMAT
                 JSONCompactEachRowWithNamesAndTypes (names + types +
                 row arrays, streamed line-wise)
* ``insert``  -> POST body: INSERT INTO t (cols) FORMAT JSONEachRow
                 + NDJSON rows
* ``execute`` -> POST body: any DDL/DML statement

Like the reference's client path (and the BigQuery REST fallback), tap
results materialize driver-side — the bounded-result contract. The
sink auto-creates the target table with the dialect DDL from
sources/jdbc.py (``clickhouse_type`` + ENGINE clause) when it does not
exist, mirroring the reference's create-on-first-write behavior
(reference clickhouse.py:160-166).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Any, Dict, List, Optional, Tuple

_CH_TO_SPARK = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "uint8": "smallint",
    "uint16": "int",
    "uint32": "bigint",
    # UInt64's full range exceeds BIGINT (2^63-1); decimal(20,0) holds it
    "uint64": "decimal(20,0)",
    "float32": "float",
    "float64": "double",
    "string": "string",
    "bool": "boolean",
    "date": "date",
    "date32": "date",
}


def ch_to_spark_type(ch_type: str) -> str:
    t = ch_type.strip()
    low = t.lower()
    if low.startswith("nullable(") and low.endswith(")"):
        return ch_to_spark_type(t[9:-1])
    if low.startswith("datetime64") or low.startswith("datetime"):
        return "timestamp"
    if low.startswith("decimal"):
        return low
    return _CH_TO_SPARK.get(low, "string")


class ClickHouseHttpError(RuntimeError):
    def __init__(self, status: int, body: str):
        self.status = status
        super().__init__(f"ClickHouse HTTP error {status}: {body[:500]}")


class ClickHouseHttpClient:
    """Minimal ClickHouse HTTP-interface client (stdlib only)."""

    def __init__(self, endpoint: str, database: Optional[str] = None,
                 user: Optional[str] = None, password: Optional[str] = None,
                 timeout: float = 60.0):
        self.endpoint = endpoint.rstrip("/")
        self.database = database
        self.user = user
        self.password = password
        self.timeout = timeout

    def _post(self, body: bytes, params: Optional[Dict[str, str]] = None) -> bytes:
        q = dict(params or {})
        if self.database:
            q.setdefault("database", self.database)
        url = self.endpoint + ("/?" + urllib.parse.urlencode(q) if q else "/")
        req = urllib.request.Request(url, data=body, method="POST")
        req.add_header("Content-Type", "text/plain; charset=utf-8")
        if self.user:
            req.add_header("X-ClickHouse-User", self.user)
        if self.password:
            req.add_header("X-ClickHouse-Key", self.password)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            raise ClickHouseHttpError(e.code, e.read().decode("utf-8", "replace"))

    def query(self, sql: str) -> Tuple[List[Tuple[str, str]], List[list]]:
        """-> ([(name, spark_type)], rows) via
        JSONCompactEachRowWithNamesAndTypes: line 1 = names, line 2 =
        ClickHouse types, then one JSON array per row."""
        body = (sql.rstrip().rstrip(";")
                + " FORMAT JSONCompactEachRowWithNamesAndTypes").encode()
        lines = [ln for ln in self._post(body).decode().splitlines() if ln.strip()]
        if len(lines) < 2:
            return [], []
        names = json.loads(lines[0])
        types = [ch_to_spark_type(t) for t in json.loads(lines[1])]
        rows = [json.loads(ln) for ln in lines[2:]]
        return list(zip(names, types)), rows

    def insert(self, table: str, cols: List[str], ndjson: bytes) -> None:
        head = f"INSERT INTO {table} ({', '.join(cols)}) FORMAT JSONEachRow\n"
        self._post(head.encode() + ndjson)

    def execute(self, sql: str) -> None:
        self._post(sql.encode())

    def table_exists(self, table: str) -> bool:
        _, rows = self.query(f"EXISTS TABLE {table}")
        return bool(rows and int(rows[0][0]) == 1)


class ClickHouseHttpConnection:
    """``kind: clickhouse`` over the HTTP interface — selected by
    sources.get_connector when the connection carries an http(s)
    endpoint instead of a jdbc: url. Same surface as JDBCConnection:
    tap (ranking pushed into the remote query, reference
    clickhouse.py:144-155), sink (create-on-first-write with dialect
    DDL, then NDJSON insert), execute (DDL)."""

    def __init__(self, engine, spec: Dict[str, Any], variables: Dict[str, Any]):
        self.engine = engine
        self.spec = spec
        self.variables = variables
        opts = dict(spec.get("options") or {})
        endpoint = spec.get("endpoint") or opts.get("url") or spec.get("locator")
        if not str(endpoint).startswith(("http://", "https://")):
            raise ValueError(
                "clickhouse HTTP connection needs an http(s) endpoint "
                "(spec.endpoint / options.url); jdbc: urls route to the "
                "JDBC connector"
            )
        self.client = ClickHouseHttpClient(
            str(endpoint),
            database=spec.get("database") or opts.get("database"),
            user=opts.get("user"),
            password=opts.get("password"),
        )

    # -- helpers ---------------------------------------------------------
    def _table(self) -> Optional[str]:
        from .jdbc import resolve_warehouse_table

        table = self.spec.get("table") or self.spec.get("locator")
        if not table or str(table).startswith(("http://", "https://")):
            return None
        return resolve_warehouse_table(
            str(table),
            self.spec.get("database") or (self.spec.get("options") or {}).get("database"),
        )

    def _to_df(self, fields, rows):
        import datetime as _dt
        import decimal as _decimal

        def conv(v, typ):
            if v is None:
                return None
            if typ == "timestamp":
                return _dt.datetime.fromisoformat(str(v).replace("T", " "))
            if typ == "date":
                return _dt.date.fromisoformat(str(v))
            if typ == "bigint" or typ == "int" or typ == "smallint" or typ == "tinyint":
                return int(v)
            if typ in ("double", "float"):
                return float(v)
            if typ == "boolean":
                return bool(v) if not isinstance(v, str) else v.lower() in ("1", "true")
            if typ.startswith("decimal"):
                # ClickHouse JSON formats quote Decimal (and UInt64)
                # cells as strings; createDataFrame needs Decimal objects
                return _decimal.Decimal(str(v))
            return v

        typed = [
            [conv(v, t) for v, (_, t) in zip(r, fields)] for r in rows
        ]
        schema = ", ".join(f"`{n}` {t}" for n, t in fields)
        return self.engine.spark.createDataFrame(typed, schema=schema)

    # -- surface ---------------------------------------------------------
    def tap(self, query: Optional[str], stage) -> "Any":
        from ..sqlfront.ranking import RANK_COL
        from .jdbc import build_remote_query

        if not query:
            table = self._table()
            if not table:
                raise ValueError("clickhouse tap needs a query or a table locator")
            query = f"SELECT * FROM {table}"
        remote = build_remote_query(
            query, version=self.spec.get("version"), keys=self.spec.get("key")
        )
        fields, rows = self.client.query(remote)
        df = self._to_df(fields, rows)
        return df.drop(RANK_COL) if RANK_COL in df.columns else df

    def sink(self, df, stage) -> None:
        from .jdbc import clickhouse_type

        table = self._table()
        if not table:
            raise ValueError("clickhouse sink needs `table` (or a table locator)")
        if not self.client.table_exists(table):
            cols = ", ".join(
                f"{f.name} {clickhouse_type(f.dataType.simpleString(), f.nullable)}"
                for f in df.schema.fields
            )
            engine_clause = self.spec.get("engine") or "MergeTree()"
            order_by = self.spec.get("order_by") or "tuple()"
            self.client.execute(
                f"CREATE TABLE {table} ({cols}) ENGINE = {engine_clause} "
                f"ORDER BY {order_by}"
            )
        import io

        buf = io.StringIO()
        # bounded reference-parity materialization (the reference's
        # streaming sink likewise drains the relation through the
        # client in batches — clickhouse.py:255-282)
        for row in df.toJSON().toLocalIterator():
            buf.write(row)
            buf.write("\n")
        self.client.insert(table, list(df.columns), buf.getvalue().encode())

    def execute(self, query: str, stage) -> None:
        self.client.execute(query)
