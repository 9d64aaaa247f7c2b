"""LIVE ClickHouse e2e against a local HTTP-interface emulator — the
Derby/BigQuery pattern for the last unexercised warehouse: the
connector speaks ClickHouse's real HTTP wire shapes (FORMAT
JSONCompactEachRowWithNamesAndTypes responses, INSERT ... FORMAT
JSONEachRow bodies, bare-DDL posts), the emulator evaluates against
DuckDB with a ClickHouse->DuckDB type translation — so the dialect
CREATE TABLE the connector synthesizes (Int64/Float64/Nullable/ENGINE
clause) is parsed and enforced live, not just string-asserted.
"""

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import duckdb
import pytest

from ankaflow_spark.sources import get_connector
from ankaflow_spark.sources.clickhouse_http import ClickHouseHttpError, ch_to_spark_type


# ---------------------------------------------------------------------------
# Emulator
# ---------------------------------------------------------------------------

_CH_TO_DUCK = [
    (r"Nullable\(([^)]+)\)", r"\1"),
    (r"Decimal\(", "DECIMAL("),
    (r"UInt64", "UBIGINT"),
    (r"Int64", "BIGINT"),
    (r"Int32|UInt32", "INTEGER"),
    (r"Int16|UInt16", "SMALLINT"),
    (r"Int8|UInt8", "TINYINT"),
    (r"Float64", "DOUBLE"),
    (r"Float32", "FLOAT"),
    (r"String", "VARCHAR"),
    (r"DateTime64\(\d+\)|DateTime", "TIMESTAMP"),
    (r"Date32|Date", "DATE"),
    (r"Bool", "BOOLEAN"),
]

_DUCK_TO_CH = {
    "BIGINT": "Int64",
    "INTEGER": "Int32",
    "SMALLINT": "Int16",
    "TINYINT": "Int8",
    "DOUBLE": "Float64",
    "FLOAT": "Float32",
    "VARCHAR": "String",
    "TIMESTAMP": "DateTime64(6)",
    "DATE": "Date32",
    "BOOLEAN": "Bool",
    "HUGEINT": "Int64",
    "UBIGINT": "UInt64",
}


class _State:
    def __init__(self):
        self.con = duckdb.connect()
        self.lock = threading.Lock()


STATE = _State()


def _strip_quotes(name):
    return name.replace('"', "").replace("`", "")


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _send(self, code, body: bytes):
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        raw = self.rfile.read(int(self.headers.get("Content-Length", 0))).decode()
        try:
            with STATE.lock:
                out = self._dispatch(raw)
        except Exception as e:
            return self._send(400, f"Code: 62. DB::Exception: {e}".encode())
        self._send(200, out)

    def _dispatch(self, raw: str) -> bytes:
        ins = re.match(
            r"(?is)^\s*INSERT\s+INTO\s+(\S+)\s*\(([^)]*)\)\s*FORMAT\s+JSONEachRow\s*\n(.*)$",
            raw,
        )
        if ins:
            table = _strip_quotes(ins.group(1)).split(".")[-1]
            cols = [c.strip() for c in ins.group(2).split(",")]
            rows = [json.loads(l) for l in ins.group(3).splitlines() if l.strip()]
            import pandas as pd

            pdf = pd.DataFrame(rows, columns=cols)
            STATE.con.register("__in__", pdf)
            STATE.con.sql(f"INSERT INTO {table} BY NAME SELECT * FROM __in__")
            STATE.con.unregister("__in__")
            return b""
        fmt = re.search(r"(?is)\s+FORMAT\s+(\w+)\s*$", raw)
        sql = re.sub(r"(?is)\s+FORMAT\s+\w+\s*$", "", raw).strip()
        create = re.match(r"(?is)^\s*CREATE\s+TABLE\s+(\S+)\s*\((.*)\)\s*ENGINE.*$", sql, re.DOTALL)
        if create:
            table = _strip_quotes(create.group(1)).split(".")[-1]
            cols_src = create.group(2)
            for pat, rep in _CH_TO_DUCK:
                cols_src = re.sub(pat, rep, cols_src)
            STATE.con.sql(f"CREATE TABLE {table} ({cols_src})")
            return b""
        exists = re.match(r"(?is)^\s*EXISTS\s+TABLE\s+(\S+)\s*$", sql)
        if exists:
            table = _strip_quotes(exists.group(1)).split(".")[-1]
            tables = {t[0] for t in STATE.con.sql("SHOW TABLES").fetchall()}
            found = 1 if table in tables else 0
            return (
                json.dumps(["result"]) + "\n" + json.dumps(["UInt8"]) + "\n"
                + json.dumps([found]) + "\n"
            ).encode()
        # plain query: strip db qualification (single-db emulator)
        sql2 = re.sub(r'"[^"]+"\."([^"]+)"', r"\1", sql)
        rel = STATE.con.sql(sql2)
        if rel is None:
            return b""
        cols = list(rel.columns)
        types = [
            "Decimal" + str(t).upper().split("DECIMAL", 1)[1]
            if "DECIMAL" in str(t).upper()
            else _DUCK_TO_CH.get(str(t).split("(")[0].upper(), "String")
            for t in rel.types
        ]
        rows = rel.fetchall()
        lines = [json.dumps(cols), json.dumps(types)]
        for r in rows:
            lines.append(json.dumps([_cell(v) for v in r], default=str))
        return ("\n".join(lines) + "\n").encode()


def _cell(v):
    import datetime as dt

    if isinstance(v, (dt.datetime, dt.date)):
        return str(v)
    return v


@pytest.fixture(scope="module")
def ch_endpoint():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _conn(engine, ch_endpoint, **extra):
    spec = {"kind": "clickhouse", "endpoint": ch_endpoint, "database": "db"}
    spec.update(extra)
    return get_connector("clickhouse")(engine, spec, {})


# ---------------------------------------------------------------------------
# e2e
# ---------------------------------------------------------------------------

def test_sink_creates_table_with_dialect_ddl_then_inserts(engine, ch_endpoint):
    df = engine.spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", 7.25)], "id bigint, name string, score double"
    )
    conn = _conn(engine, ch_endpoint, table="t_metrics", order_by="id")
    conn.sink(df, None)
    conn.sink(df, None)  # table exists now -> plain insert
    out = _conn(engine, ch_endpoint, table="t_metrics").tap(
        "SELECT COUNT(*) AS n, CAST(SUM(score) AS DOUBLE) AS s FROM t_metrics", None
    )
    row = out.collect()[0]
    assert (row["n"], row["s"]) == (4, 19.5)


def test_tap_pushes_ranking_remote(engine, ch_endpoint):
    rows = [(1, 1, "old"), (1, 2, "new"), (2, 1, "only")]
    df = engine.spark.createDataFrame(rows, "k bigint, v bigint, payload string")
    _conn(engine, ch_endpoint, table="t_ver").sink(df, None)
    conn = _conn(engine, ch_endpoint, table="t_ver", version="v", key=["k"])
    out = conn.tap("SELECT k, v, payload FROM t_ver", None)
    got = sorted(tuple(r) for r in out.collect())
    assert got == [(1, 2, "new"), (2, 1, "only")]
    assert "__rank__" not in out.columns


def test_tap_without_query_reads_table(engine, ch_endpoint):
    out = _conn(engine, ch_endpoint, table="t_ver").tap(None, None)
    assert out.count() == 3


def test_execute_ddl_and_type_roundtrip(engine, ch_endpoint):
    conn = _conn(engine, ch_endpoint)
    conn.execute(
        "CREATE TABLE t_typed (id Int64, ts DateTime64(6), d Date32, "
        "ok Bool, note Nullable(String)) ENGINE = MergeTree() ORDER BY id",
        None,
    )
    conn.execute(
        "INSERT INTO t_typed SELECT 7, TIMESTAMP '2024-05-01 10:30:00', "
        "DATE '2024-05-01', true, NULL",
        None,
    )
    out = _conn(engine, ch_endpoint, table="t_typed").tap(None, None)
    r = out.collect()[0]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "timestamp", "date", "boolean", "string",
    ]
    assert r["id"] == 7 and r["ok"] is True and r["note"] is None
    assert str(r["ts"]).startswith("2024-05-01 10:30:00")


def test_server_error_surfaces(engine, ch_endpoint):
    conn = _conn(engine, ch_endpoint)
    with pytest.raises(ClickHouseHttpError, match="DB::Exception"):
        conn.tap("SELECT * FROM no_such_table_anywhere", None)


def test_type_mapping_unit():
    assert ch_to_spark_type("Nullable(Int64)") == "bigint"
    assert ch_to_spark_type("DateTime64(3)") == "timestamp"
    assert ch_to_spark_type("UInt8") == "smallint"
    assert ch_to_spark_type("LowCardinality(String)") == "string"  # fallback
    assert ch_to_spark_type("Decimal(18, 4)") == "decimal(18, 4)"
    # UInt64's full range exceeds BIGINT — decimal(20,0) holds it
    assert ch_to_spark_type("UInt64") == "decimal(20,0)"


def test_decimal_and_uint64_roundtrip(engine, ch_endpoint):
    """ClickHouse's JSON formats quote Decimal cells as strings, and
    UInt64 exceeds BIGINT above 2^63 — both must land typed: Decimal
    objects for createDataFrame, decimal(20,0) for the uint64 range."""
    import decimal

    conn = _conn(engine, ch_endpoint)
    conn.execute(
        "CREATE TABLE t_dec (id UInt64, amt Decimal(18,4)) "
        "ENGINE = MergeTree() ORDER BY id",
        None,
    )
    conn.execute(
        "INSERT INTO t_dec SELECT 18446744073709551615, "
        "CAST('12345.6789' AS DECIMAL(18,4))",
        None,
    )
    out = _conn(engine, ch_endpoint, table="t_dec").tap(None, None)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "decimal(20,0)", "decimal(18,4)",
    ]
    r = out.collect()[0]
    assert r["id"] == decimal.Decimal(2**64 - 1)  # > BIGINT max
    assert r["amt"] == decimal.Decimal("12345.6789")
