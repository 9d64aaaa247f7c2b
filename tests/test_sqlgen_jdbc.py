"""SQLGen (LLM text-to-SQL) replay loop + JDBC remote-query synthesis
(model: reference tests/itest_sqlgen.py + clickhouse query push)."""

import pytest

from ankaflow_spark.models.core import Stages
from ankaflow_spark.plans.flow import Flow
from ankaflow_spark.sources.jdbc import build_remote_query
from ankaflow_spark.sources.sqlgen import (
    SQLGenError,
    StaticBackend,
    generate_sql,
    strip_fences,
)
from ankaflow_spark.sqlfront.validate import QueryValidationError


def test_sqlgen_first_try(engine):
    backend = StaticBackend(["SELECT 40 + 2 AS answer"])
    df = generate_sql(engine, "what is the answer?", backend)
    assert df.collect()[0]["answer"] == 42
    assert len(backend.calls) == 1


def test_sqlgen_replay_on_error(engine):
    backend = StaticBackend(
        ["SELECT definitely broken syntax FROM", "SELECT 1 AS ok"]
    )
    df = generate_sql(engine, "count things", backend)
    assert df.collect()[0]["ok"] == 1
    assert len(backend.calls) == 2
    # replay prompt carries the failed SQL and the error text
    assert "definitely broken" in backend.calls[1]
    assert "SQL Execution Error" in backend.calls[1]


def test_sqlgen_gives_up(engine):
    backend = StaticBackend(["SELECT nope FROM nowhere_at_all"])
    with pytest.raises(SQLGenError, match="after 3 attempts"):
        generate_sql(engine, "impossible", backend)
    assert len(backend.calls) == 3


def test_strip_fences():
    assert strip_fences("```sql\nSELECT 1\n```") == "SELECT 1"
    assert strip_fences("SELECT 1;") == "SELECT 1"


def test_sqlgen_stage_in_pipeline(engine):
    backend = StaticBackend(["SELECT explode(sequence(1, 4)) AS n"])
    flow = Flow(
        Stages.loads("""
- kind: tap
  name: generated
  connection:
    kind: sqlgen
    options: {backend_variable: llm}
  query: give me four rows
"""),
        engine=engine,
        variables={"llm": backend},
    )
    assert flow.run().count() == 4


def test_jdbc_remote_query_ranking_push():
    sql = build_remote_query(
        "SELECT * FROM events_raw WHERE tenant = 'a'",
        version="updated_at",
        keys=["id"],
        limit=100,
    )
    assert 'ROW_NUMBER() OVER (PARTITION BY "id" ORDER BY "updated_at" DESC)' in sql
    assert sql.endswith("LIMIT 100")
    assert "__rank__ = 1" in sql


def test_jdbc_remote_query_validates():
    with pytest.raises(QueryValidationError):
        build_remote_query("SELECT * FROM a JOIN b ON a.x = b.x")
    with pytest.raises(QueryValidationError):
        build_remote_query("SELECT count(*) FROM t", version="v", keys=["k"])


def test_jdbc_needs_url(engine):
    from ankaflow_spark.sources import get_connector

    conn = get_connector("clickhouse")(engine, {"kind": "clickhouse", "locator": "db.nope"}, {})
    with pytest.raises(ValueError, match="jdbc:"):
        conn.tap(None, None)
    # bare locator without a database fails the reference's locate()
    # validation before the URL check (reference clickhouse.py:120-143)
    conn = get_connector("clickhouse")(engine, {"kind": "clickhouse", "locator": "nope"}, {})
    with pytest.raises(ValueError, match="must include a database"):
        conn.tap(None, None)


def test_bigquery_disposition_mapping():
    from ankaflow_spark.sources.bigquery import disposition_mode

    assert disposition_mode("WRITE_APPEND") == "append"
    assert disposition_mode("WRITE_TRUNCATE") == "overwrite"
    assert disposition_mode("WRITE_EMPTY") == "errorifexists"
    assert disposition_mode(None) == "append"
    with pytest.raises(ValueError, match="disposition"):
        disposition_mode("WRITE_WAT")


def test_bigquery_unavailable_raises(engine):
    from ankaflow_spark.sources import get_connector
    from ankaflow_spark.sources.bigquery import BigQueryUnavailable

    with pytest.raises(BigQueryUnavailable):
        get_connector("bigquery")(engine, {"kind": "bigquery", "table": "p.d.t"}, {})


def test_jdbc_live_roundtrip_derby(engine, tmp_path):
    """LIVE JDBC e2e against embedded Derby (its driver ships with
    Spark): sql stage creates a remote table, sink appends the previous
    stage, tap reads back through a remote query with a pushed filter."""
    from ankaflow_spark.models.core import Stages
    from ankaflow_spark.plans.flow import Flow

    url = f"jdbc:derby:{tmp_path}/ddb;create=true"
    flow = Flow(
        Stages.loads(f"""
- kind: internal
  name: seed
  query: SELECT id, concat('name', cast(id AS STRING)) AS name FROM range(10)
- kind: sink
  name: to_derby
  connection:
    kind: jdbc
    locator: people
    mode: append
    options: {{url: '{url}'}}
- kind: tap
  name: back
  connection:
    kind: jdbc
    locator: people
    options: {{url: '{url}'}}
  # remote-dialect SQL goes to the external engine verbatim; Spark's
  # JDBC writer quotes column identifiers, so Derby needs them quoted
  query: SELECT "id", "name" FROM people WHERE "id" >= 5
"""),
        engine=engine,
    )
    df = flow.run()
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {i: f"name{i}" for i in range(5, 10)}


def test_jdbc_sql_stage_remote_ddl_derby(engine, tmp_path):
    """kind: sql executes remote DDL through DriverManager (reference
    'SQL (remote)' stage surface) — verified live on Derby."""
    from ankaflow_spark.models.core import Stages
    from ankaflow_spark.plans.flow import Flow

    url = f"jdbc:derby:{tmp_path}/ddl;create=true"
    flow = Flow(
        Stages.loads(f"""
- kind: sql
  name: create remote
  connection:
    kind: jdbc
    locator: '{url}'
  query: CREATE TABLE t1 (a INT, b VARCHAR(10))
- kind: sql
  name: fill remote
  connection:
    kind: jdbc
    locator: '{url}'
  query: INSERT INTO t1 VALUES (1, 'x'), (2, 'y')
- kind: tap
  name: read
  connection:
    kind: jdbc
    locator: t1
    options: {{url: '{url}'}}
"""),
        engine=engine,
    )
    assert flow.run().count() == 2


def test_parse_model_response_shapes():
    from ankaflow_spark.sources.sqlgen import parse_model_response

    assert parse_model_response('{"query": "SELECT 1", "message": "hi"}') == {
        "query": "SELECT 1",
        "message": "hi",
    }
    fenced = 'Here you go:\n```json\n{"query": "SELECT 2"}\n```\nEnjoy.'
    assert parse_model_response(fenced) == {"query": "SELECT 2"}
    inline = 'Sure! {"query": "SELECT 3"} as requested'
    assert parse_model_response(inline) == {"query": "SELECT 3"}
    import pytest as _pytest

    from ankaflow_spark.sources.sqlgen import SQLGenError

    with _pytest.raises(SQLGenError):
        parse_model_response("no json here")


def test_sqlgen_openai_protocol_mock_client(engine):
    """Reference protocol path: OpenAI-shaped responses with JSON
    content, replay extras on a recoverable SQL error, and the
    variables side-channel (<name>_user / <name>_success)."""
    from ankaflow_spark.models.core import Stages
    from ankaflow_spark.plans.flow import Flow

    def oa(content):
        return {"choices": [{"message": {"content": content}}]}

    responses = [
        oa('{"query": "SELECT broken FROM nowhere", "message": "first try"}'),
        oa('```json\n{"query": "SELECT 41 + 1 AS answer", "message": "fixed"}\n```'),
    ]
    variables = {}
    flow = Flow(
        Stages.loads("""
- kind: tap
  name: gen
  connection:
    kind: sqlgen
    variables: {target: answer}
    options:
      llm:
        kind: openai
        model: test-model
        responses: []
  query: "Compute {{ target }} as SQL"
"""),
        engine=engine,
        variables=variables,
    )
    # inject the scripted responses into the parsed spec
    flow.stages[0].connection.options["llm"]["responses"] = responses
    df = flow.run()
    assert df.collect()[0]["answer"] == 42
    assert variables["gen_user"] == "fixed"
    assert variables["gen_success"] is True


def test_sqlgen_protocol_gives_up_sets_fail_var(engine):
    from ankaflow_spark.models.core import Stages
    from ankaflow_spark.plans.flow import Flow, FlowError

    bad = {"choices": [{"message": {"content": '{"query": "SELECT nope FROM missing"}'}}]}
    variables = {}
    flow = Flow(
        Stages.loads("""
- kind: tap
  name: gen2
  connection:
    kind: sqlgen
    options:
      llm: {kind: openai, responses: []}
  query: anything
"""),
        engine=engine,
        variables=variables,
    )
    flow.stages[0].connection.options["llm"]["responses"] = [bad]
    with pytest.raises(FlowError, match="Retry limit"):
        flow.run()
    assert "gen2_fail" in variables


def test_sqlgen_http_client_live(engine):
    """HTTPClient against a live local OpenAI-shaped endpoint."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from ankaflow_spark.models.core import Stages
    from ankaflow_spark.plans.flow import Flow

    seen = []

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = _json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            seen.append(body)
            content = '{"query": "SELECT 7 AS seven", "message": "ok"}'
            payload = _json.dumps(
                {"choices": [{"message": {"content": content}}]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        flow = Flow(
            Stages.loads(f"""
- kind: tap
  name: remote gen
  connection:
    kind: sqlgen
    options:
      llm: {{kind: openai, model: gw-model, endpoint: "http://127.0.0.1:{srv.server_address[1]}/v1/chat"}}
  query: seven please
"""),
            engine=engine,
        )
        assert flow.run().collect()[0]["seven"] == 7
        # the chat-completions request shape reached the endpoint
        assert seen[0]["model"] == "gw-model"
        assert seen[0]["messages"][0] == {"role": "system", "content": "seven please"}
    finally:
        srv.shutdown()


def test_warehouse_locator_resolution():
    import pytest as _pytest

    from ankaflow_spark.sources.jdbc import resolve_warehouse_table

    # dotted locator, no database configured
    assert resolve_warehouse_table("analytics.events") == '"analytics"."events"'
    # bare locator + configured database
    assert resolve_warehouse_table("events", "analytics") == '"analytics"."events"'
    # dotted + configured database = ambiguous (reference rule)
    with _pytest.raises(ValueError, match="must not include"):
        resolve_warehouse_table("analytics.events", "analytics")
    # bare + no database
    with _pytest.raises(ValueError, match="must include"):
        resolve_warehouse_table("events")
    # malformed
    with _pytest.raises(ValueError, match="Invalid locator"):
        resolve_warehouse_table("a.b.c")


def test_clickhouse_kind_qualifies_sink_table(engine):
    from ankaflow_spark.sources.jdbc import JDBCConnection

    conn = JDBCConnection(
        engine,
        {"kind": "clickhouse", "locator": "events", "options": {"database": "analytics"}},
        {},
    )
    assert conn._qualified_table() == '"analytics"."events"'
    # plain jdbc kind keeps the table name verbatim
    conn = JDBCConnection(engine, {"kind": "jdbc", "table": "raw_events"}, {})
    assert conn._qualified_table() == "raw_events"
    # a jdbc: url locator is not a table
    conn = JDBCConnection(engine, {"kind": "jdbc", "locator": "jdbc:derby:x"}, {})
    assert conn._qualified_table() is None


def test_clickhouse_type_mapping():
    from ankaflow_spark.sources.jdbc import clickhouse_type

    assert clickhouse_type("bigint") == "Int64"
    assert clickhouse_type("string", nullable=True) == "Nullable(String)"
    assert clickhouse_type("timestamp") == "DateTime64(6)"
    assert clickhouse_type("decimal(12,2)") == "Decimal(12,2)"
    assert clickhouse_type("boolean") == "Bool"
    with pytest.raises(ValueError, match="ClickHouse type mapping"):
        clickhouse_type("array<int>")


def test_clickhouse_ddl_options(engine):
    from ankaflow_spark.sources.jdbc import clickhouse_ddl_options

    df = engine.spark.createDataFrame(
        [(1, "a", 2.5)], "id bigint, name string, score double"
    )
    opts = clickhouse_ddl_options(df, {"order_by": "id"})
    assert opts["createTableOptions"] == "ENGINE = MergeTree() ORDER BY id"
    assert "id Nullable(Int64)" in opts["createTableColumnTypes"]
    assert "name Nullable(String)" in opts["createTableColumnTypes"]
    # engine override
    opts2 = clickhouse_ddl_options(df, {"engine": "ReplacingMergeTree(v)"})
    assert opts2["createTableOptions"].startswith("ENGINE = ReplacingMergeTree(v)")
