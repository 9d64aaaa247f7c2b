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

    conn = get_connector("clickhouse")(engine, {"kind": "clickhouse", "locator": "nope"}, {})
    with pytest.raises(ValueError, match="jdbc:"):
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
