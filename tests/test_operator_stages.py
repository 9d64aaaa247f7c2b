"""Declarative `kind: operator` stages end-to-end in YAML pipelines."""

import pytest

from ankaflow_spark.models.core import Stages
from ankaflow_spark.plans.flow import Flow, FlowError


def test_versioned_dedup_stage(engine, sf_dir):
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: events
  connection: {{kind: parquet, locator: {sf_dir}/events.parquet}}
- kind: operator
  name: latest
  op: versioned_dedup
  params: {{keys: [user_id, event_type], version: ts, tiebreak: event_id}}
- kind: transform
  name: check
  query: SELECT user_id, event_type, count(*) AS c FROM latest GROUP BY 1, 2
"""),
        engine=engine,
    )
    assert flow.run().filter("c > 1").count() == 0


def test_hash_sample_stage(engine, sf_dir):
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: orders
  connection: {{kind: parquet, locator: {sf_dir}/orders.parquet}}
- kind: operator
  name: sampled
  op: hash_sample
  params: {{key: o_orderkey, fraction: 0.25}}
"""),
        engine=engine,
    )
    df = flow.run()
    total = engine.table("orders").count()
    n = df.count()
    assert 0 < n < total
    # deterministic: same result on re-run
    assert n == flow.engine.table("sampled").count()


def test_minhash_and_quality_stages(engine, sf_dir):
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: docs
  connection: {{kind: parquet, locator: {sf_dir}/documents.parquet}}
- kind: operator
  name: scored
  op: quality_score
  params: {{text_column: text}}
- kind: operator
  name: pairs
  op: minhash_pairs
  input: docs
  params: {{id_column: doc_id, text_column: text}}
- kind: transform
  name: summary
  query: >
    SELECT (SELECT count(*) FROM scored WHERE quality = 'high') AS n_high,
           (SELECT count(*) FROM pairs) AS n_pairs
"""),
        engine=engine,
    )
    row = flow.run().collect()[0]
    assert row["n_high"] >= 0 and row["n_pairs"] >= 0
    assert "quality_score" in engine.table("scored").columns


def test_asof_stage(engine):
    flow = Flow(
        Stages.loads("""
- kind: internal
  name: quotes
  query: >
    SELECT * FROM VALUES ('A', 8, 1.0), ('A', 12, 2.0), ('B', 1, 9.0) AS t(sym, t, bid)
- kind: internal
  name: trades
  query: >
    SELECT * FROM VALUES ('A', 10, 100.0), ('A', 20, 101.0), ('B', 15, 50.0) AS t(sym, t, price)
- kind: operator
  name: matched
  op: asof_join
  params: {right: quotes, "on": t, by: [sym], value_column: bid}
"""),
        engine=engine,
    )
    got = {(r["sym"], r["t"]): r["bid_asof"] for r in flow.run().collect()}
    assert got[("A", 10)] == 1.0
    assert got[("A", 20)] == 2.0
    assert got[("B", 15)] == 9.0


def test_unknown_operator_fails(engine, sf_dir):
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: orders
  connection: {{kind: parquet, locator: {sf_dir}/orders.parquet}}
- kind: operator
  name: nope
  op: does_not_exist
"""),
        engine=engine,
    )
    with pytest.raises(FlowError, match="unknown operator"):
        flow.run()
