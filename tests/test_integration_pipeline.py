"""End-to-end integration pipeline (model: the reference's opt-in
integration suite — one YAML exercising file taps across formats,
UNION ALL, aggregation, versioned dedup, operator stages, sinks, and a
variable round-trip; reference tests/support/integration.yaml shape)."""

import json
import os


def test_full_integration_pipeline(engine, tmp_path):
    from ankaflow_spark.models.core import Stages
    from ankaflow_spark.plans.flow import Flow

    # seed files in three formats (the reference writes its 5-row frame
    # to every format then taps them all back)
    seed = [{"id": i, "amount": 50 * i, "name": f"User {i}"} for i in range(1, 6)]
    (tmp_path / "seed.jsonl").write_text("\n".join(json.dumps(r) for r in seed))
    (tmp_path / "seed.csv").write_text(
        "id,amount,name\n" + "\n".join(f"{r['id']},{r['amount']},{r['name']}" for r in seed)
    )
    out_parquet = tmp_path / "combined.parquet"

    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: json rows
  connection:
    kind: json
    locator: {tmp_path}/seed.jsonl
- kind: tap
  name: csv rows
  connection:
    kind: csv
    locator: {tmp_path}/seed.csv
    options: {{header: true}}
    fields:
    - {{name: id, type: BIGINT}}
    - {{name: amount, type: BIGINT}}
    - {{name: name, type: VARCHAR}}
- kind: transform
  name: combined
  query: >
    SELECT id, amount, name, 'json' AS src FROM "json rows"
    UNION ALL
    SELECT id, amount, name, 'csv' AS src FROM "csv rows"
- kind: transform
  name: big spenders
  query: SELECT * FROM combined WHERE amount > << threshold >>
- kind: operator
  name: deduped
  op: exact_dedup
  input: combined
  params: {{key_columns: [id], order_by: [src, id]}}
- kind: transform
  name: totals
  query: >
    SELECT count(*) AS n_all,
           (SELECT count(*) FROM "big spenders") AS n_big,
           (SELECT count(*) FROM deduped) AS n_unique,
           Fn.div(sum(amount), count(*)) AS avg_amount
    FROM combined
- kind: sink
  name: save combined
  connection:
    kind: parquet
    locator: {out_parquet}
  query: SELECT * FROM combined
- kind: sink
  name: totals out
  connection:
    kind: variable
    locator: result
  query: SELECT * FROM totals
"""),
        engine=engine,
        variables={"threshold": 100},
    )
    flow.run()

    result = flow.variables["result"][0]
    assert result["n_all"] == 10  # 5 rows x 2 formats
    assert result["n_big"] == 6  # amounts 150,200,250 in both formats
    assert result["n_unique"] == 5
    assert result["avg_amount"] == 150.0
    assert os.path.isfile(out_parquet)
    back = engine.spark.read.parquet(str(out_parquet))
    assert back.count() == 10
