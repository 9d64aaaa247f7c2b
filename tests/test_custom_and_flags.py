"""Custom connection loader + stage control flags (show/explain/throttle)."""

import time

import pytest

from ankaflow_spark.models.core import Stages
from ankaflow_spark.plans.flow import Flow
from ankaflow_spark.sources.custom import CustomConnectionError, load_connector_class


# a user connector importable by dotted path (this test module itself)
class ToyConnection:
    def __init__(self, engine, spec, variables):
        self.engine = engine
        self.spec = spec

    def tap(self, query, stage):
        n = int(self.spec.get("options", {}).get("rows", 3))
        return self.engine.spark.range(n).withColumnRenamed("id", "toy_id")

    def sink(self, df, stage):
        raise NotImplementedError

    def execute(self, query, stage):
        raise NotImplementedError


def test_custom_connection_loads_and_taps(engine):
    flow = Flow(
        Stages.loads("""
- kind: tap
  name: toys
  connection:
    kind: custom
    module: tests.test_custom_and_flags.ToyConnection
    options: {rows: 7}
"""),
        engine=engine,
    )
    df = flow.run()
    assert df.count() == 7
    assert df.columns == ["toy_id"]


def test_custom_connection_bad_paths():
    with pytest.raises(CustomConnectionError, match="dotted"):
        load_connector_class("NoDots")
    with pytest.raises(CustomConnectionError, match="cannot import"):
        load_connector_class("no.such.module.Klass")
    with pytest.raises(CustomConnectionError, match="no attribute"):
        load_connector_class("tests.test_custom_and_flags.Missing")
    with pytest.raises(CustomConnectionError, match="protocol"):
        load_connector_class("tests.test_custom_and_flags.Stages")  # imported, not a connector


def test_show_and_explain_flags(engine, capsys):
    flow = Flow(
        Stages.loads("""
- kind: internal
  name: peek
  show: 2
  explain: true
  query: SELECT explode(sequence(1, 5)) AS n
"""),
        engine=engine,
    )
    flow.run()
    out = capsys.readouterr().out
    assert "only showing top 2 rows" in out or "| n|" in out.replace("  ", " ")
    assert "Physical Plan" in out


def test_throttle_sleeps(engine):
    flow = Flow(
        Stages.loads("""
- kind: internal
  name: slow
  throttle: 0.5
  query: SELECT 1 AS x
"""),
        engine=engine,
    )
    t0 = time.time()
    flow.run()
    assert time.time() - t0 >= 0.5
