"""User macro registration + CLI smoke (model: reference
tests/test_fn_register.py + CLI surface)."""

import subprocess
import sys

import pytest

from ankaflow_spark.functions.register import MacroError, register_macro


def test_register_macro_both_spellings(engine):
    spark = engine.spark
    register_macro(spark, "discount", "(price DOUBLE, pct DOUBLE) RETURNS DOUBLE",
                   "price * (1 - pct / 100)")
    assert spark.sql("SELECT fn_discount(200.0, 25.0) AS v").collect()[0]["v"] == 150.0
    # reference spelling through the engine rewriter
    assert engine.sql("SELECT Fn.discount(200.0, 25.0) AS v").collect()[0]["v"] == 150.0


def test_register_macro_rejects_builtin(spark):
    with pytest.raises(MacroError, match="built-in"):
        register_macro(spark, "div", "(a DOUBLE, b DOUBLE) RETURNS DOUBLE", "a / b")


def test_register_macro_rejects_bad_name(spark):
    with pytest.raises(MacroError):
        register_macro(spark, "bad name!", "(a INT) RETURNS INT", "a")


def test_tap_validator_wired(engine, sf_dir):
    from ankaflow_spark.models.core import Stages
    from ankaflow_spark.plans.flow import Flow, FlowError

    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: bad tap
  connection:
    kind: parquet
    locator: {sf_dir}/orders.parquet
  query: SELECT * FROM "bad tap" JOIN other ON 1=1
"""),
        engine=engine,
    )
    with pytest.raises(FlowError, match="JOIN"):
        flow.run()


def test_cli_runs_pipeline(tmp_path, sf_dir):
    yaml_file = tmp_path / "pipe.yaml"
    out = tmp_path / "out.csv"
    yaml_file.write_text(f"""
- kind: tap
  name: orders
  connection:
    kind: parquet
    locator: {sf_dir}/orders.parquet
- kind: transform
  name: by status
  query: SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1
""")
    proc = subprocess.run(
        [sys.executable, "-m", "ankaflow_spark", str(yaml_file), "--out", str(out)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    import pandas as pd

    pdf = pd.read_csv(out)
    assert set(pdf.columns) == {"o_orderstatus", "n"}
    assert pdf["n"].sum() == 1500


def test_connection_configuration_from_env(tmp_path):
    from ankaflow_spark.models.configs import ConnectionConfiguration

    env = {
        "AWS_DEFAULT_BUCKET": "my-bucket",
        "AWS_REGION": "eu-west-1",
        "AWS_ACCESS_KEY_ID": "AK",
        "AWS_SECRET_ACCESS_KEY": "SK",
        "GOOGLE_CLOUD_PROJECT": "proj",
    }
    cfg = ConnectionConfiguration.from_env(env)
    assert cfg.bucket == "s3://my-bucket"
    assert cfg.s3.access_key_id == "AK" and cfg.s3.region == "eu-west-1"
    assert cfg.bigquery.project == "proj"
    # bare bucket names gain a scheme; paths/URIs pass through
    assert ConnectionConfiguration.from_env({"AWS_DEFAULT_BUCKET": str(tmp_path)}).bucket == str(tmp_path)
    # the default fills relative locators
    spec = cfg.apply_defaults({"kind": "parquet", "locator": "data.parquet"})
    assert spec["bucket"] == "s3://my-bucket"


def test_cli_env_configured_bucket(tmp_path, monkeypatch, spark):
    """python -m ankaflow_spark with AWS_DEFAULT_BUCKET set resolves a
    relative locator against the env-configured bucket (reference
    cli.py:37-56 behavior, local path standing in for the bucket)."""
    import pandas as pd

    from ankaflow_spark import __main__ as cli

    pd.DataFrame({"v": [1, 2, 3]}).to_parquet(tmp_path / "rel.parquet")
    yml = tmp_path / "p.yaml"
    yml.write_text(
        "- kind: tap\n"
        "  name: t\n"
        "  connection: {kind: parquet, locator: rel.parquet}\n"
    )
    out = tmp_path / "out.csv"
    monkeypatch.setenv("AWS_DEFAULT_BUCKET", str(tmp_path))
    assert cli.main([str(yml), "--out", str(out)]) == 0
    assert len(out.read_text().strip().splitlines()) == 4  # header + 3 rows


def test_cli_demo_and_output_format(tmp_path, spark):
    """'DEMO' resolves to the bundled demo pipeline; -o FORMAT PATH
    writes the final frame (reference cli.py surface)."""
    from ankaflow_spark import __main__ as cli

    out = tmp_path / "demo.json"
    assert cli.main(["DEMO", "-o", "json", str(out)]) == 0
    import json as _json

    rows = _json.loads(out.read_text())
    assert len(rows) == 20  # asc ∪ desc over 10 ids
    assert {r["id"] for r in rows} == set(range(1, 11))
