"""Locator/path algebra tests (model: reference tests/test_path.py)."""

from ankaflow_spark.models.core import Stages
from ankaflow_spark.plans.flow import Flow
from ankaflow_spark.sources.locator import Locator, normalize_scheme, wildcardize


def test_absolute_passthrough():
    assert Locator().locate("/data/x.parquet") == "/data/x.parquet"
    assert Locator(bucket="s3://b").locate("/data/x.parquet") == "/data/x.parquet"


def test_scheme_mapping():
    assert normalize_scheme("s3://bucket/k") == "s3a://bucket/k"
    assert normalize_scheme("gs://bucket/k") == "gcs://bucket/k"
    assert normalize_scheme("hdfs://nn/k") == "hdfs://nn/k"
    assert normalize_scheme("plain/path") == "plain/path"


def test_relative_join():
    loc = Locator(bucket="s3://bucket", prefix="team/raw")
    assert loc.locate("data.parquet") == "s3a://bucket/team/raw/data.parquet"
    loc = Locator(bucket="/mnt/data")
    assert loc.locate("x.csv") == "/mnt/data/x.csv"


def test_wildcardize():
    assert wildcardize("data-2024.parquet") == "data-*.parquet"
    # separator is preserved so the glob still matches the file family
    assert wildcardize("events_20240101.json") == "events_*.json"
    assert wildcardize("snap.20240101.parquet") == "snap.*.parquet"
    assert wildcardize("plain.parquet") == "plain.parquet"


def test_file_tap_reads_wildcard_family(engine, tmp_path):
    """The reference wildcard-substitutes every file tap locator: a tap
    naming one dated file reads the whole family."""
    import pandas as pd

    pd.DataFrame({"v": [1]}).to_parquet(tmp_path / "part_20240101.parquet")
    pd.DataFrame({"v": [2]}).to_parquet(tmp_path / "part_20240102.parquet")
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: fam
  connection:
    kind: parquet
    locator: {tmp_path}/part_20240101.parquet
"""),
        engine=engine,
    )
    assert flow.run().count() == 2

    # locator_wildcard: false opts out (single file read)
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: one
  connection:
    kind: parquet
    locator: {tmp_path}/part_20240101.parquet
    locator_wildcard: false
"""),
        engine=engine,
    )
    assert flow.run().count() == 1


def test_bucket_prefix_in_pipeline(engine, sf_dir, tmp_path):
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: rel
  connection:
    kind: parquet
    bucket: {sf_dir}
    locator: region.parquet
"""),
        engine=engine,
    )
    assert flow.run().count() == 5


def test_glob_locator_reads_many(engine, tmp_path):
    for i in (1, 2):
        p = tmp_path / f"part-{i}.json"
        p.write_text(f'{{"a": {i}}}\n')
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: globbed
  connection:
    kind: json
    locator: "{tmp_path}/part-*.json"
"""),
        engine=engine,
    )
    assert flow.run().count() == 2
