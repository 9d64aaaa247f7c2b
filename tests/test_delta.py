"""Delta connector e2e against the jar-free delta_log fallback (model:
reference tests/test_delta.py — tap/sink/truncate/optimize through real
tables; here the transaction log is the public Delta protocol subset
documented in ankaflow_spark/sources/delta_log.py).

The first test hand-authors a _delta_log (parquet + JSON commits written
manually, no connector involvement) and reads it through a Flow tap —
proving the read path against an externally-produced log shape. The
rest round-trip through the connector's own sink/execute surface.
"""

import json
import os

import pytest

from ankaflow_spark.models.core import Stages
from ankaflow_spark.plans.flow import Flow
from ankaflow_spark.sources import delta_log


def _connector(engine, spec):
    from ankaflow_spark.sources import get_connector

    spec = {"kind": "delta", **spec}
    return get_connector("delta")(engine, spec, {})


def _hand_authored_table(spark, root):
    """Parquet + _delta_log JSON written by hand: two commits, the
    second removing one file — the active snapshot is files 1 and 2."""
    os.makedirs(os.path.join(root, "_delta_log"))
    paths = []
    for i in range(3):
        sub = os.path.join(root, f"stage{i}")
        spark.createDataFrame([(i * 10 + j, f"v{i}") for j in range(2)], "id INT, tag STRING") \
            .coalesce(1).write.mode("overwrite").parquet(sub)
        import glob as _glob
        import shutil as _shutil

        part = _glob.glob(os.path.join(sub, "part-*.parquet"))[0]
        name = f"file{i}.parquet"
        _shutil.move(part, os.path.join(root, name))
        _shutil.rmtree(sub)
        paths.append(name)
    schema = {"type": "struct", "fields": [
        {"name": "id", "type": "integer", "nullable": True, "metadata": {}},
        {"name": "tag", "type": "string", "nullable": True, "metadata": {}},
    ]}
    commit0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "hand", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {}}},
        {"add": {"path": paths[0], "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    commit1 = [
        {"add": {"path": paths[1], "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": paths[2], "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"remove": {"path": paths[0], "deletionTimestamp": 0, "dataChange": True}},
    ]
    for v, actions in enumerate([commit0, commit1]):
        with open(os.path.join(root, "_delta_log", f"{v:020d}.json"), "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return root


def test_hand_authored_log_reads_through_flow(engine, tmp_path):
    root = _hand_authored_table(engine.spark, str(tmp_path / "t"))
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: dl
  connection:
    kind: Deltatable
    locator: {root}
  query: SELECT id, tag FROM Deltatable ORDER BY id
"""),
        engine=engine,
    )
    rows = flow.run().collect()
    # file0 (ids 0,1) was removed in commit 1; files 1 and 2 are active
    assert [r["id"] for r in rows] == [10, 11, 20, 21]
    assert {r["tag"] for r in rows} == {"v1", "v2"}


def test_sink_append_overwrite_roundtrip(engine, tmp_path):
    loc = str(tmp_path / "sink")
    conn = _connector(engine, {"locator": loc, "mode": "append"})
    conn.sink(engine.spark.range(3), None)
    conn.sink(engine.spark.range(3), None)
    assert conn.tap(None, None).count() == 6
    over = _connector(engine, {"locator": loc, "mode": "overwrite"})
    over.sink(engine.spark.range(2), None)
    assert over.tap(None, None).count() == 2
    # mode=error on an existing table refuses
    err = _connector(engine, {"locator": loc, "mode": "error"})
    with pytest.raises(FileExistsError):
        err.sink(engine.spark.range(1), None)


def test_sink_create_empty_then_write(engine, tmp_path):
    loc = str(tmp_path / "created")
    fields = [{"name": "a", "type": "BIGINT"}, {"name": "b", "type": "VARCHAR"}]
    conn = _connector(engine, {"locator": loc, "fields": fields})
    # CREATE: schema declared, zero rows -> empty table with that schema
    conn.sink(engine.spark.createDataFrame([], "a BIGINT, b STRING"), None)
    df = conn.tap(None, None)
    assert df.count() == 0
    assert df.columns == ["a", "b"]
    # then a real write lands rows
    conn2 = _connector(engine, {"locator": loc, "mode": "append"})
    conn2.sink(engine.spark.sql("SELECT 1 AS a, 'x' AS b"), None)
    assert conn2.tap(None, None).count() == 1


def test_partitioned_write_recovers_partition_column(engine, tmp_path):
    loc = str(tmp_path / "parted")
    conn = _connector(engine, {"locator": loc, "mode": "append", "partition_by": ["part"]})
    conn.sink(engine.sql("SELECT id, id % 2 AS part FROM range(6)"), None)
    df = conn.tap(None, None)
    assert set(df.columns) == {"id", "part"}
    assert df.filter("part = 1").count() == 3
    # data files live in partition directories (real Delta layout)
    assert os.path.isdir(os.path.join(loc, "part=0"))


def test_truncate_keeps_schema(engine, tmp_path):
    loc = str(tmp_path / "trunc")
    conn = _connector(engine, {"locator": loc, "mode": "append"})
    conn.sink(engine.spark.range(4), None)
    conn.execute(f"TRUNCATE {loc}", None)
    df = conn.tap(None, None)
    assert df.count() == 0
    assert df.columns == ["id"]


def test_optimize_compact_and_vacuum(engine, tmp_path):
    loc = str(tmp_path / "opt")
    conn = _connector(engine, {"locator": loc, "mode": "append"})
    for _ in range(3):
        conn.sink(engine.spark.range(2), None)
    before = conn.tap(None, None).count()
    conn.execute(f"OPTIMIZE {loc} COMPACT VACUUM AGE=0 DAYS", None)
    assert conn.tap(None, None).count() == before
    # vacuum with AGE=0 removed every de-referenced pre-compaction file
    import glob

    active, _, _ = delta_log.snapshot(engine.spark, loc)
    on_disk = {
        os.path.relpath(f, loc)
        for f in glob.glob(os.path.join(loc, "**", "*.parquet"), recursive=True)
        if "_delta_log" not in f
    }
    assert on_disk == set(active)


def test_checkpoint_roundtrip(engine, tmp_path):
    loc = str(tmp_path / "ckpt")
    conn = _connector(engine, {"locator": loc, "mode": "append"})
    for _ in range(3):
        conn.sink(engine.spark.range(2), None)
    version = delta_log.write_checkpoint(engine.spark, loc)
    # replay must not need the pre-checkpoint JSON commits any more
    for v, f in delta_log._commit_files(loc):
        if v <= version:
            os.remove(f)
    assert conn.tap(None, None).count() == 6
    # and further commits after the checkpoint still apply
    conn.sink(engine.spark.range(1), None)
    assert conn.tap(None, None).count() == 7


def test_protocol_gate(engine, tmp_path):
    root = str(tmp_path / "v3")
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}) + "\n")
    with pytest.raises(delta_log.DeltaProtocolError, match="reader protocol 3"):
        delta_log.read_delta_table(engine.spark, root)


def test_time_travel_version_as_of(engine, tmp_path):
    """Delta time travel through the jar-free log replay: each commit
    is a readable version; a pre-checkpoint version replays from
    commit 0; out-of-range versions and cleaned logs raise with the
    delta-spark-parity explanation."""
    loc = str(tmp_path / "tt")
    conn = _connector(engine, {"locator": loc, "mode": "append"})
    conn.sink(engine.spark.range(3), None)        # v0: 3 rows
    conn.sink(engine.spark.range(2), None)        # v1: +2 -> 5
    over = _connector(engine, {"locator": loc, "mode": "overwrite"})
    over.sink(engine.spark.range(7), None)        # v2: overwrite -> 7

    def read_as_of(v):
        c = _connector(
            engine, {"locator": loc, "options": {"version_as_of": v}}
        )
        return c.tap(None, None).count()

    assert read_as_of(0) == 3
    assert read_as_of(1) == 5
    assert read_as_of(2) == 7
    assert _connector(engine, {"locator": loc}).tap(None, None).count() == 7
    with pytest.raises(ValueError, match="is at version 2"):
        read_as_of(9)

    # checkpoint at the head, then travel BEFORE it (replays from 0)
    delta_log.write_checkpoint(engine.spark, loc)
    assert read_as_of(1) == 5

    # cleaned-up early commits make pre-checkpoint travel impossible
    for v, f in delta_log._commit_files(loc):
        if v < 2:
            os.remove(f)
    with pytest.raises(ValueError, match="log retention"):
        read_as_of(1)
    # but the checkpointed head still reads fine
    assert _connector(engine, {"locator": loc}).tap(None, None).count() == 7
