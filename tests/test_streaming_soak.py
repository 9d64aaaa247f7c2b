"""Streaming SOAK evidence (r9 verdict punch item 2): the bounded-state
family's pitch is trigger-count invariance — state and per-batch wall
must stay flat when the same corpus arrives over MANY micro-batches,
not just in one availableNow drain. These tests stage the sf0.1 corpus
as 24 time-sliced files, drive each state mechanism with
maxFilesPerTrigger=1 (>= 20 real micro-batches), and assert:

* state rows reach the documented bound and PLATEAU (exactly flat over
  the trailing batches once every key has been seen);
* per-batch wall does not trend upward (trailing-window mean vs an
  early window, generous 3x to tolerate host noise);
* the one deliberately UNBOUNDED mechanism (st21's complete-mode
  session_window) grows monotonically — the honest contrast that shows
  the flatness assertions would fail on a leaky operator.

Covers every distinct state mechanism behind st21-st25: native
session_window state (st21), applyInPandasWithState sessionization
(st22), foreachbatch_merge_sums (st23's lattice), and
foreachbatch_merge_counts (st24/st25's counter lattices).

Run at a different scale with SPARK_GRAFT_SOAK_SF_DIR.
"""

import hashlib
import os
import tempfile

import pytest
from pyspark.sql import functions as F

SOAK_SF_DIR = os.environ.get("SPARK_GRAFT_SOAK_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 24
MIN_BATCHES = 20

pytestmark = [
    pytest.mark.soak,
    pytest.mark.skipif(
        not os.path.isdir(SOAK_SF_DIR), reason=f"{SOAK_SF_DIR} not present"
    ),
]


def _stage_n_files(spark, table: str, range_col: str):
    """Stage a table as N_FILES range-partitioned parquet files so a
    maxFilesPerTrigger=1 reader executes N_FILES real micro-batches in
    arrival order (ascending range_col mimics a time-sliced ingest)."""
    from ankaflow_spark.operators.tables import load_tables

    t = load_tables(spark, SOAK_SF_DIR)
    staged = os.path.join(
        tempfile.gettempdir(),
        "ankaflow_soak_"
        + hashlib.md5(f"{SOAK_SF_DIR}:{table}:{N_FILES}".encode()).hexdigest()[:10],
    )
    success = os.path.join(staged, "_SUCCESS")
    src = os.path.join(SOAK_SF_DIR, f"{table}.parquet")
    fresh = os.path.exists(success) and (
        os.path.getmtime(success) >= os.path.getmtime(src)
    )
    if not fresh:
        t[table].repartitionByRange(N_FILES, range_col).write.mode(
            "overwrite"
        ).parquet(staged)
    return staged, spark.read.parquet(staged).schema


def _drive_with_progress(
    stream_df, name: str, output_mode: str, want_custom_metrics: bool = False
):
    """Drive a throttled stream to completion on a memory sink and
    return the per-batch progress rows Spark itself reports:
    (batch index, wall seconds, state rows, provider custom metrics —
    RocksDB's rocksdb* keys when that provider backs the query)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    prog = [
        p
        for p in q.recentProgress
        if p.get("stateOperators") and p["numInputRows"] > 0
    ]
    q.stop()
    return [
        (
            i,
            p["durationMs"].get("triggerExecution", 0) / 1000.0,
            p["stateOperators"][0]["numRowsTotal"],
            p["stateOperators"][0].get("customMetrics", {})
            if want_custom_metrics
            else {},
        )
        for i, p in enumerate(prog)
    ]


def _assert_wall_flat(walls, label):
    """Trailing-window mean must not trend above an early window (3x:
    generous for host noise, far below what linear state growth causes
    — st21's contrast run shows >=1 order of magnitude drift)."""
    early = sorted(walls[2:10])[len(walls[2:10]) // 2]
    late = sorted(walls[-5:])[2]
    assert late <= 3 * max(early, 0.05), (
        f"{label}: per-batch wall trends up ({early=:.3f}s -> {late=:.3f}s)"
    )


@pytest.mark.parametrize("provider", [None, "rocksdb"])
def test_soak_st22_sessionizer_state_bounded(spark, provider):
    """applyInPandasWithState gap-closure sessionizer (st22's state):
    state is 3 longs per LIVE KEY — bounded by |users|, flat once every
    user has appeared, regardless of trigger count. Parametrized over
    the state store provider (r12 verdict punch item 4): the SAME
    bounds must hold on RocksDB — the off-heap provider a 100 TB/day
    deployment runs, where state must not live on executor heap — and
    the progress metrics must prove RocksDB actually backed the
    query."""
    from ankaflow_spark.streaming.stream import (
        sessionize_stateful,
        state_store_conf,
        stream_tap,
    )

    staged, schema = _stage_n_files(spark, "events", "ts")
    n_users = spark.read.parquet(staged).select("user_id").distinct().count()
    stream = stream_tap(spark, staged, schema, max_files_per_trigger=1)
    sessions = sessionize_stateful(stream, gap_minutes=30, watermark="3650 days")
    name = f"soak_st22_{provider or 'default'}"
    with state_store_conf(spark, provider):
        rows = _drive_with_progress(
            sessions, name, "append", want_custom_metrics=True
        )
    assert len(rows) >= MIN_BATCHES
    state = [r[2] for r in rows]
    assert max(state) <= n_users, "state exceeded the live-key bound"
    # plateau: once saturated, trailing batches hold exactly |users|
    assert state[-1] == max(state)
    assert len(set(state[-5:])) == 1, f"no plateau: {state[-5:]}"
    _assert_wall_flat([r[1] for r in rows], f"st22 sessionizer ({name})")
    # provider proof: RocksDB reports its own custom metrics (SST file
    # bytes etc.); the heap-backed default reports none of them
    has_rocks = any("rocksdb" in k for r in rows for k in r[3])
    assert has_rocks == (provider == "rocksdb"), (provider, rows[-1][3])
    globals().setdefault("_SOAK_RESULTS", {})[name] = rows


def test_soak_st21_native_session_window_grows(spark):
    """CONTRAST (the documented growth class): st21's complete-mode
    session_window keeps EVERY session in the state store, so state
    grows with the stream — the leak shape the bounded family avoids.
    If this assertion ever fails (native state stops growing), the
    bounded-state claims above are being tested against a strawman."""
    from ankaflow_spark.streaming.stream import stream_tap

    staged, schema = _stage_n_files(spark, "events", "ts")
    stream = stream_tap(spark, staged, schema, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
    )
    rows = _drive_with_progress(agg, "soak_st21", "complete")
    assert len(rows) >= MIN_BATCHES
    state = [r[2] for r in rows]
    # growing across the run. numRowsTotal for the native session-window
    # operator updates in PLATEAU STEPS (identical values across several
    # batches), and where the steps land shifts with the range-partition
    # sampling at staging time — a back-half window ratio (>=1.5x mid)
    # proved brittle against that (r13: a restaged trajectory read
    # end/mid = 1.30 while still growing 8.7x overall). Assert the
    # actual contrast property instead: never shrinks, and total growth
    # is far beyond anything the bounded family's exact plateau allows.
    # Strict monotonicity is safe HERE because arrival order is
    # time-ascending by construction (the staging repartitionByRange on
    # ts + one file per trigger): a new event can only extend a user's
    # latest session or open a new one, never land in a gap between two
    # existing sessions — so cross-batch session MERGES (which would
    # shrink numRowsTotal) cannot occur. If the staging ever feeds
    # out-of-order slices, relax this to a tolerance dip (r13 ADVICE)
    # instead of deleting the contrast check.
    assert state == sorted(state), f"state shrank mid-stream: {state}"
    assert state[-1] >= 3 * state[0] > 0, f"no unbounded growth: {state}"
    # and it blows past the bounded sessionizer's live-key ceiling
    n_users = spark.read.parquet(staged).select("user_id").distinct().count()
    assert state[-1] > 2 * n_users
    globals().setdefault("_SOAK_RESULTS", {})["st21_native_contrast"] = rows


@pytest.mark.parametrize(
    "name,table,range_col,keys,bound_sql,value_col",
    [
        # st23: per-(label, dim) centroid numerators over embeddings
        ("st23_lattice", "embeddings", "vec_id", ["label", "dim"],
         "SELECT COUNT(DISTINCT label) * 64 FROM embeddings", "q"),
        # st24: per-(event_type, $5-bucket) histogram counters
        ("st24_buckets", "events", "ts", ["event_type", "bucket"],
         "SELECT COUNT(*) FROM (SELECT DISTINCT event_type, "
         "CAST(floor(CAST(value AS DECIMAL(18,6)) * 100) AS BIGINT) div 500 "
         "FROM events)", None),
        # st25: per-(snapshot, bin) PSI counters
        ("st25_psi_cells", "events", "ts", ["snap", "bin"],
         "SELECT COUNT(*) FROM (SELECT DISTINCT "
         "CAST(unix_micros(ts) >= 1705363200000000 AS INT), "
         "CAST(floor(CAST(value AS DECIMAL(18,6)) * 100) AS BIGINT) div 500 "
         "FROM events)", None),
    ],
)
def test_soak_foreachbatch_state_flat(
    spark, name, table, range_col, keys, bound_sql, value_col
):
    """foreachbatch_merge_counts/_merge_sums (st23/st24/st25's state):
    the counter lattice is |key combinations| rows — saturates once
    every cell has been occupied, then stays EXACTLY flat (rows and
    bytes) for every further trigger."""
    from ankaflow_spark.operators.tables import load_tables
    from ankaflow_spark.streaming.stream import (
        foreachbatch_merge_counts,
        foreachbatch_merge_sums,
        stream_tap,
    )

    load_tables(spark, SOAK_SF_DIR)
    lattice_bound = spark.sql(bound_sql).collect()[0][0]
    staged, schema = _stage_n_files(spark, table, range_col)
    stream = stream_tap(spark, staged, schema, max_files_per_trigger=1)
    if name == "st23_lattice":
        cells = stream.select(
            "label", F.expr("posexplode(embedding) AS (pos, v)")
        ).select(
            "label",
            (F.col("pos") + 1).alias("dim"),
            F.expr("CAST(floor(CAST(v AS DOUBLE) * 10000) AS BIGINT)").alias("q"),
        )
    elif name == "st24_buckets":
        cells = stream.select(
            "event_type",
            F.expr(
                "CAST(floor(CAST(value AS DECIMAL(18,6)) * 100) AS BIGINT) div 500"
            ).alias("bucket"),
        )
    else:
        cells = stream.select(
            F.expr("CAST(unix_micros(ts) >= 1705363200000000 AS INT)").alias("snap"),
            F.expr(
                "CAST(floor(CAST(value AS DECIMAL(18,6)) * 100) AS BIGINT) div 500"
            ).alias("bin"),
        )
    base = os.path.join(tempfile.gettempdir(), f"ankaflow_soak_state_{name}")
    metrics: list = []
    if value_col:
        foreachbatch_merge_sums(cells, keys, value_col, base, metrics=metrics)
    else:
        foreachbatch_merge_counts(cells, keys, base, metrics=metrics)
    assert len(metrics) >= MIN_BATCHES
    state = [m["state_rows"] for m in metrics]
    assert max(state) <= lattice_bound, (max(state), lattice_bound)
    # monotone fill toward the FIXED lattice capacity — never O(stream)
    assert state == sorted(state), f"state shrank mid-stream: {state}"
    assert state[-1] == lattice_bound
    # trigger-count invariance: most of the lattice is occupied early,
    # and late-stream growth is residual cell fill-in (rare values
    # touching new cells), NOT per-trigger accumulation — thousands of
    # input rows in the last 5 batches add at most a few per mille of
    # the input in state cells
    assert state[4] >= 0.6 * lattice_bound, f"lattice fills too late: {state}"
    late_growth = state[-1] - state[-6]
    assert late_growth <= max(5, 0.05 * lattice_bound), (
        f"state still accumulating per trigger near the end: {state}"
    )
    # state BYTES bounded alongside rows (no per-trigger file growth)
    sizes = [m["state_bytes"] for m in metrics[len(metrics) // 2:]]
    assert max(sizes) <= 2 * min(sizes)
    _assert_wall_flat([m["wall_sec"] for m in metrics], name)
    globals().setdefault("_SOAK_RESULTS", {})[name] = [
        (m["batch_id"], m["wall_sec"], m["state_rows"]) for m in metrics
    ]
