"""Structured Streaming extension (beyond the reference's batch-only
surface — SURVEY.md §7 names this the designed extension point).

Stage kinds map to streaming primitives:

* stream tap    -> ``spark.readStream`` (file source here; kafka/rate on
  a real cluster) with an explicit schema.
* stream window -> ``withWatermark`` + tumbling/sliding ``window()``
  aggregation — the streaming twin of ts01.
* stream dedup  -> ``dropDuplicates`` on key+version within the
  watermark — the streaming twin of the reference's versioned dedup
  (bounded state: late duplicates beyond the watermark age out).

Local tests drive a parquet-backed stream to completion with
``processAllAvailable()`` on a memory sink — the same code shape a
cluster deployment points at kafka + a Delta sink.
"""

from __future__ import annotations

import contextlib
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the two state store providers Spark ships. The default
#: (HDFS-backed) keeps every store's working set on the executor HEAP —
#: fine for demo-scale state, an OOM source at 100 TB/day where stores
#: hold millions of keys. RocksDB keeps state OFF-HEAP in a local
#: RocksDB instance per store (native memory + local SSD, incremental
#: changelog/snapshot checkpointing), which is the provider a
#: production deployment of the bounded-state family runs on.
STATE_STORE_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

#: RocksDB commit mode: with changelog checkpointing OFF (Spark's
#: default) EVERY micro-batch commit snapshots the full store and
#: fsyncs the snapshot into the checkpoint dir — measured on st27's
#: 8-store replay: rocksdbCommitFileSyncLatencyMs was 1.2-4.9 s summed
#: per batch, the single largest per-batch cost (stream wall 13.9 s).
#: With changelog checkpointing ON, a commit fsyncs only the batch's
#: tiny change set (same probe: state commit 0.37-0.78 s/batch, stream
#: wall 9.8 s) and snapshots move to the background maintenance task.
#: This is also the at-scale contract: a 100 TB/day store cannot
#: re-upload its full SST set per trigger — incremental commit is the
#: production spelling, not a local tweak (OPTIMIZATION_r13.md).
_ROCKSDB_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


@contextlib.contextmanager
def state_store_conf(spark: SparkSession, provider: Optional[str]):
    """Scope the state store provider to one streaming query: the
    provider class is read from the SESSION conf when the query starts,
    so it is set before `.start()` and restored unset-aware afterwards
    (q88's restore pattern). `provider` is a STATE_STORE_PROVIDERS key
    or None (leave the session setting untouched). The rocksdb provider
    also enables changelog checkpointing (see _ROCKSDB_CHANGELOG_KEY —
    incremental per-batch commits instead of full-snapshot fsyncs),
    scoped and restored the same way."""
    if provider is None:
        yield
        return
    try:
        cls = STATE_STORE_PROVIDERS[provider]
    except KeyError:
        raise ValueError(
            f"unknown state_store {provider!r} "
            f"(one of {sorted(STATE_STORE_PROVIDERS)})"
        ) from None
    scoped = {_PROVIDER_KEY: cls}
    if provider == "rocksdb":
        scoped[_ROCKSDB_CHANGELOG_KEY] = "true"
    old = {k: spark.conf.get(k, None) for k in scoped}
    for k, v in scoped.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, prev in old.items():
            if prev is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prev)


def stream_tap(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def windowed_agg(
    events: DataFrame,
    ts_col: str,
    window_len: str = "5 minutes",
    slide: Optional[str] = None,
    watermark: str = "10 minutes",
    group_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation (count + sum of
    ``value`` when present)."""
    w = F.window(ts_col, window_len, slide) if slide else F.window(ts_col, window_len)
    keys = [w] + [F.col(c) for c in (group_cols or [])]
    aggs = [F.count("*").alias("n_events")]
    if "value" in events.columns:
        # sum in DECIMAL: exact and associative, so the streaming state
        # accumulation order (partition/trigger dependent) cannot change
        # the result — the same cross-engine determinism rule the batch
        # aggregates follow (PERF.md); emitted as DOUBLE
        aggs.append(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value")
        )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(c) for c in (group_cols or [])],
            F.col("n_events"),
            *([F.col("total_value")] if "value" in events.columns else []),
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: List[str],
    ts_col: str,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming versioned dedup: first event per key wins within the
    watermark horizon (state bounded by watermark age-out). The batch
    latest-record-wins semantics of q06 need a terminal compaction; in a
    stream, 'first arrival wins' is the standard incremental contract."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(subset=keys)


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a bounded stream to completion into an in-memory table and
    return the query handle (caller reads ``spark.sql(f"SELECT * FROM
    {name}")``). Test helper; production sinks are files/kafka."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


# ---------------------------------------------------------------------------
# custom stateful operator: streaming sessionization via
# applyInPandasWithState (the batch twin is operators ts02)
# ---------------------------------------------------------------------------
SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"


def sessionize_stateful(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionizer: per-key state carries the open session
    (start, last-seen, count); a gap beyond ``gap_minutes`` closes and
    emits the previous session, and an event-time timeout flushes a
    session once the watermark passes its last event + gap (idle keys
    leave state — bounded at three longs per live key).

    The per-key kernel is VECTORIZED (guide §4.2): the key's batch
    timestamps sort once as an int64-µs numpy array and session
    boundaries are ``diff > gap`` cut points — the same
    close-and-reopen rule the original per-row loop applied, so the
    emitted (start, end, n) set is bit-identical, but the Python work
    per key is a handful of array ops instead of one interpreted
    iteration (plus a Timestamp object construction) per event.
    Measured on st29's 1500-key replay: the row loop was the dominant
    Python cost inside applyInPandasWithState."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                }
            )
            return
        start = last = n = None
        if state.exists:
            start, last, n = state.get
        # one sorted int64-µs array for the key's whole batch
        # (datetime64 unit narrowing truncates ns -> µs exactly like the
        # old per-row `Timestamp.value // 1000`)
        chunks = [
            pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            for pdf in pdf_iter
        ]
        ts = (
            np.sort(np.concatenate(chunks))
            if chunks
            else np.empty(0, dtype=np.int64)
        )
        rows = []
        if ts.size:
            cuts = np.flatnonzero(np.diff(ts) > gap_us)
            lo = np.concatenate(([0], cuts + 1))
            hi = np.concatenate((cuts, [ts.size - 1]))
            segs = [
                (int(ts[a]), int(ts[b]), int(b - a + 1))
                for a, b in zip(lo, hi)
            ]
            if last is not None:
                if ts[0] - last <= gap_us:
                    # carried open session absorbs the first segment
                    _, l0, c0 = segs[0]
                    segs[0] = (start, l0, n + c0)
                else:
                    rows.append((user_id, start, last, n))
            rows.extend((user_id, s, e, c) for s, e, c in segs[:-1])
            start, last, n = segs[-1]
        if start is not None:
            state.update((int(start), int(last), int(n)))
            # flush when event-time watermark passes last + gap
            state.setTimeoutTimestamp(last // 1000 + gap_minutes * 60 * 1000)
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows],
                    "session_start": [pd.Timestamp(r[1], unit="us") for r in rows],
                    "session_end": [pd.Timestamp(r[2], unit="us") for r in rows],
                    "n_events": [r[3] for r in rows],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def foreachbatch_upsert(
    stream_df: DataFrame,
    keys: List[str],
    version: str,
    state_base: str,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Maintain a latest-record-per-key state table on disk across
    micro-batches via foreachBatch merge — the jar-free stand-in for a
    Delta MERGE sink. Each batch unions the previous state and keeps
    the top-ranked row per key (version DESC, tiebreak DESC); writes
    alternate between two directories (write-new-then-swap, the
    atomic-publish contract). Latest-wins with a total tie-break is
    merge-order independent, so the final state equals the batch
    ranking whatever the trigger boundaries.

    Returns the final state as a batch DataFrame."""
    import os
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ckpt = state_base + "_ckpt"
    for d in (state_base + "_a", state_base + "_b", ckpt):
        shutil.rmtree(d, ignore_errors=True)
    last_dir: List[str] = []
    order = [F.desc(version)] + ([F.desc(tiebreak)] if tiebreak else [])

    def merge_batch(batch_df, batch_id: int):
        prev = state_base + ("_b" if batch_id % 2 else "_a")
        nxt = state_base + ("_a" if batch_id % 2 else "_b")
        merged = batch_df
        if os.path.isdir(prev):
            merged = batch_df.unionByName(batch_df.sparkSession.read.parquet(prev))
        w = W.partitionBy(*keys).orderBy(*order)
        latest = (
            merged.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
        latest.write.mode("overwrite").parquet(nxt)
        last_dir.append(nxt)

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    if not last_dir:
        raise RuntimeError("foreachbatch_upsert: no micro-batch executed")
    return stream_df.sparkSession.read.parquet(last_dir[-1])


def _state_table_metrics(state_dir: str) -> tuple:
    """(row count, byte size) of a parquet state table, read from file
    footers driver-side — no Spark job, so soak instrumentation does
    not perturb the batch walls it measures."""
    import os

    import pyarrow.parquet as pq

    rows, size = 0, 0
    for f in os.listdir(state_dir):
        p = os.path.join(state_dir, f)
        size += os.path.getsize(p)
        if f.endswith(".parquet"):
            rows += pq.read_metadata(p).num_rows
    return rows, size


def foreachbatch_merge_counts(
    stream_df: DataFrame,
    keys: List[str],
    state_base: str,
    metrics: Optional[list] = None,
) -> DataFrame:
    """Maintain EXACT per-key counts across micro-batches: each batch
    pre-aggregates its own slice (the map-side combine of a streaming
    count) and sum-merges it with the previous state table. Integer
    addition is associative and commutative, so the final counts equal
    the batch GROUP BY whatever the trigger boundaries — the streaming
    twin of a count rollup, maintained incrementally the way a
    production ingest keeps daily counters. State publishes via the
    same alternating-directory atomic-swap contract as
    ``foreachbatch_upsert``; state size is O(|keys|), not O(stream).

    ``metrics``: when a list is passed, one dict per micro-batch is
    appended — {batch_id, wall_sec, state_rows, state_bytes} — read
    from the written state table's parquet FOOTERS (driver-side, no
    extra Spark job), the soak-test evidence that state stays flat
    across triggers.

    Returns the final counts as a batch DataFrame (columns: keys + n)."""
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    ckpt = state_base + "_ckpt"
    for d in (state_base + "_a", state_base + "_b", ckpt):
        shutil.rmtree(d, ignore_errors=True)
    last_dir: List[str] = []

    def merge_batch(batch_df, batch_id: int):
        t0 = time.time()
        prev = state_base + ("_b" if batch_id % 2 else "_a")
        nxt = state_base + ("_a" if batch_id % 2 else "_b")
        part = batch_df.groupBy(*keys).agg(F.count("*").alias("n"))
        if os.path.isdir(prev):
            part = part.unionByName(batch_df.sparkSession.read.parquet(prev))
        merged = part.groupBy(*keys).agg(F.sum("n").alias("n"))
        merged.write.mode("overwrite").parquet(nxt)
        last_dir.append(nxt)
        if metrics is not None:
            rows, size = _state_table_metrics(nxt)
            metrics.append(
                {
                    "batch_id": batch_id,
                    "wall_sec": round(time.time() - t0, 3),
                    "state_rows": rows,
                    "state_bytes": size,
                }
            )

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    if not last_dir:
        raise RuntimeError("foreachbatch_merge_counts: no micro-batch executed")
    # pin the result: a subsequent call with the same state_base rmtree's
    # these dirs, which would silently break a still-held lazy reader
    return stream_df.sparkSession.read.parquet(last_dir[-1]).localCheckpoint(eager=True)


def foreachbatch_merge_sums(
    stream_df: DataFrame,
    keys: List[str],
    value_col: str,
    state_base: str,
    metrics: Optional[list] = None,
) -> DataFrame:
    """Maintain EXACT per-key (sum, count) pairs across micro-batches —
    ``foreachbatch_merge_counts`` generalized to an integer value
    column: each batch pre-aggregates its own slice and sum-merges it
    with the previous state table. BIGINT addition is associative and
    commutative, so the final sums equal the batch GROUP BY whatever
    the trigger boundaries. State publishes via the same
    alternating-directory atomic-swap contract; state size is
    O(|keys|), not O(stream) — the bounded-state property st22
    measures. ``metrics``: same per-batch soak instrumentation as
    ``foreachbatch_merge_counts``.

    Returns the final state as a batch DataFrame (columns: keys + s + n)."""
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    ckpt = state_base + "_ckpt"
    for d in (state_base + "_a", state_base + "_b", ckpt):
        shutil.rmtree(d, ignore_errors=True)
    last_dir: List[str] = []

    def merge_batch(batch_df, batch_id: int):
        t0 = time.time()
        prev = state_base + ("_b" if batch_id % 2 else "_a")
        nxt = state_base + ("_a" if batch_id % 2 else "_b")
        part = batch_df.groupBy(*keys).agg(
            F.sum(value_col).cast("bigint").alias("s"),
            F.count("*").cast("bigint").alias("n"),
        )
        if os.path.isdir(prev):
            part = part.unionByName(batch_df.sparkSession.read.parquet(prev))
        merged = part.groupBy(*keys).agg(
            F.sum("s").cast("bigint").alias("s"),
            F.sum("n").cast("bigint").alias("n"),
        )
        merged.write.mode("overwrite").parquet(nxt)
        last_dir.append(nxt)
        if metrics is not None:
            rows, size = _state_table_metrics(nxt)
            metrics.append(
                {
                    "batch_id": batch_id,
                    "wall_sec": round(time.time() - t0, 3),
                    "state_rows": rows,
                    "state_bytes": size,
                }
            )

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    if not last_dir:
        raise RuntimeError("foreachbatch_merge_sums: no micro-batch executed")
    return stream_df.sparkSession.read.parquet(last_dir[-1]).localCheckpoint(eager=True)


def foreachbatch_append(
    stream_df: DataFrame,
    transform,
    state_base: str,
    progress_out: Optional[list] = None,
) -> DataFrame:
    """Apply ``transform(batch_df) -> DataFrame`` to every micro-batch
    and APPEND the result to a parquet state dir — the sink shape for
    per-record/per-group work with NO cross-batch state (each input
    row's verdict depends only on its own batch plus broadcast
    statics). Unlike foreachbatch_upsert there is nothing to merge, so
    the sink scales with output volume only; exactly-once comes from
    the checkpointed source offsets plus append idempotence per batch
    id (each batch writes its own subdirectory, pre-cleaned on retry).

    Returns the union of all batch outputs as a batch DataFrame."""
    import shutil

    ckpt = state_base + "_ckpt"
    out = state_base + "_out"
    for d in (ckpt, out):
        shutil.rmtree(d, ignore_errors=True)

    def run_batch(batch_df, batch_id: int):
        # REBALANCE before the per-batch write: the verdict relation
        # inherits the probe join's partitioning (shuffle-partition
        # many near-empty slices), and writing it as-is emits one tiny
        # file per slice per batch — the small-files trap twice over
        # (slow batch commit now, slow union read-back later). The
        # AQE rebalance sizes the write from real bytes: one file for
        # a demo-scale batch, advisory-sized files at volume (guide
        # §6; measured on st27's sibling sink: 40% off the stream
        # wall vs the unhinted write, while coalesce(1) instead
        # SERIALIZED the upstream stateful stage — 2x slower).
        transform(batch_df).hint("rebalance").write.mode("overwrite").parquet(
            f"{out}/batch={batch_id}"
        )

    q = (
        stream_df.writeStream.foreachBatch(run_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    if progress_out is not None:
        # caller wants the engine-reported per-batch progress (e.g.
        # st29's provider-proof metrics) — harvest before stop()
        progress_out.extend(q.recentProgress or [])
    q.stop()
    spark = stream_df.sparkSession
    import glob as _glob
    import os as _os

    if not _glob.glob(_os.path.join(out, "batch=*")):
        # no batches ran (empty source): derive the output schema by
        # applying the transform to an empty static batch
        empty = transform(spark.createDataFrame([], stream_df.schema))
        return spark.createDataFrame([], empty.schema)
    # `batch=N` subdirs surface as a partition column on read-back —
    # an implementation detail of the idempotent layout, not output
    return spark.read.parquet(out).drop("batch")


def foreachbatch_update_latest(
    stream_df: DataFrame,
    keys: List[str],
    state_base: str,
    feeds=(),
):
    """UPDATE-output-mode sink for streaming aggregations: each
    micro-batch emits only the keys whose aggregate CHANGED, so the
    current value of a key is its latest emission. Each batch appends
    its emissions under an idempotent ``batch=N`` subdir (exactly-once
    from checkpointed offsets + per-batch-id overwrite, the
    foreachbatch_append layout) and the read-back keeps the
    max-batch-id row per key — merge-order independent because batch
    ids are totally ordered.

    ``feeds``: optional callables that make MORE source data available
    (e.g. copy the next arrival-chunk file into the source dir). When
    given, the query runs on the default micro-batch trigger and the
    stream is drained (processAllAvailable) after start and after
    every feed — each drain runs the data batch AND the no-new-data
    batch that COMMITS the advanced watermark, so the watermark
    entering feed k's batch is exactly max(event time through feed
    k-1) - delay, the documented one-batch-lag contract st27's oracle
    simulates. (availableNow + maxFilesPerTrigger does NOT give this:
    without empty commit batches between file batches the effective
    watermark lags one extra batch.)

    Returns ``(final state DataFrame, rows dropped by watermark)`` —
    the engine-reported numRowsDroppedByWatermark total across
    batches, so callers can verify drop accounting against a batch
    prediction (st27's value oracle)."""
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ckpt = state_base + "_ckpt"
    out = state_base + "_out"
    for d in (ckpt, out):
        shutil.rmtree(d, ignore_errors=True)

    def run_batch(batch_df, batch_id: int):
        # REBALANCE the update emission before writing (same
        # small-files rationale as foreachbatch_append's sink, and
        # the same measured trap: coalesce(1) here pulls the whole
        # stateful aggregation into one task). Update-mode emissions
        # are the CHANGED keys only, so a demo batch lands in one
        # file while a 100 TB batch still writes advisory-sized files.
        batch_df.hint("rebalance").write.mode("overwrite").parquet(
            f"{out}/batch={batch_id}"
        )

    writer = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(run_batch)
        .option("checkpointLocation", ckpt)
    )
    if not feeds:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    # recentProgress retains only the last numRecentProgressUpdates
    # entries (default 100): summing it ONCE at the end silently
    # under-counts drops past that many batches. Harvesting after
    # EVERY drain with a seen-batchId set keeps the total exact for
    # any number of feeds (each drain adds at most a data batch plus
    # a no-data commit batch, far under the retention window).
    seen_batches: set = set()
    dropped = 0

    def _harvest() -> None:
        nonlocal dropped
        for p in q.recentProgress or []:
            bid = p["batchId"]
            if bid in seen_batches:
                continue
            seen_batches.add(bid)
            for so in p.get("stateOperators") or []:
                dropped += so["numRowsDroppedByWatermark"]

    q.processAllAvailable()
    _harvest()
    for feed in feeds:
        feed()
        q.processAllAvailable()
        _harvest()
    q.stop()
    import glob as _glob
    import os as _os

    spark = stream_df.sparkSession
    if not _glob.glob(_os.path.join(out, "batch=*")):
        # a source that never yields a batch writes no batch=N subdir;
        # read.parquet over the bare dir would raise. The empty state
        # carries the stream's own (aggregation-output) schema.
        return spark.createDataFrame([], stream_df.schema), dropped
    emitted = spark.read.parquet(out)
    w = W.partitionBy(*keys).orderBy(F.col("batch").desc())
    latest = (
        emitted.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__", "batch")
    )
    return latest, dropped


def foreachbatch_scd2(
    stream_df: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    tiebreak: str,
    state_base: str,
) -> DataFrame:
    """Incrementally maintain an SCD2 (type-2 slowly-changing-dimension)
    history across micro-batches — the streaming CDC-apply twin of the
    batch ts27 build. State is the history table itself (closed rows +
    one current row per key); each batch seeds the change-detection LAG
    with the key's CURRENT attribute, so only genuinely-changed values
    open a new version, the superseded current row closes at the new
    version's effective-from, and version numbers continue from the
    stored maximum. Per batch the work is one window over (key) across
    batch rows + current rows of touched keys — never a re-sort of
    history.

    Ordering contract (the CDC-apply contract): batches must arrive in
    event-time order per key, which the time-range-partitioned staging
    guarantees here and a log-compacted CDC feed (Kafka per-key
    ordering, Debezium) guarantees in production. Out-of-order feeds
    need a reconciliation pass instead — this operator asserts nothing
    and would interleave wrongly, exactly like any CDC applier.

    Returns the final history as a batch DataFrame."""
    import os
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ckpt = state_base + "_ckpt"
    for d in (state_base + "_a", state_base + "_b", ckpt):
        shutil.rmtree(d, ignore_errors=True)
    last_dir: List[str] = []

    def merge_batch(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        prev = state_base + ("_b" if batch_id % 2 else "_a")
        nxt = state_base + ("_a" if batch_id % 2 else "_b")
        evs = batch_df.select(
            F.col(key).alias("k"),
            F.col(attr).alias("a"),
            F.col(ts_col).alias("t"),
            F.col(tiebreak).alias("tb"),
            F.lit(False).alias("is_seed"),
            F.lit(0).cast("bigint").alias("seed_version"),
        )
        if os.path.isdir(prev):
            hist = spark.read.parquet(prev)
            closed = hist.filter(F.col("eff_to").isNotNull())
            cur = hist.filter(F.col("eff_to").isNull())
            seeds = cur.select(
                F.col("k"),
                F.col("a"),
                F.col("eff_from").alias("t"),
                F.col("eff_tb").alias("tb"),
                F.lit(True).alias("is_seed"),
                F.col("version").alias("seed_version"),
            )
            seq = evs.unionByName(seeds)
        else:
            closed = None
            seq = evs
        w = W.partitionBy("k").orderBy("t", "tb")
        changes = (
            seq.withColumn("prev_a", F.lag("a").over(w))
            .filter(F.col("prev_a").isNull() | (F.col("prev_a") != F.col("a")))
            .drop("prev_a")
        )
        wc = W.partitionBy("k").orderBy("t", "tb")
        versioned = changes.select(
            "k",
            "a",
            F.col("t").alias("eff_from"),
            F.col("tb").alias("eff_tb"),
            F.lead("t").over(wc).alias("eff_to"),
            # Under the ordering contract the seed (stored current row)
            # sorts FIRST among a key's change rows, so with
            # rn = ROW_NUMBER over them: the seed gets back its stored
            # version (rn == 1), new rows continue from it, and a key
            # never seen before (no seed) numbers from 1:
            #   version = max_seed_version + rn - has_seed
            (
                F.max("seed_version").over(W.partitionBy("k"))
                + F.row_number().over(wc)
                - F.max(F.col("is_seed").cast("bigint")).over(W.partitionBy("k"))
            ).alias("version"),
        )
        out = versioned
        if closed is not None:
            out = closed.unionByName(versioned)
        out.write.mode("overwrite").parquet(nxt)
        last_dir.append(nxt)

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    if not last_dir:
        raise RuntimeError("foreachbatch_scd2: no micro-batch executed")
    return stream_df.sparkSession.read.parquet(last_dir[-1]).localCheckpoint(
        eager=True
    )


def foreachbatch_first_seen(
    stream_df: DataFrame,
    make_grams,
    id_col: str,
    state_base: str,
) -> DataFrame:
    """Incremental first-occurrence novelty across micro-batches:
    state is the FIRST-SEEN REGISTRY (gram -> smallest id that contains
    it) — the relation an incremental curation pipeline persists so new
    snapshots never re-scan old corpora (d11's argument, applied to
    t24's novelty). The registry is APPEND-ONLY: because batches arrive
    in ascending ``id_col`` (the staged ingest guarantees it), a gram
    already present can never change owner, so each batch anti-joins
    its gram set against the registry and appends ONLY its genuinely
    new grams (one ``gen={batch_id}`` parquet subdir per trigger).
    Per-batch write cost is O(new grams) — total writes across the run
    are linear in distinct grams, where a merge-rewrite registry would
    re-write O(registry) every batch (super-linear total, the r12
    stress finding). Verdicts need no merged-registry re-read either: a
    batch doc's gram is novel iff it is absent from the prior registry
    AND this doc is the batch-minimum id for it.

    ``make_grams(batch_df) -> DataFrame[(id, g)]`` distinct grams/doc.
    Returns the union of all batch verdicts as a batch DataFrame."""
    import os
    import shutil

    from pyspark.sql import functions as F

    ckpt = state_base + "_ckpt"
    out = state_base + "_out"
    reg = state_base + "_reg"
    for d in (reg, ckpt, out):
        shutil.rmtree(d, ignore_errors=True)

    def merge_batch(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        grams = make_grams(batch_df)
        batch_first = grams.groupBy("g").agg(F.min("id").alias("first_id"))
        gens = os.path.isdir(reg) and any(
            e.startswith("gen=") for e in os.listdir(reg)
        )
        if gens:
            # One read-only scan of the registry; only the batch's NEW
            # grams survive (and get appended below).
            new = batch_first.join(
                spark.read.parquet(reg).select("g"), "g", "left_anti"
            )
        else:
            new = batch_first
        new.write.mode("overwrite").parquet(f"{reg}/gen={batch_id}")
        new_back = spark.read.parquet(f"{reg}/gen={batch_id}")
        verdicts = (
            grams.join(new_back, "g", "left")
            .groupBy("id")
            .agg(
                F.count("*").cast("bigint").alias("n_grams"),
                F.sum(F.when(F.col("first_id") == F.col("id"), 1).otherwise(0))
                .cast("bigint")
                .alias("n_novel"),
            )
        )
        verdicts.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.read.parquet(out).drop("batch")


def foreachbatch_markov(
    stream_df: DataFrame,
    entity: str,
    state: str,
    ts_col: str,
    tiebreak: str,
    state_base: str,
) -> DataFrame:
    """Incrementally maintain a first-order Markov transition-count
    table across micro-batches — the streaming twin of the batch ts29
    build. State is (a) the transition-count table itself (src, dst,
    n — |state|^2-bounded, so the per-batch merge rewrite is
    constant-size) and (b) one LAST-EVENT row per entity, which seeds
    each batch's LEAD window so the cross-batch edge (stored last event
    -> first batch event) is counted exactly once: a seed's OUTGOING
    edge was by definition uncounted when it was stored, and its
    incoming edge was counted by the batch that stored it. Per batch
    the window runs over batch rows + seeds of touched entities —
    never a re-sort of history (st14's CDC-apply shape, same
    event-time ordering contract).

    Returns the final transition table (src, dst, n_trans) as a batch
    DataFrame."""
    import os
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ckpt = state_base + "_ckpt"
    for d in (
        state_base + "_ca", state_base + "_cb",
        state_base + "_la", state_base + "_lb", ckpt,
    ):
        shutil.rmtree(d, ignore_errors=True)

    def merge_batch(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        cprev = state_base + ("_cb" if batch_id % 2 else "_ca")
        cnxt = state_base + ("_ca" if batch_id % 2 else "_cb")
        lprev = state_base + ("_lb" if batch_id % 2 else "_la")
        lnxt = state_base + ("_la" if batch_id % 2 else "_lb")
        evs = batch_df.select(
            F.col(entity).alias("k"),
            F.col(state).alias("s"),
            F.col(ts_col).alias("t"),
            F.col(tiebreak).alias("tb"),
        )
        untouched = None
        if os.path.isdir(lprev):
            prev_last = spark.read.parquet(lprev)
            touched = evs.select("k").distinct()
            seq = evs.unionByName(prev_last.join(touched, "k", "left_semi"))
            untouched = prev_last.join(touched, "k", "left_anti")
        else:
            seq = evs
        w = W.partitionBy("k").orderBy("t", "tb")
        edges = (
            seq.withColumn("dst", F.lead("s").over(w))
            .filter(F.col("dst").isNotNull())
            .groupBy(F.col("s").alias("src"), "dst")
            .agg(F.count("*").cast("bigint").alias("n"))
        )
        if os.path.isdir(cprev):
            edges = (
                edges.unionByName(spark.read.parquet(cprev))
                .groupBy("src", "dst")
                .agg(F.sum("n").cast("bigint").alias("n"))
            )
        edges.write.mode("overwrite").parquet(cnxt)
        # one surviving row per touched entity: the (t, tb)-max event;
        # untouched entities carry their stored row forward
        wl = W.partitionBy("k").orderBy(F.col("t").desc(), F.col("tb").desc())
        last = (
            seq.withColumn("__r", F.row_number().over(wl))
            .filter(F.col("__r") == 1)
            .drop("__r")
        )
        if untouched is not None:
            last = last.unionByName(untouched)
        last.write.mode("overwrite").parquet(lnxt)
        last_dir[0] = cnxt

    last_dir = [state_base + "_ca"]
    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return (
        stream_df.sparkSession.read.parquet(last_dir[0])
        .select("src", "dst", F.col("n").alias("n_trans"))
    )


def foreachbatch_funnel(
    stream_df: DataFrame,
    entity: str,
    type_col: str,
    ts_col: str,
    steps: List[str],
    state_base: str,
) -> DataFrame:
    """Incrementally maintain per-entity funnel state — the first
    completion timestamp of each ordered step (step k must happen
    strictly AFTER the entity's first completion of step k-1) — across
    micro-batches: the streaming twin of the batch ts32 build. State is
    ONE row per entity (t1..tn, monotone: each is set at most once and
    never changes). Correctness leans on the event-time-ordered ingest
    contract (st14/st16's staging): every event in batch k+1 is >= every
    event in batch k, so a stored t_{k-1} can never be lowered by a
    later batch, and the first QUALIFYING step-k event is found by the
    batch that carries it — a candidate in an earlier batch would have
    timestamp <= t_{k-1} and fails the strict inequality in both
    engines. Per batch each step is one type-filtered per-entity MIN
    joined to the prior state; the state rewrite is one row per entity
    (st14's compaction shape). Returns the final state as a batch
    DataFrame (columns: entity, t1..tn)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    ckpt = state_base + "_ckpt"
    for d in (state_base + "_a", state_base + "_b", ckpt):
        shutil.rmtree(d, ignore_errors=True)
    tcols = [f"t{i + 1}" for i in range(len(steps))]

    def merge_batch(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        prev = state_base + ("_b" if batch_id % 2 else "_a")
        nxt = state_base + ("_a" if batch_id % 2 else "_b")
        evs = batch_df.select(
            F.col(entity).alias("k"),
            F.col(type_col).alias("s"),
            F.col(ts_col).alias("t"),
        )
        if os.path.isdir(prev):
            st = spark.read.parquet(prev)
        else:
            st = evs.select("k").limit(0)
            for c in tcols:
                st = st.withColumn(c, F.col("k").cast("timestamp"))
        for i, step in enumerate(steps):
            tc = tcols[i]
            cand = evs.filter(F.col("s") == step)
            if i == 0:
                got = cand.groupBy("k").agg(F.min("t").alias("__new"))
                st = st.join(got, "k", "full_outer")
            else:
                # only events strictly after the (possibly batch-new)
                # previous-step timestamp qualify
                got = (
                    cand.join(st.select("k", tcols[i - 1]), "k")
                    .filter(F.col("t") > F.col(tcols[i - 1]))
                    .groupBy("k")
                    .agg(F.min("t").alias("__new"))
                )
                st = st.join(got, "k", "left")
            st = st.withColumn(tc, F.coalesce(F.col(tc), F.col("__new"))).drop(
                "__new"
            )
        st.select("k", *tcols).write.mode("overwrite").parquet(nxt)
        last_dir[0] = nxt

    last_dir = [state_base + "_a"]
    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.read.parquet(last_dir[0]).localCheckpoint(
        eager=True
    )


def foreachbatch_streaks(
    stream_df: DataFrame,
    entity: str,
    ts_col: str,
    state_base: str,
) -> DataFrame:
    """Incrementally maintain each entity's consecutive-active-day
    streak state across micro-batches — the streaming twin of the
    batch ts35 gaps-and-islands build. State is ONE row per entity:
    (last_day, cur_run, best_run). Each batch reduces to its distinct
    (entity, day) pairs, seeds every touched entity's walk with the
    stored last_day (flagged, deduped by MAX so a same-day re-arrival
    never double-counts), numbers the batch-local islands with
    entity-partitioned windows, and credits the island containing the
    seed with the stored run's prior length (cur_run - 1; the seed day
    itself is counted once by the island). The event-time-ordered
    ingest contract (st14/st16's) guarantees batch days never precede
    the stored last_day, so the cross-batch join of two runs is always
    head-of-batch against tail-of-state. Per batch the windows run
    over batch rows + one seed row per touched entity — never a
    re-sort of history.

    Returns the final per-entity state (entity, last_day, cur_run,
    best_run) as a batch DataFrame."""
    import os
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ckpt = state_base + "_ckpt"
    for d in (state_base + "_sa", state_base + "_sb", ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def merge_batch(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        sprev = state_base + ("_sb" if batch_id % 2 else "_sa")
        snxt = state_base + ("_sa" if batch_id % 2 else "_sb")
        days = (
            batch_df.select(
                F.col(entity).alias("k"),
                F.floor(F.unix_micros(F.col(ts_col)).cast("double") / 86400000000.0)
                .cast("bigint")
                .alias("day"),
            )
            .distinct()
            .withColumn("is_seed", F.lit(0))
        )
        untouched = None
        carried = None
        if os.path.isdir(sprev):
            prev = spark.read.parquet(sprev)
            touched = days.select("k").distinct()
            carried = prev.join(touched, "k", "left_semi")
            untouched = prev.join(touched, "k", "left_anti")
            seeds = carried.select(
                "k", F.col("last_day").alias("day"), F.lit(1).alias("is_seed")
            )
            days = days.unionByName(seeds)
        merged = days.groupBy("k", "day").agg(F.max("is_seed").alias("is_seed"))
        w = W.partitionBy("k").orderBy("day")
        isl = merged.withColumn("__prev__", F.lag("day").over(w)).withColumn(
            "__isl__",
            F.sum(
                F.when(
                    F.col("__prev__").isNull() | (F.col("day") - F.col("__prev__") > 1),
                    1,
                ).otherwise(0)
            ).over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        islands = isl.groupBy("k", "__isl__").agg(
            F.count("*").cast("bigint").alias("len"),
            F.max("day").cast("bigint").alias("max_day"),
            F.max("is_seed").alias("has_seed"),
        )
        if carried is not None:
            islands = islands.join(
                carried.select("k", "cur_run", "best_run"), "k", "left"
            )
        else:
            islands = islands.withColumn("cur_run", F.lit(None).cast("bigint")).withColumn(
                "best_run", F.lit(None).cast("bigint")
            )
        eff = islands.withColumn(
            "eff_len",
            F.col("len")
            + F.when(
                (F.col("has_seed") == 1) & F.col("cur_run").isNotNull(),
                F.col("cur_run") - 1,
            ).otherwise(0),
        )
        wl = W.partitionBy("k").orderBy(F.col("__isl__").desc())
        state = (
            eff.withColumn("__r__", F.row_number().over(wl))
            .groupBy("k")
            .agg(
                F.max("max_day").cast("bigint").alias("last_day"),
                F.max(F.when(F.col("__r__") == 1, F.col("eff_len")))
                .cast("bigint")
                .alias("cur_run"),
                F.greatest(
                    F.max("eff_len"), F.coalesce(F.max("best_run"), F.lit(0))
                )
                .cast("bigint")
                .alias("best_run"),
            )
        )
        if untouched is not None:
            state = state.unionByName(
                untouched.select("k", "last_day", "cur_run", "best_run")
            )
        state.write.mode("overwrite").parquet(snxt)
        last_dir[0] = snxt

    last_dir = [state_base + "_sa"]
    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.read.parquet(last_dir[0]).select(
        F.col("k").alias(entity), "last_day", "cur_run", "best_run"
    )
