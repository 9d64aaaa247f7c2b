"""q82 -> withWatermark end-to-end (r10 verdict punch item 6): the
late-arrival audit exists to produce THE number a streaming deployment
plugs into withWatermark — this suite closes the loop by feeding q82's
measured p99 lateness into a real Structured Streaming windowed
aggregation over the SAME disordered arrival order and asserting that
the rows the engine drops match the batch prediction EXACTLY.

The sf events arrive perfectly ordered (q82 measures 0 lateness on
them), so the suite builds a deterministically disordered arrival
order first — event_id := rank of md5(original id) — giving a real
lateness distribution that spans many arrival chunks.

Batch model of Spark's watermark semantics (verified here end-to-end):
the global watermark entering micro-batch k is
max(event time seen in batches 0..k-1) - delay (epoch ms, starts at
0), and an input row of batch k is dropped by the stateful aggregation
iff its WINDOW END <= that watermark (window-end, not raw event time:
the watermark attribute of a windowed aggregate is the window struct).
Micro-batch boundaries are made deterministic by writing one arrival
chunk at a time and draining processAllAvailable() between writes —
chunk k IS batch k.
"""

import os
import shutil
import tempfile
from collections import defaultdict

import pytest

WINDOW_US = 3_600 * 1_000_000  # 1 hour tumbling windows
N_CHUNKS = 8


def _disordered(spark, sf_dir):
    from ankaflow_spark.operators.streamq import _md5_disorder_sql

    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).createOrReplaceTempView(
        "wm_events"
    )
    return spark.sql(_md5_disorder_sql("wm_events", "event_id"))


def _calibrate(spark, view: str) -> dict:
    """q82's audit on the disordered arrival order: the measured
    lateness distribution. Returns {p99: max p99 over types (minutes),
    max: max lateness over types (minutes)} — the two watermark
    candidates a deployment weighs."""
    from ankaflow_spark.operators.relational import _late_arrival_sql

    rows = spark.sql(_late_arrival_sql(True, table=view)).collect()
    assert sum(r["n_late"] for r in rows) > 0  # the shuffle disordered arrival
    return {
        "p99": max(r["p99_late_min"] for r in rows),
        "max": max(r["max_late_min"] or 0 for r in rows),
    }


def _predict(chunks, delay_min: int):
    """Batch prediction: replay the chunk sequence through the
    watermark rule and return (dropped_count, surviving per-(window
    start us, type) counts). Rows: (event_type, ts_us, chunk)."""
    delay_ms = delay_min * 60_000
    wm_ms = 0  # Spark's initial watermark
    dropped = 0
    counts = defaultdict(int)
    for k, chunk in enumerate(chunks):
        for etype, ts_us in chunk:
            win_start = (ts_us // WINDOW_US) * WINDOW_US
            win_end_ms = (win_start + WINDOW_US) // 1000
            if win_end_ms <= wm_ms:
                dropped += 1
            else:
                counts[(win_start, etype)] += 1
        wm_ms = max(wm_ms, max(ts // 1000 for _, ts in chunk) - delay_ms)
    return dropped, dict(counts)


def _run_stream(spark, chunks, schema, delay_min: int):
    """One arrival chunk per micro-batch: write chunk k, drain, write
    chunk k+1. Returns (engine-reported dropped rows summed across
    batches, final upserted per-(window start us, type) counts)."""
    import pyspark.sql.functions as F

    src = tempfile.mkdtemp(prefix="wm_e2e_src_")
    ckpt = tempfile.mkdtemp(prefix="wm_e2e_ckpt_")
    state = {}

    def upsert(batch_df, batch_id):
        for r in batch_df.collect():
            key = (r["win_start_us"], r["event_type"])
            state[key] = r["n"]

    try:
        # seed the source dir so the stream can start with batch 0
        chunks[0].write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("ts", f"{delay_min} minutes")
            .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
            .agg(F.count("*").alias("n"))
            .select(
                F.unix_micros(F.col("window.start")).alias("win_start_us"),
                "event_type",
                "n",
            )
        )
        q = (
            stream.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(upsert)
            .start()
        )
        q.processAllAvailable()
        for chunk in chunks[1:]:
            chunk.write.mode("append").parquet(src)
            q.processAllAvailable()
        dropped = sum(
            p["stateOperators"][0]["numRowsDroppedByWatermark"]
            for p in (q.recentProgress or [])
            if p.get("stateOperators")
        )
        q.stop()
        return dropped, state
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@pytest.fixture(scope="module")
def wm_setup(spark, request):
    sf_dir = "/root/testdata/sf0.001"
    dis = _disordered(spark, sf_dir)
    dis.createOrReplaceTempView("wm_disordered")
    cal = _calibrate(spark, "wm_disordered")
    n = dis.count()
    per_chunk = -(-n // N_CHUNKS)
    import pyspark.sql.functions as F

    base = dis.withColumn(
        "chunk", ((F.col("event_id") - 1) / per_chunk).cast("int")
    )
    chunk_dfs = [
        base.filter(F.col("chunk") == k).select("event_type", "ts").coalesce(1)
        for k in range(N_CHUNKS)
    ]
    chunk_rows = [
        [
            (r["event_type"], r["us"])
            for r in base.filter(F.col("chunk") == k)
            .selectExpr("event_type", "unix_micros(ts) AS us", "event_id")
            .orderBy("event_id")
            .collect()
        ]
        for k in range(N_CHUNKS)
    ]
    return cal, chunk_dfs, chunk_rows, chunk_dfs[0].schema


def test_calibrated_p99_watermark_drops_match_batch_prediction(spark, wm_setup):
    """With the watermark set to q82's measured p99 (the calibrated
    deployment value), the engine's numRowsDroppedByWatermark total
    and the surviving per-window counts must equal the batch replay of
    the watermark rule exactly — AND the tight watermark must actually
    drop something, or the e2e proves nothing."""
    cal, chunk_dfs, chunk_rows, schema = wm_setup
    delay = int(cal["p99"])
    predicted_drops, predicted_counts = _predict(chunk_rows, delay)
    assert predicted_drops > 0  # p99 is tighter than max lateness by design
    dropped, counts = _run_stream(spark, chunk_dfs, schema, delay)
    assert dropped == predicted_drops
    assert counts == predicted_counts
    total = sum(len(c) for c in chunk_rows)
    assert sum(counts.values()) == total - dropped


def test_tail_safe_max_watermark_drops_nothing(spark, wm_setup):
    """With the watermark set past q82's measured MAX lateness (the
    tail-risk-averse deployment value), nothing may drop and the
    streamed counts must equal the plain batch aggregation — the other
    half of the calibration contract."""
    cal, chunk_dfs, chunk_rows, schema = wm_setup
    delay = int(cal["max"]) + 1
    predicted_drops, predicted_counts = _predict(chunk_rows, delay)
    assert predicted_drops == 0
    dropped, counts = _run_stream(spark, chunk_dfs, schema, delay)
    assert dropped == 0
    batch = defaultdict(int)
    for chunk in chunk_rows:
        for etype, ts_us in chunk:
            batch[((ts_us // WINDOW_US) * WINDOW_US, etype)] += 1
    assert counts == dict(batch)
