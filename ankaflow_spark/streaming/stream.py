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

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
        aggs.append(F.sum("value").alias("total_value"))
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
