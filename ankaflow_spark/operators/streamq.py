"""Streaming operator exposed through the graded query surface.

``st01_stream_window`` drives a real Structured Streaming query
(watermark + tumbling window over the events table, availableNow
trigger) to completion and returns the result as a DataFrame. It has no
``oracle_sql`` entry — streaming execution is not SQL-expressible in
DuckDB — so the driver records the weaker rows-only check, as the
contract allows. Its batch twin ts01 *is* oracle-checked; the streaming
row counts reconcile against it in tests/test_streaming.py.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_tables

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def st01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream import run_stream_to_memory, stream_tap, windowed_agg

    t = load_tables(spark, sf_dir)
    events = t["events"]
    # stage a µs-normalized copy for the streaming file source (the
    # raw file's ns timestamps need the batch loader's conversion)
    staged = os.path.join(
        tempfile.gettempdir(), f"ankaflow_stream_{abs(hash(sf_dir)) % 10**8}"
    )
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        events.write.mode("overwrite").parquet(staged)
    schema = spark.read.parquet(staged).schema
    stream = stream_tap(spark, staged, schema)
    agg = windowed_agg(stream, "ts", window_len="5 minutes", group_cols=["event_type"])
    name = "st01_out"
    run_stream_to_memory(agg, name, output_mode="complete")
    return (
        spark.table(name)
        .select("window_start", "window_end", "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


QUERIES["st01_stream_window"] = st01


def m01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction over deterministic synthetic media
    (binary payloads -> sha256 + fixed-width features via mapInPandas).
    Rows-only check: binary/mapInPandas plumbing is not SQL-expressible
    in the oracle; determinism is asserted in tests/test_operators.py."""
    from .multimodal import extract_features, synth_media

    media = synth_media(spark, 120)
    feats = extract_features(media)
    # serialize the float-array feature for the graded projection (the
    # harness canonicalizes via pandas, which can't hash lists); fixed
    # 6-decimal formatting keeps the string deterministic.
    feat_str = F.concat_ws(
        ",", F.transform("feature", lambda x: F.format_number(x.cast("double"), 6))
    )
    return feats.select(
        "media_id", "kind", "n_bytes", "sha256", feat_str.alias("feature_csv")
    ).orderBy("media_id")


QUERIES["m01_multimodal_features"] = m01
