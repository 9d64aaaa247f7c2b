"""Skew stress harness — the reproducible source for PERF.md's skew
numbers.

Builds an events table where ONE user owns a configurable share of all
rows (the power-law reality of user data at 100 TB: one bot/test
account dominating a partition) into a temp sf-shaped dir, then times
key-partitioned operators warm. AQE skew-join splitting and the salted
aggregation pattern (q30) are the mitigations under test: wall time
should grow with data volume, not with the skewed key's share.

Usage: python tools/stress_skew.py [skew_share] [op ...]
Defaults: 0.5; ts01 ts02 ts18 ts19 q30.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
DEFAULT_OPS = [
    "ts01_time_buckets",
    "ts02_sessionization",
    "ts18_user_features",
    "ts19_native_session_window",
    "q30_skew_salted_agg",
]


def build_corpus(spark, share: float) -> str:
    import tempfile

    out = os.path.join(tempfile.gettempdir(), f"ankaflow_skew_{int(share * 100)}pct")
    ev_path = os.path.join(out, "events.parquet")
    if not os.path.exists(ev_path):
        os.makedirs(out, exist_ok=True)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            src = os.path.join(BASE, f"{t}.parquet")
            dst = os.path.join(out, f"{t}.parquet")
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(src, dst)
        from pyspark.sql import functions as F

        ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
        # reassign a `share` fraction of rows (hash-deterministic) to
        # user 0 — the canonical hot key
        skewed = ev.withColumn(
            "user_id",
            F.when(
                F.abs(F.hash("event_id")) % 100 < int(share * 100), F.lit(0).cast("long")
            ).otherwise(F.col("user_id")),
        )
        skewed.write.mode("overwrite").parquet(ev_path)
    return out


def main() -> None:
    import __spark_entry__ as entry
    from ankaflow_spark.session import get_spark

    share = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    ops = sys.argv[2:] or DEFAULT_OPS
    spark = get_spark("skew-stress")
    corpus = build_corpus(spark, share)
    qs = entry.queries()
    for name in ops:
        fn = qs[name]
        fn(spark, corpus).count()  # warm (JIT/codegen + table registration)
        t0 = time.time()
        n = fn(spark, corpus).count()
        base_t0 = time.time()
        print(f"{name}  skew={time.time() - t0:.2f}s", end="  ")
        fn(spark, BASE).count()
        print(f"organic={time.time() - base_t0:.2f}s  rows={n}  hot_share={share}")


if __name__ == "__main__":
    main()
