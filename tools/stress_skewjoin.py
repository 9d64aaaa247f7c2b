"""AQE skew-join on/off measurement — the reproducible source for
PERF.md's q88 row.

Builds a 20x events corpus (clone waves shift event_id by an even
stride, so q88's deterministic hot-key rule `event_id % 2 = 0 ->
user 0` keeps exactly ~50% of ALL rows on one key as volume grows —
the stress_skew power-law regime at q88's own spelling), then times
q88's internal join twice under the same squeezed demo thresholds:
once with spark.sql.adaptive.skewJoin.enabled=true (the hot reduce
partition splits into mapper-chunk ranges) and once =false (ONE task
sorts and joins half the fact). Prints best-of-2 walls and the join
marker actually planned.

Usage: python tools/stress_skewjoin.py [n_copies]   (default 20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"


def build_corpus(spark, n_copies: int) -> str:
    import tempfile

    from pyspark.sql import functions as F

    out = os.path.join(tempfile.gettempdir(), f"ankaflow_skewjoin_{n_copies}x")
    ev_path = os.path.join(out, "events.parquet")
    if not os.path.exists(ev_path):
        os.makedirs(out, exist_ok=True)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            src = os.path.join(BASE, f"{t}.parquet")
            dst = os.path.join(out, f"{t}.parquet")
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(src, dst)
        ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
        n_base = ev.count()
        stride = n_base * 10 + (n_base * 10) % 2  # even: parity preserved
        copies = ev
        for i in range(1, n_copies):
            copies = copies.unionAll(
                ev.withColumn("event_id", F.col("event_id") + i * stride)
            )
        copies.write.mode("overwrite").parquet(ev_path)
    return out


def run_once(spark, sf_dir: str, skew_enabled: bool) -> tuple:
    from ankaflow_spark.operators.relational import (
        _Q88_JOIN_SQL,
        _Q88_PROFILE_SQL,
        _Q88_SKEW_CONF,
        _Q88_SKEWED_SQL,
    )
    from ankaflow_spark.operators.tables import load_tables

    load_tables(spark, sf_dir)
    spark.sql(_Q88_SKEWED_SQL).createOrReplaceTempView("__q88_skewed__")
    import tempfile

    prof = os.path.join(tempfile.gettempdir(), "ankaflow_skewjoin_prof")
    spark.sql(_Q88_PROFILE_SQL).write.mode("overwrite").parquet(prof)
    spark.read.parquet(prof).createOrReplaceTempView("__q88_profile__")
    conf = dict(_Q88_SKEW_CONF)
    conf["spark.sql.adaptive.skewJoin.enabled"] = str(skew_enabled).lower()
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        best, marker = None, "?"
        for _ in range(2):
            df = spark.sql(_Q88_JOIN_SQL)
            t0 = time.time()
            df.collect()
            wall = time.time() - t0
            best = wall if best is None else min(best, wall)
            ex = df._jdf.queryExecution().executedPlan().toString()
            marker = (
                "SortMergeJoin(skew=true)"
                if "SortMergeJoin(skew=true)" in ex
                else "SortMergeJoin(skew=false)"
            )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return best, marker


def main() -> None:
    from ankaflow_spark.session import get_spark

    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("skewjoin-stress")
    corpus = build_corpus(spark, n_copies)
    n = spark.read.parquet(os.path.join(corpus, "events.parquet")).count()
    for enabled in (True, False):
        wall, marker = run_once(spark, corpus, enabled)
        print(
            f"q88-join[skewJoin={'on' if enabled else 'off'}]  "
            f"rows={n}  best-of-2={wall:.2f}s  planned={marker}"
        )


if __name__ == "__main__":
    main()
