"""Benchmark harness: runs the headline operator queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes its full plan through the noop sink (no driver
collect, no disk write) — the honest distributed-execution cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_local_supplier_volume",
    "q05_window_top_order",
    "q06_versioned_dedup",
    "q09_distinct_counts",
    "q14_rollup",
    "ts01_time_buckets",
    "ts02_sessionization",
    "ts03_asof_last_click",
    "d01_exact_dedup",
    "d02_minhash_lsh_pairs",
    "d03_ngram_jaccard",
    "d04_simhash",
    "s01_cosine_topk",
    "s02_lsh_ann",
    "t01_token_stats",
    "t03_quality_score",
    "t04_winnow_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from ankaflow_spark.operators import collect_all
    from ankaflow_spark.session import get_spark

    spark = get_spark("bench")
    queries, _ = collect_all()

    # warm the JVM + parquet footers once (not counted)
    queries["q07_topk_orders"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings = {}
    for name in HEADLINE:
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
