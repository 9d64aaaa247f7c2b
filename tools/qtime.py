"""Isolated per-query timing + plan capture harness for optimization
work (r13). Replays bench.py's exact methodology — same session config
(SPARK_GRAFT_SHUFFLE_PARTITIONS sized from input), sf0.001 warmup pass
per plan shape, shared caches cleared before each timed pass, noop-sink
action, best-of-N — for an arbitrary SUBSET of headline queries, so a
single query can be measured and re-measured in seconds instead of
re-running the full 115-query battery.

Usage:
    python tools/qtime.py [--sf DIR] [--runs N] [--plans OUTDIR] q87 st28 ...

Query names may be unique prefixes (q87 -> q87_layered_fact_layout).
With --plans, each query's .explain("formatted") text is written to
OUTDIR/<name>.txt (the committed plans/r13/ evidence files).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir to write explain(formatted) per query")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from bench import input_bytes

    if "SPARK_GRAFT_SHUFFLE_PARTITIONS" not in os.environ:
        parts = max(8, min(2000, input_bytes(args.sf) // (64 * 1024 * 1024)))
        os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(parts)

    from ankaflow_spark.operators import clear_shared_caches, collect_all
    from ankaflow_spark.session import get_spark

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = collect_all()

    names = []
    for n in args.names:
        hits = [q for q in queries if q == n or q.startswith(n)]
        if len(hits) != 1:
            sys.exit(f"ambiguous or unknown query {n!r}: {hits}")
        names.append(hits[0])

    warm = "/root/testdata/sf0.001"
    warm = warm if os.path.isdir(warm) else args.sf
    if not args.no_warmup:
        for name in names:
            try:
                queries[name](spark, warm).write.format("noop").mode("overwrite").save()
            except Exception as e:
                print(f"warmup {name} failed: {e}", file=sys.stderr)

    from ankaflow_spark.operators.tables import load_tables

    load_tables(spark, args.sf)

    timings: dict = {}
    for p in range(args.runs):
        clear_shared_caches(spark)
        for name in names:
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.time()
            df = queries[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            prev = timings.get(name)
            timings[name] = round(dt if prev is None else min(prev, dt), 3)
            print(f"pass{p + 1} {name}: {round(dt, 3)}s", file=sys.stderr)
            if args.plans and p == args.runs - 1:
                os.makedirs(args.plans, exist_ok=True)
                jvm = spark.sparkContext._jvm
                txt = jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                    fh.write(txt)
            spark.sparkContext.setJobDescription(None)

    print(json.dumps(timings))


if __name__ == "__main__":
    main()
