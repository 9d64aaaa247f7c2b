"""Scale-ladder evidence for the heaviest battery queries (r12 verdict
punch item 7): run each of the 10 most expensive BENCH_DETAIL queries
at sf0.1 and at 10x volume and report the wall ratio.

Each query scales along ITS OWN input table's growth axis (the
stress_volume clone machinery: shifted primary keys, entity keys
stay; embeddings clones are circular-shift perturbed so they are new
points, not exact duplicates — the organic-growth regime, not the
dup-dense worst case):

  events 10x     -> st27 (watermark replay), q87 (layered layout)
  documents 10x  -> st28 (streaming band probe), d19 (substring dedup)
  lineitem 10x   -> q83/q84 (bucketed layout + consumers), q89 (lookup)
  embeddings 10x -> s20 (IVF probe sweep), s23 (hubness), s25 (stale
                    index recall)

Protocol per (query, scale): 2 runs, per-query min (bench.py's
convention — for the staged-replay streams this makes the measured
wall the warm-staging call at BOTH scales, comparing like with like),
full plan executed through the noop sink. Shared caches cleared
between scales, NOT between the 2 runs (same as bench passes).

A scale-safe plan reads ~linear (ratio <= ~10x + fixed overhead
amortization, often well under 10x when per-run layout/fixed costs
dominate); a hidden single-partition stage or quadratic candidate set
reads super-linear.

Usage: python tools/scale_ladder.py [n_copies]   (default 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

LADDER = [
    # (query, table-axis, perturb)
    ("st27_stream_watermark_drops", "events", False),
    ("q87_layered_fact_layout", "events", False),
    ("st28_stream_band_probe", "documents", False),
    ("d19_substring_dedup", "documents", False),
    ("q83_bucketed_colocated_join", "lineitem", False),
    ("q84_bucketed_colocated_agg", "lineitem", False),
    ("q89_bucket_pruned_lookup", "lineitem", False),
    ("s20_ivf_probe_sweep", "embeddings", True),
    ("s23_hubness_audit", "embeddings", True),
    ("s25_stale_index_recall", "embeddings", True),
    # r14 additions: the queries this round restructured, each on its
    # own axis (m12/m13/m14 have no axis — their sources are fixed-size
    # synthetic generators)
    ("q60_column_profile", "orders", False),
    ("st29_rocksdb_survival", "events", False),
    ("d27_transitivity_audit", "documents", False),
    ("d10_semantic_dedup", "embeddings", True),
]


def main_filter(names):
    return [(q, t, p) for q, t, p in LADDER if not names or any(q.startswith(n) for n in names)]


def time_query(spark, queries, name: str, sf_dir: str, runs: int = 2) -> float:
    best = None
    for _ in range(runs):
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:]  # optional query-name prefixes to run a subset

    from ankaflow_spark.operators import clear_shared_caches, collect_all
    from ankaflow_spark.session import get_spark
    from tools.stress_volume import build_corpus

    spark = get_spark("scale_ladder")
    queries, _ = collect_all()

    # group by axis so each 10x corpus is built once and each axis's
    # queries run together (cache clear between scales per axis)
    axes = {}
    for q, table, perturb in main_filter(names):
        axes.setdefault((table, perturb), []).append(q)

    rows = []
    for (table, perturb), qs in axes.items():
        big_dir = build_corpus(spark, n_copies, table, perturb=perturb)
        for scale, sf_dir in (("1x", BASE), (f"{n_copies}x", big_dir)):
            clear_shared_caches(spark)
            for q in qs:
                wall = time_query(spark, queries, q, sf_dir)
                rows.append((q, table, scale, wall))
                print(f"{q} [{table} {scale}]: {wall:.2f}s", flush=True)

    print("\n| query | axis | 1x | 10x | ratio |")
    print("|---|---|---|---|---|")
    by_q = {}
    for q, table, scale, wall in rows:
        by_q.setdefault(q, {})[scale] = (table, wall)
    for q, d in by_q.items():
        t, w1 = d["1x"]
        _, wN = d[f"{n_copies}x"]
        print(f"| {q} | {t} {n_copies}x | {w1:.2f}s | {wN:.2f}s | {wN / w1:.2f}x |")


if __name__ == "__main__":
    main()
