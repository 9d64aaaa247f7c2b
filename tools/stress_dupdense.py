"""Duplicate-dense stress harness — the reproducible source for
PERF.md's stress numbers.

Builds the adversarial corpus for near-dup pipelines (N shifted copies
of the sf documents table: every doc has N-1 clones, so the candidate
pair graph is ~N^2/2 denser than organic) into a temp dir shaped like a
testdata sf dir (symlinking the untouched tables), then times selected
operators warm.

Usage: python tools/stress_dupdense.py [n_copies] [op ...]
Defaults: 20 copies; d02_minhash_lsh_pairs d06_dedup_clusters
t12_normalized_dedup t15_tfidf_topterms d12_lsh_recall_eval.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
DEFAULT_OPS = [
    "d02_minhash_lsh_pairs",
    "d06_dedup_clusters",
    "t12_normalized_dedup",
    "t15_tfidf_topterms",
    "d12_lsh_recall_eval",
]


def build_corpus(spark, n_copies: int) -> str:
    import tempfile

    out = os.path.join(tempfile.gettempdir(), f"ankaflow_dupdense_{n_copies}x")
    docs_path = os.path.join(out, "documents.parquet")
    if not os.path.exists(docs_path):
        os.makedirs(out, exist_ok=True)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            link = os.path.join(out, f"{t}.parquet")
            if not os.path.exists(link):
                os.symlink(os.path.join(BASE, f"{t}.parquet"), link)
        docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
        n_base = docs.count()
        from pyspark.sql import functions as F

        copies = docs
        for i in range(1, n_copies):
            # shift ids so clones are distinct rows of identical text
            copies = copies.unionAll(
                docs.withColumn("doc_id", F.col("doc_id") + i * n_base * 10)
            )
        copies.write.mode("overwrite").parquet(docs_path)
    return out


def main() -> None:
    args = sys.argv[1:]
    n_copies = int(args[0]) if args and args[0].isdigit() else 20
    ops = [a for a in args if not a.isdigit()] or DEFAULT_OPS

    from ankaflow_spark.session import get_spark

    spark = get_spark()
    sf_dir = build_corpus(spark, n_copies)
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in ops:
        fn = qs[name]
        fn(spark, sf_dir).count()  # warm (plans + JIT)
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        print(f"{name}  {time.time() - t0:.1f}s  rows={n}  corpus={n_copies}x")


if __name__ == "__main__":
    main()
