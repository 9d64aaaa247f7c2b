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


def stress_survivors_stage(spark, sf_dir: str, n_copies: int) -> None:
    """The r10 verdict's forced-broadcast regression test: run the
    dedup_survivors STAGE OP on the dup-dense corpus, where EVERY doc
    sits in a clone cluster so the cluster-label relation ≈ the corpus
    — exactly the regime where a static F.broadcast(labels) dies at
    100 TB. With the hint removed the join side is chosen from the
    labels' real parquet stats: broadcast while labels fit the
    threshold, sort-merge once they don't (emulated here by squeezing
    autoBroadcastJoinThreshold, the local stand-in for labels
    outgrowing the 8 GB limit). Both configurations must COMPLETE and
    report which join the planner picked."""
    from ankaflow_spark.models.core import Stages
    from ankaflow_spark.plans.flow import Flow
    from ankaflow_spark.session import SparkEngine

    engine = SparkEngine(spark)

    def run_once(tag: str) -> None:
        flow = Flow(
            Stages.loads(f"""
- kind: tap
  name: docs
  connection: {{kind: parquet, locator: {sf_dir}/documents.parquet}}
- kind: operator
  name: pairs
  op: minhash_pairs
  params: {{id_column: doc_id, text_column: text}}
- kind: operator
  name: survivors
  op: dedup_survivors
  input: docs
  params: {{pairs: pairs, id_column: doc_id, score_column: n_chars}}
"""),
            engine=engine,
        )
        t0 = time.time()
        df = flow.run()
        n = df.count()
        wall = time.time() - t0
        executed = df._jdf.queryExecution().executedPlan().toString()
        join = (
            "BroadcastHashJoin"
            if "BroadcastHashJoin" in executed
            else "SortMergeJoin"
            if "SortMergeJoin" in executed
            else "ShuffledHashJoin"
        )
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, "static hint crept back in"
        n_labels = engine.table("pairs").selectExpr(
            "explode(array(doc_a, doc_b)) AS d"
        ).distinct().count()
        n_docs = engine.table("docs").count()
        print(
            f"survivors-stage[{tag}]  {wall:.1f}s  survivors={n}  "
            f"labels={n_labels}/{n_docs} docs ({100.0 * n_labels / n_docs:.0f}% "
            f"dup-covered)  join={join}  corpus={n_copies}x"
        )

    run_once("default-threshold")
    squeeze = "64KB"  # labels no longer fit -> AQE must pick a shuffled join
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", old
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", squeeze)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", squeeze)
    try:
        run_once(f"threshold={squeeze}")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def main() -> None:
    args = sys.argv[1:]
    n_copies = int(args[0]) if args and args[0].isdigit() else 20
    stage_mode = "--stage-survivors" in args
    args = [a for a in args if a != "--stage-survivors"]
    ops = [a for a in args if not a.isdigit()] or DEFAULT_OPS

    from ankaflow_spark.session import get_spark

    spark = get_spark()
    sf_dir = build_corpus(spark, n_copies)
    if stage_mode:
        stress_survivors_stage(spark, sf_dir, n_copies)
        return
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
