"""Hot-BAND skew stress for the banded-LSH join family (r9 verdict
punch item 4) — the reproducible source for PERF.md's hot-band table.

The dup-dense stress (stress_dupdense.py) grows TOTAL candidate
volume; this harness instead concentrates candidates in FEW BAND
BUCKETS — the boilerplate-corpus failure mode: when a fraction of
documents shares a dominant template (licence headers, scraped
navigation chrome, form letters), their minhash signatures agree on
most bands, so the band self-join sees a handful of buckets holding
O(hot_n) rows each and the candidate set gains O(hot_n^2) pairs routed
through single join keys — a skew shape AQE's skew-split can spread
but whose OUTPUT is irreducibly quadratic unless the operator bounds
verification (d29's cap) or caps degenerate buckets.

Corpus: SAME row count as organic sf0.1 (5000 docs); a ``frac`` share
(default 30%) of docs is rewritten as ``template (90% of tokens) +
per-doc unique tail`` so hot docs collide in most of their 4 bands
while organic docs are untouched. Also prints band-bucket diagnostics
(max bucket size, candidate-pair count) so wall ratios can be read
against the true work growth.

Usage: python tools/stress_hotband.py [frac_percent] [op ...]
Defaults: 30 (percent); the banded-join family
d02 d24 d26 d28 d29 s02 s24.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
DEFAULT_OPS = [
    "d02_minhash_lsh_pairs",
    "d24_lsh_threshold_sweep",
    "d26_bbit_minhash",
    "d28_lexical_semantic_agreement",
    "d29_agreement_bounded",
    "s02_lsh_ann",
    "s24_lsh_plane_sweep",
]

# ~60 words of boilerplate: long enough to dominate a rewritten doc's
# shingle set (deterministic, plain-ASCII so the tokenizers all agree)
TEMPLATE = " ".join(
    f"template boilerplate clause {i} governs the use of this document"
    for i in range(12)
)


def build_corpus(spark, frac: float) -> str:
    import tempfile

    from pyspark.sql import functions as F

    out = os.path.join(
        tempfile.gettempdir(), f"ankaflow_hotband_{int(frac * 100)}pct"
    )
    docs_path = os.path.join(out, "documents.parquet")
    if not os.path.exists(docs_path):
        os.makedirs(out, exist_ok=True)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            link = os.path.join(out, f"{t}.parquet")
            if not os.path.exists(link):
                os.symlink(os.path.join(BASE, f"{t}.parquet"), link)
        docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
        # hot docs: template body + a short unique tail (first 8 words of
        # the original text) — unique enough to stay distinct rows,
        # template-dominated enough to agree on most minhash bands
        hot = F.col("doc_id") % 100 < int(frac * 100)
        rewritten = F.concat(
            F.lit(TEMPLATE + " "),
            F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8)),
            F.lit(" unique tail "),
            F.col("doc_id").cast("string"),
        )
        docs.withColumn(
            "text", F.when(hot, rewritten).otherwise(F.col("text"))
        ).withColumn(
            "n_chars", F.length("text").cast(docs.schema["n_chars"].dataType)
        ).write.mode("overwrite").parquet(docs_path)
    return out


def band_diagnostics(spark, sf_dir: str) -> dict:
    """Max band-bucket size and total candidate pairs — the true work
    the banded self-join must do on this corpus."""
    from ankaflow_spark.operators.dedup import cached_bands

    bands = cached_bands(spark, sf_dir)
    cols = [c for c in bands.columns if c != "doc_id"]
    from pyspark.sql import functions as F

    sizes = bands.groupBy(*cols).agg(F.count("*").alias("n"))
    row = sizes.agg(
        F.max("n").alias("max_bucket"),
        F.sum(F.expr("n * (n - 1) / 2")).cast("bigint").alias("cand_pairs"),
    ).collect()[0]
    return {"max_bucket": row["max_bucket"], "cand_pairs": row["cand_pairs"]}


def time_ops(spark, sf_dir: str, ops, qs) -> dict:
    from ankaflow_spark.operators import clear_shared_caches

    walls = {}
    for name in ops:
        fn = qs[name]
        fn(spark, sf_dir).count()  # warm (plans + JIT + shared builds)
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        walls[name] = (round(time.time() - t0, 2), n)
    clear_shared_caches(spark)
    return walls


def main() -> None:
    args = sys.argv[1:]
    frac = (int(args[0]) if args and args[0].isdigit() else 30) / 100.0
    ops = [a for a in args if not a.isdigit()] or DEFAULT_OPS

    from ankaflow_spark.session import get_spark

    spark = get_spark()
    import __spark_entry__ as entry

    qs = entry.queries()

    hot_dir = build_corpus(spark, frac)
    organic = time_ops(spark, BASE, ops, qs)
    d_org = band_diagnostics(spark, BASE)
    from ankaflow_spark.operators import clear_shared_caches

    clear_shared_caches(spark)
    hot = time_ops(spark, hot_dir, ops, qs)
    d_hot = band_diagnostics(spark, hot_dir)

    print(f"band diagnostics organic: {d_org}  hot({frac:.0%}): {d_hot}")
    for name in ops:
        ow, on = organic[name]
        hw, hn = hot[name]
        ratio = hw / ow if ow else float("inf")
        print(
            f"{name}  organic {ow}s rows={on}  hot {hw}s rows={hn}  "
            f"ratio {ratio:.2f}x"
        )


if __name__ == "__main__":
    main()
