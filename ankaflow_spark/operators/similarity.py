"""Similarity search over embedding columns (``array<float>``).

Two paths, as a 100 TB pipeline needs both:

* **Brute-force top-k cosine** (s01) — broadcast the (small) query set,
  one scan over the corpus, per-query top-k via window. Exact baseline.
* **LSH-bucketed ANN** (s02) — random-hyperplane signatures computed
  from *integer-deterministic* pseudo-random planes (exact in both
  engines — no libm drift), candidates restricted to matching buckets.
  At scale the bucket join replaces the corpus×queries product.

Float determinism: per-element products are IEEE doubles (deterministic)
but a SUM over rows is order-dependent, so dot products fold over the
array sequentially (Spark ``aggregate``, DuckDB ``list_reduce`` — both
left-to-right) — bit-identical between Spark and the DuckDB oracle
regardless of partitioning, and cheaper than exploding to rows.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

from .tables import load_tables

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}

TOP_K = 10
N_QUERY_VECS = 5  # vec_id < 5 are the probe vectors
N_PLANES = 8
DIM = 64


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# s01 — brute-force cosine top-k
# ---------------------------------------------------------------------------
# norms: sum of squares in decimal -> double; dot likewise.
# Left-fold summation: DuckDB list_reduce and Spark aggregate(..., 0.0, +)
# both fold left-to-right, so the double accumulation is bit-identical
# (0.0 + x == x exactly, so the differing seeds don't matter).
_DUCK_NORM = """
  SELECT vec_id,
         list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     (a, b) -> a + b) AS norm2
  FROM embeddings
"""

_SPARK_NORM = """
  SELECT vec_id,
         aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   CAST(0 AS DOUBLE), (a, b) -> a + b) AS norm2
  FROM embeddings
"""

_DUCK_DOT = """list_reduce(list_transform(range(1, {dim} + 1),
        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
        (a, b) -> a + b)"""

_SPARK_DOT = """aggregate(zip_with(q.embedding, c.embedding,
        (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        CAST(0 AS DOUBLE), (a, b) -> a + b)"""


@query(
    "s01_cosine_topk",
    oracle=f"""
    WITH norms AS ({_DUCK_NORM}),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {_DUCK_DOT.format(dim=DIM)} AS dot
      FROM embeddings q, embeddings c
      WHERE q.vec_id < {N_QUERY_VECS} AND c.vec_id <> q.vec_id
    ),
    sims AS (
      SELECT query_id, cand_id,
             dot / (sqrt(nq.norm2) * sqrt(nc.norm2)) AS cosine
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = cand_id
    )
    SELECT query_id, cand_id, cosine, rn FROM (
      SELECT query_id, cand_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rn
      FROM sims
    ) WHERE rn <= {TOP_K}
    ORDER BY query_id, rn
    """,
)
def s01(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(f"""
    WITH norms AS ({_SPARK_NORM}),
    dots AS (
      SELECT /*+ BROADCAST(q) */ q.vec_id AS query_id, c.vec_id AS cand_id,
             {_SPARK_DOT} AS dot
      FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERY_VECS}) q
      CROSS JOIN embeddings c
      WHERE c.vec_id <> q.vec_id
    ),
    sims AS (
      SELECT query_id, cand_id,
             dot / (sqrt(nq.norm2) * sqrt(nc.norm2)) AS cosine
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = cand_id
    )
    SELECT query_id, cand_id, cosine, rn FROM (
      SELECT query_id, cand_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rn
      FROM sims
    ) WHERE rn <= {TOP_K}
    ORDER BY query_id, rn
    """)


# ---------------------------------------------------------------------------
# s02 — LSH-bucketed ANN: hyperplane components are small integers from
# ((plane*37 + dim*17) % 13) - 6 — exact integer arithmetic, identical
# in both engines. Bucket = 8 sign bits. Per-bucket exact re-rank.
# ---------------------------------------------------------------------------
_PLANE_EXPR = "((pl * 37 + i * 17) % 13) - 6"


def _bucket_sql(spark_dialect: bool) -> str:
    if spark_dialect:
        fold = (
            f"aggregate(transform(sequence(0, {DIM - 1}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({_PLANE_EXPR})), "
            "CAST(0 AS DOUBLE), (a, b) -> a + b)"
        )
        shift = "shiftleft(CAST(1 AS BIGINT), CAST(pl AS INT))"
        planes = f"SELECT explode(sequence(0, {N_PLANES - 1})) AS pl"
    else:
        fold = (
            f"list_reduce(list_transform(range(0, {DIM}), "
            f"i -> CAST(embedding[i + 1] AS DOUBLE) * ({_PLANE_EXPR})), "
            "(a, b) -> a + b)"
        )
        shift = "CAST(1 AS BIGINT) << CAST(pl AS INT)"
        planes = f"SELECT unnest(range(0, {N_PLANES})) AS pl"
    return f"""
      SELECT vec_id,
        CAST(SUM(CASE WHEN s >= 0 THEN shift ELSE 0 END) AS BIGINT) AS bucket
      FROM (
        SELECT vec_id, pl.pl AS pl, {fold} AS s, {shift} AS shift
        FROM embeddings
        CROSS JOIN ({planes}) pl
      ) y GROUP BY vec_id
    """


@query(
    "s02_lsh_ann",
    oracle=f"""
    WITH buckets AS ({_bucket_sql(False)}),
    norms AS ({_DUCK_NORM}),
    cands AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id
      FROM buckets q JOIN buckets c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERY_VECS}
    ),
    dots AS (
      SELECT query_id, cand_id,
             {_DUCK_DOT.format(dim=DIM)} AS dot
      FROM cands
      JOIN embeddings q ON q.vec_id = query_id
      JOIN embeddings c ON c.vec_id = cand_id
    )
    SELECT query_id, cand_id,
           dot / (sqrt(nq.norm2) * sqrt(nc.norm2)) AS cosine
    FROM dots
    JOIN norms nq ON nq.vec_id = query_id
    JOIN norms nc ON nc.vec_id = cand_id
    ORDER BY query_id, cand_id
    """,
)
def s02(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(f"""
    WITH buckets AS ({_bucket_sql(True)}),
    norms AS ({_SPARK_NORM}),
    cands AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id
      FROM buckets q JOIN buckets c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERY_VECS}
    ),
    dots AS (
      SELECT query_id, cand_id,
             {_SPARK_DOT} AS dot
      FROM cands
      JOIN embeddings q ON q.vec_id = query_id
      JOIN embeddings c ON c.vec_id = cand_id
    )
    SELECT query_id, cand_id,
           dot / (sqrt(nq.norm2) * sqrt(nc.norm2)) AS cosine
    FROM dots
    JOIN norms nq ON nq.vec_id = query_id
    JOIN norms nc ON nc.vec_id = cand_id
    ORDER BY query_id, cand_id
    """)
