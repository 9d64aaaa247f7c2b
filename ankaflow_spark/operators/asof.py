"""As-of (point-in-time) join operator.

Spark has no native as-of join; two strategies per the preference order
in the build plan:

* ``asof_join_window`` — composition of built-in ops: union the two
  streams, one window pass carries the right side's latest value onto
  left rows. One shuffle on the key; fully codegen'd; preferred at
  scale whenever the right side's carried columns are few (ts03 uses
  this shape).
* ``asof_join_pandas`` — grouped ``applyInPandas`` with
  ``pd.merge_asof`` per key group for wide right sides / tolerance
  semantics. Arrow-batched; shuffles both sides once on the key.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join_window(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: List[str],
    value_col: str,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the greatest right ``on`` <= left ``on``
    (strictly earlier rows win ties deterministically via the source tag)
    carrying ``value_col``."""
    lt = left.withColumn("__side__", F.lit(1)).withColumn("__val__", F.lit(None).cast(
        right.schema[value_col].dataType
    ))
    rt = (
        right.withColumn("__side__", F.lit(0))
        .withColumn("__val__", F.col(value_col))
        .select(*[F.col(c) for c in by], F.col(on), F.col("__side__"), F.col("__val__"))
    )
    lt_cols = [c for c in left.columns]
    merged = lt.select(
        *[F.col(c) for c in lt_cols], F.col("__side__"), F.col("__val__")
    ).unionByName(
        rt.select(
            *[
                F.col(c) if c in rt.columns else F.lit(None).alias(c)
                for c in lt_cols + ["__side__", "__val__"]
            ]
        ),
        allowMissingColumns=False,
    )
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side__").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = merged.withColumn(f"{value_col}{suffix}", F.last("__val__", ignorenulls=True).over(w))
    return out.filter(F.col("__side__") == 1).drop("__side__", "__val__")


def asof_join_full(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    eq_keys: List[tuple],
    direction: str = "backward",
    strict: bool = False,
    how: str = "inner",
) -> DataFrame:
    """As-of join carrying ALL right columns — the execution plan behind
    the SQL ``ASOF JOIN`` surface (sqlfront parses the statement, this
    runs it). Window-based: union both sides tagged, one window pass per
    key partition carries the right row (as a struct) onto left rows;
    one shuffle on the equality keys, no range join, no pairwise blowup.

    ``eq_keys``: [(left_col, right_col), ...] equality conditions.
    ``direction``: 'backward' (right.on <= left.on — DuckDB's
    ``l.ts >= r.ts``) or 'forward' (right.on >= left.on).
    ``strict``: exclusive comparison (``>`` / ``<``) — equal timestamps
    do not match.
    ``how``: 'inner' drops unmatched left rows (DuckDB ASOF JOIN);
    'left' keeps them with NULL right columns (ASOF LEFT JOIN).
    """
    lkeys = [lk for lk, _ in eq_keys]
    ren = dict(zip([rk for _, rk in eq_keys], lkeys))
    ren[on_right] = on_left
    # right-internal clash: a right column that is NOT being renamed but
    # already carries one of the rename TARGETS (e.g. right has its own
    # column named on_left while on_right is distinct) would produce
    # duplicate names in rt and a cryptic ambiguous-column analysis
    # error downstream — reject actionably instead.
    targets = set(ren.values())
    internal = sorted(c for c in right.columns if c not in ren and c in targets)
    if internal:
        raise ValueError(
            f"ASOF JOIN: right-side columns {internal} collide with the "
            f"renamed key/timestamp columns ({sorted(targets)}); project "
            "distinct names in a subquery on the right side"
        )
    rsel = [F.col(c).alias(ren.get(c, c)) for c in right.columns]
    if on_right != on_left:
        # the matched right timestamp is frequently projected (DuckDB's
        # c.click_ts); expose it under its right-side name when that
        # name is distinct from the left ordering column
        rsel.append(F.col(on_right).alias(on_right))
    rt = right.select(*rsel)
    carry_cols = [c for c in rt.columns if c not in lkeys and c != on_left]
    clash = set(carry_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"ASOF JOIN: right-side columns {sorted(clash)} collide with the "
            "left side; project distinct names in a subquery on either side"
        )
    # side tag orders equal timestamps: inclusive -> right first (its
    # value is visible to same-ts left rows), strict -> right last.
    r_tag, l_tag = (1, 0) if strict else (0, 1)
    rt = rt.select(
        *[F.col(k) for k in lkeys],
        F.col(on_left),
        F.lit(r_tag).alias("__side__"),
        F.struct(*[F.col(c) for c in carry_cols]).alias("__carry__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in lkeys and c != on_left],
    )
    lt = left.select(
        *left.columns,
        F.lit(l_tag).alias("__side__"),
        F.lit(None).cast(rt.schema["__carry__"].dataType).alias("__carry__"),
    )
    merged = lt.unionByName(rt)
    order = F.col(on_left).asc() if direction == "backward" else F.col(on_left).desc()
    w = (
        W.partitionBy(*lkeys)
        .orderBy(order, F.col("__side__").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = merged.withColumn("__m__", F.last("__carry__", ignorenulls=True).over(w))
    out = out.filter(F.col("__side__") == l_tag)
    if how == "inner":
        out = out.filter(F.col("__m__").isNotNull())
    return out.select(
        *left.columns,
        *[F.col(f"__m__.{c}").alias(c) for c in carry_cols],
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: List[str],
    tolerance: Optional[pd.Timedelta] = None,
    direction: str = "backward",
    carry_on: Optional[str] = None,
    n_buckets: int = 64,
) -> DataFrame:
    """merge_asof over HASH BUCKETS of the key columns (cogrouped
    Pandas path). Cogrouping directly on ``by`` spawns one Python/Arrow
    round-trip per distinct key — at sf0.1 that is thousands of
    few-row pandas calls and interpreter overhead dominates (25.8s for
    ts07). Bucketing on ``hash(by) % n_buckets`` keeps the shuffle
    co-partitioned on the same keys but amortizes the Arrow hop over
    ~|keys|/n_buckets keys per call, with ``pd.merge_asof(by=...)``
    doing the per-key as-of inside the batch — semantically identical
    (merge_asof with ``by`` equals the per-key merge on each group).
    Right columns (except keys) are appended with pandas' merge_asof
    semantics. ``carry_on`` additionally emits the matched right
    ``on`` value under that name — duplicated pandas-side because a
    Spark-side alias of the same attribute is pruned to one column on
    the Arrow cogroup hop."""
    right_cols = [c for c in right.columns if c not in by and c != on]
    out_schema = left.schema
    from pyspark.sql import types as T

    fields = list(out_schema.fields) + [
        T.StructField(f"{c}_asof", right.schema[c].dataType, True) for c in right_cols
    ]
    if carry_on:
        fields.append(T.StructField(carry_on, right.schema[on].dataType, True))
    schema = T.StructType(fields)
    out_cols = [f.name for f in fields]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=out_cols)
        l = l.drop(columns=["__bucket__"]).sort_values(on, kind="mergesort")
        if r.empty or on not in r.columns:
            # a bucket whose keys never appear on the right: every left
            # row is unmatched (merge_asof rejects an empty right frame)
            for c in out_cols:
                if c not in l.columns:
                    l[c] = None
            return l[out_cols]
        r = r.sort_values(on, kind="mergesort")[list(by) + [on] + right_cols].rename(
            columns={c: f"{c}_asof" for c in right_cols}
        )
        if carry_on:
            r[carry_on] = r[on]
        merged = pd.merge_asof(
            l, r, on=on, by=list(by), tolerance=tolerance, direction=direction
        )
        return merged[out_cols]

    bucket = F.pmod(F.hash(*[F.col(k) for k in by]), F.lit(n_buckets))
    return (
        left.withColumn("__bucket__", bucket)
        .groupBy("__bucket__")
        .cogroup(right.withColumn("__bucket__", bucket).groupBy("__bucket__"))
        .applyInPandas(lambda key, l, r: merge(l, r), schema=schema)
    )
