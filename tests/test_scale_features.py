"""Scale-path features: bucketed co-located joins (no exchange) and
salted aggregation for skewed keys."""

from pyspark.sql import functions as F


def test_bucketed_join_skips_shuffle(engine, sf_dir, tmp_path):
    spark = engine.spark
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    engine.write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    engine.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", n_buckets=8
    )
    # force a sort-merge join (at test scale AQE would broadcast, which
    # also needs no co-location — the interesting case is two LARGE
    # bucketed sides, where SMJ must run shuffle-free)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert plan.count("SortMergeJoin") == 1
        assert plan.count("Exchange hashpartitioning") == 0  # no shuffle at all
        assert plan.count("SelectedBucketsCount") == 2  # both scans bucketed
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_aggregation_matches_plain(engine, sf_dir):
    from ankaflow_spark.operators.registry import get_operator

    spark = engine.spark
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    salted = get_operator("salted_agg")(
        engine, events, {"keys": ["event_type"], "agg": "count", "salt": 8}
    )
    plain = events.groupBy("event_type").agg(F.count("*").alias("n"))
    got = {r["event_type"]: r["n"] for r in salted.collect()}
    want = {r["event_type"]: r["n"] for r in plain.collect()}
    assert got == want


def test_salted_sum(engine, sf_dir):
    from ankaflow_spark.operators.registry import get_operator

    spark = engine.spark
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = get_operator("salted_agg")(
        engine, li, {"keys": ["l_returnflag"], "agg": "sum", "column": "l_quantity", "salt": 16}
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("total")
    )
    got = {r["l_returnflag"]: r["total"] for r in salted.collect()}
    want = {r["l_returnflag"]: r["total"] for r in plain.collect()}
    assert got == want
