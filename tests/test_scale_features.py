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


def test_runtime_bloom_filter_injected(engine, sf_dir):
    """Runtime semi-join bloom filters are ON (session default) — with
    thresholds lowered to test scale, a shuffle join of a big fact to a
    selectively-filtered dim injects bloom_filter_agg on the build side
    and a might_contain probe into the fact scan. At 100 TB the
    production thresholds (>= 10 GB probe scan) activate this
    automatically; this test proves the machinery end-to-end."""
    import re

    from pyspark.sql import functions as F

    spark = engine.spark
    saved = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": None,
        "spark.sql.autoBroadcastJoinThreshold": None,
    }
    for k in saved:
        saved[k] = spark.conf.get(k)
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        dim = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = fact.join(dim, fact.l_orderkey == dim.o_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert re.search(r"bloom_filter_agg", plan), "no bloom filter built"
        assert re.search(r"(?i)might_contain", plan), "no bloom probe on the fact side"
        # and the result is unaffected by the filter
        expected = (
            fact.join(dim.hint("broadcast"), fact.l_orderkey == dim.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, expected.collect()))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning(engine, sf_dir, tmp_path):
    """Dynamic partition pruning: a fact table partitioned on the join
    key must be scan-pruned at RUNTIME by the dim side's selective
    filter — the Catalyst feature that turns a 100 TB star-join scan
    into a read of only the partitions the dim filter selects. The
    plan must carry a dynamicpruning subquery in the fact scan's
    partition filters, and the pruned row count must equal the
    unpruned join's."""
    import re

    from pyspark.sql import functions as F

    spark = engine.spark
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    fact_path = str(tmp_path / "orders_by_year")
    orders.write.partitionBy("order_year").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    # dim: per-year aggregate filtered on a NON-join column. (A filter
    # on the join key itself constant-propagates into a STATIC
    # partition filter — also pruned, but no runtime subquery needed;
    # the runtime-only case is a predicate the fact scan cannot know
    # until the dim side evaluates.)
    dim = (
        orders.groupBy(F.col("order_year").alias("dim_year"))
        .agg(F.max("o_totalprice").alias("peak"))
        .filter(F.col("peak") > 495000)
    )
    j = fact.join(dim, fact.order_year == dim.dim_year).groupBy().count()
    plan = j._sc._jvm.PythonSQLUtils.explainString(
        j._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dynamicpruning" in m.group(1), (
        "fact scan is not dynamically pruned:\n" + plan[:2000]
    )
    years = [r["dim_year"] for r in dim.collect()]
    assert 0 < len(years) < orders.select("order_year").distinct().count(), (
        "filter must keep some but not all years for the test to mean anything"
    )
    expected = orders.filter(F.col("order_year").isin(years)).count()
    assert j.collect()[0]["count"] == expected > 0
