"""The shipped example pipelines run end-to-end."""

import os

from ankaflow_spark.models.core import Stages
from ankaflow_spark.plans.flow import Flow


def test_training_data_pipeline(engine, tmp_path):
    flow = Flow(
        Stages.load("/root/repo/examples/training_data_pipeline.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001", "out_dir": str(tmp_path)},
    )
    flow.run()
    out = engine.spark.read.parquet(str(tmp_path / "curated.parquet"))
    n_docs = engine.spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert 0 < out.count() <= n_docs
    assert "n_tokens" in out.columns


def test_incremental_dedup_example(engine, tmp_path):
    out = tmp_path / "latest.parquet"
    flow = Flow(
        Stages.load("/root/repo/examples/incremental_dedup.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001", "out": str(out)},
    )
    flow.run()
    assert os.path.exists(out)
    back = engine.spark.read.parquet(str(out))
    assert set(back.columns) == {"user_id", "n_types", "avg_value"}


def test_operator_pipeline_example(engine):
    flow = Flow(
        Stages.load("/root/repo/examples/operator_pipeline.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001"},
    )
    row = flow.run().first()
    assert row["latest_rows"] > 0
    assert 0 < row["sampled_rows"] < row["latest_rows"]
    assert row["clean_docs"] > 0
    # dedup collapse and remixing only ever shrink the set
    assert 0 < row["surviving_docs"] <= row["clean_docs"]
    assert 0 < row["mixed_docs"] <= row["surviving_docs"]
    # the synthetic corpus carries no PII of its own
    assert row["pii_hits"] == 0
    # curation keeps at most k=25 docs per language
    assert 0 < row["curated_docs"] <= row["mixed_docs"]


def test_timeseries_pipeline_example(engine):
    flow = Flow(
        Stages.load("/root/repo/examples/timeseries_pipeline.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001"},
    )
    row = flow.run().first()
    assert row["n_rolled"] == row["n_raw"] == row["n_ohlc"]
    assert row["n_bad"] == 0


def test_streaming_pipeline_example(engine):
    flow = Flow(
        Stages.load("/root/repo/examples/streaming_pipeline.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001"},
    )
    row = flow.run().first()
    raw = engine.spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert row["n_events"] == raw.count()
    assert row["n_users"] == raw.select("user_id").distinct().count()


def test_behavioral_analytics_example(engine):
    flow = Flow(
        Stages.load("/root/repo/examples/behavioral_analytics.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001"},
    )
    row = flow.run().first()
    assert row["funnel_entrants"] >= row["funnel_completers"] > 0
    assert 0 < row["best_late_retention"] <= 1.0
    assert row["burstiest_hour"] >= 1


def test_dialect_statements_example(engine, tmp_path):
    """ASOF JOIN, UNION ALL BY NAME, and optioned read_csv running as
    plain transform-stage SQL in a YAML pipeline (the paste-parity
    contract: reference core/flow.py:267 accepts any DuckDB SQL)."""
    flow = Flow(
        Stages.load("/root/repo/examples/dialect_statements.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001", "out_dir": str(tmp_path)},
    )
    flow.run()
    att = engine.table("Attributed")
    assert {"user_id", "ts", "purchase_value", "click_ts", "click_value"} <= set(
        att.columns
    )
    # LEFT semantics: purchases exist, some without a prior click
    assert att.count() > 0
    allt = engine.table("AllTouchpoints")
    # BY NAME union: view rows carry NULL click_value
    assert allt.filter("click_value IS NULL").count() > 0
    got = engine.table("Reloaded").collect()[0]
    assert got["n_rows"] == allt.count()


def test_governance_audit_example(engine):
    flow = Flow(
        Stages.load("/root/repo/examples/governance_audit.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001"},
    )
    row = flow.run().collect()[0]
    assert row["failed_expectations"] == 0 and row["quality_ok"]
    # the sf0.001 release has sparse QI classes: both audits must fire
    assert row["k_anonymity_violations"] > 0
    assert row["l_diversity_violations"] > 0


def test_curation_quality_example(engine):
    flow = Flow(
        Stages.load("/root/repo/examples/curation_quality.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001"},
    )
    row = flow.run().collect()[0]
    assert row["n_docs"] == 500
    assert 0 < row["n_after_caps"] <= row["n_docs"]
    assert row["n_after_caps"] + row["n_capped_out"] == row["n_docs"]


def test_product_analytics_example(engine):
    flow = Flow(
        Stages.load("/root/repo/examples/product_analytics.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001"},
    )
    row = flow.run().collect()[0]
    assert row["n_viewers"] >= row["n_purchasers"] >= 0
    assert row["end_to_end_conv"] is None or 0 <= row["end_to_end_conv"] <= 1
    assert row["above_avg_cells"] > 0 and row["peak_seasonality"] > 1.0


def test_corpus_health_example(engine):
    flow = Flow(
        Stages.load("/root/repo/examples/corpus_health.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001"},
    )
    row = flow.run().collect()[0]
    assert row["n_dims"] == 64
    assert 0 <= row["n_collapsed_dims"] <= row["n_dims"]
    # synthetic word-stream docs tokenize ~1 BPE token per word
    assert row["worst_fertility"] >= 1.0
    assert 0 <= row["n_lang_agree"] <= row["n_docs"]
    assert row["ri_ok"] is True


def test_retention_analytics_example(engine):
    flow = Flow(
        Stages.load("/root/repo/examples/retention_analytics.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001"},
    )
    row = flow.run().collect()[0]
    assert row["longest_session_min"] >= 0
    assert row["n_edge_censored"] >= 1  # the corpus edge always censors
    assert 0 < row["min_hazard"] <= 1
    assert row["top_decayed_score"] > 0
    assert row["leaderboard_rows"] == 10
    assert row["longest_comeback_days"] >= 0


def test_stream_health_monitor_example(engine):
    flow = Flow(
        Stages.load("/root/repo/examples/stream_health_monitor.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001"},
    )
    row = flow.run().collect()[0]
    # the frozen 30-day corpus: freshest type is at the edge, so the
    # worst lag is bounded by the corpus span; short TTLs must expire
    assert 0 <= row["worst_lag_min"] < 45 * 24 * 60
    assert row["n_rows_to_purge"] > 0
    assert row["n_partitions_to_purge"] > 0
    assert 0 < row["n_anomalous_hours"] < row["n_hour_cells"]
    assert row["max_p99_lo_cents"] > 0


def test_dedup_ann_curation_example(engine):
    flow = Flow(
        Stages.load("/root/repo/examples/dedup_ann_curation.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001"},
    )
    row = flow.run().collect()[0]
    # survivors <= docs (LSH collapse removes clones), curation gate
    # removes only low-quality survivors
    assert 0 < row["n_survivors"] <= row["n_docs"]
    assert 0 < row["n_curated"] <= row["n_survivors"]
    # SemDeDup keeps a strict subset of the vector corpus; the probe
    # returns top-10 per query vector (5 query vecs), all real cosines
    assert 0 < row["n_index_vectors"] <= row["n_vectors"]
    assert row["n_ann_hits"] == 50
    assert -1.0 <= row["worst_hit_cosine"] <= 1.0


def test_bucketed_layout_example(engine):
    """The layout-amortization pipeline: one bucketed write, two
    shuffle-free consumers — the report must reconcile with the graded
    q83 (join) and q84 (rollup) on the same corpus."""
    flow = Flow(
        Stages.load("/root/repo/examples/bucketed_layout.yaml"),
        engine=engine,
        variables={"data_dir": "/root/testdata/sf0.001"},
    )
    row = flow.run().collect()[0]
    from ankaflow_spark.operators.relational import QUERIES

    q83 = QUERIES["q83_bucketed_colocated_join"](engine.spark, "/root/testdata/sf0.001").collect()
    q84 = QUERIES["q84_bucketed_colocated_agg"](engine.spark, "/root/testdata/sf0.001").collect()
    assert row["n_priorities"] == len(q83)
    assert row["n_lines_joined"] == sum(r["n_lines"] for r in q83)
    assert row["max_priority_revenue"] == max(r["revenue"] for r in q83)
    assert row["n_top_orders"] == len(q84)
    assert row["top_order_revenue"] == q84[0]["revenue"]


def test_partitioned_layout_example(engine):
    """The scan-side layout pipeline: one partition_by sink, two
    pruned consumers — the report must reconcile with graded q85
    (busiest-day slice) and q86 (dow slice) on the same corpus."""
    import tempfile

    flow = Flow(
        Stages.load("/root/repo/examples/partitioned_layout.yaml"),
        engine=engine,
        variables={
            "data_dir": "/root/testdata/sf0.001",
            "out_dir": tempfile.mkdtemp(prefix="pl_test_"),
        },
    )
    row = flow.run().collect()[0]
    from ankaflow_spark.operators.relational import QUERIES

    q85 = QUERIES["q85_partition_pruned_scan"](engine.spark, "/root/testdata/sf0.001").collect()
    q86 = QUERIES["q86_dynamic_partition_pruning"](engine.spark, "/root/testdata/sf0.001").collect()
    assert row["n_types_day"] == len(q85)
    assert row["n_events_day"] == sum(r["n_events"] for r in q85)
    assert row["n_types_dow"] == len(q86)
    assert row["n_events_dow"] == sum(r["n_events"] for r in q86)
    assert row["n_dow_days"] == max(r["n_days"] for r in q86)
