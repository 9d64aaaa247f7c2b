"""Plan-shape regression gate: the scale-critical physical-plan
properties the 100 TB story depends on, asserted over every graded
batch query so they cannot silently regress.

Plans are compiled (never executed) at sf0.01 — this tests what
Catalyst chooses, not wall time. Node counts come from the formatted
explain's numbered node list, one entry per physical node.
"""

import re

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.01"

# BroadcastNestedLoopJoin is legitimate only where one side is a tiny
# constant-size relation by design (query sets, hyperplane tables,
# bracketing bounds) — documented in PERF.md per query.
BNLJ_ALLOWED = {
    "d05_embedding_neardup",  # hyperplane table (8 rows) x embeddings
    "d09_simhash_neardup",  # block-id table (4 rows) x signatures
    "s01_cosine_topk",  # exact baseline: 5-query broadcast cross join
    "s05_knn_label",  # exact kNN eval: broadcast test-slice cross join (ANN paths replace it at scale)
    "s02_lsh_ann",  # hyperplane table x query/corpus buckets
    "s29_ann_bucket_balance",  # 8-row plane spine x corpus signature fold (s02's class)
    "s03_ivf_ann",  # queries x centroids (5 x 16) + probe products
    "ts06_interpolate",  # bracketing-bounds join over a 30-row spine
    "d12_lsh_recall_eval",  # three 1-row count relations merged into the metrics row
    "t15_tfidf_topterms",  # 1-row corpus-size scalar broadcast into the idf term
    "t16_domain_mixture",  # 1-row total-tokens / normalizer scalars broadcast
    "s07_random_projection",  # 16x64 constant sign-matrix cross join
    "d15_graph_centrality",  # 1-row node-count scalar cross-joined into every iteration
    "s10_pq_recall_eval",  # 3-query ADC/truth scalar relations (d12's metrics-row class)
    "ts20_trajectory_similarity",  # 3-user query cohort broadcast against the journey table (s01's class)
    "q49_important_value_share",  # 1-row cohort-total scalar broadcast into the share filter
    "q60_column_profile",  # 1-row per-column profile aggregates stitched by broadcast cross join (r14: replaces the 5x Expand multi-distinct — each side is exactly one row)
    "q51_untapped_segments",  # 1-row avg-balance scalar broadcast into the customer filter
    "q52_heavy_hitters",  # 1-row miss-bound scalar broadcast into the verdict projection
    "s12_hard_negatives",  # 5-query broadcast cross join (s01's class, label-pruned)
    "ts22_rfm_segmentation",  # 1-row scalars only: max-ts anchor, min/max stats, quintile-boundary rows (no corpus-sized window — see _rfm_sql)
    "s14_retrieval_mrr",  # 5-query broadcast cross join (s01's class)
    "q59_skew_diagnostics",  # 1-row total/n_keys scalar broadcast into the share projection
    "t23_woe_binning",  # 1-row class-total scalar broadcast into the WOE projection
    "s16_matryoshka_recall",  # 4-row length table inequality-joined to the broadcast query slice
    "s13_ivf_recall_eval",  # checkpoint fragments ARE s01/s03's plans (exact + IVF sides materialized for the recall join) — justified by their own entries
    "d10_semantic_dedup",  # two-level IVF super-centroid draw: 1-row (k1, kk) scalar CROSS JOINed into the constant-size centroid-id filter
    "d17_dedup_cascade",  # same fragments via its d10 stage input
    "s15_countmin_heavy_hitters",  # 10-row candidate list x 4-row hash-row table (sketch probe)
    "s18_mmr_diverse_topk",  # greedy picks over the <=30-row shortlist: inequality joins among <=5-row selection sets
    "q63_zorder_layout",  # 1-row max-orderkey scalar broadcast into the natural-layout file id
    "t25_bpe_merge_training",  # 1-row best-pair argmax relations (b1/b2) cross-joined into the vocab spellings — q62's scalar class
    "t26_pmi_collocations",  # 1-row corpus-total scalar (tot) cross-joined into the PMI projection — t15's idf class
    "q72_t_closeness",  # 1-row grand-total scalar + 5-row sensitive-marginal table cross-joined into the bounded QI-class relation — t26's scalar class
    "d24_lsh_threshold_sweep",  # 8-row threshold spine + 1-row candidate-total scalar cross-joined into the bounded verified-pair table
    "q73_psi_drift",  # 1-row snapshot-total scalar cross-joined into the |bins|-bounded smoothed relation — t15's idf class
    "ts34_repeat_purchase_gaps",  # 1-row gap-total scalar cross-joined into the |distinct gaps|-bounded share projection — q59's scalar class
    "ts35_activity_streaks",  # 1-row user-total scalar cross-joined into the |streak lengths|-bounded histogram — q59's scalar class
    "s20_ivf_probe_sweep",  # 4-row probe spine inequality-joined (crank <= probe) to the 40-row query x centroid rank table — d24's sweep-spine class
    "st19_stream_streaks",  # 1-row user-total scalar cross-joined into the |streak lengths|-bounded histogram tail — ts35's scalar class over the maintained state
    "s21_sq_bits_sweep",  # 4-row bit-width spine cross-joined into the corpus scan (one pass, 4x per-row array math) — d24's sweep-spine class
    "q81_retention_ttl_audit",  # 1-row corpus-edge scalar cross-joined into the TTL comparison — q59/q78's scalar class
    "t35_boilerplate_shingles",  # 1-row corpus-total scalar cross-joined into the 20-row top-shingle relation — q59's scalar class
    "d31_cluster_size_audit",  # 1-row corpus-total + labeled-total scalars cross-joined into the |distinct sizes|-bounded histogram — q59's scalar class
    "s22_ivf_cell_balance",  # 1-row corpus-total scalar cross-joined into the K-bounded cell relation — q59's scalar class
    "d25_dedup_bias_audit",  # 1-row before/after-totals scalar cross-joined into the |sources|-bounded drift relation — q73's class
    "ts37_survival_curve",  # 1-row corpus-edge + totals scalars cross-joined into the |distinct durations|-bounded actuarial walk — q59's scalar class
    "ts38_decayed_leaderboard",  # 1-row week-span scalar cross-joined into the weekly-count relation — q59's scalar class
    "s23_hubness_audit",  # hyperplane table x corpus buckets (s02's class) + 1-row vec-total scalar into the degree histogram
    "t31_source_overlap",  # sizes x sizes pair assembly: both sides are the 20-row |sources| relation by design (broadcast-hinted)
    "t32_temperature_mix",  # 1-row sqrt-normalizer scalar cross-joined into the |sources|-bounded mix relation — q59's scalar class
    "s24_lsh_plane_sweep",  # 4-row plane spine + 10-row hyperplane table + 5-query truth broadcast + 1-row corpus-total scalar (s02/d24's sweep-spine classes)
    "q77_partition_planner",  # 1-row table-total scalar cross-joined into the |months|-bounded partition relation — q59's scalar class
    "d27_transitivity_audit",  # 1-row wedge-total scalar cross-joined into the |classes|-bounded report — q59's scalar class
    "ts42_stickiness",  # 7-row trailing-window offset spine cross-joined into the distinct (user, day) relation — s21's sweep-spine class
    "q78_ingest_freshness",  # 1-row corpus-edge scalar cross-joined into the |event types|-bounded report — q59's scalar class
    "t34_length_ks_drift",  # |sources| x |distinct lengths| evaluation spine + 1-row corpus-total scalar — d24's spine + q59's scalar classes
    "s26_calinski_harabasz",  # 64-row dim spine (s07's constant-matrix class) + 1-row totals scalar into the k-bounded report — q59's class
    "s27_clustering_stability",  # 64-row dim spine (s07's class) + 1-row ARI scalar cross-joined into the k x k contingency — q59's class
    "q79_erasure_cascade",  # 1-row blast-total scalar cross-joined into the |nations|-bounded report — q59's scalar class
    "ts43_session_cooccurrence",  # 1-row session-total scalar cross-joined into the |type pairs|-bounded report — q59's scalar class
    "q80_join_fanout_audit",  # 1-row parent-count scalar subquery folded into each relationship's single-row fan-out summary — q59's scalar class
    "s25_stale_index_recall",  # 10-row literal probe table broadcast against the corpus for the exact-truth arm (s01's class) + K-bounded centroid products
    "d29_agreement_bounded",  # 1-row candidate-count scalar cross-joined into the sample-rate predicate — q59's scalar class (the rate calibrator)
    "ts45_daily_acf",  # 7-row lag spine cross-joined into the checkpointed daily lattice — s21/d24's sweep-spine class
}

# SortMergeJoin is acceptable only where both sides are genuinely
# large at scale; today's graded plans broadcast every small side.
SMJ_ALLOWED = {
    "s03_ivf_ann",  # cell-candidates x embeddings re-rank join
    "d12_lsh_recall_eval",  # exact ground-truth shingle self-join: both sides ARE the corpus by design (d03x's documented cost profile)
    "q38_waiting_suppliers",  # late-lineitems semi/anti-joined to lineitem: fact x fact on l_orderkey, SMJ is the right call at scale
    "d15_graph_centrality",  # PageRank iterations: edges x labels, both ARE the graph — SMJ correct at scale
    "d22_triangle_count",  # edge-iterator triangle join: every side IS the candidate edge list — SMJ correct at scale (stats-less checkpointed __cands__)
    "q71_snapshot_diff",  # FULL OUTER on the snapshot key: both sides are table versions; SMJ is Spark's only full-outer strategy and the right one
    "d25_dedup_bias_audit",  # survivor-selection join (keys x surv on keep=doc_id): both sides ARE the corpus — d17's class, SMJ correct at scale
    "s20_ivf_probe_sweep",  # probe-arm candidates x embeddings re-rank join: the candidate side is probe-multiplied corpus cells (stats-less checkpointed assign) — s03's re-rank class, correct at scale
    "s10_pq_recall_eval",  # exact-truth side: corpus x corpus quantized-L2 (d12's documented cost profile)
    "d17_dedup_cascade",  # per-doc verdict relations joined on doc_id: both sides ARE the corpus — SMJ correct at scale
    "ts14_funnel",  # survivor-set joins on user_id: every side is |users|-sized at scale (stats-less checkpointed survivor sets) — SMJ correct; AQE downgrades when a funnel step collapses
    "d21_bloom_decontam",  # doc-spine LEFT JOIN per-doc exact counts: both sides ARE the corpus (stats-less checkpoint) — d17's class
    "t31_source_overlap",  # per-source shingle-set self-join on the shingle key: both sides ARE the corpus shingle relation (stats-less checkpoint) — d12's class
    # CC iteration fragments (labels x edges / pointer-jump label self-joins):
    # per-round relations are |V|-sized at scale and the RAM stats-reset
    # checkpoint deliberately carries no size estimate — SMJ planned, AQE
    # downgrades to broadcast at runtime where a side is small
    "d06_dedup_clusters",
    "d08_dedup_survivors",
    "d10_semantic_dedup",
    "t20_leakage_safe_split",
    "d23_dedup_impact_report",  # consumes d06's cluster build — same CC iteration fragments
    "d31_cluster_size_audit",  # consumes d06's cluster build — same CC iteration fragments
    "d18_minhash_accuracy",  # candidates x per-doc signature/shingle tables: both sides corpus-sized (d12's class)
    "s13_ivf_recall_eval",  # checkpoint fragment is s03's own plan (cell-candidates x embeddings re-rank join)
    "q66_excess_suppliers",  # per-(supp,part) volumes x per-part averages: both are partsupp-scale derived aggregates (Q20's availability relation class) — SMJ correct at scale, AQE downgrades where small
    "d26_bbit_minhash",  # candidates x per-doc signature/shingle tables: both sides corpus-sized — d18's documented class
    "s23_hubness_audit",  # bucket-candidate edges x embeddings/norms re-rank joins: both sides ARE the corpus — s03's re-rank class
    "t31_source_overlap",  # (source, shingle) distinct-set self-join on the shingle key: both sides ARE the corpus — d07/d12's gram-join class
    "ts39_linear_attribution",  # purchases x clicks on the user key: both sides are type-pruned facts — q38's fact-x-fact class, AQE broadcasts where small
    "s24_lsh_plane_sweep",  # masked-signature self-join on (p, bucket): both sides ARE the corpus x spine — s03's re-rank class
    "d27_transitivity_audit",  # verified-edge wedge join + candidate/shingle equi-joins: every side IS the candidate graph/corpus — d18/d22's classes
    "s25_stale_index_recall",  # stale-cell candidates x embeddings/norms re-rank joins: both sides ARE the corpus — s03's re-rank class
    "s26_calinski_harabasz",  # dims x centroid scoring join on the dim key: the dims side IS the corpus x 64 lattice (stats-less derived relation) — s03's re-rank class, AQE broadcasts the k x 64 centroid side at runtime
    "s27_clustering_stability",  # two Lloyd runs of s26's dims x centroid scoring join — same class
    "d28_lexical_semantic_agreement",  # candidates x shingles / x embeddings verify joins: both sides ARE the corpus — d18/s03's classes
    "q79_erasure_cascade",  # cascade orders x lineitem on l_orderkey: fact x fact — q38's SMJ class, AQE broadcasts where small
    "ts43_session_cooccurrence",  # basket self-join on the session key: both sides ARE the distinct (session, type) corpus relation — d12's class, |types|^2-bounded per session
    "q83_bucketed_colocated_join",  # the POINT of the query: bucketed-bucketed SMJ with zero exchange on the join key (fact x fact at scale, merge-hinted; gated below)
    "d33_bucketed_band_probe",  # the POINT of the query: batch bands SMJ the bucketed corpus index with zero Exchange on the corpus side (merge-hinted for determinism; gated below — a no-hint deployment lets AQE broadcast the batch instead)
    "d34_band_index_merge",  # d33's probe shape over the APPEND-MERGED index — same justification, same gate
    "q88_aqe_skew_join",  # the POINT of the query: SortMergeJoin(skew=true) over the hot-key fact — since the collect-and-rebuild removal the RETURNED plan is the real join plan (gated by test_q88_skew_join_split below)
    "q91_runtime_bloom_join",  # the POINT of the query: SMJ over the Bloom-pruned fact scan — runtime bloomFilter only injects into shuffle joins (gated by test_q91_runtime_bloom_filter below)
}


def _explain(jvm, df):
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _collect_plans(spark, keep):
    """name -> (node names, plan text) for every queries() entry whose
    name satisfies ``keep`` — INCLUDING every pre-localCheckpoint
    fragment (``name::ckpt{i}``). The capturing wrapper passes through
    *args/**kwargs so any localCheckpoint signature (eager,
    storageLevel, positional) still delegates instead of raising."""
    from pyspark.sql.classic.dataframe import DataFrame

    jvm = spark.sparkContext._jvm
    out = {}
    orig = DataFrame.localCheckpoint
    fragments = []

    def capturing(self, *args, **kwargs):
        fragments.append(_explain(jvm, self))
        return orig(self, *args, **kwargs)

    DataFrame.localCheckpoint = capturing
    try:
        for name, fn in entry.queries().items():
            if not keep(name):
                continue
            fragments.clear()
            plan = _explain(jvm, fn(spark, SF))
            for i, frag in enumerate(list(fragments)):
                out[f"{name}::ckpt{i}"] = (
                    re.findall(r"\(\d+\) ([A-Za-z]+)", frag),
                    frag,
                )
            out[name] = (re.findall(r"\(\d+\) ([A-Za-z]+)", plan), plan)
    finally:
        DataFrame.localCheckpoint = orig
    return out


@pytest.fixture(scope="module")
def plans(spark):
    """name -> list of physical node names, for every batch query —
    INCLUDING every pre-localCheckpoint fragment. localCheckpoint
    truncates lineage, so the final plan hides everything upstream of
    the checkpoint (exactly how the r5 d10 seed-selection
    single-partition window escaped this gate); the capturing wrapper
    records each checkpoint input's physical plan as ``name::ckpt{i}``
    before delegating to the real checkpoint. NOTE _collect_plans
    patches the CLASSIC DataFrame (what spark.sql returns on PySpark
    4): its own localCheckpoint shadows the pyspark.sql.DataFrame base,
    so patching only the base silently captures nothing."""
    # st*/m* are covered by the executed_plans fixture below
    return _collect_plans(
        spark, lambda name: not (name.startswith("st") or name.startswith("m"))
    )


def _base(name: str) -> str:
    """Allowlists are keyed by query name; a checkpoint fragment
    inherits its parent query's justification."""
    return name.split("::", 1)[0]


def test_checkpoint_fragments_are_captured(plans):
    """The capturing wrapper must actually see pre-checkpoint plans —
    d10 materializes its IVF cell assignment via localCheckpoint, which
    is exactly where the r5 seed-selection scale-killer hid."""
    assert any(n.startswith("d10_semantic_dedup::ckpt") for n in plans)


def test_no_cartesian_products(plans):
    offenders = [n for n, (nodes, _) in plans.items() if "CartesianProduct" in nodes]
    assert offenders == []


def test_nested_loop_joins_only_where_tiny_by_design(plans):
    offenders = [
        n
        for n, (nodes, _) in plans.items()
        if "BroadcastNestedLoopJoin" in nodes and _base(n) not in BNLJ_ALLOWED
    ]
    assert offenders == []


def test_sort_merge_joins_only_where_both_sides_large(plans):
    offenders = [
        n
        for n, (nodes, _) in plans.items()
        if "SortMergeJoin" in nodes and _base(n) not in SMJ_ALLOWED
    ]
    assert offenders == []


def test_q02_filter_pushdown_reaches_scan(plans):
    _, plan = plans["q02_filter_project"]
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan).group(1)
    assert "EqualTo(o_orderstatus,F)" in pushed
    assert "GreaterThan(o_totalprice,200000.0)" in pushed
    # column pruning: unreferenced wide columns never leave the reader
    read = re.search(r"ReadSchema: (.*)", plan).group(1)
    assert "o_comment" not in read and "o_clerk" not in read


def test_q01_single_aggregation_shuffle(plans):
    nodes, _ = plans["q01_pricing_summary"]
    # partial agg -> one hash shuffle (+ at most a final sort exchange)
    assert nodes.count("Exchange") <= 2
    assert "HashAggregate" in nodes


def test_q04_star_joins_all_broadcast(plans):
    nodes, _ = plans["q04_local_supplier_volume"]
    assert nodes.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in nodes


def test_q83_bucketed_join_eliminates_exchange(spark):
    """The bucketed-layout lever (r10 verdict punch item 5): both q83
    join sides are persisted bucketed on the join key with the same
    bucket count, so the sort-merge join must plan with ZERO Exchange
    on the join key — the co-partitioning comes from the table layout,
    not a shuffle. The only exchanges allowed in the whole plan are the
    downstream aggregation/sort ones (keyed on o_orderpriority), never
    on l_orderkey/o_orderkey."""
    import __spark_entry__ as entry

    df = entry.queries()["q83_bucketed_colocated_join"](spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in executed
    offenders = [
        line
        for line in executed.splitlines()
        if "Exchange" in line and "orderkey" in line.lower()
    ]
    assert not offenders, offenders


def test_q84_bucketed_agg_zero_exchange(spark):
    """The other half of the layout lever: q84 groups on the BUCKET
    key, so the bucketed scan's output partitioning satisfies the
    aggregation's required distribution and the top-k readout is
    TakeOrderedAndProject — the ENTIRE executed plan must contain ZERO
    Exchange nodes. On a 100 TB fact bucketed by its hot key this is
    the difference between a shuffle-free scan and moving the table."""
    import __spark_entry__ as entry

    df = entry.queries()["q84_bucketed_colocated_agg"](spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in executed
    assert "TakeOrderedAndProject" in executed


def test_q85_static_partition_pruning(spark):
    """q85's day filter must reach the scan as a PARTITION filter (the
    fact is laid out day_no=N hive-style): the executed scan carries
    the day_no equality in PartitionFilters and no post-scan Filter on
    day_no — at 100 TB this is reading one day directory instead of
    the table."""
    import __spark_entry__ as entry

    df = entry.queries()["q85_partition_pruned_scan"](spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in executed.splitlines() if "PartitionFilters" in l]
    assert scan_lines and all(
        "day_no" in l.split("PartitionFilters:")[1].split("]")[0]
        for l in scan_lines
    ), scan_lines
    # the equality must NOT survive as a row-level filter after the scan
    assert not [
        l for l in executed.splitlines() if l.strip().startswith("+- Filter") and "day_no" in l
    ]


def test_q86_dynamic_partition_pruning(spark):
    """q86's pruning days are unknowable at plan time (the filter sits
    on a dim ATTRIBUTE), so the fact scan must carry a dynamicpruning
    subquery — Spark broadcasts the filtered dim and skips ~6/7 of the
    day partitions at runtime. Without DPP the scan reads every
    partition and the filter runs post-join."""
    import __spark_entry__ as entry

    df = entry.queries()["q86_dynamic_partition_pruning"](spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in executed


def test_q87_layered_layout_prunes_and_skips_shuffle(spark):
    """The layered-layout capstone: ONE executed plan must show all
    three layout dividends at once — the fact scan carries a
    dynamicpruning subquery (day partitions pruned at runtime), there
    is NO exchange on user_id anywhere (the bucketed scan's
    partitioning feeds the per-user aggregation directly), and the
    readout is TakeOrderedAndProject."""
    import __spark_entry__ as entry

    df = entry.queries()["q87_layered_fact_layout"](spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in executed
    assert "hashpartitioning(user_id" not in executed
    assert "TakeOrderedAndProject" in executed
    assert "SelectedBucketsCount" in executed


def test_q89_bucket_pruned_lookup(spark):
    """q89's equality predicate on the single bucket column must prune
    the scan to ONE bucket ("SelectedBucketsCount: 1 out of 16") and
    the single-key rollup must run with ZERO Exchange — the bucketed
    scan satisfies the grouping distribution. At 100 TB this is the
    entity-lookup path: O(table/buckets) bytes, no shuffle."""
    import __spark_entry__ as entry

    df = entry.queries()["q89_bucket_pruned_lookup"](spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    final = executed.split("== Initial Plan ==")[0]
    assert "SelectedBucketsCount: 1 out of 16" in final
    assert "Exchange" not in final


def test_q90_coalesced_shuffle_read(spark):
    """q90's internal run executes under a deliberately oversized
    512-partition shuffle setting; AQE must coalesce the reads from
    real map-output sizes — the executed plan shows the 512-partition
    Exchange read back through "AQEShuffleRead coalesced". The second
    adaptive lever beside q88's skew split: reducers sized DOWN at
    runtime when the static setting over-partitions a stage."""
    import __spark_entry__ as entry

    from ankaflow_spark.operators import relational

    before = spark.conf.get("spark.sql.shuffle.partitions")
    df = entry.queries()["q90_aqe_coalesced_rollup"](spark, SF)
    assert df.count() > 0
    executed = relational._Q90_LAST_EXECUTED
    assert executed is not None
    assert "AQEShuffleRead coalesced" in executed
    assert ", 512)" in executed  # the oversized exchange it collapsed
    # and the session setting was restored after the internal run
    # (compare to the PRE-query value: the session default is
    # host-dependent, never a hardcoded count)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_q07_topk_no_global_sort(plans):
    nodes, _ = plans["q07_topk_orders"]
    assert "TakeOrderedAndProject" in nodes


def test_d07_benchmark_grams_broadcast(plans):
    nodes, _ = plans["d07_benchmark_decontam"]
    assert "BroadcastHashJoin" in nodes and "SortMergeJoin" not in nodes


def test_d08_label_join_broadcast(plans):
    # the broadcast must come from the labels' REAL parquet stats (the
    # CC exit round-trip), never from a static hint: labels are
    # corpus-scale in a dup-heavy corpus, where a forced broadcast
    # fails on the 8 GB / 512M-row limit (r10 verdict)
    nodes, _ = plans["d08_dedup_survivors"]
    assert "SortMergeJoin" not in nodes


def test_no_static_broadcast_of_cluster_labels(engine, sf_dir):
    """The dedup_survivors / semantic_dedup STAGE OPS must not force-
    broadcast the cluster-label relation (r10 verdict, medium): labels
    have one row per document in ANY near-dup pair — corpus-scale in a
    dup-heavy corpus — and a static hint bypasses AQE's size checks.
    Gate: the analyzed plan of both stage ops carries NO broadcast
    hint; the small-SF executed plan still picks a broadcast join from
    the labels' real parquet stats (so dropping the hint costs nothing
    when labels genuinely are small)."""
    from ankaflow_spark.models.core import Stages
    from ankaflow_spark.plans.flow import Flow

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
    df = flow.run()
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed  # stats-chosen, not hint-forced

    flow2 = Flow(
        Stages.loads(f"""
- kind: tap
  name: vectors
  connection: {{kind: parquet, locator: {sf_dir}/embeddings.parquet}}
- kind: operator
  name: deduped
  op: semantic_dedup
  params: {{threshold: 0.35, n_cells: 4}}
"""),
        engine=engine,
    )
    df2 = flow2.run()
    analyzed2 = df2._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed2 and "UnresolvedHint" not in analyzed2


def test_m07_no_static_broadcast_of_frame_counts(spark):
    """m07's per-video frame-count relation (per_video in
    duplicate_video_pairs) is one row per video with >= 1 sampled
    frame — corpus-scale at 100 TB of media — so the pair-scoring
    joins must NOT force-broadcast it (r11 verdict, medium: the
    dedup-label defect class, multimodal edition). Gate: the analyzed
    plan carries NO broadcast hint; the small-SF executed plan still
    picks broadcast joins from per_video's real runtime stats, so
    dropping the hint costs nothing when the relation genuinely is
    small."""
    import __spark_entry__ as entry

    df = entry.queries()["m07_duplicate_frame_pairs"](spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed  # stats-chosen, not hint-forced


def test_d33_band_probe_moves_only_the_batch(spark):
    """d33's probe join must shuffle ONLY the daily batch: the corpus
    band index is persisted bucketed on the full band join key, so in
    the FINAL executed plan the only band-key Exchange is the batch
    side's — re-partitioned into the index's 16 buckets — and the
    corpus side is a bucketed scan (SelectedBucketsCount) feeding the
    SMJ with no Exchange. The q83 argument applied to d02's hottest
    shuffle: at 100 TB the corpus never moves again after the index
    build."""
    import __spark_entry__ as entry

    df = entry.queries()["d33_bucketed_band_probe"](spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    final = executed.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in final
    assert "SelectedBucketsCount" in final
    band_ex = [
        l
        for l in final.splitlines()
        if "Exchange hashpartitioning(band_id" in l
    ]
    assert len(band_ex) == 1, band_ex
    assert ", 16)" in band_ex[0]  # co-partitioned into the bucket count


def test_d34_merged_index_keeps_the_layout_guarantee(spark):
    """After the day-1 batch APPEND-merges into the bucketed index,
    the day-2 probe must keep d33's plan shape unchanged: one band-key
    Exchange (the batch side), bucketed corpus scan, SMJ — the merge
    adds per-bucket files, never a reshuffle."""
    import __spark_entry__ as entry

    df = entry.queries()["d34_band_index_merge"](spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    final = executed.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in final
    assert "SelectedBucketsCount" in final
    band_ex = [
        l
        for l in final.splitlines()
        if "Exchange hashpartitioning(band_id" in l
    ]
    assert len(band_ex) == 1, band_ex


def test_q88_skew_join_split(spark):
    """q88's internal execution must show AQE's own skew mitigation:
    the hot-key fact-profile SMJ plans with skew=true and the hot
    reduce partition is read as mapper-chunk splits (AQEShuffleRead
    skewed) — one task no longer sorts/joins half the fact. The query
    captures its executed plan in _Q88_LAST_EXECUTED (the join runs
    inside the query under the squeezed demo thresholds; at 100 TB
    the 256MB/5x defaults fire on their own)."""
    import __spark_entry__ as entry

    from ankaflow_spark.operators import relational

    before = {
        k: spark.conf.get(k, None) for k in relational._Q88_SKEW_CONF
    }
    df = entry.queries()["q88_aqe_skew_join"](spark, SF)
    assert df.count() == 2
    executed = relational._Q88_LAST_EXECUTED
    assert executed is not None
    assert "SortMergeJoin(skew=true)" in executed
    assert "AQEShuffleRead skewed" in executed
    # and the squeezed demo confs were restored after the internal run
    # (compared to the PRE-query values — session defaults are
    # host/env-dependent, never hardcoded)
    after = {
        k: spark.conf.get(k, None) for k in relational._Q88_SKEW_CONF
    }
    assert after == before


# A window with an empty PARTITION BY funnels its whole input through
# ONE partition (Spark's "No Partition Defined" warning). Acceptable
# only where the window input is a constant-size relation by design —
# documented per query. Growing-with-data relations must use the
# scalar-aggregate + broadcast-join spelling instead (q49/q50/q51).
GLOBAL_WINDOW_ALLOWED = {
    "q52_heavy_hitters",  # top-k rank + kth-count windows over the <= SHARDS*M candidate summary
    "q05_rank_in_group",  # final dense_rank over the 3-row grouped output
    "q07_topk_orders",  # row_number bounded by TakeOrderedAndProject's K
    "q16_running_total",  # running total over <= |dates in one quarter| grouped rows
    "q42_value_deciles",  # ntile over the 150-row per-segment aggregate
    "q53_approx_quantile_verdict",  # exact-rank window over the 3-metric relation
    "d12_lsh_recall_eval",  # metrics-row assembly: windows over tiny verdict relations
    "s03_ivf_ann",  # per-query rank: 5 queries x probe candidates, query-count-bounded
    "s10_pq_recall_eval",  # rank over 3-query truth/ADC candidate slices
    "s13_ivf_recall_eval",  # rank over 5-query eval slices
    "s05_knn_label",  # rank over broadcast test-slice neighbors (query-count-bounded)
    "s12_hard_negatives",  # rank over 5-query candidate slices
    "s14_retrieval_mrr",  # rank over 5-query candidate slices
    "q56_returned_item_reporting",  # re-rank over TakeOrderedAndProject's 20-row output
    "t11_vocab_topk",  # re-rank over TakeOrderedAndProject's K-row output
    "t35_boilerplate_shingles",  # re-rank over TakeOrderedAndProject's 20-row output (t11's rank-after-LIMIT spelling)
    "t18_zipf_fit",  # cumsum over the DISTINCT-frequency table (O(sqrt tokens) rows, count-of-counts law)
    "q59_skew_diagnostics",  # re-rank over TakeOrderedAndProject's 10-row output
    "ts37_survival_curve",  # cumulative walk over the |distinct session durations|-bounded times relation (ts34/ts35's bounded-walk class)
    "ts38_decayed_leaderboard",  # re-rank over TakeOrderedAndProject's 10-row output (st11's rank-after-LIMIT spelling)
    "t34_length_ks_drift",  # corpus-ECDF cumulative walk over the |distinct doc lengths|-bounded value relation — t18's count-of-counts class
}

_WSPEC = re.compile(r"windowspecdefinition\(([^)]*?)specifiedwindowframe")


def _has_unpartitioned_window(plan: str) -> bool:
    for m in _WSPEC.finditer(plan):
        head = m.group(1)
        parts = [p.strip() for p in head.split(",") if p.strip()]
        # partition columns appear as bare `col#id`; order columns carry
        # ASC/DESC. No bare column before the frame => empty PARTITION BY.
        if not any(" ASC" not in p and " DESC" not in p for p in parts):
            return True
    return False


def test_no_unpartitioned_windows_over_growing_relations(plans):
    offenders = [
        n
        for n, (_, plan) in plans.items()
        if _has_unpartitioned_window(plan) and _base(n) not in GLOBAL_WINDOW_ALLOWED
    ]
    assert offenders == [], (
        f"{offenders}: global (empty PARTITION BY) window over a relation "
        f"that grows with data — respell as scalar aggregate + broadcast "
        f"join (see q49/q50), or allowlist with a constant-size justification"
    )


# ---------------------------------------------------------------------------
# st* / m0* coverage: these queries execute during construction
# (streaming runs to completion; multimodal kernels stage inputs), so
# their plans are captured by RUNNING each query once and explaining
# the returned batch DataFrame — plus every pre-checkpoint fragment via
# the same capturing wrapper. This is what the r5 gate skipped.
# ---------------------------------------------------------------------------

# Same classes as the batch allowlists, keyed by query name.
EXEC_BNLJ_ALLOWED = {
    "st19_stream_streaks",  # 1-row user-total scalar in the report tail (ts35's scalar class); the per-batch merge plans join only on the entity key
    "st20_stream_decay_topk",  # 1-row week-span scalar in the report tail (ts38's scalar class); per-batch merge plans join only on the counter key
    "m10_aspect_buckets",  # 5-row literal anchor table x image metadata + 1-row image-total scalar (q59's class)
    "st21_stream_survival",  # 1-row corpus-edge + totals scalars in ts37's shared actuarial tail (q59's scalar class)
    "st22_stream_survival_bounded",  # same actuarial-tail scalars as st21, over the gap-closure sessionizer's bounded-state emitted set
    "st29_rocksdb_survival",  # st22's exact relation on the RocksDB provider — same actuarial-tail scalars
    "m11_shot_lengths",  # 1-row shot-total scalar cross-joined into the |shot lengths|-bounded histogram (q59's class)
    "st25_stream_psi_drift",  # 1-row snapshot-totals scalar cross-joined into the |bins|-bounded smoothed relation — q73's class over the maintained state
}
EXEC_GLOBAL_WINDOW_ALLOWED = {
    "st11_stream_heavy_hitters",  # re-rank over TakeOrderedAndProject's 10-row output (t11's pattern)
    "st20_stream_decay_topk",  # re-rank over TakeOrderedAndProject's 10-row output (st11's pattern, ts38's tail)
    "st21_stream_survival",  # cumulative walk over the |distinct durations|-bounded times relation (ts37's bounded-walk class)
    "st22_stream_survival_bounded",  # ts37's bounded-walk class over the closed-session relation
    "st29_rocksdb_survival",  # st22's bounded-walk class, RocksDB provider twin
    "m12_shard_planner",  # running byte-offset walk over the 120-item contract-scale inventory (m11's class; production inventories pre-partition by coarse key)
    "st27_stream_watermark_drops",  # two-phase md5 arrival-rank (r12 respell): the only remaining global window is the <= 256-row prefix-count offset relation (bounded by construction); the disorder itself is synthesis-only — production reads its real ingest sequence and never ranks
}


@pytest.fixture(scope="module")
def executed_plans(spark):
    out = _collect_plans(
        spark, lambda name: name.startswith("st") or name.startswith("m")
    )
    return out


def test_streaming_multimodal_no_cartesian_products(executed_plans):
    offenders = [
        n for n, (nodes, _) in executed_plans.items() if "CartesianProduct" in nodes
    ]
    assert offenders == []


def test_streaming_multimodal_nested_loop_joins_tiny_only(executed_plans):
    offenders = [
        n
        for n, (nodes, _) in executed_plans.items()
        if "BroadcastNestedLoopJoin" in nodes and _base(n) not in EXEC_BNLJ_ALLOWED
    ]
    assert offenders == []


def test_streaming_multimodal_no_unpartitioned_windows(executed_plans):
    offenders = [
        n
        for n, (_, plan) in executed_plans.items()
        if _has_unpartitioned_window(plan)
        and _base(n) not in EXEC_GLOBAL_WINDOW_ALLOWED
    ]
    assert offenders == [], (
        f"{offenders}: global window in a streaming/multimodal final batch "
        f"plan — respell with ORDER BY + literal LIMIT before ranking "
        f"(st11/t11's pattern), or allowlist with a constant-size justification"
    )


def test_scan_heavy_queries_bounded_shuffles(plans):
    # pure per-row expression queries: at most the final sort exchange
    for name, cap in [
        ("t09_pii_redaction", 1),
        ("t10_stratified_mix", 1),
        ("t01_token_stats", 1),
        ("t03_quality_score", 1),
        ("s04_quantization_fidelity", 1),
        ("t04_winnow_fingerprint", 2),  # + one groupBy(doc) shuffle
    ]:
        nodes, _ = plans[name]
        assert nodes.count("Exchange") <= cap, name


# ---------------------------------------------------------------------------
# Executed-scan regression gate (r9): Spark re-expands a CTE / DataFrame
# subtree per consumer with NO physical reuse, so a relation consumed k
# times re-SCANS its base table k times unless materialized (the inline
# ts22 executed 28 separate events scans — PERF.md r27). The queries
# below were fixed by staging their natural materialization points
# through eager localCheckpoints; this gate pins the RETURNED DataFrame's
# base-table scan budget so a refactor can't silently reintroduce the
# re-expansion. tools/scan_audit.py is the sweep tool for new queries.
# Budgets count FileSourceScanExec nodes in the final adaptive plan
# (reused exchanges/subqueries excluded); scans paid inside checkpoint
# stages are by construction one per stage.
# ---------------------------------------------------------------------------
SCAN_BUDGETS = {
    # query: {table: max FileSourceScanExec in the returned plan}
    "ts22_rfm_segmentation": {"events": 0},  # staged: profile + cells checkpoints
    "ts14_funnel": {"events": 0},  # survivor sets checkpointed (3 disjoint slice scans at build)
    "d21_bloom_decontam": {"documents": 2},  # train grams (full) + doc_id-only spine; bench checkpointed
    "t07_repetition_signals": {"documents": 1},  # fused tagged-gram single pass
    "t08_curation_gate": {"documents": 4},  # scored(1) + fused rep(1) + decontam bench/train slices(2)
    "d25_dedup_bias_audit": {"documents": 0},  # content keys checkpointed
    "ts43_session_cooccurrence": {"events": 0},  # session baskets checkpointed
    "t34_length_ks_drift": {"documents": 0},  # (source, n_chars) histogram checkpointed
    "q78_ingest_freshness": {"events": 1},  # final-24h count (profile checkpointed)
    "ts37_survival_curve": {"events": 0},  # per-session relation checkpointed
    "t31_source_overlap": {"documents": 0},  # per-source shingle set checkpointed
    "q79_erasure_cascade": {"orders": 0, "lineitem": 0, "customer": 0},  # cohort/ord/li_n checkpointed
    "q73_psi_drift": {"orders": 0},  # (snap, bin) cells checkpointed
    "ts40_peak_concurrency": {"events": 0},  # day-clipped session spans checkpointed
    "t28_domain_caps": {"documents": 2},  # totals folded into the ranked pass (scored full + source-join narrow)
    "t22_chunk_dedup_rewrite": {"documents": 2},  # chunk instances checkpointed (explode full + doc_id spine)
    # second wave: queries that read the heavy TEXT column twice (a
    # genuine 2x of the dominant bytes at scale) — the multiply-
    # consumed relation is now checkpointed; 0 scans in the returned
    # plan, one text pass at build
    "t19_chunk_dedup": {"documents": 0},  # chunk instances checkpointed
    "t23_woe_binning": {"documents": 0},  # (bin, label) counts checkpointed
    # r13: t24's gram relation is no longer checkpointed — the one-
    # shuffle window rework consumes it ONCE, so the returned plan
    # carries exactly the single honest documents pass (0 only when a
    # prior same-session consumer left the table materialized).
    "t24_ngram_novelty": {"documents": 1},
    "t30_langid_confusion": {"documents": 0},  # confusion cells checkpointed
    "t32_temperature_mix": {"documents": 0},  # per-source token inventory checkpointed
    "ts45_daily_acf": {"events": 0},  # daily lattice checkpointed (both lag-join sides consume it)
}

# Remaining >= 3x queries are SEMANTICALLY multi-pass and stay unfixed
# by design (audited r9, tools/scan_audit.py): q47 pins three NOT IN /
# NOT EXISTS spellings side by side (3 scans IS the query), q76's MV
# audit recomputes by contract (base + delta + full recompute), q71
# synthesizes a second table version from the first (v2's two branches
# are the synthetic CDC feed; in production v2 is its own table),
# q74/q80/q38 audit multiple FK relationships (one pass per
# relationship), t25 is iterative (one pass per BPE round), ts06's
# bracketing joins read the sparse series per bound side.


def test_executed_scan_budgets(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.scan_audit import real_scans

    from ankaflow_spark.operators import collect_all

    qs, _ = collect_all()
    sf = "/root/testdata/sf0.001"
    over = []
    for name, budget in SCAN_BUDGETS.items():
        counts = real_scans(qs[name](spark, sf))
        for table, cap in budget.items():
            if counts.get(table, 0) > cap:
                over.append((name, table, counts.get(table, 0), cap))
    assert over == [], (
        f"{over}: a base table is scanned more often than its pinned "
        f"budget — a CTE/DataFrame re-expansion crept back in; stage the "
        f"multiply-consumed relation through localCheckpoint (PERF.md r27)"
    )


def test_q91_runtime_bloom_filter(spark):
    """q91's internal execution must show Spark's runtime Bloom-filter
    join pruning: the creation side builds bloom_filter_agg over the
    FILTERED dim keys and the application side's fact scan carries a
    might_contain(xxhash64(l_suppkey)) filter — fact rows die BEFORE
    the shuffle feeding the join. The query captures its executed plan
    in _Q91_LAST_EXECUTED (the join runs inside the query under the
    squeezed scan-size threshold; at 100 TB the 10GB default fires on
    its own). Completes the runtime-pruning lever set: q85/q86
    partitions, q89 buckets, q91 rows on an un-laid-out fact."""
    import __spark_entry__ as entry

    from ankaflow_spark.operators import relational

    before = {
        k: spark.conf.get(k, None) for k in relational._Q91_BLOOM_CONF
    }
    df = entry.queries()["q91_runtime_bloom_join"](spark, SF)
    assert df.count() > 0
    executed = relational._Q91_LAST_EXECUTED
    assert executed is not None
    final = executed.split("== Initial Plan ==")[0]
    # creation side: bloom built over the filtered dim's join keys
    assert "bloom_filter_agg(xxhash64(s_suppkey" in final
    # application side: the probe sits on the FACT's key pre-shuffle
    assert "might_contain" in final
    assert "xxhash64(l_suppkey" in final
    # and the squeezed confs were restored after the internal run
    after = {
        k: spark.conf.get(k, None) for k in relational._Q91_BLOOM_CONF
    }
    assert after == before


def test_q92_shuffled_hash_join(spark):
    """q92's internal execution must pick ShuffledHashJoin with the
    dim as build side — the join-strategy lever for a dim too big to
    broadcast but far smaller than the fact: same shuffle as SMJ, but
    the fact streams through a per-partition hash map UNSORTED. The
    gate also pins the deleted cost: no Sort node anywhere in the
    final plan (the aggregation is hash-based and the join no longer
    sorts either side)."""
    import __spark_entry__ as entry

    from ankaflow_spark.operators import relational

    before = {
        k: spark.conf.get(k, None) for k in relational._Q92_SHJ_CONF
    }
    df = entry.queries()["q92_shuffled_hash_join"](spark, SF)
    assert df.count() > 0
    executed = relational._Q92_LAST_EXECUTED
    assert executed is not None
    final = executed.split("== Initial Plan ==")[0]
    assert "ShuffledHashJoin" in final
    assert "BuildRight" in final or "BuildLeft" in final
    # the lever's win: NEITHER join side is sorted on its join key
    # (SMJ would plan Sort [o_custkey]/Sort [c_custkey] above both
    # shuffle reads; the only remaining Sort is the bounded 5-row
    # ORDER BY segment on the aggregate output)
    assert "Sort [o_custkey" not in final
    assert "Sort [c_custkey" not in final
    # and the squeezed confs were restored after the internal run
    after = {
        k: spark.conf.get(k, None) for k in relational._Q92_SHJ_CONF
    }
    assert after == before
