"""Physical-plan quality gates: prove the plans would survive 100 TB.

Correctness tests say the answer is right; these say the *plan* is right —
filters reach the parquet scan, projections prune columns, small sides
broadcast, no accidental cartesian products, shuffle counts stay minimal.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.operators.filters import filter_id_range
from vector_io_spark.operators.joins import semi_join_id_list
from vector_io_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_only,
    count_broadcast_joins,
    count_shuffles,
    formatted_plan,
)


def test_id_range_filter_pushdown(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    df = filter_id_range(emb, "vec_id", 100, 299).select("vec_id", "label")
    # try_cast(long) on an int64 column folds away; the range must be
    # pushed to the parquet scan for row-group pruning
    assert_pushed_filters(df)
    assert_read_schema_only(df, "vec_id", "label")


def test_column_pruning_text_ops(spark, sf_dir):
    from vector_io_spark.functions.text import doc_fingerprint

    docs = load(spark, sf_dir, "documents")
    df = docs.select("doc_id", doc_fingerprint("text").alias("fp"))
    # scan must read only doc_id + text, not lang/source/n_chars
    assert_read_schema_only(df, "doc_id", "text")


def test_semi_join_broadcasts_id_list(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    ids = load(spark, sf_dir, "part").where(F.col("p_size") == 25).select("p_partkey")
    df = semi_join_id_list(li, ids, id_col="l_partkey")
    assert_broadcast_join(df)
    # the fact side never shuffles: zero non-broadcast exchanges
    assert count_shuffles(df) == 0


def test_star_join_broadcasts_dims(spark, sf_dir):
    from vector_io_spark.queries import QUERIES

    df = QUERIES["order_priority_by_region"](spark, sf_dir)
    assert count_broadcast_joins(df) == 3, formatted_plan(df)
    # only the final group-by shuffles
    assert count_shuffles(df) <= 1, formatted_plan(df)


def test_topk_has_no_cartesian_on_corpus(spark, sf_dir):
    from vector_io_spark.queries import QUERIES

    df = QUERIES["ann_topk_bruteforce"](spark, sf_dir)
    # round-4 kernel shape: the corpus feeds an Arrow mapInPandas scorer
    # (queries closure-bound — the same boundedness as a broadcast) that
    # emits only per-batch top-k; never a CartesianProduct, and the only
    # shuffle ranks the candidate triples. The hof impl would instead
    # show the broadcast nested-loop join.
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "MapInPandas" in plan or "BroadcastNestedLoopJoin" in plan, plan
    from vector_io_spark.plans import count_shuffles

    assert count_shuffles(df) <= 2, plan


def test_q1_single_shuffle_and_codegen(spark, sf_dir):
    from vector_io_spark.queries import QUERIES

    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    # partial agg map-side, one exchange on the group keys
    assert count_shuffles(df) == 1
    from vector_io_spark.plans import simple_plan

    assert "partial_sum" in simple_plan(df)  # map-side combine
    # the timestamp filter is pushed to the scan
    assert_pushed_filters(df, "l_shipdate")


def test_minhash_signatures_shuffle_free(spark, sf_dir):
    from vector_io_spark.operators.dedup import minhash_signatures
    from vector_io_spark.plans import simple_plan

    docs = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8)
    # at most the small-input CPU rebalance (round-robin); never a
    # key-hash shuffle — signatures are per-row work
    assert count_shuffles(sigs) <= 1
    assert "hashpartitioning" not in simple_plan(sigs)
    assert_read_schema_only(sigs, "doc_id", "text")


def test_dedup_exact_shuffles_once(spark, sf_dir):
    from vector_io_spark.operators.dedup import dedup_exact_content

    docs = load(spark, sf_dir, "documents")
    df = dedup_exact_content(docs, "doc_id", "text")
    assert count_shuffles(df) == 1  # one exchange on the fingerprint


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Two tables bucketed on the same key/count: joining them must show
    ZERO exchanges (the write-time shuffle is reused) and a groupBy on the
    bucket key must also skip its exchange."""
    from vector_io_spark.format.bucketing import bucketed_join, write_bucketed

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8,
                   path=str(tmp_path / "b_orders"))
    write_bucketed(li, "b_lineitem", "o_orderkey", 8,
                   path=str(tmp_path / "b_lineitem"))
    try:
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
            assert count_shuffles(joined) == 0, formatted_plan(joined)
            assert joined.count() == li.count()

            # aggregation on the bucket key also reuses the distribution
            agg = (
                spark.table("b_lineitem")
                .groupBy("o_orderkey")
                .agg(F.sum("l_quantity").alias("q"))
            )
            assert count_shuffles(agg) == 0, formatted_plan(agg)

            # control: the same join on plain parquet shuffles both sides
            plain = orders.join(li, "o_orderkey")
            assert count_shuffles(plain) > 0, formatted_plan(plain)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_q6_pushes_all_predicates(spark, sf_dir):
    from vector_io_spark.queries import QUERIES

    df = QUERIES["revenue_change_forecast"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "PushedFilters" in plan
    for frag in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
                 "LessThan(l_quantity"):
        assert frag in plan, plan
    # scalar aggregate: one single-partition exchange, nothing else
    assert count_shuffles(df) <= 1, formatted_plan(df)


def test_q5_broadcasts_all_dims_single_fact_shuffle(spark, sf_dir):
    from vector_io_spark.queries import QUERIES

    df = QUERIES["local_supplier_volume"](spark, sf_dir)
    # customer/supplier/nation/region broadcast (orders too at this SF);
    # the fact side shuffles at most once (big join) + the final group-by
    assert count_broadcast_joins(df) >= 4, formatted_plan(df)
    assert count_shuffles(df) <= 2, formatted_plan(df)


def test_semdedup_broadcasts_centroids_only(spark, sf_dir):
    """The centroid table (≤ 2^num_planes rows) broadcasts; the corpus
    self-join is a hash join on the cell key — never a cartesian."""
    from vector_io_spark.operators.semdedup import semdedup

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    df = semdedup(emb)
    assert_no_cartesian(df)
    assert count_broadcast_joins(df) >= 1, formatted_plan(df)


def test_funnel_pushes_type_filter(spark, sf_dir):
    from vector_io_spark.operators.events import funnel

    ev = load(spark, sf_dir, "events")
    df = funnel(ev, ["signup", "purchase"])
    plan = formatted_plan(df)
    # only funnel step types leave the scan: In-filter pushed to parquet
    assert "In(event_type" in plan, plan
    assert_read_schema_only(df, "user_id", "event_type", "ts")


def test_profile_columns_single_scan_both_modes(spark, sf_dir):
    """Profiling N columns is ONE table scan in both modes. Approx mode
    (the 100 TB path) additionally avoids the Expand that the exact
    multi-column COUNT DISTINCT rewrite inserts (Expand multiplies the
    pre-aggregation row flow ×|distinct cols|)."""
    import re

    from vector_io_spark.operators.aggregates import profile_columns
    from vector_io_spark.plans import simple_plan

    def scan_nodes(df):
        return len(re.findall(r"\(\d+\) Scan parquet", formatted_plan(df)))

    li = load(spark, sf_dir, "lineitem")
    approx = profile_columns(li, ["l_quantity", "l_discount"], approx=True)
    assert "Expand" not in simple_plan(approx)
    assert scan_nodes(approx) == 1
    exact = profile_columns(li, ["l_quantity", "l_discount"])
    assert scan_nodes(exact) == 1


def test_q14_broadcast_part_single_row_agg(spark, sf_dir):
    from vector_io_spark.queries import QUERIES

    df = QUERIES["promo_revenue_share"](spark, sf_dir)
    assert count_broadcast_joins(df) == 1, formatted_plan(df)
    # scalar aggregate: the fact side never hash-shuffles; one
    # single-partition exchange finishes it
    assert count_shuffles(df) <= 1, formatted_plan(df)
    assert_pushed_filters(df, "l_shipdate")


def test_q18_reuses_rollup_partitioning_for_orders_join(spark, sf_dir):
    """The per-order rollup hash-partitions on l_orderkey; the orders
    join keys on the same column, so the aggregate side must not
    re-shuffle (fact moves once: rollup exchange + orders exchange +
    customer exchange at most — never a second lineitem pass)."""
    import re

    from vector_io_spark.queries import QUERIES

    df = QUERIES["large_volume_customers"](spark, sf_dir)
    plan = formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 3, plan
    assert count_shuffles(df) <= 3, plan


def test_q19_zero_fact_shuffles_and_envelope_pushdown(spark, sf_dir):
    from vector_io_spark.queries import QUERIES

    df = QUERIES["bracket_revenue"](spark, sf_dir)
    assert count_broadcast_joins(df) == 1, formatted_plan(df)
    assert count_shuffles(df) <= 1, formatted_plan(df)
    # the derived quantity envelope reaches the scan even though the OR
    # bracket itself straddles both tables
    plan = formatted_plan(df)
    assert "GreaterThanOrEqual(l_quantity" in plan, plan


def test_q10_aggregates_before_customer_join(spark, sf_dir):
    """Revenue collapses to one row per customer BEFORE customer
    attributes join: the window sort input is the small aggregate. The
    returnflag filter is pushed to the lineitem scan."""
    from vector_io_spark.queries import QUERIES
    from vector_io_spark.plans import simple_plan

    df = QUERIES["returned_item_report"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "EqualTo(l_returnflag,R)" in plan, plan
    # aggregate appears below the customer join in the plan tree: the
    # simple string shows HashAggregate feeding the c_custkey join
    sp = simple_plan(df)
    agg_pos = sp.index("HashAggregate")
    # nation is broadcast
    assert count_broadcast_joins(df) >= 1, plan
    assert agg_pos > -1


def test_mmr_never_shuffles_corpus(spark, sf_dir):
    """Both corpus touches (shortlist scoring + candidate-vector
    fetch) are broadcast-side joins: no cartesian, and every exchange
    moves only shortlist-sized data (the corpus never hash-shuffles on
    a data-dependent key)."""
    from vector_io_spark.operators.similarity import mmr_topk

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 3).selectExpr(
        "vec_id as query_id", "embedding"
    )
    df = mmr_topk(emb, queries, k=4, shortlist=12)
    assert_no_cartesian(df)
    assert count_broadcast_joins(df) >= 2, formatted_plan(df)


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Spark's runtime bloom-filter join (enabled by default) injects a
    might_contain probe on the FACT side of a selective fact⨝dim join, so
    fact rows that cannot match are dropped at the scan before the
    shuffle — the 100 TB semi-join-reduction path. The injection
    thresholds are sized for real clusters (application side >= 10 GB
    scan); here we scale them to the test fixture and assert the
    optimizer actually plants the filter."""
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a shuffle join (broadcast joins don't need a bloom) and
        # make the fixture-size fact table eligible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        assert (
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
            == "true"
        )
        li = load(spark, sf_dir, "lineitem")
        o = (
            load(spark, sf_dir, "orders")
            .where(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        # and the result is still exact (bloom is a pre-filter, the real
        # join verifies)
        exact = (
            li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, exact.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_q7_both_fact_inputs_nation_pruned(spark, sf_dir):
    """Q7 shape: supplier-side nation filter broadcasts onto lineitem and
    the customer-side nation filter reduces orders BEFORE the orderkey
    join — at least two broadcast joins, no cartesian, and the final
    big-big edge meets two pre-filtered streams."""
    from vector_io_spark.queries import QUERIES

    df = QUERIES["nation_trade_volume"](spark, sf_dir)
    assert_no_cartesian(df)
    assert count_broadcast_joins(df) >= 2, formatted_plan(df)


def test_hybrid_rrf_fusion_moves_pairs_only(spark, sf_dir):
    """Hybrid search: the fused exchange carries (id, rank/contrib)
    pairs; the only corpus-sized inputs are the two ranking scans; the
    dense side's query vector is a broadcast cross join (1 row), never
    a cartesian over the corpus."""
    from vector_io_spark.queries import QUERIES

    df = QUERIES["hybrid_rrf_search"](spark, sf_dir)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or count_broadcast_joins(df) >= 1, plan


def test_bigram_lm_no_broadcast_of_vocab(spark, sf_dir):
    """The doc-bigrams ⨝ logprob join must NOT hint broadcast — bigram
    vocabulary grows with the corpus. The V scalar and the tiny consts
    ARE broadcast. (AQE may still choose broadcast at this fixture size;
    the gate is that no *hint* forces it at scale: logical plan carries
    no ResolvedHint on the bigram-count side.)"""
    from vector_io_spark.queries import QUERIES

    df = QUERIES["bigram_lm_score"](spark, sf_dir)
    logical = df._jdf.queryExecution().analyzed().toString()
    # the only hints in the plan are the deliberate scalar broadcasts
    hints = [l for l in logical.splitlines() if "ResolvedHint" in l]
    assert len(hints) <= 1, hints  # countDistinct V scalar only


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join (enabled in session.py) splits a hot-key partition
    at runtime: the final adaptive plan marks the join skew=true and the
    result stays exact. This is the zero-code-change half of the skew
    story; operators/skew.py::salted_join is the explicit half for joins
    AQE can't fix (e.g. when the hot side must stay un-split for a
    downstream window). Thresholds here scale the 10 GB-class defaults
    to fixture size — detection logic is identical at 100 TB.

    Caveat the test encodes: the skew detector sees POST-PRUNING bytes.
    A count(*) would drop the payload column and nothing would be skewed
    — the aggregate must consume the wide column for the hot partition
    to weigh anything."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        small = spark.range(0, 50_000).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        )
        j = big.join(small, "k").select(F.sum(F.length("pad")).alias("n"))
        (got,) = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        # exactness: hot key 0 joins (9/10 * 400k) rows * 64-char pad;
        # non-hot keys < 50k contribute their own
        expected = 360_000 * 64 + sum(
            64 for i in range(400_000) if i % 10 == 9 and i < 50_000
        )
        assert got["n"] == expected
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_global_rank_family_has_no_single_partition_window(spark, sf_dir):
    """rfm_segments and customer_revenue_percentiles compute exact global
    ntile/percent_rank/cume_dist — historically via unpartitioned windows
    (single-task sort of every user/customer; WindowGroupLimit cannot
    rescue rank-less window functions). The distributed two-pass rank in
    operators/ranks.py must keep these plans free of ANY unpartitioned
    window operator."""
    from vector_io_spark.plans import assert_no_unpartitioned_window
    from vector_io_spark.queries import QUERIES

    for name in ("rfm_segments", "customer_revenue_percentiles"):
        assert_no_unpartitioned_window(QUERIES[name](spark, sf_dir))


def test_attach_global_rank_matches_window_row_number(spark):
    """Bit-exactness of the distributed rank vs the single-partition
    window it replaces, including ntile's uneven-bucket distribution
    (97 rows / 10 buckets -> first 7 buckets get 10, rest get 9)."""
    from pyspark.sql import Window

    from vector_io_spark.operators.ranks import (
        attach_global_rank,
        exact_cume_dist,
        exact_ntile,
        exact_percent_rank,
    )

    df = spark.range(0, 97).select(
        F.col("id"),
        ((F.col("id") * 37) % 19).alias("key"),  # heavy ties
    )
    order = [F.col("key").desc(), F.col("id").asc()]
    got = (
        attach_global_rank(df, order, rank_col="rk", total_col="tot")
        .select(
            "id",
            F.col("rk"),
            exact_ntile(10, "rk", "tot").alias("nt"),
            F.round(exact_percent_rank("rk", "tot"), 9).alias("pr"),
            F.round(exact_cume_dist("rk", "tot"), 9).alias("cd"),
        )
        .orderBy("id")
        .collect()
    )
    w = Window.orderBy(*order)
    want = (
        df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rk"),
            F.ntile(10).over(w).cast("long").alias("nt"),
            F.round(F.percent_rank().over(w), 9).alias("pr"),
            F.round(F.cume_dist().over(w), 9).alias("cd"),
        )
        .orderBy("id")
        .collect()
    )
    assert got == want


def test_attach_global_rank_empty_and_single_row(spark):
    from vector_io_spark.operators.ranks import attach_global_rank

    empty = spark.range(0).select(F.col("id"))
    out = attach_global_rank(empty, [F.col("id")], rank_col="rk", total_col="t")
    assert out.count() == 0 and set(out.columns) == {"id", "rk", "t"}

    one = attach_global_rank(
        spark.range(5, 6), [F.col("id")], rank_col="rk", total_col="t"
    ).collect()
    assert [(r["rk"], r["t"]) for r in one] == [(1, 1)]


def test_global_topk_window_group_limit_fires(spark, sf_dir):
    """Every global row_number-top-k in the headline set is scale-safe
    ONLY because WindowGroupLimit pre-truncates map-side. Gate each plan
    so an expression change that disqualifies the rank filter (reverting
    to a full single-partition sort) fails loudly instead of silently."""
    from vector_io_spark.plans import assert_window_group_limit
    from vector_io_spark.queries import QUERIES

    for name in (
        "returned_item_report",
        "suppliers_kept_waiting",
        "cms_heavy_hitters",
        "hybrid_rrf_search",
        "sparse_keyword_retrieval",
        "quota_constrained_topk",
        "vocab_coverage",
    ):
        assert_window_group_limit(QUERIES[name](spark, sf_dir))


def test_pq_exact_broadcasts_codebook_and_lut(spark, sf_dir):
    """The exact-PQ ADC scan must keep every corpus-side join broadcast
    (centroids m*K*sub_dim rows, LUTs |queries|*m*K rows) — the corpus
    shuffles only for the training aggregates and the final per-query
    ADC sum, never for a join."""
    from vector_io_spark.plans import formatted_plan
    from vector_io_spark.queries import QUERIES

    df = QUERIES["ann_topk_pq_exact"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


import pytest


@pytest.fixture(scope="module")
def registry_plan_walk(spark, sf_dir):
    """ONE build of every registered query's DataFrame, shared by the
    blanket plan gates below (r13, VERDICT r12 Next #1: the two gates
    each re-built all 233 query plans — index builds, training loops,
    checkpoint jobs — at ~2 min per walk; one walk serves both).
    Returns {name: (simple_plan_string, n_unpartitioned_windows)}."""
    from vector_io_spark.plans import (
        count_unpartitioned_windows,
        simple_plan,
    )
    from vector_io_spark.queries import QUERIES

    walk = {}
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, sf_dir)
        walk[name] = (simple_plan(df), count_unpartitioned_windows(df))
    return walk


def test_no_query_has_unbounded_single_partition_window(
    registry_plan_walk,
):
    """BLANKET gate over the whole query registry: every plan is free of
    unpartitioned windows, except an explicit allowlist where the window
    input is provably bounded — either a rank<=k literal filter whose
    WindowGroupLimit/TakeOrderedAndProject rescue is asserted here, or a
    documented tiny derived table (bin/bucket-count frames). Any new
    query that sorts data-proportional input on one task fails this
    test by name."""
    RANK_FILTER_RESCUED = {
        "returned_item_report",
        "suppliers_kept_waiting",
        "vocab_coverage",
        "quota_constrained_topk",
        "sparse_keyword_retrieval",
        # single-query posting-list probe: per-doc sums of MATCHING
        # postings only, then one global rank<=20 — TakeOrderedAndProject
        # rescue asserted below (same shape as sparse_keyword_retrieval)
        "sparse_indexed_retrieval",
        "hybrid_rrf_search",
        # same three-global-window shape as hybrid_rrf_search: two
        # top-100 shortlist legs + final top-20, every window behind a
        # rank<=k literal — rescue asserted below
        "hybrid_weighted_search",
        # catalog-served hybrid (r10): both legs are partition-pruned
        # index probes whose windows partition by query_id; the only
        # global window is the final top-20 over the fused ≤200-row
        # shortlist union, behind a rank<=20 literal — rescue asserted
        # below
        "hybrid_indexed_search",
        # same plan shape with the SQ8 catalog as the dense leg (r11,
        # operators/hybrid.py dense_kind='sq8'): the only global window
        # is the final top-20 over the fused ≤200-row shortlist union,
        # behind a rank<=20 literal — rescue asserted below
        "hybrid_indexed_sq8",
        "cms_heavy_hitters",
        # global top-5 heavy keys over the per-key rollup; rank<=5
        # filter — WindowGroupLimit rescue asserted below
        "join_key_skew_report",
        # global top-50 PMI pairs over the count-floored vocabulary;
        # rank<=50 filter — WindowGroupLimit rescue asserted below
        "pmi_collocations",
        # bottom-k quantile sketch: global rank<=4096 by md5 hash —
        # WindowGroupLimit truncates map-side (rescue asserted below)
        "quantile_sketch_order_totals",
        # KMV set-overlap sketch: three global rank<=1024 by md5 hash
        # (per-side signatures + union re-truncate) — same rescued
        # bottom-k shape as the quantile sketch
        "set_overlap_customers",
    }
    TINY_DERIVED_TABLE = {
        # global cumsum over the bucket-count table (|buckets| rows,
        # operators/chunking.py docstring)
        "pack_sequences",
        # same packer over BPE token counts — same tiny bucket table
        "bpe_tokenize_and_pack",
        # PSI bin table (n_bins rows, operators/corpus.py)
        "quality_drift_by_source",
        # Gini rank/sum windows over the per-source rollup (|sources|
        # rows — a bounded dimension)
        "source_token_gini",
        # MoM lag over the month rollup (one row per calendar month —
        # a bounded dimension)
        "monthly_revenue_trend",
    }
    offenders = {}
    for name, (plan, n) in registry_plan_walk.items():
        if n == 0:
            continue
        if name in TINY_DERIVED_TABLE:
            continue
        if name in RANK_FILTER_RESCUED:
            assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan, (
                name,
                plan,
            )
            continue
        offenders[name] = n
    assert not offenders, offenders


def test_no_query_plans_a_cartesian_product(registry_plan_walk):
    """BLANKET gate: no registered query may plan a CartesianProduct.
    Cross joins are legal only when one side broadcasts (they plan as
    BroadcastNestedLoopJoin over a provably small side — query vectors,
    constants, scalar aggregates); a CartesianProduct means both sides
    are unbounded and the join is O(n·m) shuffle work at scale."""
    offenders = [
        name
        for name, (plan, _n) in registry_plan_walk.items()
        if "CartesianProduct" in plan
    ]
    assert not offenders, offenders


def test_attach_global_rank_handles_nulls_in_order_cols(spark):
    """NULL order keys: range partitioning and row_number agree on null
    ordering (NULLS FIRST for asc), so the distributed rank must equal
    the window on a column with nulls — and every row must survive the
    two-pass join (no silent drops)."""
    from pyspark.sql import Window

    from vector_io_spark.operators.ranks import attach_global_rank

    df = spark.range(0, 50).select(
        F.col("id"),
        F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id") % 5).alias("k"),
    )
    order = [F.col("k").asc(), F.col("id").asc()]
    got = (
        attach_global_rank(df, order, rank_col="rk", total_col="t")
        .orderBy("id")
        .collect()
    )
    assert len(got) == 50 and all(r["t"] == 50 for r in got)
    want = (
        df.select(
            "id", F.row_number().over(Window.orderBy(*order)).cast("long").alias("rk")
        )
        .orderBy("id")
        .collect()
    )
    assert [(r["id"], r["rk"]) for r in got] == [(r["id"], r["rk"]) for r in want]


def test_q4_envelope_pushdown_and_semi_join(spark, sf_dir):
    """Q4 shape: both the orders date window AND the derived lineitem
    envelope (min orderdate + 60d) must reach their parquet scans; the
    EXISTS decorrelates to a semi join, never a fact self-join."""
    from vector_io_spark.queries import QUERIES

    df = QUERIES["late_order_priority_check"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan
    assert "GreaterThan(l_shipdate,1996-03-01" in plan, plan
    assert "LeftSemi" in plan, plan
    assert_no_cartesian(df)


def test_q9_fact_joins_are_broadcast_except_orders(spark, sf_dir):
    """Q9 shape: part (name-filtered, pushed), supplier, nation all
    broadcast onto the lineitem scan; the only possible big-big edge is
    lineitem x orders; one group-by shuffle."""
    from vector_io_spark.queries import QUERIES

    df = QUERIES["profit_by_nation_year"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "StringStartsWith(p_name,red)" in plan, plan
    assert count_broadcast_joins(df) >= 3, plan
    assert count_shuffles(df) <= 2, plan


def test_q11_rollup_computes_once(spark, sf_dir):
    """Q11 shape: the per-part rollup is persisted and reused for the
    grand total — the scalar threshold broadcasts back, and lineitem is
    scanned at most twice (once per branch pre-persist materialization),
    never re-aggregated per comparison side."""
    from vector_io_spark.queries import QUERIES

    df = QUERIES["top_value_parts"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan, plan
    assert_no_cartesian(df)


def test_q20_single_fact_aggregation_chain(spark, sf_dir):
    """Q20 shape: filtered part broadcasts; the fact aggregates once on
    (partkey, suppkey) and the per-part total is a partitioned window
    (partkey shuffle) — no second scan of lineitem, no cartesian."""
    from vector_io_spark.queries import QUERIES

    df = QUERIES["excess_shipment_suppliers"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("lineitem.parquet") == 1, plan
    assert "StringStartsWith(p_name,small)" in plan, plan
    assert_no_cartesian(df)


def test_filtered_ann_pushes_label_predicate(spark, sf_dir):
    """Filtered vector search must pre-filter AT THE SCAN (exact
    semantics, file-prune-able) — never post-filter ranked results."""
    from vector_io_spark.queries import QUERIES

    df = QUERIES["ann_topk_filtered"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "In(label, [1,2])" in plan, plan
    assert_no_cartesian(df)
