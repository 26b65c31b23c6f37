"""IVF similarity search + skew utilities."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.operators.similarity import brute_force_topk, ivf_topk
from vector_io_spark.operators.skew import salted_join, two_phase_agg


def test_ivf_topk_recall(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, num_cells=8, nprobe=4)
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    approx_rows = approx.collect()
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx_rows}
    # self-match always lands in its own cell -> rank 1 with score 1
    firsts = {r["query_id"]: r for r in approx_rows if r["rank"] == 1}
    for qid, r in firsts.items():
        assert r["vec_id"] == qid and abs(r["score"] - 1.0) < 1e-4
    # recall over the exact top-5 should be substantial with nprobe=half
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, f"recall {recall}"
    # scores of returned pairs are exact (match brute-force scores)
    exact_scores = {(r["query_id"], r["vec_id"]): r["score"] for r in exact.collect()}
    for r in approx_rows:
        key = (r["query_id"], r["vec_id"])
        if key in exact_scores:
            assert abs(r["score"] - exact_scores[key]) < 1e-9


def test_salted_join_matches_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    plain = li.join(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    )
    salted = salted_join(
        li, o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey",
        salt_buckets=8,
    )
    assert salted.count() == plain.count()
    a = plain.groupBy("l_orderkey").count().orderBy("l_orderkey").collect()
    b = salted.groupBy("l_orderkey").count().orderBy("l_orderkey").collect()
    assert a == b


def test_two_phase_agg_matches_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: (r["s"], r["n"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("s"),
            F.count("*").alias("n"),
            F.max("l_quantity").alias("mx"),
        )
        .collect()
    }
    two = {
        r["l_returnflag"]: (round(r["s"], 4), r["n"], r["mx"])
        for r in two_phase_agg(
            li,
            "l_returnflag",
            {"s": "sum(l_quantity)", "n": "count(*)", "mx": "max(l_quantity)"},
            salt_buckets=8,
        ).collect()
    }
    assert set(plain) == set(two)
    for k in plain:
        assert plain[k][1] == two[k][1] and plain[k][2] == two[k][2]
        assert abs(plain[k][0] - two[k][0]) < 1e-6


def test_pq_topk_recall_and_compression(spark, sf_dir):
    """PQ ADC: codes are M small ints; L2 ranking recall vs exact L2;
    the query's own vector (zero quantization error relative to others)
    should rank near the top."""
    import numpy as np

    from vector_io_spark.operators.similarity import (
        pq_encode, pq_topk, train_pq_codebooks,
    )

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")

    cb = train_pq_codebooks(emb, num_subspaces=8, codebook_size=16)
    assert cb.shape == (8, 16, 8)  # 64-dim / 8 subspaces
    coded = pq_encode(emb, cb).select("vec_id", "pq_code").collect()
    assert all(len(r["pq_code"]) == 8 for r in coded)
    assert all(0 <= c < 16 for r in coded for c in r["pq_code"])

    # finer quantization (2-dim subspaces) for the recall check: the
    # synthetic embeddings are near-uniform, so neighbor contrast is
    # small and coarse codes can't order it
    approx = pq_topk(emb, queries, k=5, num_subspaces=32, codebook_size=64)
    rows = approx.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2, 3, 4}
    assert all(r["adc_dist"] >= 0 for r in rows)

    # exact L2 top-5 via numpy on the same data
    data = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in data])
    mat = np.vstack([r["embedding"] for r in data]).astype(np.float64)
    exact_set = set()
    for r in queries.collect():
        d2 = ((mat - np.asarray(r["embedding"], dtype=np.float64)) ** 2).sum(axis=1)
        for vid in ids[np.argsort(d2, kind="stable")[:5]]:
            exact_set.add((r["query_id"], int(vid)))
    approx_set = {(r["query_id"], r["vec_id"]) for r in rows}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"recall {recall}"


def test_ivfpq_topk_recall(spark, sf_dir):
    """IVF+PQ composition: self-match should surface (its cell is always
    probed; residual code error is small near the centroid) and recall vs
    exact L2 should be substantial at nprobe=half."""
    import numpy as np

    from vector_io_spark.operators.similarity import ivfpq_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    rows = ivfpq_topk(
        emb, queries, k=5, num_cells=8, nprobe=4,
        num_subspaces=32, codebook_size=64,
    ).collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2, 3, 4}

    data = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in data])
    mat = np.vstack([r["embedding"] for r in data]).astype(np.float64)
    exact_set = set()
    for r in queries.collect():
        d2 = ((mat - np.asarray(r["embedding"], dtype=np.float64)) ** 2).sum(axis=1)
        for vid in ids[np.argsort(d2, kind="stable")[:5]]:
            exact_set.add((r["query_id"], int(vid)))
    approx_set = {(r["query_id"], r["vec_id"]) for r in rows}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, f"recall {recall}"
    # every query's own vector must be found (rank 1 by construction of
    # residual coding: ADC error ~ quantization noise, dist near 0)
    firsts = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert firsts == {q: q for q in range(5)}


def test_mmr_diversifies_and_keeps_relevance_order(spark):
    """A corpus with a cluster of 3 near-identical high-relevance vectors
    plus 2 distinct moderate ones: plain top-4 takes the whole clone
    cluster; MMR must pick 1 clone then reach for the distinct vectors.
    Also: pick 1 is the plain argmax, ranks are 1..k, and a
    single-candidate query still returns its one row."""
    import math

    from vector_io_spark.operators.similarity import mmr_topk

    q = [1.0, 0.0, 0.0, 0.0]
    clone = [0.99, 0.14, 0.0, 0.0]   # ~cos 0.990 to q, mutually ~1.0
    clone2 = [0.99, 0.141, 0.0, 0.0]
    clone3 = [0.99, 0.139, 0.0, 0.0]
    distinct1 = [0.8, 0.0, 0.6, 0.0]  # cos 0.8 to q, ~0.79 to clones
    distinct2 = [0.8, 0.0, 0.0, 0.6]
    rows = [
        (10, clone), (11, clone2), (12, clone3),
        (20, distinct1), (21, distinct2),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, q)], "query_id long, embedding array<double>"
    )
    out = mmr_topk(corpus, queries, k=4, shortlist=5, lam=0.5).collect()
    assert [r["mmr_rank"] for r in sorted(out, key=lambda r: r["mmr_rank"])] == [
        1, 2, 3, 4,
    ]
    picked = [r["vec_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]
    # pick 1 = plain argmax (a clone); picks 2 and 3 must be the two
    # distinct vectors — a plain top-4 would have taken all three clones
    assert picked[0] in (10, 11, 12)
    assert set(picked[1:3]) == {20, 21}, picked
    assert sum(1 for v in picked if v in (10, 11, 12)) == 2

    # scores are the documented formula over rounded sims
    r1 = next(r for r in out if r["mmr_rank"] == 1)
    qsim_clone = round(
        sum(a * b for a, b in zip(q, [0.99, 0.14, 0.0, 0.0]))
        / (math.sqrt(sum(a * a for a in q))
           * math.sqrt(sum(b * b for b in [0.99, 0.14, 0.0, 0.0]))),
        6,
    )
    if r1["vec_id"] == 10:
        assert r1["mmr_score"] == 0.5 * qsim_clone

    # single-candidate query: shortlist of 1 still yields one row
    one = mmr_topk(
        corpus.where(F.col("vec_id") == 20), queries, k=4, shortlist=5
    ).collect()
    assert len(one) == 1 and one[0]["vec_id"] == 20 and one[0]["mmr_rank"] == 1


def test_hard_negatives_exclude_same_label_and_rank_correctly(spark, sf_dir):
    from vector_io_spark.operators.similarity import hard_negatives

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).selectExpr(
        "vec_id as query_id", "embedding", "label"
    )
    out = hard_negatives(emb, queries, k=5).collect()
    qlabels = {r["query_id"]: r["label"] for r in queries.collect()}
    assert len(out) == 15
    for r in out:
        assert r["neg_label"] != qlabels[r["query_id"]]
    # per query: ranks 1..5, scores non-increasing
    from collections import defaultdict

    per_q = defaultdict(list)
    for r in out:
        per_q[r["query_id"]].append(r)
    for rows in per_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_ivf_index_partition_pruned_probe(spark, sf_dir, tmp_path):
    """Persisted IVF layout: cell dirs on disk, probe scan's plan prunes
    partitions to the probed cells only, recall vs brute force holds."""
    import os

    from vector_io_spark.operators.similarity import (
        brute_force_topk,
        ivf_index_probe_topk,
        write_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path, num_cells=8, seed=7)
    # hive-style cell directories exist
    cell_dirs = [d for d in os.listdir(f"{path}/cells") if d.startswith("cell=")]
    assert len(cell_dirs) >= 4, cell_dirs

    queries = (
        emb.where(F.col("vec_id") < 5)
        .selectExpr("vec_id as query_id", "embedding")
    )
    got = ivf_index_probe_topk(spark, path, queries, k=5, nprobe=4)
    # plan gate: the cells scan carries a PartitionFilter on cell
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan

    exact = brute_force_topk(emb, queries, k=5)
    hits = got.select("query_id", "vec_id").intersect(
        exact.select("query_id", "vec_id")
    )
    recall = hits.count() / exact.count()
    assert recall >= 0.6, recall
    # self-match always survives (its own cell is always probed)
    self_rows = got.where(F.col("query_id") == F.col("vec_id"))
    assert self_rows.count() == 5


def test_ivf_index_append_assigns_correct_cells_and_is_probe_visible(
    spark, sf_dir, tmp_path
):
    """Incremental maintenance: build the index on half the corpus,
    append the other half. Every appended row must land in the argmin
    cell of the STORED centroids (no retrain), total row count must be
    the union, and a probe must surface appended rows (self-match for an
    appended query id) with partition pruning intact."""
    import numpy as np

    from vector_io_spark.operators.similarity import (
        append_to_ivf_index,
        ivf_index_probe_topk,
        write_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = emb.where(F.col("vec_id") % 2 == 0)
    delta = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(old, path, num_cells=8, seed=7)
    n_before = spark.read.parquet(f"{path}/cells").count()
    append_to_ivf_index(delta, path, delta_token="odd-half")

    cells = spark.read.parquet(f"{path}/cells")
    assert cells.count() == n_before + delta.count() == emb.count()

    # appended rows sit in the argmin cell of the stored centroids
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    cent = np.zeros((len(cent_rows), len(cent_rows[0]["centroid"])))
    for r in cent_rows:
        cent[r["cell"]] = r["centroid"]
    odd = cells.where(F.col("vec_id") % 2 == 1).collect()
    assert odd
    for r in odd[:50]:
        v = np.asarray(r["embedding"], dtype=np.float64)
        want = int(((v[None, :] - cent) ** 2).sum(axis=1).argmin())
        assert r["cell"] == want, (r["vec_id"], r["cell"], want)

    # probe with an APPENDED vector as the query: the self-match must
    # surface (its cell is always probed), proving delta visibility
    queries = delta.where(F.col("vec_id") < 10).selectExpr(
        "vec_id as query_id", "embedding"
    )
    got = ivf_index_probe_topk(spark, path, queries, k=5, nprobe=4)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan
    nq = queries.count()
    assert got.where(F.col("query_id") == F.col("vec_id")).count() == nq


def test_multiprobe_lsh_recall_dominates_single_probe(spark, sf_dir):
    """Multi-probe LSH (flip-1 query-side perturbations) must recall a
    SUPERSET of the single-probe candidates (its probe set contains the
    original keys), lift recall vs brute-force truth, and expand ONLY
    the query side — corpus banding identical."""
    from vector_io_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = brute_force_topk(emb, queries, k=5)
    plain = lsh_bucketed_topk(emb, queries, k=5, num_planes=32, bands=4)
    multi = lsh_bucketed_topk(
        emb, queries, k=5, num_planes=32, bands=4, multiprobe=1
    )

    t = {(r["query_id"], r["vec_id"]) for r in truth.collect()}
    p = {(r["query_id"], r["vec_id"]) for r in plain.collect()}
    m = {(r["query_id"], r["vec_id"]) for r in multi.collect()}
    recall_p = len(p & t) / len(t)
    recall_m = len(m & t) / len(t)
    # probe superset => recall can only go up (pairs can also displace
    # weaker candidates out of top-k, so compare against truth overlap)
    assert recall_m >= recall_p, (recall_m, recall_p)
    # with 8-bit bands, flip-1 probing should strictly help at this SF
    assert recall_m > recall_p, (recall_m, recall_p)
    # self-match survives in both
    for got in (p, m):
        for qid in range(20):
            assert (qid, qid) in got


def test_ann_recall_floors_at_sf01(spark):
    """Absolute recall@10 floors for every approximate ANN path at
    sf0.1 (40k vectors, 32 queries), pinned alongside the timings in
    BASELINE.md — so a geometry/typo regression that silently trades
    recall for speed fails here. The sf0.1 synthetic embeddings are
    near-uniform (neighbors barely angularly concentrated — adversarial
    for LSH pruning; see BASELINE.md round 4 for the sf1 numbers on
    clustered data), so the floors are deliberately conservative but
    non-trivial. All methods are deterministic (md5 planes, fixed
    seeds), so the floors are stable, not flaky."""
    from pyspark.sql import functions as F

    from vector_io_spark.functions.vectors import quantize_embeddings
    from vector_io_spark.operators.similarity import (
        brute_force_topk,
        hamming_topk,
        ivf_topk,
        ivfpq_topk,
        lsh_bucketed_topk,
        pq_topk,
    )

    sf = "/root/testdata/sf0.1"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    def recall(approx, exact):
        num = sum(len(approx.get(q, set()) & w) for q, w in exact.items())
        den = sum(len(w) for w in exact.values())
        return num / den

    exact_cos = sets(brute_force_topk(emb, queries, k=10))
    exact_l2 = sets(brute_force_topk(emb, queries, k=10, metric="euclid"))

    lsh = recall(sets(lsh_bucketed_topk(
        emb, queries, k=10, num_planes=128, bands=8)), exact_cos)
    lsh_mp = recall(sets(lsh_bucketed_topk(
        emb, queries, k=10, num_planes=128, bands=8, multiprobe=1)),
        exact_cos)
    assert lsh >= 0.05, lsh
    assert lsh_mp >= lsh, (lsh_mp, lsh)
    assert recall(sets(ivf_topk(
        emb, queries, k=10, num_cells=16, nprobe=4, sample_fraction=0.5)),
        exact_cos) >= 0.5
    assert recall(sets(ivfpq_topk(
        emb, queries, k=10, num_cells=16, nprobe=4, num_subspaces=16,
        codebook_size=64, max_train_rows=20_000)), exact_cos) >= 0.30
    assert recall(sets(pq_topk(
        emb, queries, k=10, num_subspaces=16, codebook_size=64,
        max_train_rows=20_000)), exact_l2) >= 0.35
    packed = quantize_embeddings(
        emb, "embedding", "packed", precision="ubinary"
    ).select("vec_id", "packed")
    qp = quantize_embeddings(
        queries, "embedding", "packed", precision="ubinary"
    ).select("query_id", "packed")
    assert recall(sets(hamming_topk(packed, qp, k=10)), exact_cos) >= 0.15


def test_round6_half_up_matches_spark_round(spark):
    """The kernel's rounding replica must equal Spark F.round(x, 6)
    including on DYADIC halfway values (k/2^n that land exactly on a
    6-decimal midpoint, e.g. 1/128 = 0.0078125 — where naive
    floor(x*1e6+0.5) and banker's np.round both have failure modes)
    and on negatives (HALF_UP is away from zero)."""
    import numpy as np

    from pyspark.sql import functions as F

    from vector_io_spark.operators.similarity import _round6_half_up

    vals = [
        0.0078125, -0.0078125,          # 1/128: exact 6-decimal midpoint
        0.5078125, -0.5078125,          # 65/128
        0.1234565, -0.1234565,          # non-representable near-midpoint
        0.9999995, 1e-7, -1e-7, 0.0,
        0.123456789, -0.987654321, 12345.6789012,
        # large-magnitude 6-decimal midpoints (round-5): ULP of x*1e6
        # exceeds the old fixed 4e-9 band here, so these only pass with
        # the magnitude-scaled risky band routing them through decimal
        12345678.1234565, -12345678.1234565,
        987654.3210985, -987654.3210985,
        54321.1234565, 1234567890.1234565,
    ]
    got = _round6_half_up(np.array(vals, dtype=np.float64))
    want = [
        r["r"]
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round("x", 6).alias("r"))
        .collect()
    ]
    assert list(got) == want, list(zip(vals, got, want))
    # NaN passes through
    assert np.isnan(_round6_half_up(np.array([np.nan]))[0])


def test_bounded_query_guard_on_all_query_collect_paths(
    spark, tmp_path, monkeypatch
):
    """Round-5 contract: EVERY query-side driver collect in the
    similarity family (brute kernel, PQ/IVFPQ LUT builders, the
    persisted-IVF probe planner) shares one bounded-driver-state guard —
    a corpus-sized "query" frame raises a loud ValueError naming the
    caller instead of silently OOMing the driver. The cap is patched
    small so the test stays cheap; the guard reads it at call time."""
    import pytest

    from vector_io_spark.operators import similarity

    monkeypatch.setattr(similarity, "MAX_QUERY_ROWS", 20)

    dim = 8
    vec = F.array(*[(F.col("id") + F.lit(float(j))).cast("double")
                    for j in range(dim)])
    corpus = spark.range(64).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    big_queries = spark.range(25).select(
        F.col("id").alias("query_id"), vec.alias("embedding")
    )

    with pytest.raises(ValueError, match="brute_force_topk.*exceeds 20"):
        similarity.brute_force_topk(
            corpus, big_queries, k=3, impl="kernel"
        ).collect()
    with pytest.raises(ValueError, match="pq_topk.*exceeds 20"):
        similarity.pq_topk(
            corpus, big_queries, k=3, num_subspaces=2, codebook_size=4,
            max_train_rows=64,
        ).collect()
    with pytest.raises(ValueError, match="ivfpq_topk.*exceeds 20"):
        similarity.ivfpq_topk(
            corpus, big_queries, k=3, num_cells=4, nprobe=2,
            num_subspaces=2, codebook_size=4, max_train_rows=64,
        ).collect()

    idx = str(tmp_path / "ivf_idx")
    similarity.write_ivf_index(
        corpus, idx, num_cells=4, max_train_rows=64
    )
    with pytest.raises(ValueError, match="ivf_index_probe_topk.*exceeds 20"):
        similarity.ivf_index_probe_topk(
            spark, idx, big_queries, k=3, nprobe=2
        ).collect()

    # the cap is a guard, not a behavior change: a small batch still works
    small = big_queries.limit(3)
    assert similarity.pq_topk(
        corpus, small, k=3, num_subspaces=2, codebook_size=4,
        max_train_rows=64,
    ).count() > 0


def test_brute_force_topk_kernel_hof_agree_on_undefined_scores(spark):
    """Round-5 contract: impl='kernel' and impl='hof' return IDENTICAL
    rows including the undefined-score corner — NULL vectors and
    zero-norm cosine rows are emitted with NULL score and ranked
    NULLS-LAST (smallest-id tie-break), so a query with fewer than k
    scoreable corpus rows still returns k rows. Previously the kernel
    dropped them and hof ranked asc-metric NULLs FIRST."""
    from vector_io_spark.operators.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
            (4, None),                    # NULL vector
            (5, [0.0, 0.0, 0.0, 0.0]),    # zero norm: cosine undefined
            (6, None),                    # second NULL vector
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])],
        "query_id long, embedding array<double>",
    )

    for metric in ("cosine", "euclid"):
        hof = [
            tuple(r)
            for r in brute_force_topk(
                corpus, queries, k=5, metric=metric, impl="hof"
            ).orderBy("rank").collect()
        ]
        kern = [
            tuple(r)
            for r in brute_force_topk(
                corpus, queries, k=5, metric=metric, impl="kernel"
            ).orderBy("rank").collect()
        ]
        assert kern == hof, (metric, kern, hof)
        assert len(kern) == 5
        # scoreable rows first, NULL scores fill the tail in id order
        scores = [r[2] for r in kern]
        n_def = 4 if metric == "euclid" else 3  # zero-norm scores under L2
        assert all(s is not None for s in scores[:n_def])
        assert all(s is None for s in scores[n_def:])
        null_ids = [r[1] for r in kern if r[2] is None]
        assert null_ids == sorted(null_ids)


def test_knn_graph_batched_equals_single_pass(spark):
    """Round-5: the batched full-corpus kNN-graph driver must produce
    EXACTLY the single-pass result (batches partition the query set;
    each pass scans the full corpus), across batch counts."""
    import hashlib

    from vector_io_spark.operators.similarity import brute_force_topk, knn_graph

    def vec(i):
        h = hashlib.md5(f"v{i}".encode()).digest()
        return [float(b) / 255.0 + 0.01 for b in h[:8]]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    single = brute_force_topk(
        corpus,
        corpus.select(F.col("vec_id").alias("query_id"), "embedding"),
        k=3, exclude_self=True,
    )
    want = {tuple(r) for r in single.collect()}
    for bs in (50_000, 100):  # 1 batch, then 3+ hash batches
        got = {
            tuple(r)
            for r in knn_graph(corpus, k=3, batch_size=bs).collect()
        }
        assert got == want, bs


def test_ivfpq_index_probe_matches_from_scratch(spark, sf_dir, tmp_path):
    """Persisted IVF+PQ catalog: probing the written index must return
    EXACTLY the rows of the ad-hoc ivfpq_topk on the same corpus /
    params / seed — build, encode, probe, and ADC all run through the
    shared kernels, and the codebook parquet round-trip is float-exact
    (array<double> storage)."""
    from vector_io_spark.operators.similarity import (
        ivfpq_index_probe_topk,
        ivfpq_topk,
        write_ivfpq_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 8).selectExpr(
        "vec_id as query_id", "embedding"
    )
    params = dict(num_cells=8, num_subspaces=8, codebook_size=16)
    scratch = ivfpq_topk(
        emb, queries, k=5, nprobe=3, seed=11, **params
    )
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(emb, path, seed=11, **params)
    indexed = ivfpq_index_probe_topk(spark, path, queries, k=5, nprobe=3)

    def rows(df):
        return sorted(
            (r["query_id"], r["vec_id"], r["adc_dist"], r["rank"])
            for r in df.collect()
        )

    assert rows(indexed) == rows(scratch)
    # plan gate: the codes scan prunes to the probed cell directories
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan


def test_ivfpq_index_append_is_probe_visible_no_retrain(spark, sf_dir, tmp_path):
    """Delta append encodes against the STORED artifacts: appended ids
    surface in probes (self-match at rank 1 — its own cell is always
    probed and its own code is its ADC argmin), counts are the union,
    and the codebooks/centroids files are byte-identical post-append."""
    import os

    from vector_io_spark.operators.similarity import (
        append_to_ivfpq_index,
        ivfpq_index_probe_topk,
        write_ivfpq_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = emb.where(F.col("vec_id") % 2 == 0)
    delta = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(
        old, path, num_cells=8, num_subspaces=8, codebook_size=16, seed=11
    )
    cent_mtime = {
        f: os.path.getmtime(os.path.join(f"{path}/codebooks", f))
        for f in os.listdir(f"{path}/codebooks")
    }
    n_before = spark.read.parquet(f"{path}/cells").count()
    append_to_ivfpq_index(delta, path, delta_token="odd-half")
    assert (
        spark.read.parquet(f"{path}/cells").count()
        == n_before + delta.count()
        == emb.count()
    )
    # append never touches the trained artifacts
    assert cent_mtime == {
        f: os.path.getmtime(os.path.join(f"{path}/codebooks", f))
        for f in os.listdir(f"{path}/codebooks")
    }
    queries = delta.where(F.col("vec_id") < 11).selectExpr(
        "vec_id as query_id", "embedding"
    )
    got = ivfpq_index_probe_topk(spark, path, queries, k=5, nprobe=4)
    nq = queries.count()
    assert got.where(F.col("query_id") == F.col("vec_id")).count() == nq


def test_pq_exact_catalog_roundtrip_is_value_exact(spark, sf_dir, tmp_path):
    """Engine-exact PQ catalog: ranking from the persisted all-BIGINT
    codes/codebook parquet must equal retraining ad-hoc row for row —
    the pytest half of the ann_topk_pq_exact_catalog oracle pairing
    (there DuckDB retrains from scratch to the same ranking)."""
    from vector_io_spark.operators.pq_exact import (
        pq_adc_topk,
        pq_adc_topk_from_index,
        write_pq_exact_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 6).selectExpr(
        "vec_id as query_id", "embedding"
    )
    scratch = pq_adc_topk(emb, queries, k=7)
    path = str(tmp_path / "pq_exact_index")
    write_pq_exact_index(emb, path)
    indexed = pq_adc_topk_from_index(spark, path, queries, k=7)

    def rows(df):
        return sorted(
            (r["query_id"], r["vec_id"], r["dist"], r["rk"])
            for r in df.collect()
        )

    assert rows(indexed) == rows(scratch)
    # the persisted artifacts are pure BIGINT (value-exact round-trip)
    for leaf, cols in (("codes", {"vec_id", "s", "code"}),
                       ("codebook", {"s", "c", "j", "cq"})):
        schema = spark.read.parquet(f"{path}/{leaf}").schema
        assert {f.name for f in schema} == cols, (leaf, schema)
        assert all(f.dataType.simpleString() == "bigint" for f in schema), (
            leaf, schema,
        )


def test_ivfpq_index_stats_counts_and_delta(spark, sf_dir, tmp_path):
    """The maintenance audit: per-cell counts sum to the corpus, shares
    sum to 1, imbalance_factor = max*cells/total, and on a streaming
    store the delta_share separates post-seed arrivals from residents."""
    from vector_io_spark.operators.similarity import (
        append_to_ivfpq_index,
        ivfpq_index_stats,
        write_ivfpq_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = emb.where(F.col("vec_id") % 2 == 0)
    delta = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(
        old, path, num_cells=8, num_subspaces=8, codebook_size=16, seed=11
    )
    rows = ivfpq_index_stats(spark, path).collect()
    assert sum(r["n_vectors"] for r in rows) == old.count()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    mx = max(r["n_vectors"] for r in rows)
    # imbalance uses the TRAINED nlist (8), not the occupied-cell count
    # — empty cells ARE imbalance
    want_if = round(mx * 8 / old.count(), 4)
    assert all(abs(r["imbalance_factor"] - want_if) < 1e-3 for r in rows)
    # static layout: no batch level -> delta_share identically 0
    assert all(r["delta_share"] == 0.0 for r in rows)

    # streaming-store shape via the seed + appended batch partitions
    from vector_io_spark.streaming.incremental import (
        seed_ivfpq_stream_index,
    )

    sroot = str(tmp_path / "stream_store")
    seed_ivfpq_stream_index(
        old, sroot, num_cells=8, num_subspaces=8, codebook_size=16, seed=11
    )
    # emulate one ingested micro-batch partition
    from vector_io_spark.operators.similarity import (
        _ivfpq_encode_udf,
        _load_ivfpq_artifacts,
    )

    cents, cb = _load_ivfpq_artifacts(spark, sroot)
    enc = _ivfpq_encode_udf(cents, cb)
    (
        delta.select(F.col("vec_id"), enc(F.col("embedding")).alias("__cc"))
        .select(
            "vec_id",
            F.col("__cc.cell").alias("cell"),
            F.col("__cc.code").alias("code"),
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{sroot}/cells/ingest_batch=0")
    )
    srows = ivfpq_index_stats(spark, sroot).collect()
    assert sum(r["n_vectors"] for r in srows) == emb.count()
    got_delta = sum(
        round(r["delta_share"] * r["n_vectors"]) for r in srows
    )
    assert got_delta == delta.count()


def test_ivfpq_append_same_token_is_retry_idempotent(spark, sf_dir, tmp_path):
    """VERDICT r6 'What's wrong' #1: re-running a delta append (job-level
    retry) must REPLACE that delta's code rows, never double them —
    doubled codes put duplicate ids into top-k and inflate the cell
    counts feeding the imbalance trigger. Append the same delta twice
    under one token: counts, probe results, and ivfpq_index_stats must
    equal the appended-once state. A missing/invalid token raises."""
    import pytest

    from vector_io_spark.operators.similarity import (
        append_to_ivfpq_index,
        ivfpq_index_probe_topk,
        ivfpq_index_stats,
        write_ivfpq_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = emb.where(F.col("vec_id") % 2 == 0)
    delta = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(
        old, path, num_cells=8, num_subspaces=8, codebook_size=16, seed=11
    )

    with pytest.raises(ValueError, match="delta_token"):
        append_to_ivfpq_index(delta, path)
    with pytest.raises(ValueError, match="delta_token"):
        append_to_ivfpq_index(delta, path, delta_token="bad token/..")

    queries = emb.where(F.col("vec_id") < 9).selectExpr(
        "vec_id as query_id", "embedding"
    )

    def state():
        stats = sorted(
            (r["cell"], r["n_vectors"], r["imbalance_factor"])
            for r in ivfpq_index_stats(spark, path).collect()
        )
        probe = sorted(
            (r["query_id"], r["vec_id"], r["adc_dist"], r["rank"])
            for r in ivfpq_index_probe_topk(
                spark, path, queries, k=5, nprobe=4
            ).collect()
        )
        return stats, probe

    append_to_ivfpq_index(delta, path, delta_token="batch-001")
    once = state()
    assert spark.read.parquet(f"{path}/cells").count() == emb.count()

    # retry: same token, repartitioned input (different staged file
    # layout) — end state must be byte-for-byte the appended-once state
    append_to_ivfpq_index(
        delta.repartition(7), path, delta_token="batch-001"
    )
    assert spark.read.parquet(f"{path}/cells").count() == emb.count()
    assert state() == once

    # a DIFFERENT token is a different delta: rows do add
    append_to_ivfpq_index(
        delta.limit(10), path, delta_token="batch-002"
    )
    assert spark.read.parquet(f"{path}/cells").count() == emb.count() + 10

    # r7 review fix: a token that is a dash-prefix of another must NOT
    # clear the other's files (startswith("delta-batch-0-") would also
    # match "delta-batch-002-..."; the clear is exact-name now)
    append_to_ivfpq_index(delta.limit(7), path, delta_token="batch-0")
    n_with_both = spark.read.parquet(f"{path}/cells").count()
    assert n_with_both == emb.count() + 10 + 7
    append_to_ivfpq_index(delta.limit(7), path, delta_token="batch-0")
    assert spark.read.parquet(f"{path}/cells").count() == n_with_both
    # no hidden staging dirs survive
    import os

    leftovers = [
        d for d in os.listdir(f"{path}/cells") if d.startswith(".delta-")
    ]
    assert leftovers == [], leftovers


def test_ivf_append_same_token_is_retry_idempotent(spark, sf_dir, tmp_path):
    """IVF twin of the retry-idempotency contract: same token twice ==
    once, for the raw-vector cell layout."""
    from vector_io_spark.operators.similarity import (
        append_to_ivf_index,
        ivf_index_probe_topk,
        write_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = emb.where(F.col("vec_id") % 2 == 0)
    delta = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(old, path, num_cells=8, seed=7)

    append_to_ivf_index(delta, path, delta_token="2026-08-15")
    queries = delta.where(F.col("vec_id") < 10).selectExpr(
        "vec_id as query_id", "embedding"
    )

    def probe_rows():
        return sorted(
            (r["query_id"], r["vec_id"], r["score"], r["rank"])
            for r in ivf_index_probe_topk(
                spark, path, queries, k=5, nprobe=4
            ).collect()
        )

    once_n = spark.read.parquet(f"{path}/cells").count()
    once_probe = probe_rows()
    assert once_n == emb.count()

    append_to_ivf_index(delta, path, delta_token="2026-08-15")
    assert spark.read.parquet(f"{path}/cells").count() == once_n
    assert probe_rows() == once_probe


def test_rebuild_ivfpq_if_drifted_acts_only_past_budget(
    spark, sf_dir, tmp_path
):
    """The stats->threshold->rebuild composition (VERDICT r6 Next #3):
    an iid delta leaves imbalance under budget -> no rebuild; a shifted
    delta (the BASELINE.md drift recipe: +1.5 on the first 8 dims)
    piles into a few stale cells, trips the budget, and the rebuild —
    geometry read from the persisted artifacts, never caller-supplied —
    brings imbalance back under it."""
    from vector_io_spark.operators.similarity import (
        append_to_ivfpq_index,
        rebuild_ivfpq_if_drifted,
        write_ivfpq_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = emb.where(F.col("vec_id") % 2 == 0)
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(
        old, path, num_cells=8, num_subspaces=8, codebook_size=16, seed=11
    )

    # iid delta: same distribution, no drift -> decision is "keep"
    iid = emb.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") % 4 == 1))
    append_to_ivfpq_index(iid, path, delta_token="iid")
    corpus1 = old.unionByName(iid)
    got = rebuild_ivfpq_if_drifted(
        spark, path, corpus1, imbalance_budget=3.0
    )
    assert got["rebuilt"] is False
    assert got["imbalance_after"] is None
    assert got["nlist"] == 8
    assert got["imbalance_before"] <= 3.0

    # shifted delta (the BASELINE.md drift recipe, amplified for the
    # tiny sf0.001 corpus: 3x replicated, +2.0 on every dim) -> the
    # whole delta piles into whichever stale cell sits nearest the
    # shifted domain, tripping the budget
    shifted = (
        emb.where(F.col("vec_id") % 4 == 3)
        .select(
            "vec_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("rep"),
            "embedding",
        )
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias(
                "vec_id"
            ),
            F.expr(
                "transform(embedding, x -> float(x + 2.0d))"
            ).alias("embedding"),
        )
    )
    append_to_ivfpq_index(shifted, path, delta_token="shifted")
    corpus2 = corpus1.unionByName(shifted)

    # r8 (VERDICT r7 Next #6): a rebuild must restore PROBE RECALL on
    # the shifted distribution, not only the imbalance number — a buggy
    # rebuild could rebalance the cells while mis-ranking (e.g. dropped
    # codebook residuals). Snapshot recall@10 of shifted queries on the
    # APPENDED index, then require the rebuilt index to match or beat
    # it (both sides deterministic: md5-seeded k-means, fixed iters).
    from vector_io_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_index_probe_topk,
    )

    shifted_queries = shifted.where(
        F.col("vec_id") < 1_000_100
    ).selectExpr("vec_id as query_id", "embedding")

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    truth = sets(
        brute_force_topk(corpus2, shifted_queries, k=10, metric="euclid")
    )

    def probe_recall():
        approx = sets(ivfpq_index_probe_topk(
            spark, path, shifted_queries, k=10, nprobe=4
        ))
        num = sum(len(approx.get(q, set()) & w) for q, w in truth.items())
        return num / sum(len(w) for w in truth.values())

    recall_appended = probe_recall()

    got2 = rebuild_ivfpq_if_drifted(
        spark, path, corpus2, imbalance_budget=3.0
    )
    assert got2["rebuilt"] is True, got2
    assert got2["imbalance_before"] > 3.0, got2
    assert got2["imbalance_after"] <= 3.0, got2
    # the rebuilt index covers the full current corpus
    assert spark.read.parquet(f"{path}/cells").count() == corpus2.count()
    recall_rebuilt = probe_recall()
    assert recall_rebuilt >= recall_appended, (
        f"rebuild REGRESSED shifted-query recall: "
        f"{recall_appended} -> {recall_rebuilt}"
    )


def test_probe_paths_return_empty_typed_result_for_empty_queries(
    spark, sf_dir, tmp_path
):
    """ADVICE r6: every catalog/probe path must short-circuit an empty
    query frame into an empty, correctly-typed result — mirroring
    brute_force_topk — instead of crashing in np.vstack([])."""
    from vector_io_spark.operators.similarity import (
        ivf_index_probe_topk,
        ivfpq_index_probe_topk,
        ivfpq_topk,
        pq_topk,
        write_ivf_index,
        write_ivfpq_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    none = emb.where(F.lit(False)).selectExpr(
        "vec_id as query_id", "embedding"
    )

    pq_path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(
        emb, pq_path, num_cells=4, num_subspaces=8, codebook_size=16, seed=11
    )
    got = ivfpq_index_probe_topk(spark, pq_path, none, k=5)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == [
        "query_id", "vec_id", "adc_dist", "rank",
    ]

    ivf_path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, ivf_path, num_cells=4, seed=7)
    got = ivf_index_probe_topk(spark, ivf_path, none, k=5)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == [
        "query_id", "vec_id", "score", "rank",
    ]

    got = ivfpq_topk(
        emb, none, k=5, num_cells=4, num_subspaces=8, codebook_size=16
    )
    assert got.count() == 0

    got = pq_topk(emb, none, k=5, num_subspaces=8, codebook_size=16)
    assert got.count() == 0


def test_rebuild_ivf_if_drifted_twin(spark, sf_dir, tmp_path):
    """The plain-IVF rebuild twin shares the contract: iid delta ->
    keep; amplified shifted delta -> rebuild, imbalance back under
    budget, rebuilt store covers the full corpus."""
    from vector_io_spark.operators.similarity import (
        append_to_ivf_index,
        rebuild_ivf_if_drifted,
        write_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = emb.where(F.col("vec_id") % 2 == 0)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(old, path, num_cells=8, seed=7)

    iid = emb.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") % 4 == 1))
    append_to_ivf_index(iid, path, delta_token="iid")
    got = rebuild_ivf_if_drifted(
        spark, path, old.unionByName(iid), imbalance_budget=3.0
    )
    assert got["rebuilt"] is False and got["nlist"] == 8

    shifted = (
        emb.where(F.col("vec_id") % 4 == 3)
        .select(
            "vec_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("rep"),
            "embedding",
        )
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias(
                "vec_id"
            ),
            F.expr(
                "transform(embedding, x -> float(x + 2.0d))"
            ).alias("embedding"),
        )
    )
    append_to_ivf_index(shifted, path, delta_token="shifted")
    corpus = old.unionByName(iid).unionByName(shifted)
    got2 = rebuild_ivf_if_drifted(spark, path, corpus, imbalance_budget=3.0)
    assert got2["rebuilt"] is True, got2
    assert got2["imbalance_before"] > 3.0, got2
    assert got2["imbalance_after"] <= 3.0, got2
    assert spark.read.parquet(f"{path}/cells").count() == corpus.count()


def test_filtered_topk_restricts_to_matching_metadata(spark, sf_dir):
    """filtered_topk == brute_force_topk over the predicate-restricted
    corpus, per query; every returned neighbor shares the query's
    filter value; a NULL filter value matches nothing; a missing
    filter column raises."""
    import pytest

    from vector_io_spark.operators.similarity import filtered_topk

    emb = load(spark, sf_dir, "embeddings")  # vec_id, embedding, label
    queries = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    got = filtered_topk(emb, queries, k=5, filter_cols=("label",))
    rows = got.collect()

    # neighbor labels match the query's label, and per-query results
    # equal brute force over that label's sub-corpus
    qlabels = {r["query_id"]: r["label"] for r in queries.collect()}
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    for r in rows:
        assert labels[r["vec_id"]] == qlabels[r["query_id"]]
    for qid, lab in qlabels.items():
        sub = emb.where(F.col("label") == lab)
        want = sorted(
            (r["vec_id"], r["score"], r["rank"])
            for r in brute_force_topk(
                sub,
                queries.where(F.col("query_id") == qid).select(
                    "query_id", "embedding"
                ),
                k=5,
            ).collect()
        )
        have = sorted(
            (r["vec_id"], r["score"], r["rank"])
            for r in rows
            if r["query_id"] == qid
        )
        assert have == want, qid

    # NULL filter value matches nothing
    nullq = spark.createDataFrame(
        [(999, [0.0] * 64, None)],
        "query_id long, embedding array<float>, label int",
    )
    assert filtered_topk(emb, nullq, k=5).count() == 0

    # missing filter column raises loudly
    with pytest.raises(ValueError, match="filter column"):
        filtered_topk(emb, queries.drop("label"), k=5)


def test_filtered_ivfpq_index_probe_pushes_predicate(spark, sf_dir, tmp_path):
    """Filtered ANN against the persisted catalog (r7): metadata_cols
    persist next to the codes; a probe `where` predicate (a) restricts
    results to matching rows with PRE-filter semantics — identical to
    probing an index holding only the matching rows under the same
    artifacts — (b) pushes into the parquet code scan (PushedFilters),
    and (c) deltas must carry the store's metadata columns (missing ->
    loud error; present -> filtered probes see the delta)."""
    import shutil

    import pytest

    from vector_io_spark.operators.similarity import (
        append_to_ivfpq_index,
        ivfpq_index_probe_topk,
        write_ivfpq_index,
    )

    emb = load(spark, sf_dir, "embeddings")  # vec_id, embedding, label
    old = emb.where(F.col("vec_id") % 2 == 0)
    path = str(tmp_path / "ivfpq_meta_index")
    write_ivfpq_index(
        old, path, num_cells=8, num_subspaces=8, codebook_size=16,
        seed=11, metadata_cols=("label",),
    )
    lab = old.select("label").first()[0]
    queries = emb.where(F.col("vec_id") < 6).selectExpr(
        "vec_id as query_id", "embedding"
    )

    got = ivfpq_index_probe_topk(
        spark, path, queries, k=5, nprobe=8, where=f"label = {lab}"
    )
    rows = got.collect()
    labels = {r["vec_id"]: r["label"] for r in old.collect()}
    assert rows and all(labels[r["vec_id"]] == lab for r in rows)
    # (b) the predicate reaches the parquet scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "label" in plan, plan

    # (a) pre-filter semantics == probing a matching-rows-only index
    # under the SAME artifacts (copy artifacts, filter the codes)
    sub = str(tmp_path / "ivfpq_sub_index")
    import os

    os.makedirs(sub)
    for leaf in ("centroids", "codebooks"):
        shutil.copytree(f"{path}/{leaf}", f"{sub}/{leaf}")
    (
        spark.read.parquet(f"{path}/cells")
        .where(F.col("label") == lab)
        .write.partitionBy("cell")
        .parquet(f"{sub}/cells")
    )
    want = sorted(
        (r["query_id"], r["vec_id"], r["adc_dist"], r["rank"])
        for r in ivfpq_index_probe_topk(
            spark, sub, queries, k=5, nprobe=8
        ).collect()
    )
    have = sorted(
        (r["query_id"], r["vec_id"], r["adc_dist"], r["rank"]) for r in rows
    )
    assert have == want

    # (c) delta metadata contract
    delta = emb.where(F.col("vec_id") % 2 == 1)
    with pytest.raises(ValueError, match="metadata columns"):
        append_to_ivfpq_index(
            delta.drop("label"), path, delta_token="d1"
        )
    append_to_ivfpq_index(delta, path, delta_token="d1")
    lab_delta_ids = {
        r["vec_id"]
        for r in delta.where(F.col("label") == lab)
        .select("vec_id")
        .collect()
    }
    dq = delta.where(
        (F.col("label") == lab) & (F.col("vec_id") < 50)
    ).selectExpr("vec_id as query_id", "embedding")
    if dq.count():
        got2 = ivfpq_index_probe_topk(
            spark, path, dq, k=3, nprobe=8, where=f"label = {lab}"
        )
        selfs = got2.where(F.col("query_id") == F.col("vec_id")).collect()
        assert {r["vec_id"] for r in selfs} <= lab_delta_ids
        assert len(selfs) == dq.count()

    # r7 review fix: a triggered rebuild must PRESERVE the persisted
    # metadata columns (filtered probes keep working), and a corpus
    # missing them must raise instead of silently dropping them
    from vector_io_spark.operators.similarity import (
        rebuild_ivfpq_if_drifted,
    )

    full = emb.select("vec_id", "embedding", "label")
    with pytest.raises(ValueError, match="metadata columns"):
        rebuild_ivfpq_if_drifted(
            spark, path, full.drop("label"), imbalance_budget=0.0
        )
    got3 = rebuild_ivfpq_if_drifted(
        spark, path, full, imbalance_budget=0.0  # force via tiny budget
    )
    assert got3["rebuilt"] is True
    schema = {f.name for f in spark.read.parquet(f"{path}/cells").schema}
    assert "label" in schema, schema
    post = ivfpq_index_probe_topk(
        spark, path, queries, k=5, nprobe=8, where=f"label = {lab}"
    ).collect()
    assert post and all(
        labels.get(r["vec_id"], lab) == lab for r in post
    )


def test_filtered_ivf_index_probe(spark, sf_dir, tmp_path):
    """IVF twin of the filtered catalog probe: metadata persists beside
    the raw vectors, where= pre-filters with pushdown, deltas must
    carry the metadata, and results equal probing a matching-rows-only
    index under the same centroids."""
    import os
    import shutil

    import pytest

    from vector_io_spark.operators.similarity import (
        append_to_ivf_index,
        ivf_index_probe_topk,
        write_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    old = emb.where(F.col("vec_id") % 2 == 0)
    path = str(tmp_path / "ivf_meta_index")
    write_ivf_index(
        old, path, num_cells=8, seed=7, metadata_cols=("label",)
    )
    lab = old.select("label").first()[0]
    queries = emb.where(F.col("vec_id") < 6).selectExpr(
        "vec_id as query_id", "embedding"
    )
    got = ivf_index_probe_topk(
        spark, path, queries, k=5, nprobe=8, where=f"label = {lab}"
    )
    rows = got.collect()
    labels = {r["vec_id"]: r["label"] for r in old.collect()}
    assert rows and all(labels[r["vec_id"]] == lab for r in rows)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "label" in plan, plan

    sub = str(tmp_path / "ivf_sub_index")
    os.makedirs(sub)
    shutil.copytree(f"{path}/centroids", f"{sub}/centroids")
    (
        spark.read.parquet(f"{path}/cells")
        .where(F.col("label") == lab)
        .write.partitionBy("cell")
        .parquet(f"{sub}/cells")
    )
    want = sorted(
        (r["query_id"], r["vec_id"], r["score"], r["rank"])
        for r in ivf_index_probe_topk(
            spark, sub, queries, k=5, nprobe=8
        ).collect()
    )
    assert sorted(
        (r["query_id"], r["vec_id"], r["score"], r["rank"]) for r in rows
    ) == want

    delta = emb.where(F.col("vec_id") % 2 == 1)
    with pytest.raises(ValueError, match="metadata columns"):
        append_to_ivf_index(delta.drop("label"), path, delta_token="d1")
    append_to_ivf_index(delta, path, delta_token="d1")
    assert spark.read.parquet(f"{path}/cells").where(
        "label is null"
    ).count() == 0


def test_ivf_append_and_rebuild_with_renamed_vec_and_metadata(
    spark, sf_dir, tmp_path
):
    """r7 review round 2: (a) a non-default corpus_vec name must not be
    misclassified as metadata (append previously produced a duplicate
    column and crashed); (b) rebuild_ivf_if_drifted preserves the
    store's metadata columns like its IVFPQ twin and refuses a corpus
    missing them."""
    import pytest

    from vector_io_spark.operators.similarity import (
        append_to_ivf_index,
        ivf_index_probe_topk,
        rebuild_ivf_if_drifted,
        write_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "embedding as vector", "label"
    )
    old = emb.where(F.col("vec_id") % 2 == 0)
    path = str(tmp_path / "ivf_renamed")
    write_ivf_index(
        old, path, corpus_vec="vector", num_cells=8, seed=7,
        metadata_cols=("label",),
    )
    # (a) append with the renamed vector column works and keeps metadata
    delta = emb.where(F.col("vec_id") % 2 == 1)
    append_to_ivf_index(
        delta, path, corpus_vec="vector", delta_token="d1"
    )
    cells = spark.read.parquet(f"{path}/cells")
    assert cells.count() == emb.count()
    assert cells.where("label is null").count() == 0
    assert {f.name for f in cells.schema} == {
        "vec_id", "vector", "label", "cell",
    }

    # (b) rebuild preserves metadata; missing metadata raises
    with pytest.raises(ValueError, match="metadata columns"):
        rebuild_ivf_if_drifted(
            spark, path, emb.drop("label"), corpus_vec="vector",
            imbalance_budget=0.0,
        )
    got = rebuild_ivf_if_drifted(
        spark, path, emb, corpus_vec="vector", imbalance_budget=0.0
    )
    assert got["rebuilt"] is True
    cells = spark.read.parquet(f"{path}/cells")
    assert "label" in {f.name for f in cells.schema}
    lab = emb.select("label").first()[0]
    got_probe = ivf_index_probe_topk(
        spark, path, emb.where(F.col("vec_id") < 4).selectExpr(
            "vec_id as query_id", "vector as embedding"
        ),
        k=3, nprobe=8, corpus_vec="vector", where=f"label = {lab}",
    )
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    rows = got_probe.collect()
    assert rows and all(labels[r["vec_id"]] == lab for r in rows)


def test_compact_index_cells_collapses_files_probe_invariant(
    spark, sf_dir, tmp_path
):
    """Static-index file compaction (r7): token appends accumulate
    files per cell; compaction collapses them to row-count-sized files
    while filtered probe results and stats stay byte-identical;
    metadata columns survive; a half-finished swap self-repairs;
    streaming stores are refused."""
    import os
    import shutil

    import pytest

    from vector_io_spark.operators.similarity import (
        append_to_ivfpq_index,
        compact_index_cells,
        ivfpq_index_probe_topk,
        ivfpq_index_stats,
        write_ivfpq_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    old = emb.where(F.col("vec_id") % 4 == 0)
    path = str(tmp_path / "ivfpq_compact")
    write_ivfpq_index(
        old, path, num_cells=8, num_subspaces=8, codebook_size=16,
        seed=11, metadata_cols=("label",),
    )
    for i, m in enumerate((1, 2, 3)):
        append_to_ivfpq_index(
            emb.where(F.col("vec_id") % 4 == m), path,
            delta_token=f"day-{i}",
        )
    lab = old.select("label").first()[0]
    queries = emb.where(F.col("vec_id") < 6).selectExpr(
        "vec_id as query_id", "embedding"
    )

    def state():
        probe = sorted(
            (r["query_id"], r["vec_id"], r["adc_dist"], r["rank"])
            for r in ivfpq_index_probe_topk(
                spark, path, queries, k=5, nprobe=8,
                where=f"label = {lab}",
            ).collect()
        )
        stats = sorted(
            (r["cell"], r["n_vectors"], r["imbalance_factor"])
            for r in ivfpq_index_stats(spark, path).collect()
        )
        return probe, stats

    before = state()
    got = compact_index_cells(spark, path)
    assert got["rows"] == emb.count()
    assert got["files_after"] < got["files_before"], got
    assert got["files_after"] <= 8  # <=1 per cell at this size
    assert state() == before
    schema = {f.name for f in spark.read.parquet(f"{path}/cells").schema}
    assert "label" in schema

    # half-finished swap repairs: simulate crash-after-rename-aside
    os.rename(
        os.path.join(path, "cells"), os.path.join(path, ".cells-aside")
    )
    got2 = compact_index_cells(spark, path)
    assert got2["rows"] == emb.count()
    assert state() == before

    # streaming layout refused
    sroot = str(tmp_path / "stream_store")
    os.makedirs(os.path.join(sroot, "cells", "ingest_batch=-1"))
    shutil.copytree(
        os.path.join(path, "cells"),
        os.path.join(sroot, "cells", "ingest_batch=-1"),
        dirs_exist_ok=True,
    )
    with pytest.raises(ValueError, match="STREAMING store"):
        compact_index_cells(spark, sroot)


def test_static_index_maintenance_mutex_and_token_ledger(
    spark, sf_dir, tmp_path
):
    """Round-8 (VERDICT r7 Next #3 + ADVICE r8 medium): static-index
    maintenance ops are mutually exclusive via a ``_MAINT-<op>-…``
    marker in the index root, and token appends keep a ``_DELTA-<token>``
    commit ledger that survives compaction — a token retry spanning a
    compaction must be a no-op, not a silent re-append (the compactor
    folds the token's files into anonymous names, so 'no files present'
    proves nothing)."""
    import os
    import time

    import pytest

    from vector_io_spark.operators.similarity import (
        append_to_ivfpq_index,
        compact_index_cells,
        write_ivfpq_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = emb.where(F.col("vec_id") % 2 == 0)
    delta = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq_maint")
    write_ivfpq_index(
        old, path, num_cells=8, num_subspaces=8, codebook_size=16, seed=11
    )
    total = emb.count()

    def n_rows():
        return spark.read.parquet(f"{path}/cells").count()

    # (a) a fresh compaction marker blocks an append, and vice versa
    compact_blocker = os.path.join(path, "_MAINT-compact-999-deadbeef")
    with open(compact_blocker, "w"):
        pass
    with pytest.raises(RuntimeError, match="maintenance in flight"):
        append_to_ivfpq_index(delta, path, delta_token="d1")
    os.remove(compact_blocker)
    append_blocker = os.path.join(path, "_MAINT-append-777-cafe0000")
    with open(append_blocker, "w"):
        pass
    with pytest.raises(RuntimeError, match="maintenance in flight"):
        compact_index_cells(spark, path)

    # (b) stale markers (crashed holder) are cleared and the op proceeds
    old_t = time.time() - 7200.0
    os.utime(append_blocker, (old_t, old_t))
    append_to_ivfpq_index(delta, path, delta_token="d1")
    assert not os.path.exists(append_blocker)
    assert n_rows() == total
    ledger = os.path.join(path, "cells", "_DELTA-d1")
    assert os.path.exists(ledger), "commit ledger marker missing"
    # the op releases its own marker on completion
    assert not [
        f for f in os.listdir(path) if f.startswith("_MAINT-")
    ]

    # (c) committed-token retry is a pure no-op (rows never transiently
    # removed, never doubled)
    append_to_ivfpq_index(delta, path, delta_token="d1")
    assert n_rows() == total

    # (d) ADVICE r8 repro: the ledger survives compaction's swap, so a
    # token retry SPANNING a compaction stays a no-op instead of
    # re-appending the whole delta
    got = compact_index_cells(spark, path)
    assert got["rows"] == total
    assert os.path.exists(ledger), "ledger lost across compaction swap"
    append_to_ivfpq_index(delta, path, delta_token="d1")
    assert n_rows() == total, (
        "token retry after compaction duplicated the delta"
    )

    # (e) a genuinely new token still appends after compaction
    d2 = delta.limit(5).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    append_to_ivfpq_index(d2, path, delta_token="d2")
    assert n_rows() == total + 5


def test_probe_return_cols_payload_passthrough(spark, sf_dir, tmp_path):
    """r9 (VERDICT r8 Missing #1 / Next #1a+#3): every persisted
    catalog probe returns requested payload columns WITH its hits —
    reference parity for Pinecone include_metadata / Qdrant
    with_payload — without any join-back against the corpus. Checks
    all three catalogs (IVF, IVFPQ, exact-PQ), value correctness
    against the corpus, composition with `where`, and the loud errors
    for unknown/colliding columns."""
    import pytest

    from vector_io_spark.operators.pq_exact import (
        pq_adc_topk_from_index,
        write_pq_exact_index,
    )
    from vector_io_spark.operators.similarity import (
        ivf_index_probe_topk,
        ivfpq_index_probe_topk,
        write_ivf_index,
        write_ivfpq_index,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    truth = {r["vec_id"]: r["label"] for r in emb.collect()}
    queries = emb.where(F.col("vec_id") < 5).selectExpr(
        "vec_id as query_id", "embedding"
    )

    def check(df, score_col):
        rows = df.collect()
        assert rows, "probe returned nothing"
        assert [f.name for f in df.schema.fields] == [
            "query_id", "vec_id", score_col, "rank", "label",
        ]
        for r in rows:
            assert r["label"] == truth[r["vec_id"]], r
        return rows

    # IVF: payload rides the pruned cells scan
    ivf_path = str(tmp_path / "ivf_payload")
    write_ivf_index(
        emb, ivf_path, num_cells=8, seed=7, metadata_cols=("label",)
    )
    check(
        ivf_index_probe_topk(
            spark, ivf_path, queries, k=5, nprobe=4,
            return_cols=("label",),
        ),
        "score",
    )
    # ... and the plan still partition-prunes
    got = ivf_index_probe_topk(
        spark, ivf_path, queries, k=5, nprobe=4, return_cols=("label",)
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    # composes with where (pre-filter semantics: only matching labels)
    lab = truth[0]
    fil = ivf_index_probe_topk(
        spark, ivf_path, queries, k=5, nprobe=8,
        where=f"label = {lab}", return_cols=("label",),
    ).collect()
    assert fil and all(r["label"] == lab for r in fil)
    # loud errors: unknown column / collision with output names
    with pytest.raises(ValueError, match="not persisted"):
        ivf_index_probe_topk(
            spark, ivf_path, queries, k=5, return_cols=("nope",)
        )
    with pytest.raises(ValueError, match="collide"):
        ivf_index_probe_topk(
            spark, ivf_path, queries, k=5, return_cols=("vec_id",)
        )

    # IVFPQ: payload rides the pruned code scan through the ADC kernel
    ivfpq_path = str(tmp_path / "ivfpq_payload")
    write_ivfpq_index(
        emb, ivfpq_path, num_cells=8, num_subspaces=8, codebook_size=16,
        seed=7, metadata_cols=("label",),
    )
    check(
        ivfpq_index_probe_topk(
            spark, ivfpq_path, queries, k=5, nprobe=4,
            return_cols=("label",),
        ),
        "adc_dist",
    )

    # exact-PQ: payload from the meta side table via a broadcast of
    # the bounded hit frame
    pq_path = str(tmp_path / "pq_payload")
    write_pq_exact_index(
        emb, pq_path, num_subspaces=8, codebook_size=8,
        metadata_cols=("label",),
    )
    got = pq_adc_topk_from_index(
        spark, pq_path, queries, k=5, return_cols=("label",)
    )
    rows = got.collect()
    assert rows and [f.name for f in got.schema.fields] == [
        "query_id", "vec_id", "dist", "rk", "label",
    ]
    for r in rows:
        assert r["label"] == truth[r["vec_id"]], r
    # an index built WITHOUT metadata refuses return_cols loudly
    pq_bare = str(tmp_path / "pq_bare")
    write_pq_exact_index(emb, pq_bare, num_subspaces=8, codebook_size=8)
    with pytest.raises(ValueError, match="meta side table"):
        pq_adc_topk_from_index(
            spark, pq_bare, queries, k=5, return_cols=("label",)
        )


def test_suggest_nprobe_rule():
    """r9: the measured filtered-probe sizing rule as API. Pins the
    arithmetic against the round-8 sweep scenarios and the exact-
    fallback threshold."""
    import pytest

    from vector_io_spark.operators.similarity import suggest_nprobe

    # unfiltered 40k-row corpus, 16 cells, k=10: one cell holds 2.5k
    # rows >= 200 candidates -> nprobe=1 suffices
    got = suggest_nprobe(40_000, 16, k=10)
    assert got["nprobe"] == 1 and not got["use_exact_fallback"]

    # the r8 cliff scenario: 1% selectivity, 40k rows, 16 cells ->
    # 25 matching rows/cell; the 200-candidate floor needs nprobe=8
    got = suggest_nprobe(40_000, 16, k=10, selectivity=0.01)
    assert got["nprobe"] == 8
    assert got["expected_matching_candidates"] == 200.0
    assert not got["use_exact_fallback"]

    # monotone: tighter selectivity never lowers nprobe
    ns = [
        suggest_nprobe(40_000, 16, k=10, selectivity=s)["nprobe"]
        for s in (1.0, 0.5, 0.1, 0.05, 0.01, 0.005)
    ]
    assert ns == sorted(ns)

    # so selective that even nprobe=nlist scans < 20k matching rows:
    # recommend the exact filtered_topk fallback (nprobe clamps)
    got = suggest_nprobe(40_000, 16, k=10, selectivity=0.001)
    assert got["nprobe"] == 16 and got["use_exact_fallback"]

    with pytest.raises(ValueError):
        suggest_nprobe(0, 16)
    with pytest.raises(ValueError):
        suggest_nprobe(100, 16, selectivity=0.0)


def test_index_delete_tombstones(spark, sf_dir, tmp_path):
    """r9: delete-by-id completes the persisted catalogs' CRUD surface.
    Tombstones suppress rows from every probe immediately; compaction
    applies them physically and clears exactly what it folded; retries
    are no-ops; appends intersecting a live tombstone raise; rebuilds
    clear stale tombstones; streaming stores and mixed delete columns
    are refused."""
    import os

    import pytest

    from vector_io_spark.operators.pq_exact import (
        pq_adc_topk_from_index,
        write_pq_exact_index,
    )
    from vector_io_spark.operators.similarity import (
        append_to_ivf_index,
        brute_force_topk,
        compact_index_cells,
        delete_from_index,
        ivf_index_probe_topk,
        ivfpq_index_probe_topk,
        write_ivf_index,
        write_ivfpq_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 5).selectExpr(
        "vec_id as query_id", "embedding"
    )
    dead = [10, 11, 12, 13, 14, 15]
    alive = emb.where(~F.col("vec_id").isin(dead))

    # ---- IVF: delete -> probe omits; exhaustive probe == brute over
    # the remaining corpus (same scores, same ranks)
    path = str(tmp_path / "ivf_del")
    write_ivf_index(emb, path, num_cells=8, seed=7)
    delete_from_index(spark, path, dead, delete_token="d1")

    def rows(df):
        return sorted(
            (r["query_id"], r["vec_id"], r["score"], r["rank"])
            for r in df.collect()
        )

    got = ivf_index_probe_topk(spark, path, queries, k=10, nprobe=8)
    want = rows(brute_force_topk(alive, queries, k=10))
    assert rows(got) == want
    assert not {r[1] for r in rows(got)} & set(dead)
    # plan: anti-join present, partition pruning intact
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "PartitionFilters" in plan, plan

    # retry of the same token is a no-op; a second token composes
    delete_from_index(spark, path, dead, delete_token="d1")
    delete_from_index(spark, path, [16], delete_token="d2")
    alive2 = emb.where(~F.col("vec_id").isin(dead + [16]))
    got2 = ivf_index_probe_topk(spark, path, queries, k=10, nprobe=8)
    assert rows(got2) == rows(brute_force_topk(alive2, queries, k=10))

    # mixed delete columns refused (store has vec_id tombstones)
    with pytest.raises(ValueError, match="one store uses one"):
        delete_from_index(
            spark, path, [1], id_col="embedding", delete_token="d3"
        )

    # appends intersecting a live tombstone raise; disjoint appends ok
    dlt = emb.where(F.col("vec_id").isin([10, 200]))
    with pytest.raises(ValueError, match="live tombstone"):
        append_to_ivf_index(
            dlt.withColumn("vec_id", F.col("vec_id")), path,
            delta_token="bad-readd",
        )
    ok_delta = emb.limit(3).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    append_to_ivf_index(ok_delta, path, delta_token="ok-delta")

    # compaction applies tombstones physically and clears them
    got_c = compact_index_cells(spark, path)
    assert got_c["tombstones_applied"] == 2
    assert not os.path.exists(os.path.join(path, "tombstones")) or not [
        d for d in os.listdir(os.path.join(path, "tombstones"))
        if d.startswith("del-")
    ]
    cells_ids = {
        r["vec_id"] for r in spark.read.parquet(f"{path}/cells").collect()
    }
    assert not cells_ids & set(dead + [16])
    got3 = ivf_index_probe_topk(spark, path, queries, k=10, nprobe=8)
    assert rows(got3) == rows(
        brute_force_topk(
            alive2.unionByName(ok_delta), queries, k=10
        )
    )
    # after compaction the formerly-tombstoned id can re-append
    re_add = emb.where(F.col("vec_id") == 10)
    append_to_ivf_index(re_add, path, delta_token="re-add-10")

    # rebuild clears stale tombstones (re-inserted ids stay visible)
    delete_from_index(spark, path, [0], delete_token="d4")
    write_ivf_index(emb, path, num_cells=8, seed=7)
    assert not os.path.exists(os.path.join(path, "tombstones"))
    got4 = ivf_index_probe_topk(spark, path, queries, k=10, nprobe=8)
    assert rows(got4) == rows(brute_force_topk(emb, queries, k=10))

    # ---- IVFPQ: same contract through the ADC kernel
    pq_path = str(tmp_path / "ivfpq_del")
    write_ivfpq_index(
        emb, pq_path, num_cells=8, num_subspaces=8, codebook_size=16,
        seed=11,
    )
    before = ivfpq_index_probe_topk(
        spark, pq_path, queries, k=10, nprobe=8
    ).collect()
    assert {r["vec_id"] for r in before} & set(dead)
    delete_from_index(spark, pq_path, dead, delete_token="d1")
    after = ivfpq_index_probe_topk(
        spark, pq_path, queries, k=10, nprobe=8
    ).collect()
    assert not {r["vec_id"] for r in after} & set(dead)
    assert all(len({r["query_id"] for r in after if r["rank"] == i}) == 5
               for i in (1, 10))

    # ---- exact-PQ codes layout: probe-time apply, rebuild clears
    pqe_path = str(tmp_path / "pq_exact_del")
    write_pq_exact_index(emb, pqe_path, num_subspaces=8, codebook_size=8)
    delete_from_index(spark, pqe_path, dead, delete_token="d1")
    hits = pq_adc_topk_from_index(spark, pqe_path, queries, k=10).collect()
    assert hits and not {r["vec_id"] for r in hits} & set(dead)

    # ---- streaming store refused
    sroot = str(tmp_path / "stream_store")
    os.makedirs(os.path.join(sroot, "cells", "ingest_batch=-1"))
    import shutil

    shutil.copytree(
        os.path.join(path, "cells"),
        os.path.join(sroot, "cells", "ingest_batch=-1"),
        dirs_exist_ok=True,
    )
    with pytest.raises(ValueError, match="STREAMING"):
        delete_from_index(spark, sroot, [1], delete_token="d1")


def test_maint_lock_atomic_claim_and_heartbeat(spark, tmp_path):
    """Round-9 (ADVICE r8 medium ×2): the maintenance mutex is ONE
    fixed-name ``_MAINT-LOCK`` claimed with atomic createNewFile —
    (a) a second taker against a held lock always loses (the old
    unique-name re-check protocol could let BOTH proceed); (b) a stale
    lock is reclaimed and re-acquired; (c) the heartbeat refreshes the
    lock's mtime so a long run is never reaped as crashed, and raises
    loudly if the lock vanished (reaped during a pause) so the holder
    aborts BEFORE any destructive swap."""
    import os
    import time

    import pytest

    from vector_io_spark.operators.similarity import (
        _refresh_maint_marker,
        _take_maint_marker,
    )

    root = str(tmp_path / "idx")
    lock = _take_maint_marker(spark, root, "compact", timeout_s=3600.0)
    lock_file = os.path.join(root, "_MAINT-LOCK")
    assert os.path.exists(lock_file)

    # (a) mutual exclusion: any second taker raises while the lock is
    # fresh, whatever op it is
    for op in ("append", "compact"):
        with pytest.raises(RuntimeError, match="maintenance in flight"):
            _take_maint_marker(spark, root, op, timeout_s=3600.0)

    # (c) heartbeat refreshes the mtime (staleness clock)
    old_t = time.time() - 3000.0
    os.utime(lock_file, (old_t, old_t))
    before = os.path.getmtime(lock_file)
    _refresh_maint_marker(spark, lock, "compact")
    assert os.path.getmtime(lock_file) > before + 1000.0
    # ... and still blocks a contender after the refresh
    with pytest.raises(RuntimeError, match="maintenance in flight"):
        _take_maint_marker(spark, root, "append", timeout_s=3600.0)

    # (b) a stale lock (crashed holder) is reclaimed atomically and the
    # new taker acquires
    old_t = time.time() - 7200.0
    os.utime(lock_file, (old_t, old_t))
    lock2 = _take_maint_marker(spark, root, "append", timeout_s=3600.0)
    assert os.path.exists(lock_file)

    # (c) lost-lock abort: the original holder's next heartbeat sees
    # its lock was reaped/replaced... simulate full loss instead (the
    # replaced-lock case is indistinguishable by design; the timeout
    # contract is that heartbeat gaps stay under timeout_s)
    fs_lock2 = lock2
    spark._jvm  # noqa: B018 — keep the gateway warm for the delete
    os.remove(lock_file)
    with pytest.raises(RuntimeError, match="disappeared"):
        _refresh_maint_marker(spark, fs_lock2, "append")


def test_filtered_probe_recall_floor(spark, sf_dir, tmp_path):
    """Round-8 (VERDICT r7 Next #2): recall floors for FILTERED probes
    against both persisted catalogs, vs the exact filtered_topk truth.
    The hazard is silent: `where` thins candidates AFTER cell pruning,
    so a selective predicate can leave the probed cells holding < k
    matches. Pins (sf0.1 sweep, tools/ann_recall.py): (a) moderate
    selectivity floors at nprobe=4; (b) the monotone rescue — raising
    nprobe to nlist lifts 1%-selectivity recall from ~0.35 to ≥0.75
    (ivfpq, ADC error remains) and to 1.0 exactly (raw-vector IVF at
    nprobe=nlist scores every matching row with the identical rounded
    cosine + tie-break as filtered_topk). Deterministic seeds."""
    from vector_io_spark.operators.similarity import (
        filtered_topk,
        ivf_index_probe_topk,
        ivfpq_index_probe_topk,
        write_ivf_index,
        write_ivfpq_index,
    )

    sf = "/root/testdata/sf0.1"
    emb = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", "embedding")
        .withColumn("sel2", (F.col("vec_id") % 2).cast("int"))
        .withColumn("sel100", (F.col("vec_id") % 100).cast("int"))
    )
    queries = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pq_path = str(tmp_path / "f_ivfpq")
    ivf_path = str(tmp_path / "f_ivf")
    write_ivfpq_index(
        emb, pq_path, num_cells=16, num_subspaces=16, codebook_size=64,
        max_train_rows=20_000, metadata_cols=("sel2", "sel100"),
    )
    write_ivf_index(
        emb, ivf_path, num_cells=16, max_train_rows=20_000,
        metadata_cols=("sel2", "sel100"),
    )

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    def rec(approx, exact):
        num = sum(len(approx.get(q, set()) & w) for q, w in exact.items())
        return num / sum(len(w) for w in exact.values())

    # (a) moderate selectivity (50%), nprobe=4
    truth50 = sets(filtered_topk(
        emb, queries.withColumn("sel2", F.lit(0).cast("int")),
        k=10, filter_cols=("sel2",),
    ))
    r_pq50 = rec(sets(ivfpq_index_probe_topk(
        spark, pq_path, queries, k=10, nprobe=4, where="sel2 = 0")), truth50)
    r_ivf50 = rec(sets(ivf_index_probe_topk(
        spark, ivf_path, queries, k=10, nprobe=4, where="sel2 = 0")), truth50)
    assert r_pq50 >= 0.30, r_pq50
    assert r_ivf50 >= 0.40, r_ivf50

    # (b) selective predicate (1%): nprobe=4 starves the candidates;
    # nprobe=nlist recovers per the documented rule
    truth1 = sets(filtered_topk(
        emb, queries.withColumn("sel100", F.lit(0).cast("int")),
        k=10, filter_cols=("sel100",),
    ))
    low_pq = rec(sets(ivfpq_index_probe_topk(
        spark, pq_path, queries, k=10, nprobe=4, where="sel100 = 0")), truth1)
    high_pq = rec(sets(ivfpq_index_probe_topk(
        spark, pq_path, queries, k=10, nprobe=16, where="sel100 = 0")), truth1)
    assert high_pq >= max(low_pq, 0.75), (low_pq, high_pq)
    high_ivf = sets(ivf_index_probe_topk(
        spark, ivf_path, queries, k=10, nprobe=16, where="sel100 = 0"))
    assert rec(high_ivf, truth1) == 1.0, "nprobe=nlist raw-IVF == exact"


def test_probe_paths_accept_string_query_ids(spark, sf_dir, tmp_path):
    """r8: probe frames type query ids from the CALLER's queries frame
    — a string-keyed query batch against a long-keyed corpus is legal
    (the maxsim token probe keys queries by 'qid#pos' composites and
    hit the old hardcoded-long path)."""
    from vector_io_spark.operators.similarity import (
        ivf_index_probe_topk,
        ivfpq_index_probe_topk,
        write_ivf_index,
        write_ivfpq_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.concat(F.lit("q#"), F.col("vec_id")).alias("query_id"),
        "embedding",
    )
    pq_path = str(tmp_path / "s_ivfpq")
    write_ivfpq_index(
        emb, pq_path, num_cells=4, num_subspaces=8, codebook_size=16, seed=3
    )
    got = ivfpq_index_probe_topk(spark, pq_path, queries, k=5, nprobe=2)
    assert got.count() == 15
    assert got.schema["query_id"].dataType.simpleString() == "string"

    ivf_path = str(tmp_path / "s_ivf")
    write_ivf_index(emb, ivf_path, num_cells=4, seed=3)
    got = ivf_index_probe_topk(spark, ivf_path, queries, k=5, nprobe=2)
    assert got.count() == 15
    assert got.schema["query_id"].dataType.simpleString() == "string"


def test_pq_train_packed_kernel_matches_exploded_formulation(spark):
    """r12 optimization pin: pq_train's single-pass Arrow Lloyd kernel
    (packed vectors, driver-held codebook, partial-sum combine) must be
    bit-identical to the original exploded (id, s, j, xq) shuffle
    formulation — same seeds, same integer argmin tie-break (smallest
    code), same round(sum/n) update, same empty-cluster carry-over.
    The fixture forces both edge shapes: duplicate seed vectors (so one
    centroid starts empty and must keep its previous coordinates) and
    exact distance ties (so the smallest-code tie-break is exercised)."""
    from vector_io_spark.operators.pq_exact import (
        _assign,
        _seed_centroids,
        _update,
        pq_train,
        quantized_subvectors,
    )

    dim, m, k, iters, scale = 8, 2, 4, 2, 1000
    sub_dim = dim // m
    # 10 ids over only THREE distinct vectors: any 4 md5-ranked seeds
    # must contain duplicates (pigeonhole), so at least one centroid
    # empties after the first assignment and must carry over; identical
    # vectors also force exact distance ties (smallest-code tie-break)
    vals = [[0.0] * dim, [1.0] * dim, [2.0] * 4 + [0.0] * 4]
    rows = [(i, vals[i % 3]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # reference: the pre-r12 exploded formulation, kept in-module for
    # the SQL oracle's documentation — run it step for step
    sub = quantized_subvectors(df, "vec_id", "embedding", sub_dim, scale)
    cent = _seed_centroids(sub, "vec_id", k)
    for _ in range(iters):
        assign = _assign(sub, cent, "vec_id")
        cent = _update(sub, assign, cent, "vec_id")
    want_codes = sorted(
        (r["vec_id"], r["s"], r["c"])
        for r in _assign(sub, cent, "vec_id").collect()
    )
    want_cent = sorted(
        (r["s"], r["c"], r["j"], r["cq"]) for r in cent.collect()
    )

    codes, cent_df = pq_train(
        df, "vec_id", "embedding", num_subspaces=m, codebook_size=k,
        iters=iters, scale=scale, dim=dim,
    )
    got_codes = sorted(
        (r["vec_id"], r["s"], r["code"]) for r in codes.collect()
    )
    got_cent = sorted(
        (r["s"], r["c"], r["j"], r["cq"]) for r in cent_df.collect()
    )
    assert got_codes == want_codes
    assert got_cent == want_cent


def test_ivf_exact_packed_distance_matches_exploded_formulation(spark):
    """r12 optimization pin: ivf_exact_topk's packed candidate distance
    (one zip_with integer fold per (query, id) pair) must rank
    bit-identically to the pre-r12 exploded (id, s, j, xq) formulation
    (join ×dim + aggregate sum). The fixture forces exact distance ties
    (duplicate vectors) so the (dist, id) tie-break ordering is
    exercised, plus a query that is itself a corpus point (zero
    distance)."""
    from pyspark.sql import Window

    from vector_io_spark.operators.pq_exact import (
        ivf_exact_topk,
        pq_train,
        quantized_subvectors,
    )

    dim, cells_n, nprobe, iters, scale, k = 8, 3, 2, 2, 1000, 4
    vals = [
        [float(i % 4)] * dim for i in range(12)
    ]  # duplicate vectors -> exact distance ties
    rows = [(i, vals[i]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(100, [0.0] * dim), (101, [2.5] * dim)],
        "query_id long, embedding array<double>",
    )

    got = sorted(
        (r["query_id"], r["rk"], r["vec_id"], r["dist"])
        for r in ivf_exact_topk(
            df, queries, k=k, num_cells=cells_n, nprobe=nprobe,
            iters=iters, scale=scale, dim=dim,
        ).collect()
    )

    # reference: the pre-r12 exploded-relation distance stage, run on
    # the SAME trained quantizer (training itself is pinned by
    # test_pq_train_packed_kernel_matches_exploded_formulation)
    codes, cent = pq_train(
        df, num_subspaces=1, codebook_size=cells_n, iters=iters,
        scale=scale, dim=dim,
    )
    cells = codes.select("vec_id", F.col("code").alias("cell"))
    sub = quantized_subvectors(df, "vec_id", "embedding", dim, scale)
    qsub = quantized_subvectors(
        queries.select(F.col("query_id").alias("__qid"), "embedding"),
        "__qid", "embedding", dim, scale,
    )
    d2 = (F.col("xq") - F.col("cq")) * (F.col("xq") - F.col("cq"))
    qcell_dist = (
        qsub.join(F.broadcast(cent), ["s", "j"])
        .groupBy("__qid", "c")
        .agg(F.sum(d2).alias("cdist"))
    )
    wprobe = Window.partitionBy("__qid").orderBy(
        F.col("cdist").asc(), F.col("c").asc()
    )
    probes = (
        qcell_dist.withColumn("pr", F.row_number().over(wprobe))
        .where(F.col("pr") <= nprobe)
        .select("__qid", F.col("c").alias("cell"))
    )
    cand = cells.join(F.broadcast(probes), "cell")
    qv = qsub.groupBy("__qid").agg(
        F.map_from_arrays(
            F.collect_list("j"), F.collect_list("xq")
        ).alias("__qv")
    )
    pair_d2 = (F.col("xq") - F.col("__qv")[F.col("j")]) * (
        F.col("xq") - F.col("__qv")[F.col("j")]
    )
    dist = (
        sub.join(cand, "vec_id")
        .join(F.broadcast(qv), "__qid")
        .groupBy("__qid", "vec_id")
        .agg(F.sum(pair_d2).alias("dist"))
    )
    wk = Window.partitionBy("__qid").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    want = sorted(
        (r["__qid"], r["rk"], r["vec_id"], r["dist"])
        for r in dist.withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") <= k)
        .collect()
    )
    assert got == want and len(got) == 2 * k
