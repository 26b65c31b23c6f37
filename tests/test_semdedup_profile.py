"""Tests for semantic dedup (operators/semdedup.py) and column profiling
(operators/aggregates.py::profile_columns)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.operators.aggregates import profile_columns
from vector_io_spark.operators.semdedup import semdedup


def test_semdedup_one_survivor_per_duplicate_group(spark, sf_dir):
    """Inject 3 exact copies of every vector: each identity group must
    keep exactly one member (the lowest id — identical vectors share a
    cell and have exactly equal c2c, so the tie-break decides)."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").limit(50)
    corpus = emb
    for off in (1_000_000, 2_000_000):
        corpus = corpus.unionByName(
            emb.select((F.col("vec_id") + off).alias("vec_id"), "embedding")
        )
    out = semdedup(corpus, threshold=0.999).cache()
    kept = out.where("keep").select((F.col("vec_id") % 1_000_000).alias("g"))
    # every group has >= 1 survivor and no identity group keeps 2+
    per_group = kept.groupBy("g").count().collect()
    assert len(per_group) == 50
    assert all(r["count"] == 1 for r in per_group)
    # survivors are the originals (lowest id in each all-identical group)
    assert out.where("keep AND vec_id >= 1000000").count() == 0
    out.unpersist()


def test_semdedup_null_vectors_excluded(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 64), (2, None)], "vec_id long, embedding array<float>"
    )
    out = semdedup(df)
    assert out.count() == 1


def test_profile_columns_exact_vs_approx(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount"]
    exact = {r["column"]: r for r in profile_columns(li, cols).collect()}
    approx = {r["column"]: r for r in profile_columns(li, cols, approx=True).collect()}
    n = li.count()
    for c in cols:
        assert exact[c]["n_rows"] == approx[c]["n_rows"] == n
        assert exact[c]["min_val"] == approx[c]["min_val"]
        assert exact[c]["max_val"] == approx[c]["max_val"]
        assert exact[c]["mean_val"] == approx[c]["mean_val"]
        # approx stats land within HLL/t-digest tolerance of exact
        assert abs(approx[c]["n_distinct"] - exact[c]["n_distinct"]) <= max(
            5, 0.1 * exact[c]["n_distinct"]
        )
        assert abs(approx[c]["p50"] - exact[c]["p50"]) <= max(
            1e-6, 0.05 * abs(exact[c]["p50"])
        )


def test_auto_num_planes_rule_matches_sql_replica():
    """The integer plane-count rule must agree with its DuckDB replica
    everywhere (incl. the bin('0') edge and exact powers of two, the
    zones where a float-log2 formulation would tie-break differently)."""
    import duckdb

    from vector_io_spark.operators.semdedup import auto_num_planes

    con = duckdb.connect()
    for n in [1, 63, 64, 65, 4000, 4096, 8192, 8193, 40000, 400000,
              2 ** 20, 2 ** 20 + 1, 10 ** 8]:
        sql = con.execute(
            f"SELECT greatest(8, length(bin(({n} + 63) // 64 - 1)))"
        ).fetchone()[0]
        assert auto_num_planes(n) == sql, n
    assert auto_num_planes(4000) == 8      # gate scale: unchanged oracle
    assert auto_num_planes(40_000) == 10   # sf0.1
    assert auto_num_planes(400_000) == 13  # sf10: 8192 cells, ~49/cell
