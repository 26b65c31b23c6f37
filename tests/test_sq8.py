"""IVF-SQ8 catalog (operators/sq8.py) — semantics SQL can't express:
recall floors of the quantized+pruned probe vs exact brute force,
composition with where / return_cols / tombstoned deletes, and the
empty-query typed result. Exact values are oracle-gated
(queries.py ann_topk_sq8_exact)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.operators.similarity import (
    brute_force_topk,
    delete_from_index,
)
from vector_io_spark.operators.sq8 import (
    sq8_index_probe_topk,
    write_sq8_index,
)


@pytest.fixture(scope="module")
def sq8_store(spark, sf_dir, tmp_path_factory):
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    path = str(tmp_path_factory.mktemp("sq8") / "idx")
    write_sq8_index(
        emb, path, num_cells=8, seed=7, metadata_cols=("label",)
    )
    return emb, path


def _queries(emb, n=8):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_sq8_recall_floor_vs_exact(spark, sf_dir, sq8_store):
    """Quantization (full scan, nprobe = num_cells) must keep recall@10
    near-perfect on this data — 8-bit per-dim error is far below the
    inter-neighbor score gaps; add cell pruning (nprobe=2/8) and recall
    stays above the same floor the other catalogs pin at this SF."""
    emb, path = sq8_store
    q = _queries(emb)
    exact = _sets(brute_force_topk(emb, q, k=10))
    quant = _sets(sq8_index_probe_topk(spark, path, q, k=10, nprobe=8))
    full_scan_recall = sum(
        len(exact[i] & quant[i]) / 10 for i in exact
    ) / len(exact)
    assert full_scan_recall >= 0.9, full_scan_recall

    pruned = _sets(sq8_index_probe_topk(spark, path, q, k=10, nprobe=2))
    pruned_recall = sum(
        len(exact[i] & pruned[i]) / 10 for i in exact
    ) / len(exact)
    assert pruned_recall >= 0.4, pruned_recall
    # pruning can only lose candidates relative to its own full scan
    assert all(pruned[i] <= quant[i] or len(pruned[i]) == 10 for i in pruned)


def test_sq8_partition_pruning_and_payload(spark, sf_dir, sq8_store):
    emb, path = sq8_store
    q = _queries(emb, n=4)
    got = sq8_index_probe_topk(
        spark, path, q, k=5, nprobe=2, return_cols=("label",)
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    truth = {r["vec_id"]: r["label"] for r in emb.collect()}
    rows = got.collect()
    assert rows
    assert got.columns == ["query_id", "vec_id", "score", "rank", "label"]
    for r in rows:
        assert r["label"] == truth[r["vec_id"]]

    # filtered probe: pre-filter semantics on persisted metadata
    fil = sq8_index_probe_topk(
        spark, path, q, k=5, nprobe=8, where="label = 3",
        return_cols=("label",),
    ).collect()
    assert fil and all(r["label"] == 3 for r in fil)

    with pytest.raises(ValueError, match="not persisted"):
        sq8_index_probe_topk(spark, path, q, k=5, return_cols=("nope",))


def test_sq8_tombstone_deletes_apply(spark, sf_dir, sq8_store, tmp_path):
    emb, path = sq8_store
    q = _queries(emb, n=4)
    before = _sets(sq8_index_probe_topk(spark, path, q, k=10, nprobe=8))
    victim = sorted(set().union(*before.values()))[0]
    delete_from_index(spark, path, [victim], delete_token="t-sq8")
    after = _sets(sq8_index_probe_topk(spark, path, q, k=10, nprobe=8))
    assert victim not in set().union(*after.values())


def test_sq8_empty_query_side_returns_typed_empty(spark, sf_dir, sq8_store):
    emb, path = sq8_store
    q = _queries(emb).where(F.lit(False))
    out = sq8_index_probe_topk(spark, path, q, k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "score", "rank"]


def test_sq8_bounds_drift_stats_flags_shifted_queries(
    spark, sf_dir, sq8_store
):
    """VERDICT r9 Next #7: bounds are train-time artifacts — the drift
    monitor must report the out-of-range component fraction and
    recommend a rebuild once a sample has drifted past the trained
    range, and stay quiet on in-range data."""
    from vector_io_spark.operators.sq8 import sq8_bounds_drift_stats

    emb, path = sq8_store

    # in-range: the training data itself — zero out-of-range components
    ok = sq8_bounds_drift_stats(spark, path, emb, "embedding").collect()[0]
    assert ok["out_components"] == 0
    assert ok["out_frac"] == 0.0
    assert ok["max_overshoot"] == 0.0
    assert not ok["rebuild_recommended"]
    assert ok["n_components"] == ok["n_vectors"] * 64

    # shifted: every component pushed one full span above the trained
    # max → all components out of range, overshoot >= 1 span
    shifted = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") * 3 + F.lit(50.0)
        ).alias("embedding"),
    )
    bad = sq8_bounds_drift_stats(
        spark, path, shifted, "embedding"
    ).collect()[0]
    assert bad["out_frac"] > 0.5
    assert bad["max_overshoot"] >= 1.0
    assert bad["rebuild_recommended"]

    # threshold is honored: with an absurd budget nothing is flagged
    lax = sq8_bounds_drift_stats(
        spark, path, shifted, "embedding", rebuild_threshold=2.0
    ).collect()[0]
    assert not lax["rebuild_recommended"]


def test_rebuild_sq8_if_drifted_acts_only_past_budget(
    spark, sf_dir, tmp_path
):
    """The stats->threshold->rebuild composition for the codec whose
    drift signal is BOUNDS, not imbalance (VERDICT r10 Next #2): an
    in-range sample -> no rebuild; a shifted sample past the trained
    range trips the threshold, and the rebuild — num_cells read from
    the persisted centroids, metadata columns detected and required,
    never caller-supplied — retrains bounds over the CURRENT corpus
    and restores probe recall (the r8 lesson: assert recall, not just
    the drift number)."""
    from vector_io_spark.operators.sq8 import (
        rebuild_sq8_if_drifted,
        sq8_bounds_drift_stats,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    old = emb.where(F.col("vec_id") % 2 == 0)
    path = str(tmp_path / "sq8_idx")
    write_sq8_index(old, path, num_cells=8, seed=7, metadata_cols=("label",))

    # in-range sample (the training data itself) -> decision is "keep"
    got = rebuild_sq8_if_drifted(spark, path, old, sample=old)
    assert got["rebuilt"] is False
    assert got["out_frac_before"] == 0.0
    assert got["out_frac_after"] is None
    assert got["nlist"] == 8

    # fresh data shifted past the trained range: every component +2.0
    # (bounds were trained on old only — SQ8 has no append path, so
    # "drift" means the live distribution left the trained box)
    shifted = emb.where(F.col("vec_id") % 2 == 1).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("float") + F.lit(2.0)
        ).alias("embedding"),
        "label",
    )
    corpus2 = old.unionByName(shifted)
    shifted_queries = shifted.limit(8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    truth = _sets(brute_force_topk(corpus2, shifted_queries, k=10))

    def probe_recall():
        approx = _sets(sq8_index_probe_topk(
            spark, path, shifted_queries, k=10, nprobe=8
        ))
        num = sum(len(approx.get(q, set()) & w) for q, w in truth.items())
        return num / sum(len(w) for w in truth.values())

    recall_stale = probe_recall()

    # guard: a rebuild corpus missing the persisted metadata column
    # must refuse loudly (silently dropping it breaks filtered probes)
    with pytest.raises(ValueError, match="label"):
        rebuild_sq8_if_drifted(
            spark, path, corpus2.drop("label"), sample=shifted
        )

    got2 = rebuild_sq8_if_drifted(spark, path, corpus2, sample=shifted)
    assert got2["rebuilt"] is True, got2
    assert got2["out_frac_before"] > 0.01, got2
    assert got2["max_overshoot_before"] > 0.0, got2
    # bounds retrained over the current corpus: the sample (a subset of
    # it) is exactly in range now
    assert got2["out_frac_after"] == 0.0, got2
    assert got2["nlist"] == 8

    # geometry preserved, full current corpus covered, metadata kept
    assert spark.read.parquet(f"{path}/centroids").count() == 8
    cells = spark.read.parquet(f"{path}/cells")
    assert cells.count() == corpus2.count()
    assert "label" in cells.columns

    recall_rebuilt = probe_recall()
    assert recall_rebuilt >= recall_stale, (
        f"rebuild REGRESSED shifted-query recall: "
        f"{recall_stale} -> {recall_rebuilt}"
    )
    assert recall_rebuilt >= 0.9, recall_rebuilt

    # the monitor agrees the store is healthy again
    after = sq8_bounds_drift_stats(
        spark, path, shifted, "embedding"
    ).first()
    assert not after["rebuild_recommended"]

    # an empty drift sample is a refusal, not a silent keep
    with pytest.raises(ValueError, match="empty"):
        rebuild_sq8_if_drifted(
            spark, path, corpus2, sample=shifted.where(F.lit(False))
        )
