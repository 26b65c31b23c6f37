"""Persisted mergeable sketch catalog (round 6): the saved-signature
paths must be pytest-pinned IDENTICAL to the from-scratch paths — that
equality is the whole point of a sketch catalog (answer cross-dataset
questions from k-row files without rescanning corpora)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.operators.sketches import (
    bottomk_jaccard,
    bottomk_jaccard_from_sketches,
    bottomk_merge,
    bottomk_sample,
    hll_estimate,
    hll_estimate_from_registers,
    hll_registers,
    kmv_pairwise_jaccard,
    write_hll_registers,
    write_kmv_sketch,
    write_kmv_sketch_catalog,
)


def _docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").select("doc_id", "source", "text")


def test_kmv_from_saved_sketches_equals_from_scratch(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir)
    a = d.where(F.col("doc_id") % 2 == 0).select("doc_id")
    b = d.where(F.col("doc_id") % 3 == 0).select("doc_id")
    direct = bottomk_jaccard(a, b, "doc_id", k=64).collect()[0]
    pa, pb = str(tmp_path / "ska"), str(tmp_path / "skb")
    write_kmv_sketch(a, pa, "doc_id", k=64)
    write_kmv_sketch(b, pb, "doc_id", k=64)
    loaded = bottomk_jaccard_from_sketches(
        spark.read.parquet(pa), spark.read.parquet(pb), k=64
    ).collect()[0]
    assert loaded == direct
    assert loaded["k_used"] == 64


def test_kmv_sharded_sketches_merge_losslessly(spark, sf_dir, tmp_path):
    """min-k semigroup: the union of per-shard saved sketches of A is
    exactly the sketch of A — comparisons over the merged shards equal
    comparisons over the whole corpus."""
    d = _docs(spark, sf_dir)
    a = d.select("doc_id")
    b = d.where(F.col("doc_id") % 3 == 0).select("doc_id")
    shard_paths = []
    for m in range(4):  # 4 disjoint shards of A
        p = str(tmp_path / f"shard{m}")
        write_kmv_sketch(
            a.where(F.col("doc_id") % 4 == m), p, "doc_id", k=64
        )
        shard_paths.append(p)
    merged = spark.read.parquet(*shard_paths)
    pb = str(tmp_path / "skb")
    write_kmv_sketch(b, pb, "doc_id", k=64)
    from_shards = bottomk_jaccard_from_sketches(
        merged, spark.read.parquet(pb), k=64
    ).collect()[0]
    direct = bottomk_jaccard(a, b, "doc_id", k=64).collect()[0]
    assert from_shards == direct


def test_kmv_bigger_saved_k_still_exact(spark, sf_dir, tmp_path):
    """A catalog saved at k=256 answers k=64 questions exactly
    (membership against a superset signature is exact)."""
    d = _docs(spark, sf_dir)
    a = d.where(F.col("doc_id") % 2 == 0).select("doc_id")
    b = d.where(F.col("doc_id") % 3 == 0).select("doc_id")
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    write_kmv_sketch(a, pa, "doc_id", k=256)
    write_kmv_sketch(b, pb, "doc_id", k=256)
    loaded = bottomk_jaccard_from_sketches(
        spark.read.parquet(pa), spark.read.parquet(pb), k=64
    ).collect()[0]
    direct = bottomk_jaccard(a, b, "doc_id", k=64).collect()[0]
    assert loaded == direct


def test_kmv_empty_sets_yield_null_not_nan(spark):
    e = spark.range(0).select(F.col("id").alias("k"))
    row = bottomk_jaccard(e, e, "k", k=16).collect()[0]
    assert row["k_used"] == 0
    assert row["jaccard_est"] is None


def test_pairwise_catalog_equals_per_pair_bottomk(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir)
    path = str(tmp_path / "catalog")
    write_kmv_sketch_catalog(d, path, "text", "source", k=32)
    catalog = spark.read.parquet(path)
    pair_rows = {
        (r["group_a"], r["group_b"]): (r["k_used"], r["jaccard_est"])
        for r in kmv_pairwise_jaccard(catalog, "source", k=32).collect()
    }
    sources = sorted(
        r["source"] for r in d.select("source").distinct().collect()
    )
    assert len(pair_rows) == len(sources) * (len(sources) - 1) // 2
    # spot-check 3 pairs against the two-frame from-scratch estimator
    import itertools

    for sa, sb in list(itertools.combinations(sources, 2))[:3]:
        direct = bottomk_jaccard(
            d.where(F.col("source") == sa).select("text"),
            d.where(F.col("source") == sb).select("text"),
            "text",
            k=32,
        ).collect()[0]
        assert pair_rows[(sa, sb)] == (
            direct["k_used"],
            direct["jaccard_est"],
        )


def test_catalog_files_are_signature_sized(spark, sf_dir, tmp_path):
    """The catalog on disk is k-row-per-group small — the artifact a
    100 TB run ships around instead of the corpus."""
    d = _docs(spark, sf_dir)
    path = str(tmp_path / "catalog")
    write_kmv_sketch_catalog(d, path, "text", "source", k=16)
    catalog = spark.read.parquet(path)
    per_group = catalog.groupBy("source").count().collect()
    assert per_group and all(r["count"] <= 16 for r in per_group)


def test_hll_registers_roundtrip_and_union(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir)
    halves = [
        d.where(F.col("doc_id") % 2 == 0),
        d.where(F.col("doc_id") % 2 == 1),
    ]
    paths = []
    for i, h in enumerate(halves):
        p = str(tmp_path / f"regs{i}")
        write_hll_registers(h, p, "doc_id")
        paths.append(p)
    # single saved table estimates like the live sketch
    one = hll_estimate_from_registers(spark.read.parquet(paths[0])).collect()[0]
    live = hll_estimate(halves[0], "doc_id").collect()[0]
    assert one["estimate"] == live["estimate"]
    assert one["n_registers"] == live["n_registers"]
    # union of saved tables == sketching the union corpus directly
    merged = hll_estimate_from_registers(spark.read.parquet(*paths)).collect()[0]
    direct = hll_estimate(d, "doc_id").collect()[0]
    assert merged["estimate"] == direct["estimate"]


def test_bottomk_sample_persists_and_merges(spark, sf_dir, tmp_path):
    """Quantile-sketch catalog: saved per-shard bottom-k samples merge
    into exactly the whole-corpus sample."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    paths = []
    for m in range(3):
        p = str(tmp_path / f"s{m}")
        bottomk_sample(
            li.where(F.col("l_orderkey") % 3 == m),
            "l_quantity",
            "l_orderkey",
            k=128,
        ).write.parquet(p)
        paths.append(p)
    merged = bottomk_merge([spark.read.parquet(p) for p in paths], k=128)
    whole = bottomk_sample(li, "l_quantity", "l_orderkey", k=128)
    cols = ["__qh", "l_quantity"]
    assert sorted(map(tuple, merged.select(cols).collect())) == sorted(
        map(tuple, whole.select(cols).collect())
    )


def test_under_built_sketch_raises_not_biases(spark, sf_dir, tmp_path):
    """Round-6 review fix: comparing saved signatures at a k LARGER
    than their build k would silently bias estimates low (the merged
    union's bottom-k reaches past each side's truncation). The __k
    build marker must make that a loud ValueError — while k <= build-k
    requests and markerless in-session frames keep working."""
    d = _docs(spark, sf_dir)
    a = d.where(F.col("doc_id") % 2 == 0).select("doc_id")
    b = d.where(F.col("doc_id") % 3 == 0).select("doc_id")
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    write_kmv_sketch(a, pa, "doc_id", k=64)
    write_kmv_sketch(b, pb, "doc_id", k=256)
    sa, sb = spark.read.parquet(pa), spark.read.parquet(pb)

    with pytest.raises(ValueError, match="built with k=64"):
        bottomk_jaccard_from_sketches(sa, sb, k=256).collect()
    # requesting at or under both build-ks is exact and allowed
    ok = bottomk_jaccard_from_sketches(sa, sb, k=64).collect()[0]
    assert ok["k_used"] == 64

    cat = str(tmp_path / "cat")
    # k=8 keeps every per-source signature FULL at its build size (the
    # truncation-ambiguous case the guard must reject at larger k)
    write_kmv_sketch_catalog(d, cat, "doc_id", "source", k=8)
    with pytest.raises(ValueError, match="built with k=8"):
        kmv_pairwise_jaccard(
            spark.read.parquet(cat), "source", k=256
        ).collect()
    assert kmv_pairwise_jaccard(
        spark.read.parquet(cat), "source", k=8
    ).count() > 0

    # a COMPLETE small signature (rows < build k: the bottom-k captured
    # the whole set) is exact at ANY requested k and must pass — and
    # agree with the from-scratch estimate at that k
    small_a = d.where(F.col("doc_id") < 30).select("doc_id")
    small_b = d.where((F.col("doc_id") >= 15) & (F.col("doc_id") < 45)).select(
        "doc_id"
    )
    pa2, pb2 = str(tmp_path / "sa2"), str(tmp_path / "sb2")
    write_kmv_sketch(small_a, pa2, "doc_id", k=64)
    write_kmv_sketch(small_b, pb2, "doc_id", k=64)
    got = bottomk_jaccard_from_sketches(
        spark.read.parquet(pa2), spark.read.parquet(pb2), k=1024
    ).collect()[0]
    want = bottomk_jaccard(small_a, small_b, "doc_id", k=1024)
    w = want.collect()[0]
    assert (got["k_used"], got["jaccard_est"]) == (
        w["k_used"], w["jaccard_est"],
    )


def test_kmv_probe_group_equals_full_pairwise_rows(spark, sf_dir, tmp_path):
    """Round-7 (VERDICT r6 Next #5): probing ONE new corpus against a
    persisted catalog must return, for every cataloged group, exactly
    the row the full pairwise recompute would have produced for that
    pair — at N× less work (N·k + k rows read, no corpus scan). Build-k
    guards apply to the probe side too."""
    from vector_io_spark.operators.sketches import kmv_probe_group

    d = _docs(spark, sf_dir)
    sources = sorted(
        r["source"] for r in d.select("source").distinct().collect()
    )
    new_source = sources[-1]
    resident = d.where(F.col("source") != new_source)
    newcomer = d.where(F.col("source") == new_source)

    cat_path = str(tmp_path / "catalog")
    new_path = str(tmp_path / "new_sketch")
    write_kmv_sketch_catalog(resident, cat_path, "text", "source", k=32)
    write_kmv_sketch(newcomer, new_path, "text", k=32)
    catalog = spark.read.parquet(cat_path)
    new_sk = spark.read.parquet(new_path)

    probe = {
        r["source"]: (r["k_used"], r["jaccard_est"])
        for r in kmv_probe_group(catalog, new_sk, "source", k=32).collect()
    }
    assert set(probe) == set(sources[:-1])

    # the reference answer: catalog over ALL sources, full pairwise,
    # restricted to pairs involving the newcomer
    full_path = str(tmp_path / "catalog_full")
    write_kmv_sketch_catalog(d, full_path, "text", "source", k=32)
    full = {
        (r["group_a"], r["group_b"]): (r["k_used"], r["jaccard_est"])
        for r in kmv_pairwise_jaccard(
            spark.read.parquet(full_path), "source", k=32
        ).collect()
    }
    for s in sources[:-1]:
        key = (s, new_source) if s < new_source else (new_source, s)
        assert probe[s] == full[key], (s, probe[s], full[key])

    # under-built probe signature raises instead of biasing low
    small_path = str(tmp_path / "small_sketch")
    write_kmv_sketch(newcomer, small_path, "text", k=8)
    with pytest.raises(ValueError, match="built with k=8"):
        kmv_probe_group(
            catalog, spark.read.parquet(small_path), "source", k=32
        ).collect()
