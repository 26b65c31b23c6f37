"""Connected components + survivor selection + remote connector registry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.operators.dedup import (
    connected_components,
    dedup_survivors,
    minhash_lsh_dup_pairs,
)


def test_connected_components_chain(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    comps = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_dedup_survivors_end_to_end(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(80).select("doc_id", "text")
    dup1 = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    dup2 = docs.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    corpus = docs.unionByName(dup1).unionByName(dup2)
    pairs = minhash_lsh_dup_pairs(
        corpus, "doc_id", "text", num_hashes=16, bands=8, threshold=0.99
    )
    survivors = dedup_survivors(corpus, pairs, "doc_id")
    # every row is in some pair (3 exact copies each), so survivors ==
    # one per component; distinct original docs may legitimately merge if
    # their texts are near-identical, so compare against the component
    # count rather than assuming 80
    n_components = (
        connected_components(pairs).select("component").distinct().count()
    )
    assert survivors.count() == n_components <= 80
    # each survivor is its component's min id — always an original
    assert survivors.agg(F.max("doc_id")).collect()[0][0] < 100000


def test_remote_connector_registry_importable():
    from vector_io_spark.sources.remote import CONNECTORS

    assert set(CONNECTORS) == {
        "qdrant", "pinecone", "milvus", "chroma", "lancedb", "turbopuffer",
        "vertexai_vectorsearch", "astradb", "astradb_cql", "kdbai",
        "vespa", "weaviate", "txtai", "azureai",
    }
    # constructors are import-gated with a clear message
    with pytest.raises(ImportError, match="qdrant_client"):
        CONNECTORS["qdrant"]("http://localhost:6333")


def test_hf_source_import_gated(spark):
    from vector_io_spark.sources.hf import push_to_hub, read_hf_dataset

    with pytest.raises(ImportError, match="huggingface_hub"):
        read_hf_dataset(spark, "user/ds")
    with pytest.raises(ImportError, match="huggingface_hub"):
        push_to_hub("/tmp/nope", "user/ds")


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 300-link path graph: plain min-propagation needs 300 rounds;
    pointer jumping must converge within max_iter=12 (2^12 >> 300) and
    label every node with the chain's min id."""
    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    labels = connected_components(pairs, max_iter=12)
    distinct = labels.select("component").distinct().collect()
    assert [r["component"] for r in distinct] == [0]
    assert labels.count() == n + 1


def test_connected_components_nonconvergence_raises(spark):
    """With max_iter too small for the diameter, raise instead of
    returning a partially merged labeling."""
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_lsh_max_bucket_cap_drops_mega_bucket_only(spark):
    """max_bucket_size excludes boilerplate mega-buckets from pair
    generation while pairs from small buckets survive — the worst-case
    guard for template/empty-page clusters whose band bucket would
    otherwise self-join quadratically."""
    from vector_io_spark.operators.dedup import minhash_lsh_dup_pairs

    # 30 identical boilerplate docs (one mega bucket) + 2 distinct
    # near-dup docs that share a small bucket
    boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit")
              for i in range(30)]
    near = [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "the quick brown fox jumps over the lazy dog today"),
    ]
    df = spark.createDataFrame(boiler + near, "doc_id long, text string")

    uncapped = minhash_lsh_dup_pairs(df, "doc_id", "text", threshold=0.4)
    capped = minhash_lsh_dup_pairs(
        df, "doc_id", "text", threshold=0.4, max_bucket_size=10
    )
    un_pairs = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cap_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in un_pairs and (100, 101) in cap_pairs
    # the 30-doc boilerplate cluster contributes C(30,2)=435 pairs
    # uncapped and zero capped (every band bucket holds all 30)
    assert len(un_pairs) == 435 + 1
    assert cap_pairs == {(100, 101)}


def test_incremental_lsh_equals_symmetric_restricted_to_new(spark, sf_dir):
    """Contract: the asymmetric incremental pass returns EXACTLY the
    symmetric operator's pairs restricted to pairs involving the new
    batch — and never an old x old pair."""
    from vector_io_spark.operators.dedup import (
        minhash_lsh_dup_pairs,
        minhash_lsh_incremental_pairs,
    )

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 300)
    )
    new = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(F.reverse("text"))
        .alias("text"),
    )
    inc = minhash_lsh_incremental_pairs(
        d, new, "doc_id", "text", threshold=0.5
    )
    full = minhash_lsh_dup_pairs(
        d.unionByName(new), "doc_id", "text", threshold=0.5
    )
    got = {(r["id_a"], r["id_b"], r["est_jaccard"]) for r in inc.collect()}
    want = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in full.collect()
        if r["id_a"] >= 1000000 or r["id_b"] >= 1000000
    }
    assert got == want and got
    assert all(a >= 1000000 or b >= 1000000 for a, b, _ in got)


def test_incremental_lsh_with_persisted_signature_index(spark, sf_dir, tmp_path):
    """The persisted signature index replaces the resident-side text
    scan: loading (id, minhash) from parquet must produce the identical
    pair set as recomputing signatures."""
    from vector_io_spark.operators.dedup import (
        minhash_lsh_incremental_pairs,
        write_signature_index,
    )

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 200)
    )
    new = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    idx = str(tmp_path / "sig_index")
    write_signature_index(d, idx, "doc_id", "text")
    from_idx = minhash_lsh_incremental_pairs(
        None, new, "doc_id", "text",
        old_sigs=spark.read.parquet(idx),
    )
    recomputed = minhash_lsh_incremental_pairs(d, new, "doc_id", "text")
    a = {tuple(r) for r in from_idx.collect()}
    b = {tuple(r) for r in recomputed.collect()}
    assert a == b and a


def test_incremental_components_match_full_recompute(spark):
    """Contract: contracting old endpoints to their component ids and
    running components over the NEW pairs only yields exactly the full
    old∪new recompute for every touched node — including a new doc
    merging two previously separate old clusters."""
    from vector_io_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    # resident graph: {1,2,3} (comp 1), {10,11} (comp 10), {20,21} (comp
    # 20), singleton 30 implicitly absent from comp_old
    old_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    comp_old = connected_components(old_pairs)

    # new batch: 100 joins cluster 1; 101 MERGES clusters 10 and 20;
    # 102-103 form a brand-new cluster
    new_pairs = spark.createDataFrame(
        [(2, 100), (11, 101), (21, 101), (102, 103)],
        "id_a long, id_b long",
    )
    inc = {
        r["id"]: r["component"]
        for r in incremental_components(comp_old, new_pairs).collect()
    }
    full = {
        r["id"]: r["component"]
        for r in connected_components(
            old_pairs.unionByName(new_pairs)
        ).collect()
    }
    # new docs get exactly the full-recompute assignment
    for nid in (100, 101, 102, 103):
        assert inc[nid] == full[nid], (nid, inc.get(nid), full.get(nid))
    # the merge is visible: old component ids 10 and 20 relabel to 10
    assert inc[10] == 10 and inc[20] == 10
    assert full[21] == 10 and full[11] == 10
    # untouched resident cluster 1's supernode maps to itself
    assert inc[1] == 1
