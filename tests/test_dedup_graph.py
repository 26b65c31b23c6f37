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
        "vespa", "weaviate",
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
