"""Catalog snapshot / restore (operators/snapshot.py): consistency
under the maintenance mutex, ledger+tombstone preservation (restored
stores resume exactly-once appends and delete visibility), manifest
integrity detection, and refusal semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.operators.similarity import (
    append_to_ivf_index,
    delete_from_index,
    ivf_index_probe_topk,
    write_ivf_index,
)
from vector_io_spark.operators.snapshot import (
    MANIFEST_NAME,
    restore_index,
    snapshot_index,
    verify_snapshot,
)


def _probe_rows(spark, path, q):
    return sorted(
        map(tuple, ivf_index_probe_topk(spark, path, q, k=10, nprobe=8).collect())
    )


@pytest.fixture()
def store(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    path = str(tmp_path / "idx")
    write_ivf_index(emb, path, num_cells=8, seed=7, metadata_cols=("label",))
    # maintenance state a snapshot must carry: a committed tokened
    # append (ledger) and a live tombstone
    newbie = emb.limit(20).select(
        (F.col("vec_id") + 900_000).alias("vec_id"), "embedding", "label"
    )
    append_to_ivf_index(newbie, path, delta_token="snap-t1")
    delete_from_index(spark, path, [0, 1], delete_token="snap-d1")
    q = emb.where(F.col("vec_id").between(5, 9)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return emb, path, q


def test_snapshot_restore_roundtrip_preserves_state(
    spark, sf_dir, store, tmp_path
):
    emb, path, q = store
    at_cut = _probe_rows(spark, path, q)
    snap = str(tmp_path / "snap1")
    manifest = snapshot_index(spark, path, snap)
    assert manifest["n_files"] == len(manifest["files"]) > 0
    # transient / lock entries never enter the manifest
    assert not any(
        part.startswith((".", "_MAINT-"))
        for rel in manifest["files"]
        for part in rel.split("/")
    )
    # the ledger and tombstones DO travel
    assert any("_DELTA-" in rel for rel in manifest["files"])
    assert any("tombstones" in rel for rel in manifest["files"])

    # mutate the original AFTER the cut
    delete_from_index(spark, path, [5, 6, 7], delete_token="snap-d2")
    assert _probe_rows(spark, path, q) != at_cut

    dest = str(tmp_path / "restored")
    restore_index(spark, snap, dest)
    assert _probe_rows(spark, dest, q) == at_cut

    # restored ledger: replaying the committed append token is a no-op
    before = _probe_rows(spark, dest, q)
    newbie = emb.limit(20).select(
        (F.col("vec_id") + 900_000).alias("vec_id"), "embedding", "label"
    )
    append_to_ivf_index(newbie, dest, delta_token="snap-t1")
    assert _probe_rows(spark, dest, q) == before

    # restore refuses an existing destination without overwrite...
    with pytest.raises(ValueError, match="overwrite"):
        restore_index(spark, snap, dest)
    # ...and replaces it wholesale with it
    delete_from_index(spark, dest, [8], delete_token="snap-d3")
    restore_index(spark, snap, dest, overwrite=True)
    assert _probe_rows(spark, dest, q) == at_cut


def test_snapshot_refuses_overwrite_and_live_maintenance(
    spark, sf_dir, store, tmp_path
):
    _, path, _ = store
    snap = str(tmp_path / "snap2")
    snapshot_index(spark, path, snap)
    with pytest.raises(ValueError, match="immutable"):
        snapshot_index(spark, path, snap)

    # a fresh maintenance lock blocks the cut (consistency contract)
    lock = os.path.join(path, "_MAINT-LOCK")
    open(lock, "w").close()
    try:
        with pytest.raises(RuntimeError, match="maintenance in flight"):
            snapshot_index(spark, path, str(tmp_path / "snap3"))
    finally:
        os.remove(lock)
    # ...and the failed attempt must not have left its own lock behind
    assert not os.path.exists(lock)

    # a streaming ingest lease also blocks the cut (mid-batch state)
    lease = os.path.join(path, "_LIVE-abc123")
    open(lease, "w").close()
    try:
        with pytest.raises(RuntimeError, match="streaming ingest lease"):
            snapshot_index(spark, path, str(tmp_path / "snap3b"))
    finally:
        os.remove(lease)


def test_verify_snapshot_detects_drift(spark, sf_dir, store, tmp_path):
    _, path, _ = store
    snap = str(tmp_path / "snap4")
    manifest = snapshot_index(spark, path, snap)
    verify_snapshot(spark, snap)

    victim = os.path.join(
        snap, sorted(r for r in manifest["files"] if "cells" in r)[0]
    )
    os.truncate(victim, 1)
    with pytest.raises(ValueError, match="size-mismatch"):
        verify_snapshot(spark, snap)
    os.remove(victim)
    with pytest.raises(ValueError, match="missing"):
        verify_snapshot(spark, snap)
    # restore runs verification first — a corrupt snapshot never lands
    with pytest.raises(ValueError):
        restore_index(spark, snap, str(tmp_path / "never"))
    assert not os.path.exists(str(tmp_path / "never"))


def test_restore_failure_never_leaks_staging(spark, sf_dir, store, tmp_path):
    """A restore refused post-copy (fresh maintenance lock on the
    destination) must clean its .restore-tmp staging — a later run
    under a different pid would never clean it up otherwise."""
    import glob

    _, path, _ = store
    snap = str(tmp_path / "snap5")
    snapshot_index(spark, path, snap)
    dest = str(tmp_path / "dest5")
    restore_index(spark, snap, dest)

    lock = os.path.join(dest, "_MAINT-LOCK")
    open(lock, "w").close()
    try:
        with pytest.raises(RuntimeError, match="maintenance in flight"):
            restore_index(spark, snap, dest, overwrite=True)
    finally:
        os.remove(lock)
    assert not glob.glob(f"{dest}.restore-tmp-*"), "staging leaked"
    # the destination store is untouched by the failed attempt
    verify_like = {
        r["vec_id"]
        for r in spark.read.parquet(f"{dest}/cells").select("vec_id").collect()
    }
    assert verify_like


def test_snapshot_works_on_sparse_postings_catalog(
    spark, sf_dir, tmp_path
):
    """r10 (VERDICT r9 Next #3): the sparse posting-list layout
    (postings/shard=N + meta + append ledger + doc tombstone) snapshots
    and restores with probe equality and full maintenance state."""
    from vector_io_spark.operators.ranking import bm25_sparse_vectors
    from vector_io_spark.operators.sparse_index import (
        append_to_sparse_index,
        sparse_index_probe_topk,
        write_sparse_index,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    docs = bm25_sparse_vectors(
        d.where(F.col("doc_id") < 300), "doc_id", "text", vocab_buckets=4096
    )
    path = str(tmp_path / "sparse")
    write_sparse_index(docs, path, num_shards=16)
    delta = bm25_sparse_vectors(
        d.where(F.col("doc_id") >= 300), "doc_id", "text",
        vocab_buckets=4096,
    )
    append_to_sparse_index(delta, path, delta_token="snap-sp1")
    delete_from_index(spark, path, [5], id_col="doc_id",
                      delete_token="snap-spd1")

    q = [(b % 4096, 1.0) for b in (17, 923, 2048, 3111)]
    at_cut = sorted(
        map(tuple,
            sparse_index_probe_topk(spark, path, q, k=200).collect())
    )
    snap = str(tmp_path / "snap-sparse")
    manifest = snapshot_index(spark, path, snap)
    assert any("_DELTA-" in rel for rel in manifest["files"])
    assert any("tombstones" in rel for rel in manifest["files"])

    # mutate the original AFTER the cut, then restore elsewhere
    delete_from_index(spark, path, [10, 11], id_col="doc_id",
                      delete_token="snap-spd2")
    dest = str(tmp_path / "sparse-restored")
    restore_index(spark, snap, dest)
    got = sorted(
        map(tuple,
            sparse_index_probe_topk(spark, dest, q, k=200).collect())
    )
    assert got == at_cut
    # restored ledger: replaying the committed append token is a no-op
    append_to_sparse_index(delta, dest, delta_token="snap-sp1")
    assert sorted(
        map(tuple,
            sparse_index_probe_topk(spark, dest, q, k=200).collect())
    ) == at_cut


def test_snapshot_refuses_nested_streaming_state(spark, sf_dir, tmp_path):
    """ADVICE r9: streaming leases/markers live UNDER the root
    (streaming_ivfpq_ingest guards {root}/cells, the sparse ingest
    {root}/postings) — the refusal must scan recursively, and a
    _STREAM-* lineage marker over unfolded ingest_batch>=0 partitions
    must refuse even with no lease present (between-batch cuts race
    an attached stream)."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "idx")
    write_ivf_index(emb, path, num_cells=4, seed=7)

    # (1) a lease NESTED under cells/ must refuse (top-level-only scan
    # would miss it)
    lease = os.path.join(path, "cells", "_LIVE-deadbeef")
    open(lease, "w").close()
    try:
        with pytest.raises(RuntimeError, match="streaming ingest lease"):
            snapshot_index(spark, path, str(tmp_path / "s1"))
    finally:
        os.remove(lease)

    # (2) lineage marker + unfolded batch partition, NO lease (the
    # between-batch window): still refused
    cells = os.path.join(path, "cells")
    open(os.path.join(cells, "_STREAM-cafe01"), "w").close()
    batch_dir = os.path.join(cells, "ingest_batch=3", "cell=0")
    os.makedirs(batch_dir)
    open(os.path.join(batch_dir, "part-0.parquet"), "w").write("x")
    try:
        with pytest.raises(RuntimeError, match="stream attached"):
            snapshot_index(spark, path, str(tmp_path / "s2"))
        # (3) folded store (only ingest_batch=-1) with a marker is OK —
        # the documented quiesce+compact pre-snapshot state
        import shutil

        shutil.rmtree(os.path.join(cells, "ingest_batch=3"))
        folded = os.path.join(cells, "ingest_batch=-1", "cell=0")
        os.makedirs(folded)
        open(os.path.join(folded, "part-0.parquet"), "w").write("x")
        snapshot_index(spark, path, str(tmp_path / "s3"))
        verify_snapshot(spark, str(tmp_path / "s3"))
    finally:
        pass


def test_snapshot_works_on_sq8_catalog(spark, sf_dir, tmp_path):
    from vector_io_spark.operators.sq8 import (
        sq8_index_probe_topk,
        write_sq8_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "sq8")
    write_sq8_index(emb, path, num_cells=8, seed=7)
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = sorted(
        map(tuple, sq8_index_probe_topk(spark, path, q, k=5, nprobe=8).collect())
    )
    snap = str(tmp_path / "snap-sq8")
    snapshot_index(spark, path, snap)
    dest = str(tmp_path / "sq8-restored")
    restore_index(spark, snap, dest)
    got = sorted(
        map(tuple, sq8_index_probe_topk(spark, dest, q, k=5, nprobe=8).collect())
    )
    assert got == want
