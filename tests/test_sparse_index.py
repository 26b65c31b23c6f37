"""Persisted sparse posting-list catalog (operators/sparse_index.py) —
semantics SQL can't express: probe plan pruning (shard partition
filters + pushed bucket-IN), equality with the scan-form retrieval,
duplicate-bucket query folding, and validation. Values are
oracle-gated (queries.py sparse_indexed_retrieval)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.operators.ranking import bm25_sparse_vectors
from vector_io_spark.operators.sparse_index import (
    sparse_index_probe_topk,
    write_sparse_index,
)


@pytest.fixture(scope="module")
def sparse_store(spark, sf_dir, tmp_path_factory):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    docs = bm25_sparse_vectors(d, "doc_id", "text", vocab_buckets=4096)
    path = str(tmp_path_factory.mktemp("sparse") / "idx")
    write_sparse_index(docs, path, num_shards=64)
    return d, docs, path


def _qbuckets(spark, terms):
    return sorted(
        {
            r[0]
            for r in spark.createDataFrame([(t,) for t in terms], "t string")
            .select(
                (
                    F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
                    % 4096
                ).cast("int")
            )
            .collect()
        }
    )


def test_probe_matches_scan_form(spark, sf_dir, sparse_store):
    """The catalog probe must return the same docs in the same order
    as the scan-form sparse retrieval (same encoding, same keyword
    query, same integer micro-unit arithmetic)."""
    from vector_io_spark.queries import QUERIES

    _, _, path = sparse_store
    qb = _qbuckets(spark, ["hash", "join", "filter"])
    got = [
        (r["doc_id"], r["rank"])
        for r in sparse_index_probe_topk(
            spark, path, [(b, 1.0) for b in qb], k=20
        ).collect()
    ]
    want = [
        (r["doc_id"], i + 1)
        for i, r in enumerate(
            QUERIES["sparse_keyword_retrieval"](spark, sf_dir)
            .collect()
        )
    ]
    assert sorted(got) == sorted(want)


def test_probe_plan_prunes_shards_and_buckets(spark, sf_dir, sparse_store):
    _, _, path = sparse_store
    qb = _qbuckets(spark, ["hash"])
    df = sparse_index_probe_topk(spark, path, [(b, 1.0) for b in qb], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "shard" in plan, plan
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan
    # pushed bucket predicate reaches the scan
    assert "bucket" in plan.split("PushedFilters")[-1] or "bucket" in plan


def test_duplicate_query_buckets_fold_and_weights_scale(
    spark, sf_dir, sparse_store
):
    """A query listing the same bucket twice contributes the SUMMED
    weight (sparse-vector addition), and doubling a query weight
    doubles its contribution exactly (integer micro-units)."""
    _, _, path = sparse_store
    qb = _qbuckets(spark, ["hash"])
    b = qb[0]
    once = {
        r["doc_id"]: r["score"]
        for r in sparse_index_probe_topk(spark, path, [(b, 1.0)], k=50).collect()
    }
    folded = {
        r["doc_id"]: r["score"]
        for r in sparse_index_probe_topk(
            spark, path, [(b, 1.0), (b, 1.0)], k=50
        ).collect()
    }
    doubled = {
        r["doc_id"]: r["score"]
        for r in sparse_index_probe_topk(spark, path, [(b, 2.0)], k=50).collect()
    }
    assert folded == doubled
    for doc, s in once.items():
        assert doubled[doc] == pytest.approx(2 * s, abs=1e-9)


def test_probe_validates_empty_query(spark, sf_dir, sparse_store):
    _, _, path = sparse_store
    with pytest.raises(ValueError, match="empty"):
        sparse_index_probe_topk(spark, path, [], k=5)


def test_batch_probe_matches_per_query_probes(spark, sf_dir, sparse_store):
    """r10 (VERDICT r9 Next #2): the batch form must return, per
    query_id, exactly what N independent single-query probes return —
    same docs, same scores, same ranks."""
    from vector_io_spark.operators.sparse_index import (
        sparse_index_probe_topk_batch,
    )

    _, _, path = sparse_store
    batch = [
        (qid, [(b, 1.0) for b in _qbuckets(spark, terms)])
        for qid, terms in [
            ("qa", ["hash", "join", "filter"]),
            ("qb", ["sort", "merge", "window"]),
            ("qc", ["scan", "column", "batch"]),
        ]
    ]
    got = sorted(
        map(
            tuple,
            sparse_index_probe_topk_batch(spark, path, batch, k=15)
            .collect(),
        )
    )
    want = sorted(
        tuple(r)
        for qid, entries in batch
        for r in sparse_index_probe_topk(
            spark, path, entries, k=15, query_id=qid
        ).collect()
    )
    assert got == want


def test_batch_probe_scans_postings_once(spark, sf_dir, sparse_store):
    """N queries must cost ONE pruned postings scan (plus the tiny
    broadcast query table), not N probe jobs — the scale contract of
    the batch form."""
    from vector_io_spark.operators.sparse_index import (
        sparse_index_probe_topk_batch,
    )

    _, _, path = sparse_store
    batch = [
        ("qa", [(b, 1.0) for b in _qbuckets(spark, ["hash", "join"])]),
        ("qb", [(b, 1.0) for b in _qbuckets(spark, ["sort", "merge"])]),
        ("qc", [(b, 1.0) for b in _qbuckets(spark, ["scan", "batch"])]),
    ]
    df = sparse_index_probe_topk_batch(spark, path, batch, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "PartitionFilters: [" in plan and "shard" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_batch_probe_validates(spark, sf_dir, sparse_store):
    from vector_io_spark.operators.sparse_index import (
        sparse_index_probe_topk_batch,
    )

    _, _, path = sparse_store
    with pytest.raises(ValueError, match="queries is empty"):
        sparse_index_probe_topk_batch(spark, path, [], k=5)
    with pytest.raises(ValueError, match="no .bucket, weight. entries"):
        sparse_index_probe_topk_batch(spark, path, [("q0", [])], k=5)
    with pytest.raises(ValueError, match="duplicate query_id"):
        sparse_index_probe_topk_batch(
            spark, path, [("q0", [(1, 1.0)]), ("q0", [(2, 1.0)])], k=5
        )


def test_rebuild_clears_stale_tombstones(spark, sf_dir, tmp_path):
    """ADVICE r9: a full write_sparse_index rebuild starts a fresh
    logical store — doc_id tombstones from deletes on the PREVIOUS
    layout must not hide re-indexed documents (the df/avgdl-drift
    remedy is exactly rebuild-after-deletes)."""
    from vector_io_spark.operators.similarity import delete_from_index

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    docs = bm25_sparse_vectors(d, "doc_id", "text", vocab_buckets=4096)
    path = str(tmp_path / "idx")
    write_sparse_index(docs, path, num_shards=16)
    q = [(b, 1.0) for b in _qbuckets(spark, ["hash", "join", "filter"])]

    def hits():
        return {
            r["doc_id"]
            for r in sparse_index_probe_topk(
                spark, path, q, k=1000
            ).collect()
        }

    victim = sorted(hits())[0]
    delete_from_index(spark, path, [victim], id_col="doc_id",
                      delete_token="rb-d1")
    assert victim not in hits()
    # rebuild over the full corpus: the doc is indexed again and the
    # stale tombstone must not suppress it
    write_sparse_index(docs, path, num_shards=16)
    assert victim in hits()


def test_streaming_sparse_index_ingest(spark, sf_dir, tmp_path):
    """r9: the FIFTH continuous-ingest pipeline — sparse posting-list
    maintenance via exactly-once tokened appends on the generalized
    machinery. (a) streamed batches land and the probe retrieves the
    new docs; (b) compact_index_cells(data_sub='postings') folds the
    per-batch files, stream ledgers survive, the SAME lineage keeps
    ingesting; (c) a reset checkpoint is refused loudly."""
    import os
    import shutil

    from vector_io_spark.operators.similarity import compact_index_cells
    from vector_io_spark.streaming.incremental import (
        streaming_sparse_index_ingest,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = bm25_sparse_vectors(
        d.where(F.col("doc_id") >= 200), "doc_id", "text",
        vocab_buckets=4096,
    )
    path = str(tmp_path / "sparse_stream_idx")
    write_sparse_index(base, path, num_shards=16)

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")

    def run(docs_df, checkpoint):
        sv = bm25_sparse_vectors(docs_df, "doc_id", "text",
                                 vocab_buckets=4096)
        sv.coalesce(1).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = streaming_sparse_index_ingest(stream, path, checkpoint)
        q.awaitTermination(180)
        q.stop()

    # (a) two streamed batches become probeable
    run(d.where(F.col("doc_id") < 100), ckpt)
    run(d.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)), ckpt)
    qb = _qbuckets(spark, ["hash", "join", "filter"])
    q = [(b, 1.0) for b in qb]
    hits = {
        r["doc_id"]
        for r in sparse_index_probe_topk(spark, path, q, k=500).collect()
    }
    assert any(i < 200 for i in hits) and any(i >= 200 for i in hits)

    # (b) postings compaction folds files; ledgers survive; lineage lives
    got_c = compact_index_cells(
        spark, path, data_sub="postings", partition_col="shard"
    )
    assert got_c["files_after"] <= got_c["files_before"]
    assert [
        f for f in os.listdir(os.path.join(path, "postings"))
        if f.startswith("_DELTA-stream-")
    ], "stream ledgers must survive postings compaction"
    extra = d.where(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text"
    )
    run(extra, ckpt)
    grown = {
        r["doc_id"]
        for r in sparse_index_probe_topk(spark, path, q, k=2000).collect()
    }
    assert hits <= grown

    # (c) a reset checkpoint is refused
    ckpt2 = str(tmp_path / "ckpt2")
    with pytest.raises(Exception, match="different checkpoint lineage"):
        run(extra, ckpt2)
    shutil.rmtree(ckpt2, ignore_errors=True)


def test_sparse_append_and_delete_roundtrip(spark, sf_dir, tmp_path):
    """CRUD parity with the vector catalogs: tokened appends are
    exactly-once (replay is a no-op), appended docs become probeable,
    and doc_id tombstones suppress hits immediately."""
    from vector_io_spark.operators.similarity import delete_from_index
    from vector_io_spark.operators.sparse_index import (
        append_to_sparse_index,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    first = d.where(F.col("doc_id") < 300)
    rest = d.where(F.col("doc_id") >= 300)
    docs1 = bm25_sparse_vectors(first, "doc_id", "text", vocab_buckets=4096)
    path = str(tmp_path / "idx")
    write_sparse_index(docs1, path, num_shards=64)

    qb = _qbuckets(spark, ["hash", "join", "filter"])
    q = [(b, 1.0) for b in qb]

    def docs_at(k=500):
        return {
            r["doc_id"]
            for r in sparse_index_probe_topk(spark, path, q, k=k).collect()
        }

    base = docs_at()
    assert base and all(i < 300 for i in base)

    # NOTE: incremental postings are weighted with the DELTA's own
    # corpus stats (df / avgdl drift is the caller's rebuild trigger,
    # same as centroid drift on the vector catalogs)
    docs2 = bm25_sparse_vectors(rest, "doc_id", "text", vocab_buckets=4096)
    append_to_sparse_index(docs2, path, delta_token="sp-a1")
    grown = docs_at()
    assert grown > base and any(i >= 300 for i in grown)

    # replaying the committed token is a pure no-op
    scores_before = sorted(
        map(tuple, sparse_index_probe_topk(spark, path, q, k=50).collect())
    )
    append_to_sparse_index(docs2, path, delta_token="sp-a1")
    assert sorted(
        map(tuple, sparse_index_probe_topk(spark, path, q, k=50).collect())
    ) == scores_before

    victim = sorted(grown)[0]
    delete_from_index(spark, path, [victim], id_col="doc_id",
                      delete_token="sp-d1")
    assert victim not in docs_at()


def test_probe_equals_scan_under_collision_heavy_vocabulary(
    spark, sf_dir, tmp_path
):
    """VERDICT r10 Next #1 done-criterion: every prior sparse-retrieval
    green ran on the driver's ~31-word corpus (≤31 active buckets of
    4096, near-zero collisions). Synthesize a vocabulary LARGER than
    the bucket space with the replica generator's enricher
    (tools/make_replica.py::vocab_enriched_text), verify every bucket
    is multi-term (genuine hash collisions), and pin that the indexed
    probe still equals the scan-form retrieval EXACTLY — shard
    pruning + pushed bucket-IN must not drop or double any posting
    when buckets are shared by many terms and every shard carries
    query buckets."""
    from tools.make_replica import vocab_enriched_text
    from vector_io_spark.operators.ranking import bm25_sparse_vectors
    from vector_io_spark.operators.sparse_index import (
        sparse_index_probe_topk,
        write_sparse_index,
    )

    BUCKETS = 512
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    copies = spark.range(1, 21).withColumnRenamed("id", "__copy")
    enriched = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("__copy") * F.lit(100_000)).alias(
            "doc_id"
        ),
        vocab_enriched_text(F.col("text"), F.col("__copy")).alias("text"),
    )

    # the vocabulary dwarfs the bucket space and EVERY bucket collides
    terms = (
        enriched.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("t")
        )
        .where(F.col("t") != "")
        .distinct()
    )
    occ = (
        terms.select(
            (
                F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
                % BUCKETS
            ).alias("bucket")
        )
        .groupBy("bucket")
        .count()
    ).collect()
    n_vocab = sum(r["count"] for r in occ)
    assert n_vocab >= 4096, n_vocab
    assert len(occ) == BUCKETS, len(occ)
    assert min(r["count"] for r in occ) >= 2, "some bucket has no collision"

    sv = bm25_sparse_vectors(
        enriched, "doc_id", "text", vocab_buckets=BUCKETS
    )
    path = str(tmp_path / "sparse_big")
    write_sparse_index(sv, path, num_shards=16)

    # probe the 3 heaviest buckets (max posting lists, max collisions)
    heavy = [
        r["bucket"]
        for r in spark.read.parquet(f"{path}/postings")
        .groupBy("bucket").count()
        .orderBy(F.col("count").desc(), F.col("bucket").asc())
        .limit(3)
        .collect()
    ]
    entries = [(b, 1.0) for b in heavy]
    probe = {
        (r["doc_id"], r["score"], r["rank"])
        for r in sparse_index_probe_topk(
            spark, path, entries, k=40
        ).collect()
    }

    # scan form: same integer micro-unit math over the sparse vectors
    wq_int = 1_000_000  # weight 1.0
    ex = sv.select(
        "doc_id",
        F.explode(
            F.arrays_zip(F.col("sparse.indices"), F.col("sparse.values"))
        ).alias("e"),
    ).where(F.col("e.indices").isin(heavy))
    scored = ex.groupBy("doc_id").agg(
        F.sum(
            F.round(F.col("e.values").cast("double") * 1e6).cast("bigint")
            * F.lit(wq_int)
        ).alias("__s")
    )
    w = Window.orderBy(F.col("__s").desc(), F.col("doc_id").asc())
    scan = {
        (r["doc_id"], r["score"], r["rank"])
        for r in scored.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )
        .where(F.col("rank") <= 40)
        .select(
            "doc_id",
            F.round(F.col("__s").cast("double") / 1e12, 6).alias("score"),
            "rank",
        )
        .collect()
    }
    assert probe == scan


def test_rebuild_sparse_if_drifted_acts_only_past_budget(
    spark, sf_dir, tmp_path
):
    """The stats->budget->rebuild composition for the posting-list
    family (r11), completing the drift contract across all four
    persisted catalogs: a healthy store -> keep; a store whose heaviest
    bucket's df approaches the doc count (stopword drift, the
    documented probe-I/O failure mode) -> mutex-guarded re-index of
    the CORRECTED encoding with num_shards read from the persisted
    meta; the monitor re-run reports the share restored."""
    from vector_io_spark.operators.sparse_index import (
        rebuild_sparse_if_drifted,
    )

    def sparse_rows(with_stopword):
        # 200 docs, 3 low-df buckets each; optionally bucket 7 in EVERY
        # doc (df == n_docs -> stopword share 1.0)
        rows = []
        for i in range(200):
            buckets = sorted({(i * 13 + j * 101) % 512 for j in range(3)} - {7})
            if with_stopword:
                buckets = sorted(set(buckets) | {7})
            rows.append((i, (buckets, [1.0] * len(buckets))))
        return spark.createDataFrame(
            rows,
            "doc_id long, sparse struct<indices: array<int>, "
            "values: array<float>>",
        )

    healthy = sparse_rows(with_stopword=False)
    path = str(tmp_path / "sparse_drift")
    write_sparse_index(healthy, path, num_shards=8)

    got = rebuild_sparse_if_drifted(spark, path, healthy)
    assert got["rebuilt"] is False
    assert got["stopword_share_after"] is None
    assert got["stopword_share_before"] <= 0.5
    assert got["num_shards"] == 8

    # drifted store: every doc carries bucket 7
    drifted = sparse_rows(with_stopword=True)
    write_sparse_index(drifted, path, num_shards=8)
    got2 = rebuild_sparse_if_drifted(
        spark, path, healthy  # the corrected (stopword-filtered) encoding
    )
    assert got2["rebuilt"] is True, got2
    assert got2["stopword_share_before"] == 1.0, got2
    assert got2["stopword_share_after"] <= 0.5, got2
    assert got2["num_shards"] == 8
    # geometry preserved on disk, store now serves the corrected encoding
    assert (
        spark.read.parquet(f"{path}/meta").collect()[0]["num_shards"] == 8
    )
    assert (
        spark.read.parquet(f"{path}/postings")
        .where(F.col("bucket") == 7).count() == 0
    )

    # probe over the rebuilt store == scan-form integer math on the
    # corrected encoding (the probe==scan contract survives rebuilds)
    probe = {
        (r["doc_id"], r["score"])
        for r in sparse_index_probe_topk(
            spark, path, [(healthy.first()["sparse"]["indices"][0], 1.0)],
            k=300,
        ).collect()
    }
    ex = healthy.select(
        "doc_id",
        F.explode(
            F.arrays_zip(F.col("sparse.indices"), F.col("sparse.values"))
        ).alias("e"),
    ).where(F.col("e.indices") == healthy.first()["sparse"]["indices"][0])
    scan = {
        (r["doc_id"], r["score"])
        for r in ex.groupBy("doc_id").agg(
            F.round(
                F.sum(
                    F.round(F.col("e.values").cast("double") * 1e6)
                    .cast("bigint") * F.lit(1_000_000)
                ).cast("double") / 1e12,
                6,
            ).alias("score")
        ).collect()
    }
    assert probe == scan

    # an empty layout is a refusal, not a silent keep
    import shutil

    shutil.rmtree(f"{path}/postings")
    import os as _os

    _os.makedirs(f"{path}/postings", exist_ok=True)
    with pytest.raises(Exception):
        rebuild_sparse_if_drifted(spark, path, healthy)
