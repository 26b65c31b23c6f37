#!/usr/bin/env python
"""Streaming-path performance record (round 7, VERDICT r6 Next #4).

Measures, for each of the three continuous-ingest pipelines
(`streaming/incremental.py`):

- **per-micro-batch wall**: seed the store with half the corpus, land
  the other half as N equal parquet files, run ONE stream with
  ``maxFilesPerTrigger=1`` + ``Trigger.AvailableNow`` (so each file is
  one micro-batch), and read per-batch ``triggerExecution`` durations
  from the query's progress events — the steady-state latency a
  production stream pays per batch, without per-batch stream-startup
  noise.
- **compaction**: wall-clock of ``compact_neardup_index`` over the
  N-batch store plus the partition/file collapse it buys.

Prints ONE JSON line; run at sf0.1 for the BASELINE.md table:

    python tools/bench_streaming.py [sf_dir]

A streaming perf regression (e.g. an accidental resident rescan in the
probe join, or compaction going super-linear in files) shows up here
round-over-round the way batch regressions show up in bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
N_BATCHES = int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", "5"))
# optional subset, e.g. SPARK_GRAFT_STREAM_PIPELINES=token_index_ingest
# (r9: lets the sf10 token-ingest row run without paying the other
# three pipelines at that scale)
_PIPELINES = os.environ.get("SPARK_GRAFT_STREAM_PIPELINES")
_WANTED = ({x.strip() for x in _PIPELINES.split(",") if x.strip()}
           if _PIPELINES else None)


def _want(name: str) -> bool:
    return _WANTED is None or name in _WANTED


def _land_batches(df, id_col, landing, n):
    """One parquet file per future micro-batch (id-hash split)."""
    from pyspark.sql import functions as F

    for b in range(n):
        df.where(F.abs(F.hash(F.col(id_col))) % n == b).coalesce(
            1
        ).write.mode("append").parquet(landing)


def _run_stream(start_fn, timeout_s=600):
    """Start a stream, await availableNow drain, return per-batch
    triggerExecution seconds for batches that actually ingested rows."""
    q = start_fn()
    q.awaitTermination(timeout_s)
    q.stop()
    out = []
    for p in q.recentProgress:
        if p is None:
            continue
        if isinstance(p, str):
            p = json.loads(p)
        if int(p.get("numInputRows", 0)) > 0:
            out.append(p["durationMs"]["triggerExecution"] / 1000.0)
    return out


def _count_files(root):
    total = 0
    for _, _, files in os.walk(root):
        total += sum(1 for f in files if not f.startswith((".", "_")))
    return total


def _summary(per_batch, batch_rows):
    return {
        "n_batches": len(per_batch),
        "batch_rows": batch_rows,
        "per_batch_s": {
            "median": round(statistics.median(per_batch), 3),
            "min": round(min(per_batch), 3),
            "max": round(max(per_batch), 3),
        },
    }


def _compact(spark, root, id_col, partition_by=()):
    from vector_io_spark.streaming.incremental import compact_neardup_index

    files_before = _count_files(root)
    t0 = time.perf_counter()
    stats = compact_neardup_index(
        spark, root, id_col, keep_latest=False, partition_by=partition_by
    )
    wall = round(time.perf_counter() - t0, 3)
    return {
        "compact_s": wall,
        "folded_batches": stats["folded_batches"],
        "files_before": files_before,
        "files_after": _count_files(root),
    }


def main() -> None:
    from pyspark.sql import functions as F

    from vector_io_spark.queries import _t
    from vector_io_spark.session import get_spark
    from vector_io_spark.streaming.incremental import (
        seed_embedding_neardup_index,
        seed_ivfpq_stream_index,
        seed_neardup_index,
        streaming_embedding_neardup_ingest,
        streaming_ivfpq_ingest,
        streaming_neardup_ingest,
    )

    spark = get_spark(app_name="vector_io_spark_bench_streaming")
    work = tempfile.mkdtemp(prefix="vios_bench_streaming_")
    results: dict[str, dict] = {}
    try:
        docs = _t(spark, SF_DIR, "documents").select("doc_id", "text")
        emb = _t(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
        doc_seed = docs.where(F.col("doc_id") % 2 == 0)
        doc_new = docs.where(F.col("doc_id") % 2 == 1)
        emb_seed = emb.where(F.col("vec_id") % 2 == 0)
        emb_new = emb.where(F.col("vec_id") % 2 == 1)
        doc_batch_rows = doc_new.count() // N_BATCHES
        emb_batch_rows = emb_new.count() // N_BATCHES

        if _want("text_neardup"):
            # -- text near-dup ingest ------------------------------------
            d = os.path.join(work, "text")
            index_root, pairs_root = f"{d}/sig_index", f"{d}/pairs"
            landing, ckpt = f"{d}/landing", f"{d}/ckpt"
            seed_neardup_index(doc_seed, index_root, "doc_id", "text")
            _land_batches(doc_new, "doc_id", landing, N_BATCHES)
            schema = spark.read.parquet(landing).schema
            per_batch = _run_stream(
                lambda: streaming_neardup_ingest(
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(landing),
                    index_root, pairs_root, ckpt, "doc_id", "text",
                )
            )
            results["text_neardup"] = _summary(per_batch, doc_batch_rows)
            results["text_neardup"].update(_compact(spark, index_root, "doc_id"))

        if _want("embedding_neardup"):
            # -- embedding near-dup ingest --------------------------------
            d = os.path.join(work, "embedding")
            index_root, vectors_root = f"{d}/sig_index", f"{d}/vectors"
            pairs_root, landing, ckpt = f"{d}/pairs", f"{d}/landing", f"{d}/ckpt"
            seed_embedding_neardup_index(
                emb_seed, index_root, vectors_root, "vec_id", "embedding"
            )
            _land_batches(emb_new, "vec_id", landing, N_BATCHES)
            schema = spark.read.parquet(landing).schema
            per_batch = _run_stream(
                lambda: streaming_embedding_neardup_ingest(
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(landing),
                    index_root, vectors_root, pairs_root, ckpt,
                    "vec_id", "embedding",
                )
            )
            results["embedding_neardup"] = _summary(per_batch, emb_batch_rows)
            results["embedding_neardup"].update(
                _compact(spark, index_root, "vec_id")
            )

        if _want("ivfpq_ingest"):
            # -- IVF+PQ continuous index ingest ---------------------------
            d = os.path.join(work, "ivfpq")
            index_root, landing, ckpt = f"{d}/index", f"{d}/landing", f"{d}/ckpt"
            seed_ivfpq_stream_index(
                emb_seed, index_root, num_cells=16, num_subspaces=16,
                codebook_size=64, max_train_rows=20_000,
            )
            _land_batches(emb_new, "vec_id", landing, N_BATCHES)
            schema = spark.read.parquet(landing).schema
            per_batch = _run_stream(
                lambda: streaming_ivfpq_ingest(
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(landing),
                    index_root, ckpt,
                )
            )
            results["ivfpq_ingest"] = _summary(per_batch, emb_batch_rows)
            results["ivfpq_ingest"].update(
                _compact(
                    spark, f"{index_root}/cells", "vec_id",
                    partition_by=("cell",),
                )
            )

        if _want("token_index_ingest"):
            # -- token-index (late-interaction) ingest (r8) ----------------
            # static layout + tokened appends: per-batch wall includes the
            # _MAINT mutex take/release and the ledger write; compaction is
            # the STATIC compactor (compact_index_cells), ledger-preserving
            from vector_io_spark.operators.multivector import (
                write_token_index,
            )
            from vector_io_spark.operators.similarity import (
                compact_index_cells,
            )
            from vector_io_spark.streaming.incremental import (
                streaming_token_index_ingest,
            )

            def _toks(df, id_alias):
                return df.select(
                    F.col("vec_id").alias(id_alias),
                    F.explode(F.sequence(F.lit(0), F.lit(3))).alias("p"),
                    "embedding",
                ).select(
                    id_alias,
                    F.expr("slice(embedding, p*16+1, 16)").alias("vec"),
                )

            d = os.path.join(work, "token")
            index_root, landing, ckpt = f"{d}/index", f"{d}/landing", f"{d}/ckpt"
            write_token_index(
                _toks(emb_seed, "doc_id"), index_root, num_cells=16,
                max_train_rows=20_000,
            )
            _land_batches(_toks(emb_new, "doc_id"), "doc_id", landing, N_BATCHES)
            schema = spark.read.parquet(landing).schema
            per_batch = _run_stream(
                lambda: streaming_token_index_ingest(
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(landing),
                    index_root, ckpt,
                )
            )
            results["token_index_ingest"] = _summary(
                per_batch, emb_batch_rows * 4
            )
            files_before = _count_files(f"{index_root}/cells")
            t0 = time.perf_counter()
            compact_index_cells(spark, index_root)
            results["token_index_ingest"].update(
                {
                    "compact_s": round(time.perf_counter() - t0, 2),
                    "files_before": files_before,
                    "files_after": _count_files(f"{index_root}/cells"),
                }
            )
        if _want("sparse_index_ingest"):
            # -- sparse posting-list ingest (r9) --------------------------
            # same tokened-append machinery as the token-index pipeline on
            # the shard-partitioned postings layout; compaction is the
            # generalized static compactor
            from vector_io_spark.operators.ranking import (
                bm25_sparse_vectors,
            )
            from vector_io_spark.operators.similarity import (
                compact_index_cells,
            )
            from vector_io_spark.operators.sparse_index import (
                write_sparse_index,
            )
            from vector_io_spark.streaming.incremental import (
                streaming_sparse_index_ingest,
            )

            d = os.path.join(work, "sparse")
            index_root, landing, ckpt = f"{d}/index", f"{d}/landing", f"{d}/ckpt"
            write_sparse_index(
                bm25_sparse_vectors(doc_seed, "doc_id", "text",
                                    vocab_buckets=4096),
                index_root, num_shards=64,
            )
            _land_batches(
                bm25_sparse_vectors(doc_new, "doc_id", "text",
                                    vocab_buckets=4096),
                "doc_id", landing, N_BATCHES,
            )
            schema = spark.read.parquet(landing).schema
            per_batch = _run_stream(
                lambda: streaming_sparse_index_ingest(
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(landing),
                    index_root, ckpt,
                )
            )
            results["sparse_index_ingest"] = _summary(
                per_batch, doc_batch_rows
            )
            files_before = _count_files(f"{index_root}/postings")
            t0 = time.perf_counter()
            compact_index_cells(
                spark, index_root, data_sub="postings",
                partition_col="shard",
            )
            results["sparse_index_ingest"].update(
                {
                    "compact_s": round(time.perf_counter() - t0, 2),
                    "files_before": files_before,
                    "files_after": _count_files(f"{index_root}/postings"),
                }
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "streaming_ingest_per_batch_wall",
                "unit": "sec",
                "streaming": results,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
