"""Cross-batch stateful streaming dedup (applyInPandasWithState)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.streaming.stateful import streaming_dedup_by_key


def _run_batch(spark, landing, checkpoint, out_dir, schema):
    stream = spark.readStream.schema(schema).parquet(landing)
    deduped = streaming_dedup_by_key(stream, "doc_id", order_col="seq")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_streaming_dedup_first_seen_across_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    b1 = spark.createDataFrame(
        [(1, 10, "a"), (1, 11, "a-dup"), (2, 20, "b"), (3, 30, "c")],
        "doc_id long, seq long, text string",
    )
    b1.coalesce(1).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema
    _run_batch(spark, landing, checkpoint, out_dir, schema)

    got1 = {
        r["doc_id"]: (r["seq"], r["text"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # within-batch: smallest seq per key wins
    assert got1 == {1: (10, "a"), 2: (20, "b"), 3: (30, "c")}

    # second micro-batch: keys 2,3 are dups (state remembers them even
    # with smaller seq — first batch won), key 4 is new
    b2 = spark.createDataFrame(
        [(2, 5, "b-late"), (3, 31, "c-dup"), (4, 40, "d")],
        "doc_id long, seq long, text string",
    )
    b2.coalesce(1).write.mode("append").parquet(landing)
    _run_batch(spark, landing, checkpoint, out_dir, schema)

    got2 = {
        r["doc_id"]: (r["seq"], r["text"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got2 == {1: (10, "a"), 2: (20, "b"), 3: (30, "c"), 4: (40, "d")}


def test_streaming_dedup_fingerprint_key_on_documents(spark, sf_dir, tmp_path):
    """Content-level dedup over a document stream: key = md5 fingerprint
    (16 bytes of state per distinct content, never the text)."""
    from vector_io_spark.functions.text import doc_fingerprint

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("fp", doc_fingerprint("text"))
        .withColumn("seq", F.col("doc_id"))
    )
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).withColumn(
        "seq", F.col("seq") + 1_000_000
    )
    landing = str(tmp_path / "docs_landing")
    docs.unionByName(dup).coalesce(1).write.parquet(landing)
    schema = spark.read.parquet(landing).schema

    stream = spark.readStream.schema(schema).parquet(landing)
    deduped = streaming_dedup_by_key(stream, "fp", order_col="seq")
    out_dir = str(tmp_path / "docs_out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "docs_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    out = spark.read.parquet(out_dir)
    n_distinct_fp = docs.select("fp").distinct().count()
    assert out.count() == n_distinct_fp
    # first-writer-wins: every surviving doc_id is from the original set
    assert out.where(F.col("doc_id") >= 1_000_000).count() == 0
