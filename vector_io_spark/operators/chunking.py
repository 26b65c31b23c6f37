"""Document chunking and sequence packing — the two layout transforms an
LLM training/RAG pipeline applies between "curated corpus" and "model
input": split long documents into bounded, overlapping windows (for
embedding / retrieval), and pack variable-length documents into
fixed-token-budget bins (for training-batch construction).

Both are pure Catalyst plans:

- ``chunk_documents`` is a per-row explode — zero shuffles, linear in
  output chunks, trivially parallel at 100 TB. A chunk never crosses a
  document, so no cross-partition coordination exists at all.
- ``pack_sequences`` needs a GLOBAL exclusive running sum of token
  counts in a deterministic document order. A naive
  ``Window.orderBy(id)`` with no ``partitionBy`` funnels the whole
  corpus through ONE reducer — the classic global-window scale bug. We
  instead compute the cumsum in two phases (per-bucket window + tiny
  bucket-offset table joined back via broadcast), the same shape a
  range-partitioned sort uses: every corpus-sized stage is partitioned,
  and the only global object is one row per bucket.

Reference parity: the reference engine has no chunker/packer (it moves
vectors verbatim); these are north-star training-pipeline extensions in
the spirit of its re-embed batching (reference ``reembed.py`` batches of
96 texts), generalized to token-budget bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document into overlapping character windows.

    Chunk starts are ``1, 1+step, 1+2*step, ...`` (1-based, SQL substring
    convention) with ``step = chunk_size - overlap``, for every start
    ``<= length(text)``; each chunk is ``substring(text, start,
    chunk_size)``. Documents with empty/NULL text produce no chunks (an
    empty chunk is useless downstream and a NULL-key skew bucket in any
    later group-by).

    Returns ``(doc_id, chunk_idx, chunk_start, chunk_text,
    n_chunk_chars)`` with ``chunk_idx`` 0-based per document.

    Plan: project + ``posexplode(sequence(...))`` — no shuffle, no UDF;
    chunking 100 TB is a map-only job.
    """
    if overlap >= chunk_size:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_size ({chunk_size})"
        )
    step = chunk_size - overlap
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(F.col(text_col)), F.lit(1)), F.lit(step)
    )
    return (
        df.where(F.length(F.col(text_col)) > 0)
        .select(
            F.col(id_col),
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
            F.col(text_col),
        )
        .select(
            id_col,
            "chunk_idx",
            "chunk_start",
            F.substring(F.col(text_col), F.col("chunk_start"), chunk_size).alias(
                "chunk_text"
            ),
        )
        .withColumn("n_chunk_chars", F.length("chunk_text"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    bucket_width: int = 10_000,
) -> DataFrame:
    """Concat-and-chop sequence packing: lay documents end-to-end in
    ``id_col`` order and cut the stream every ``budget`` tokens.

    Each document gets ``pack_offset`` (exclusive running sum of tokens
    before it), ``pack_bin = floor(pack_offset / budget)`` (the training
    sequence it starts in) and ``offset_in_bin``. A document may straddle
    a bin boundary — exactly the layout GPT-style pretraining uses
    (concatenate, then chop at the context length); the bin id tells the
    batch builder where each document begins.

    Two-phase global cumsum (no single-reducer window):

    1. ``bucket = id div bucket_width`` — monotone in id, so per-bucket
       order + bucket order = global order. Window cumsum WITHIN each
       bucket (partitioned shuffle, parallel).
    2. Per-bucket token totals (tiny: |ids| / bucket_width rows) get a
       global window cumsum — safe because the frame is ~1/10000th of
       the corpus — and join back broadcast.

    Works for any non-negative integer id (TPC-H keys, row numbers,
    zipped ids). For string ids, derive a dense rank first.

    Returns ``(id, n_tokens, pack_offset, pack_bin, offset_in_bin)``.
    """
    bucket = (F.col(id_col) / bucket_width).cast("long").alias("__bucket")
    d = df.select(F.col(id_col), F.col(tokens_col).cast("long"), bucket)

    in_bucket = Window.partitionBy("__bucket").orderBy(id_col)
    d = d.withColumn(
        "__local_off",
        F.coalesce(
            F.sum(tokens_col).over(
                in_bucket.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )

    bucket_totals = d.groupBy("__bucket").agg(
        F.sum(tokens_col).alias("__bucket_tokens")
    )
    # global cumsum over the BUCKET table only — one row per bucket_width
    # ids, so the unpartitioned window is over a tiny frame by design.
    over_buckets = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_offsets = bucket_totals.select(
        "__bucket",
        F.coalesce(F.sum("__bucket_tokens").over(over_buckets), F.lit(0)).alias(
            "__bucket_off"
        ),
    )

    packed = d.join(F.broadcast(bucket_offsets), "__bucket").select(
        id_col,
        F.col(tokens_col).alias("n_tokens"),
        (F.col("__bucket_off") + F.col("__local_off")).alias("pack_offset"),
    )
    return packed.select(
        id_col,
        "n_tokens",
        "pack_offset",
        F.floor(F.col("pack_offset") / budget).cast("long").alias("pack_bin"),
        (F.col("pack_offset") % budget).alias("offset_in_bin"),
    )
