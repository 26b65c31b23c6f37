"""Tests for round-3 operators: chunking, sequence packing, line-level
dedup, snapshot diff, incremental dedup, char entropy."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_io_spark.operators.chunking import chunk_documents, pack_sequences
from vector_io_spark.operators.corpus import line_dedup
from vector_io_spark.operators.versioning import incremental_dedup, snapshot_diff


def test_chunk_documents_covers_and_overlaps(spark):
    text = "abcdefghijklmnopqrstuvwxyz" * 10  # 260 chars
    df = spark.createDataFrame([(1, text), (2, "short"), (3, "")], ["doc_id", "text"])
    out = chunk_documents(df, chunk_size=100, overlap=20).orderBy(
        "doc_id", "chunk_idx"
    )
    rows = out.collect()
    # empty doc produces no chunks
    assert {r.doc_id for r in rows} == {1, 2}
    d1 = [r for r in rows if r.doc_id == 1]
    # starts at 1, step 80, while start <= 260 -> 1, 81, 161, 241
    assert [r.chunk_start for r in d1] == [1, 81, 161, 241]
    assert [r.chunk_idx for r in d1] == [0, 1, 2, 3]
    # consecutive chunks overlap by exactly `overlap` chars
    for a, b in zip(d1, d1[1:]):
        assert a.chunk_text[-20:] == b.chunk_text[:20]
    # stitching non-overlapping prefixes reconstructs the document
    stitched = "".join(r.chunk_text[:80] for r in d1[:-1]) + d1[-1].chunk_text
    assert stitched == text
    (d2,) = [r for r in rows if r.doc_id == 2]
    assert d2.chunk_text == "short" and d2.n_chunk_chars == 5


def test_pack_sequences_matches_global_cumsum(spark):
    rows = [(i, (i * 37) % 500 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    # tiny bucket_width forces many buckets -> exercises the two-phase path
    out = pack_sequences(df, budget=1000, bucket_width=16)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    expected = df.select(
        "doc_id",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("exp_off"),
    )
    j = out.join(expected, "doc_id")
    assert j.where(F.col("pack_offset") != F.col("exp_off")).count() == 0
    bad = j.where(
        (F.col("pack_bin") != F.floor(F.col("pack_offset") / 1000))
        | (F.col("offset_in_bin") != F.col("pack_offset") % 1000)
    )
    assert bad.count() == 0


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    boiler = "Subscribe to our newsletter"
    docs = [
        (1, f"unique one\n{boiler}\nkeep me"),
        (2, f"{boiler}\nanother body"),
        (3, f"third text\n{boiler}"),
        (4, "no boilerplate here\n\ntrailing keeps blank"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r for r in line_dedup(df, max_docs_per_line=2).collect()}
    assert out[1].clean_text == "unique one\nkeep me"
    assert out[1].n_lines_removed == 1 and out[1].n_lines_kept == 2
    assert out[2].clean_text == "another body"
    assert out[3].clean_text == "third text"
    # blank lines are never treated as duplicates; order preserved
    assert out[4].clean_text == "no boilerplate here\n\ntrailing keeps blank"
    assert out[4].n_lines_removed == 0


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", "s"), (2, "b", "s"), (3, "c", "s")], ["id", "text", "src"]
    )
    new = spark.createDataFrame(
        [(1, "a", "s"), (2, "B", "s"), (4, "d", "s")], ["id", "text", "src"]
    )
    got = {
        r.id: r.status
        for r in snapshot_diff(old, new, "id", ["text", "src"]).collect()
    }
    assert got == {2: "changed", 3: "removed", 4: "added"}
    full = {
        r.id: r.status
        for r in snapshot_diff(
            old, new, "id", ["text", "src"], include_unchanged=True
        ).collect()
    }
    assert full[1] == "unchanged" and len(full) == 4


def test_snapshot_diff_null_vs_literal_not_equal(spark):
    old = spark.createDataFrame([(1, None)], "id int, text string")
    new = spark.createDataFrame([(1, "\x00null")], "id int, text string")
    # the NULL sentinel must not collide with a literal of the same text
    assert snapshot_diff(old, new, "id", ["text"]).collect()[0].status == "changed"


def test_incremental_dedup_keeps_only_fresh(spark):
    seen = spark.createDataFrame([(1, "alpha"), (2, "beta")], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma"), (12, "beta"), (13, "delta")],
        ["doc_id", "text"],
    )
    kept = sorted(r.doc_id for r in incremental_dedup(new, seen).collect())
    assert kept == [11, 13]


def test_char_entropy_known_values(spark):
    from vector_io_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")], ["doc_id", "text"]
    )
    got = {r.doc_id: r.e for r in df.select(
        "doc_id", char_entropy("text").alias("e")
    ).collect()}
    assert got[1] == 0.0
    assert math.isclose(got[2], 1.0)
    assert math.isclose(got[3], 2.0)
    assert got[4] is None or math.isnan(got[4])


def test_apply_changes_merge_semantics_and_roundtrip(spark, sf_dir):
    """MERGE semantics: upserts replace/insert, deletes remove,
    last-write-wins by seq; and the diff->apply ROUND TRIP: applying
    snapshot_diff(old, new) as a changelog onto old reconstructs new
    exactly."""
    from tests.conftest import load
    from vector_io_spark.operators.versioning import (
        apply_changes,
        snapshot_diff,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "upsert", "b2", 21.0, 1),   # superseded by seq 2
            (2, "upsert", "b3", 22.0, 2),
            (3, "delete", None, None, 1),
            (4, "upsert", "d", 40.0, 1),
        ],
        "id long, op string, name string, v double, seq long",
    )
    got = {
        r["id"]: (r["name"], r["v"])
        for r in apply_changes(base, changes, "id", seq_col="seq").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b3", 22.0), 4: ("d", 40.0)}

    # round trip on real data: old = embeddings, new = modified copy
    old = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    new = (
        old.where(F.col("vec_id") % 7 != 0)                  # deletions
        .withColumn(
            "label",
            F.when(F.col("vec_id") % 5 == 0, F.col("label") + 100).otherwise(
                F.col("label")
            ),                                                # modifications
        )
        .unionByName(
            spark.range(900000, 900010).select(
                F.col("id").alias("vec_id"), F.lit(7).alias("label")
            )                                                 # additions
        )
    )
    diff = snapshot_diff(old, new, "vec_id", ["label"])
    changelog = (
        diff.withColumn(
            "op",
            F.when(F.col("status") == "removed", "delete").otherwise("upsert"),
        )
        .join(new.withColumnRenamed("label", "new_label"), "vec_id", "left")
        .select("vec_id", "op", F.col("new_label").alias("label"))
    )
    rebuilt = apply_changes(old, changelog, "vec_id")
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0
