"""Dataset versioning: content-level diff between two snapshots of a VDF
dataset (or any id-keyed DataFrame).

A migration pipeline re-exporting a vector DB wants to know *what
changed* since the last export — which ids appeared, vanished, or had
their payload modified — both to audit the sync and to drive incremental
upserts (ship only ``added`` + ``changed`` rows to the target instead of
re-upserting the corpus). The reference engine re-upserts everything;
the diff is the Spark-native upgrade that makes the 100 TB re-export
incremental.

Plan: both sides reduce to ``(id, md5-of-compared-columns)`` — 16-byte
digests, not payloads — before the FULL OUTER join, so the shuffle
carries hashes regardless of how wide the rows are. AQE picks
broadcast automatically when one snapshot is small (the typical
incremental case: yesterday's export vs today's delta).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _content_hash(df: DataFrame, id_col: str, cols: Sequence[str]) -> DataFrame:
    # Null-safe, order-fixed, INJECTION-PROOF digest: each column hashes
    # to a fixed-width md5 of (null-flag prefix + string form), and the
    # row digest is the md5 of the concatenated per-field digests. Fixed
    # width means no separator exists for values to smuggle — a raw
    # '\x01'-joined concat let a value containing the separator shift
    # field boundaries, making distinct rows collide ('changed' rows
    # silently reported unchanged). Column ORDER is the caller's `cols`,
    # identical for both sides; the null-flag keeps NULL distinct from
    # every literal including the empty string.
    parts = [
        F.md5(
            F.concat(
                F.when(F.col(c).isNull(), F.lit("0")).otherwise(F.lit("1")),
                F.coalesce(F.col(c).cast("string"), F.lit("")),
            )
        )
        for c in cols
    ]
    return df.select(
        F.col(id_col), F.md5(F.concat(*parts)).alias("__h")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: Sequence[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots by ``id_col``: returns ``(id, status)`` where
    status ∈ {'added', 'removed', 'changed'} (plus 'unchanged' when
    ``include_unchanged``). ``compare_cols`` define content identity;
    ids must be unique per side (dedup upstream — last-write-wins — if
    not).
    """
    o = _content_hash(old, id_col, compare_cols).withColumnRenamed("__h", "__h_old")
    n = _content_hash(new, id_col, compare_cols).withColumnRenamed("__h", "__h_new")
    j = o.join(n, id_col, "full")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(F.col(id_col), status.alias("status"))
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def incremental_dedup(
    new_batch: DataFrame,
    seen: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental corpus dedup: keep only rows of ``new_batch`` whose
    content fingerprint has never been seen in the historical corpus
    ``seen`` — the day-2 operation of every crawl pipeline (dedup today's
    shard against everything already ingested).

    Exact semantics via LEFT ANTI join on ``md5(text)``: the shuffle
    moves 16-byte digests only. At 100 TB-of-history scale, enable
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` — Spark injects a
    bloom prefilter on the probe side of exactly this join shape at
    runtime; and persist `seen`'s fingerprints as a sorted/bucketed table
    so repeated daily runs skip the re-hash.

    Returns the surviving new rows (original columns).
    """
    new_fp = new_batch.withColumn("__fp", F.md5(F.col(text_col)))
    seen_fp = seen.select(F.md5(F.col(text_col)).alias("__fp")).distinct()
    return new_fp.join(seen_fp, "__fp", "left_anti").drop("__fp")


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    id_col: str,
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """MERGE-INTO semantics: apply a changelog to a snapshot.

    ``changes`` rows carry ``op_col`` ∈ {'upsert', 'delete'} plus (for
    upserts) the full payload in the base's columns. When ``seq_col`` is
    given, multiple changes per id resolve last-write-wins by the
    highest sequence (deterministic tie-break impossible — require
    unique (id, seq)); otherwise ids must be unique in the changelog.

    Plan: one per-id reduction of the changelog (max_by over seq — a
    map-combined aggregate, never a window), then base LEFT ANTI
    changed-ids ∪ surviving upserts — the changelog, which is the small
    side in every incremental pipeline, is what shuffles/broadcasts; the
    base is touched by ONE anti join. This is the apply direction of
    :func:`snapshot_diff`: ``apply_changes(old, diff_as_changelog)``
    reconstructs the new snapshot exactly (pytest-pinned round trip).
    """
    cols = base.columns
    # fail loudly on ops outside the contract — anti-join-then-filter
    # semantics would otherwise DELETE rows whose op is merely
    # misspelled ('Upsert', 'update', NULL): touched ids leave the base,
    # but the replacement rows are filtered out. raise_error rides the
    # plan, so validation costs no extra job.
    changes = changes.withColumn(
        op_col,
        F.when(
            F.col(op_col).isin("upsert", "delete"), F.col(op_col)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "apply_changes: op must be 'upsert' or 'delete', "
                        "got: "
                    ),
                    F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
                )
            )
        ),
    )
    if seq_col is not None:
        payload = F.struct(*[F.col(c) for c in cols], F.col(op_col).alias("__op"))
        latest = (
            changes.groupBy(id_col_ := F.col(id_col).alias("__cid"))
            .agg(F.max_by(payload, F.col(seq_col)).alias("__p"))
            .select(
                F.col("__cid"),
                F.col("__p.__op").alias("__op"),
                *[F.col(f"__p.{c}").alias(c) for c in cols if c != id_col],
            )
        )
    else:
        latest = changes.select(
            F.col(id_col).alias("__cid"),
            F.col(op_col).alias("__op"),
            *[F.col(c) for c in cols if c != id_col],
        )
    touched = latest.select(F.col("__cid").alias(id_col)).distinct()
    kept = base.join(touched, id_col, "left_anti")
    upserts = latest.where(F.col("__op") == "upsert").select(
        F.col("__cid").alias(id_col), *[F.col(c) for c in cols if c != id_col]
    )
    return kept.unionByName(upserts)
