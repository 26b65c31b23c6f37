"""Join operators (reference SURVEY.md §2.4).

Physical-strategy policy for 100 TB:
- id-list / id-universe side is always small -> ``broadcast()`` explicitly,
  so the big fact side never shuffles.
- vectors ⟗ metadata at scale is a sort-merge join on id; both inputs come
  from the same export so pre-partitioning by id (or bucketed tables) makes
  it shuffle-free — callers can ``repartition(id)`` both sides once and
  reuse the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def vectors_metadata_outer_join(
    vectors: DataFrame,
    metadata: DataFrame,
    id_col: str = "id",
    collision_prefix: str = "metadata_",
) -> DataFrame:
    """The core export join: vectors FULL OUTER metadata on id, with
    collision-rename ``metadata_<col>`` for duplicate non-id columns
    (save_vectors_to_parquet, vdb_export_cls.py:68-84).

    Scale note: full-outer on id is a shuffle on both sides; when both
    frames derive from the same scan partitioning this collapses to a
    zipper merge under AQE. Skewed ids don't exist (ids unique per side).
    """
    vec_cols = set(vectors.columns) - {id_col}
    renames = {
        c: collision_prefix + c for c in metadata.columns if c != id_col and c in vec_cols
    }
    meta = metadata
    for old, new in renames.items():
        meta = meta.withColumnRenamed(old, new)
    return vectors.join(meta, on=id_col, how="outer")


def key_union_join(frames: dict[str, DataFrame], id_col: str = "id") -> DataFrame:
    """Multi-vector key-union: ids = union of per-column frames; missing
    vectors stay NULL (qdrant_import.py:286-299 builds the same universe
    with dict-key union).

    Implemented as a chain of FULL OUTER joins on id — Catalyst plans one
    shuffle per frame on the same key, and AQE coalesces. ``frames`` maps
    output column name -> DataFrame with (id, <any single value column>).
    """
    if not frames:
        raise ValueError("key_union_join: frames is empty")
    out: DataFrame | None = None
    for name, df in frames.items():
        vals = [c for c in df.columns if c != id_col]
        if not vals:
            raise ValueError(
                f"key_union_join: frame {name!r} has no value column "
                f"besides {id_col!r} (columns: {df.columns})"
            )
        cur = df.select(id_col, F.col(vals[0]).alias(name))
        out = cur if out is None else out.join(cur, on=id_col, how="outer")
    return out


def semi_join_id_list(df: DataFrame, ids: DataFrame, id_col: str = "id") -> DataFrame:
    """id ∈ file-backed list (pinecone_import.py:189-196): LEFT SEMI with
    the list side broadcast — the 100 TB side never moves."""
    return df.join(
        broadcast(ids.selectExpr(f"{ids.columns[0]} as {id_col}")), on=id_col, how="left_semi"
    )


def anti_join_missing_ids(
    universe: DataFrame, present: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Missing-id detection: universe MINUS present (get_id_list.py:40-46
    builds range(1,max) and subtracts seen ids). LEFT ANTI join; the
    present side is aggregated to distinct ids first so the anti join
    shuffles ids only, not payloads."""
    return universe.select(id_col).join(
        present.select(id_col).distinct(), on=id_col, how="left_anti"
    )
