"""JSONL → VDF dataset ingest.

Reference parity: the reference ships this workflow as driver-side
pandas loops in its notebooks (`jsonl_to_parquet.ipynb`,
`jsonltgz_to_parquet.ipynb`, `get_data_from_json.ipynb` — read JSONL
shards, normalize, write parquet, then import). Spark-first it is one
distributed `spark.read.json` scan: line-delimited JSON splits by
newline across executors, `.gz` shards decompress per-file (gzip is
not splittable — one task per shard, the right granularity for
shard-sized files), and the VDF commit is the standard size-rotated
writer + VDF_META.json.

Scale shape: schema inference samples the input (pass ``schema`` to
skip the extra pass at 100 TB — inference reads every byte otherwise);
everything else is one scan → one write, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_jsonl(
    spark,
    path,
    schema: str | None = None,
    vector_columns: tuple = (),
    drop_corrupt: bool = False,
):
    """Read line-delimited JSON (plain or ``.gz``/``.jsonl.gz`` shards;
    ``path`` may be a file, directory, glob, or list) as a DataFrame.

    ``schema`` (DDL string) skips the inference pass — REQUIRED
    practice at scale: without it Spark reads the entire input once
    just to infer types. ``vector_columns`` are cast to
    ``array<float>`` (JSON numbers infer as double/long; every
    vector consumer in this engine speaks float32). With
    ``drop_corrupt``, malformed lines are dropped (PERMISSIVE capture
    + filter) instead of surfacing as an all-null row.

    Scale shape: one distributed scan; newline-splittable for plain
    text, per-file tasks for gzip shards."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(
            schema + (", _corrupt_record string" if drop_corrupt else "")
        )
    elif drop_corrupt:
        reader = reader.option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    df = reader.json(path)
    if drop_corrupt and "_corrupt_record" in df.columns:
        df = df.where(F.col("_corrupt_record").isNull()).drop(
            "_corrupt_record"
        )
    for vc in vector_columns:
        if vc in df.columns:
            df = df.withColumn(
                vc, F.col(vc).cast("array<float>")
            )
    return df


def jsonl_to_vdf(
    spark,
    src,
    dataset_dir: str,
    index_name: str = "imported",
    namespace: str = "",
    id_column: str = "id",
    vector_columns: tuple = ("vector",),
    schema: str | None = None,
    metric: str | None = None,
    select: tuple = (),
    **write_kwargs,
) -> "object":
    """The notebooks' JSONL→parquet-dataset workflow as one distributed
    job: :func:`read_jsonl` → optional column projection → the VDF
    writer (size-rotated parquet + VDF_META.json). Returns the
    committed VDFMeta. ``select`` limits output columns (projection
    happens before the write — column pruning at the scan);
    ``id_column`` and any ``vector_columns`` present in the input are
    always retained so VDF_META.json never names absent columns."""
    from vector_io_spark.format.writer import write_vdf

    df: DataFrame = read_jsonl(
        spark, src, schema=schema, vector_columns=tuple(vector_columns)
    )
    if id_column not in df.columns:
        raise ValueError(
            f"jsonl_to_vdf: id column {id_column!r} not in input "
            f"columns {df.columns}"
        )
    if select:
        missing = [c for c in select if c not in df.columns]
        if missing:
            raise ValueError(
                f"jsonl_to_vdf: select columns {missing} not in input "
                f"columns {df.columns}"
            )
        # The committed VDF_META.json names id_column + vector_columns;
        # a projection that drops them would write a meta that points at
        # absent columns. Auto-append them so the catalog stays honest.
        keep = list(select)
        for required in (id_column, *vector_columns):
            if required in df.columns and required not in keep:
                keep.append(required)
        df = df.select(*keep)
    return write_vdf(
        {(index_name, namespace): df},
        dataset_dir,
        exported_from="vdf_spark_jsonl",
        id_column=id_column,
        vector_columns=list(vector_columns),
        metric=metric,
        **write_kwargs,
    )
