"""VDF dataset reader.

A VDF dataset (reference vdb_export_cls.py:23-32) is:

    <dataset_dir>/
      VDF_META.json                    # catalog (meta_types.py:5-29)
      <index>[_<namespace>]/*.parquet  # one subdir per (index, namespace)

The reader returns one DataFrame per (index, namespace) — lazy scans; no
data moves until an action. At 100 TB each namespace is a multi-file
parquet directory and Spark parallelizes by row-group natively.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from vector_io_spark.meta import NamespaceMeta, VDFMeta, read_meta


@dataclass
class VDFDataset:
    """An opened VDF dataset: catalog + a lazy DataFrame per namespace."""

    meta: VDFMeta
    # (index_name, namespace) -> DataFrame
    namespaces: dict[tuple[str, str], DataFrame]

    def df(self, index: str, namespace: str = "") -> DataFrame:
        return self.namespaces[(index, namespace)]

    @property
    def id_column(self) -> str:
        return self.meta.id_column or "id"


def _resolve_data_path(dataset_dir: str, ns: NamespaceMeta) -> str:
    """The reference stores ``data_path`` sometimes absolute, sometimes
    relative to the dataset dir (vdf_import_cls.py:120-135 probes both)."""
    candidates = [
        ns.data_path,
        os.path.join(dataset_dir, ns.data_path),
        os.path.join(dataset_dir, os.path.basename(ns.data_path.rstrip("/"))),
    ]
    for c in candidates:
        if c and os.path.isdir(c):
            return c
    raise FileNotFoundError(
        f"data_path {ns.data_path!r} for index {ns.index_name!r} not found "
        f"under {dataset_dir!r}"
    )


def read_vdf(
    spark: SparkSession,
    dataset_dir: str,
    columns: list[str] | None = None,
    max_num_rows: int | None = None,
) -> VDFDataset:
    """Open a VDF dataset directory.

    ``columns``/``max_num_rows`` mirror read_parquet_progress
    (util.py:423-473): column pruning (a requested column missing from the
    files yields an empty selection there; here we select the intersection)
    and a row cap. Both are pushed into the scan by Catalyst.
    """
    meta = read_meta(dataset_dir)
    namespaces: dict[tuple[str, str], DataFrame] = {}
    for index_name, ns_list in meta.indexes.items():
        for ns in ns_list:
            path = _resolve_data_path(dataset_dir, ns)
            df = spark.read.parquet(path)
            if columns is not None:
                present = [c for c in columns if c in df.columns]
                df = df.select(*present) if present else df.limit(0)
            if max_num_rows is not None:
                df = df.limit(max_num_rows)
            namespaces[(index_name, ns.namespace)] = df
    return VDFDataset(meta=meta, namespaces=namespaces)
