"""VDF catalog model — ``VDF_META.json``.

Schema-compatible with the reference's pydantic models
(``meta_types.py:5-29`` in the reference repo): a VDF dataset is a directory
of Parquet files catalogued by one JSON file with a two-level
index -> [namespace] hierarchy. Implemented as plain dataclasses (no
pydantic dependency); field names and JSON layout are byte-compatible.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Any

ID_COLUMN = "id"  # reference constants.py:2
DISK_SPACE_LIMIT_BYTES = 100 * 1024 * 1024  # reference constants.py:3
DEFAULT_BATCH_SIZE = 10_000  # reference constants.py:4

# Standard metric enum — the reference normalizes every DB's metric name to
# Qdrant's Distance enum values (util.py:159-248).
METRIC_COSINE = "Cosine"
METRIC_EUCLID = "Euclid"
METRIC_DOT = "Dot"
METRIC_MANHATTAN = "Manhattan"
STANDARD_METRICS = (METRIC_COSINE, METRIC_EUCLID, METRIC_DOT, METRIC_MANHATTAN)


@dataclass
class NamespaceMeta:
    """One exported (index, namespace) slice — reference meta_types.py:5-19."""

    namespace: str
    index_name: str
    total_vector_count: int
    exported_vector_count: int
    dimensions: int
    model_name: str | None = None
    vector_columns: list[str] = field(default_factory=lambda: ["vector"])
    # sparse columns: struct<indices: array<int>, values: array<float>>
    # (functions/sparse.py; Pinecone sparseValues / Qdrant sparse vectors)
    sparse_vector_columns: list[str] = field(default_factory=list)
    data_path: str = "."
    metric: str | None = None
    index_config: dict[str, Any] | None = None
    schema_dict_str: str | None = None
    model_map: dict[str, Any] | None = None

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "NamespaceMeta":
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass
class VDFMeta:
    """Top-level catalog — reference meta_types.py:22-29."""

    version: str
    file_structure: list[str]
    author: str
    exported_from: str
    indexes: dict[str, list[NamespaceMeta]]
    exported_at: str
    id_column: str | None = ID_COLUMN

    def to_dict(self) -> dict[str, Any]:
        d = asdict(self)
        d["indexes"] = {
            idx: [ns.to_dict() if isinstance(ns, NamespaceMeta) else ns for ns in nss]
            for idx, nss in self.indexes.items()
        }
        return d

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "VDFMeta":
        indexes = {
            idx: [NamespaceMeta.from_dict(ns) for ns in nss]
            for idx, nss in d.get("indexes", {}).items()
        }
        return cls(
            version=d.get("version", "unknown"),
            file_structure=d.get("file_structure", []),
            author=d.get("author", "unknown"),
            exported_from=d.get("exported_from", "unknown"),
            indexes=indexes,
            exported_at=d.get("exported_at", ""),
            id_column=d.get("id_column", ID_COLUMN),
        )


META_FILENAME = "VDF_META.json"


def read_meta(dataset_dir: str) -> VDFMeta:
    with open(os.path.join(dataset_dir, META_FILENAME)) as f:
        return VDFMeta.from_dict(json.load(f))


def write_meta(dataset_dir: str, meta: VDFMeta) -> str:
    os.makedirs(dataset_dir, exist_ok=True)
    path = os.path.join(dataset_dir, META_FILENAME)
    with open(path, "w") as f:
        json.dump(meta.to_dict(), f, indent=4, default=str)
    return path


# --- metric standardization (reference util.py:159-248) -------------------

_DB_METRIC_TO_STANDARD: dict[str, dict[str, str]] = {
    # per-DB metric-name -> standard enum; mirrors util.py:159-218
    "pinecone": {"cosine": METRIC_COSINE, "euclidean": METRIC_EUCLID, "dotproduct": METRIC_DOT},
    "qdrant": {m: m for m in STANDARD_METRICS},
    "milvus": {"COSINE": METRIC_COSINE, "L2": METRIC_EUCLID, "IP": METRIC_DOT},
    "chroma": {"cosine": METRIC_COSINE, "l2": METRIC_EUCLID, "ip": METRIC_DOT},
    "kdbai": {"cs": METRIC_COSINE, "l2": METRIC_EUCLID, "ip": METRIC_DOT},
    "lancedb": {"cosine": METRIC_COSINE, "l2": METRIC_EUCLID, "dot": METRIC_DOT},
    "vertexai_vectorsearch": {
        "COSINE_DISTANCE": METRIC_COSINE,
        "SQUARED_L2_DISTANCE": METRIC_EUCLID,
        "DOT_PRODUCT_DISTANCE": METRIC_DOT,
        "L1_DISTANCE": METRIC_MANHATTAN,
    },
    "turbopuffer": {"cosine_distance": METRIC_COSINE, "euclidean_squared": METRIC_EUCLID},
    "astradb": {"cosine": METRIC_COSINE, "euclidean": METRIC_EUCLID, "dot_product": METRIC_DOT},
}


def standardize_metric(metric: str | None, db: str) -> str:
    """DB-specific metric name -> standard enum; unknown -> Cosine + warn
    (reference util.py:221-232)."""
    table = _DB_METRIC_TO_STANDARD.get(db, {})
    if metric in table:
        return table[metric]
    for k, v in table.items():
        if metric is not None and k.lower() == str(metric).lower():
            return v
    import warnings

    warnings.warn(f"Unknown metric {metric!r} for db {db!r}; defaulting to Cosine")
    return METRIC_COSINE


def standardize_metric_reverse(metric: str | None, db: str) -> str:
    """Standard enum -> DB-specific name (reference util.py:235-248)."""
    table = {v: k for k, v in _DB_METRIC_TO_STANDARD.get(db, {}).items()}
    if metric in table:
        return table[metric]
    import warnings

    warnings.warn(f"Cannot reverse metric {metric!r} for db {db!r}; defaulting to cosine")
    return table.get(METRIC_COSINE, "cosine")


# --- catalog utilities ------------------------------------------------------

def canonicalize(obj):
    """Key-order-insensitive canonical form of a nested config
    (sort_recursive / convert_to_consistent_value, util.py:24-73): dicts
    sorted by key recursively, lists kept in order, scalars unchanged."""
    if isinstance(obj, dict):
        return {k: canonicalize(obj[k]) for k in sorted(obj)}
    if isinstance(obj, (list, tuple)):
        return [canonicalize(x) for x in obj]
    return obj


def config_hash(obj, length: int = 5) -> str:
    """md5 fingerprint of a canonicalized config, truncated to ``length``
    hex chars — the dataset-dir hash suffix (util.py:66-80)."""
    import hashlib
    import json

    blob = json.dumps(canonicalize(obj), sort_keys=True, default=str)
    return hashlib.md5(blob.encode()).hexdigest()[:length]


def dataset_dir_name(args: dict, now=None) -> str:
    """vdf_<timestamp>_<hash> (vdb_export_cls.py:30-32)."""
    from datetime import datetime, timezone

    ts = (now or datetime.now(timezone.utc)).strftime("%Y%m%d_%H%M%S")
    return f"vdf_{ts}_{config_hash(args)}"


def check_version_compatibility(dataset_version: str | None, library_version: str) -> bool:
    """Dataset-vs-library version check (vdf_import_cls.py:95-107): warn
    when the dataset was written by a NEWER library (unknown features);
    older or equal is fine. Returns True when compatible."""
    import warnings

    def parse(v: str) -> tuple[int, ...]:
        parts = []
        for p in str(v).split("."):
            digits = "".join(ch for ch in p if ch.isdigit())
            parts.append(int(digits) if digits else 0)
        return tuple(parts)

    if dataset_version is None:
        return True
    try:
        newer = parse(dataset_version) > parse(library_version)
    except Exception:
        return True
    if newer:
        warnings.warn(
            f"dataset written by newer library ({dataset_version} > "
            f"{library_version}); some fields may be unsupported"
        )
    return not newer
