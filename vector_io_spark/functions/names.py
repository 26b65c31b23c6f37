"""Name-compliance and id-normalization functions (reference SURVEY.md §2.8).

Each target DB constrains identifier names; the reference implements one
ad-hoc rename per connector. Here they are column expressions (for data)
plus plain-python variants (for catalog names on the driver).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# --- column-expression forms ------------------------------------------------

def compliant_name_pinecone(c: Column | str) -> Column:
    """lower + '_' -> '-' (pinecone_import.py:108-110)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.lower(c), "_", "-")


def compliant_name_kdbai(c: Column | str) -> Column:
    """'-' -> '_', leading '_' -> 'col_' prefix (kdbai_import.py:78-82)."""
    c = F.col(c) if isinstance(c, str) else c
    replaced = F.regexp_replace(c, "-", "_")
    return F.when(
        replaced.startswith("_"), F.concat(F.lit("col"), replaced)
    ).otherwise(replaced)


def compliant_name_astra(c: Column | str) -> Column:
    """regex [- ./] -> '_' (astradb_import.py:272-273)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(c, "[- ./]", "_")


def compliant_name_milvus(c: Column | str) -> Column:
    """'-' -> '_' (milvus_import.py:93-95)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(c, "-", "_")


def deterministic_uuid_expr(c: Column | str) -> Column:
    """String id -> deterministic UUID via md5, for Qdrant's int/UUID-only
    id constraint (get_qdrant_id_from_id, util.py:413-420): the md5 hex of
    the id reshaped as 8-4-4-4-12. Valid-UUID inputs pass through.
    """
    c = (F.col(c) if isinstance(c, str) else c).cast("string")
    uuid_re = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
    h = F.md5(c)
    derived = F.concat_ws(
        "-",
        h.substr(1, 8),
        h.substr(9, 4),
        h.substr(13, 4),
        h.substr(17, 4),
        h.substr(21, 12),
    )
    return F.when(c.rlike(uuid_re), c).otherwise(derived)


# --- driver-side (catalog) forms -------------------------------------------

def pinecone_index_name(name: str) -> str:
    return name.lower().replace("_", "-")


def kdbai_table_name(name: str) -> str:
    name = name.replace("-", "_")
    return f"col{name}" if name.startswith("_") else name


def astra_keyspace_name(name: str) -> str:
    import re

    return re.sub(r"[- ./]", "_", name)


def create_new_name(existing: list[str], base: str) -> str:
    """Collision-free naming 'name-2', 'name-3', ... for --create_new
    (create_new_name, vdf_import_cls.py:237-262)."""
    if base not in existing:
        return base
    suffixes = [0]
    for n in existing:
        if n == base:
            suffixes.append(1)
        elif n.startswith(base + "-"):
            tail = n[len(base) + 1 :]
            if tail.isdigit():
                suffixes.append(int(tail))
    return f"{base}-{max(suffixes) + 1}"
