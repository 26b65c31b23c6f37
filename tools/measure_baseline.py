#!/usr/bin/env python
"""Measure the reference-equivalent single-node pandas pipelines
(BASELINE.md 'Derived baseline for BENCH') and the Spark engine on the
same machine/scale, printing a comparison table to append to BASELINE.md.

The pandas implementations deliberately reproduce the reference's
execution model — row-at-a-time loops where the reference loops
(update_vectors iterrows, vdf_import_cls.py:227-232), batch loops for
re-embed (reembed.py:144-170) — with network I/O removed.
"""

from __future__ import annotations

import ast
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/baseline_out"


def t(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


# --- pandas pipelines (reference execution model) --------------------------

def pandas_roundtrip():
    """read -> per-row vector extraction (iterrows, the reference hot
    path) -> id-range mask -> write."""
    df = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    vectors = {}
    for _, row in df.iterrows():  # update_vectors, vdf_import_cls.py:227-232
        v = row["embedding"]
        if isinstance(v, np.ndarray):
            v = v.tolist()
        elif isinstance(v, (bytes, str)):
            v = ast.literal_eval(v if isinstance(v, str) else v.decode())
        vectors[row["vec_id"]] = [float(x) for x in v]
    mask = (df["vec_id"] >= 100) & (df["vec_id"] <= 1600)
    df[mask].to_parquet(f"{OUT}/pd_roundtrip.parquet")


def pandas_consolidate():
    """column-union + null-pad rewrite (consolidate_parquet.py:77-91)."""
    df = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    parts = [df[["doc_id", "text"]], df[["doc_id", "lang", "source"]],
             df[["doc_id", "n_chars"]]]
    all_cols = ["doc_id", "text", "lang", "source", "n_chars"]
    padded = [p.reindex(columns=all_cols) for p in parts]
    pd.concat(padded, ignore_index=True).to_parquet(f"{OUT}/pd_consolidated.parquet")


def pandas_count_ids():
    """count + sorted distinct id list + missing ids (count_rows.py,
    get_id_list.py)."""
    df = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    _ = len(df)
    ids = sorted(set(df["l_orderkey"]))
    id_set = set(ids)
    _missing = [i for i in range(ids[0], ids[-1] + 1) if i not in id_set]
    pd.Series(ids).to_csv(f"{OUT}/pd_ids.csv", index=False, header=False)


def pandas_reembed():
    """deterministic embedder, batch 96 (reembed.py:144-170 loop shape)."""
    from vector_io_spark.embed import hash_embed_batch

    df = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    texts = df["text"].tolist()
    vecs = []
    for start in range(0, len(texts), 96):
        vecs.extend(hash_embed_batch(texts[start : start + 96], 16))
    df["vec_text_hash_dim16"] = vecs
    df.to_parquet(f"{OUT}/pd_reembed.parquet")


# --- Spark equivalents ------------------------------------------------------

def spark_pipelines(spark):
    from pyspark.sql import functions as F

    from vector_io_spark.embed import reembed
    from vector_io_spark.format.consolidate import consolidate
    from vector_io_spark.functions.vectors import coerce_vector_column
    from vector_io_spark.sources.parquet_util import get_id_list, missing_ids

    def roundtrip():
        df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        df = coerce_vector_column(df, "embedding")
        df.where(F.col("vec_id").between(100, 1600)).write.mode("overwrite").parquet(
            f"{OUT}/sp_roundtrip.parquet"
        )

    def consolidate_p():
        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        parts = [
            df.select("doc_id", "text"),
            df.select("doc_id", "lang", "source"),
            df.select("doc_id", "n_chars"),
        ]
        consolidate(parts).write.mode("overwrite").parquet(f"{OUT}/sp_consolidated.parquet")

    def count_ids():
        li = f"{SF_DIR}/lineitem.parquet"
        spark.read.parquet(li).count()
        get_id_list(spark, li, "l_orderkey").write.mode("overwrite").csv(
            f"{OUT}/sp_ids.csv"
        )
        missing_ids(spark, li, "l_orderkey").count()

    def reembed_p():
        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out, _ = reembed(df, "text", dims=16)
        out.write.mode("overwrite").parquet(f"{OUT}/sp_reembed.parquet")

    return {
        "roundtrip": roundtrip,
        "consolidate": consolidate_p,
        "count_ids": count_ids,
        "reembed": reembed_p,
    }


def main():
    os.makedirs(OUT, exist_ok=True)
    pandas_times = {
        "roundtrip": t(pandas_roundtrip),
        "consolidate": t(pandas_consolidate),
        "count_ids": t(pandas_count_ids),
        "reembed": t(pandas_reembed),
    }
    from vector_io_spark.session import get_spark

    spark = get_spark(app_name="baseline_measure")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()  # warm up
    spark_fns = spark_pipelines(spark)
    spark_times = {name: t(fn) for name, fn in spark_fns.items()}

    print(f"| pipeline (sf={SF_DIR.rsplit('sf', 1)[-1]}) | pandas (reference model) s | spark s | ratio |")
    print("|---|---|---|---|")
    for name in pandas_times:
        p, s = pandas_times[name], spark_times[name]
        print(f"| {name} | {p} | {s} | {round(s / p, 2)}x |")
    tot_p = sum(pandas_times.values())
    tot_s = sum(spark_times.values())
    print(
        f"| **aggregate** | {round(tot_p, 3)} | {round(tot_s, 3)} | "
        f"{round(tot_s / tot_p, 2)}x |"
    )


if __name__ == "__main__":
    main()
