#!/usr/bin/env python
"""Measure recall@k of every approximate ANN path against its exact
brute-force counterpart at a given scale (default the /tmp/sf1 replica —
regenerate with tools/make_replica.py, never hand-edit).

Each method is judged under ITS OWN metric and query set:

- lsh / lsh_multiprobe : cosine, vs brute_force_topk(metric='cosine')
- ivf / ivfpq          : cosine ranking over probed cells, vs brute cosine
- pq                   : L2 ADC ranking, vs brute_force_topk(metric='euclid')
- hamming_packed       : binary-quantization loss — exact hamming top-k
                         vs brute float cosine (measures the quantizer,
                         not the search, which is exact)

Prints one JSON line {method: {recall_at_k, seconds}} for BASELINE.md.

Usage: python tools/ann_recall.py [SF_DIR] [K]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def topk_sets(df, k):
    rows = df.collect()
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def recall(approx: dict, exact: dict) -> float:
    num = den = 0
    for q, want in exact.items():
        got = approx.get(q, set())
        num += len(got & want)
        den += len(want)
    return round(num / den, 4) if den else 0.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from vector_io_spark.operators.similarity import (
        brute_force_topk,
        hamming_topk,
        ivf_topk,
        ivfpq_topk,
        lsh_bucketed_topk,
        pq_topk,
    )
    from vector_io_spark.functions.vectors import quantize_embeddings
    from vector_io_spark.queries import _t
    from vector_io_spark.session import get_spark

    spark = get_spark(app_name="ann_recall")
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb.count()  # warm
    queries = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    exact_cos = topk_sets(brute_force_topk(emb, queries, k=k), k)
    exact_l2 = topk_sets(
        brute_force_topk(emb, queries, k=k, metric="euclid"), k
    )

    results: dict = {}

    def run(name, fn, exact):
        t0 = time.perf_counter()
        approx = topk_sets(fn(), k)
        secs = round(time.perf_counter() - t0, 2)
        results[name] = {"recall_at_k": recall(approx, exact), "seconds": secs}

    run("lsh", lambda: lsh_bucketed_topk(
        emb, queries, k=k, num_planes=128, bands=8), exact_cos)
    run("lsh_multiprobe", lambda: lsh_bucketed_topk(
        emb, queries, k=k, num_planes=128, bands=8, multiprobe=1), exact_cos)
    run("ivf", lambda: ivf_topk(
        emb, queries, k=k, num_cells=16, nprobe=4, sample_fraction=0.5),
        exact_cos)
    run("ivfpq", lambda: ivfpq_topk(
        emb, queries, k=k, num_cells=16, nprobe=4, num_subspaces=16,
        codebook_size=64, max_train_rows=20_000), exact_cos)
    run("pq", lambda: pq_topk(
        emb, queries, k=k, num_subspaces=16, codebook_size=64,
        max_train_rows=20_000), exact_l2)

    packed = quantize_embeddings(
        emb, "embedding", "packed", precision="ubinary"
    ).select("vec_id", "packed")
    qpacked = quantize_embeddings(
        queries, "embedding", "packed", precision="ubinary"
    ).select("query_id", "packed")
    run("hamming_packed", lambda: hamming_topk(
        packed, qpacked, k=k), exact_cos)

    # ------------------------------------------------------------------
    # Filtered-ANN sweep (VERDICT r7 Next #2): the persisted catalogs'
    # `where=` filters candidates AFTER cell pruning, so a selective
    # predicate thins the probed cells and recall@k can drop silently
    # vs the exact filtered_topk truth. Sweep predicate selectivity
    # (~50% / 10% / 1%) x nprobe on BOTH catalogs; also report the
    # SHORTFALL rate (queries returning < k rows) — at high selectivity
    # the probed cells may simply not hold k matches.
    # ------------------------------------------------------------------
    import shutil
    import tempfile

    from vector_io_spark.operators.similarity import (
        filtered_topk,
        ivf_index_probe_topk,
        ivfpq_index_probe_topk,
        write_ivf_index,
        write_ivfpq_index,
    )

    sels = [("sel2", 2, 0.5), ("sel10", 10, 0.1), ("sel100", 100, 0.01)]
    embf = emb
    for col, mod, _frac in sels:
        embf = embf.withColumn(col, (F.col("vec_id") % mod).cast("int"))
    meta = tuple(c for c, _, _ in sels)
    base = tempfile.mkdtemp(prefix="ann_recall_filtered_")
    write_ivfpq_index(
        embf, f"{base}/ivfpq", num_cells=16, num_subspaces=16,
        codebook_size=64, max_train_rows=20_000, metadata_cols=meta,
    )
    write_ivf_index(
        embf, f"{base}/ivf", num_cells=16, metadata_cols=meta,
        max_train_rows=20_000,
    )

    filtered: dict = {"ivfpq": {}, "ivf": {}}
    for col, _mod, frac in sels:
        # exact truth: the filtered_topk operator itself (pre-filter
        # join semantics — every query constrained to <col> = 0)
        fq = queries.withColumn(col, F.lit(0).cast("int"))
        truth = topk_sets(
            filtered_topk(embf, fq, k=k, filter_cols=(col,)), k
        )
        for nprobe in (4, 8, 16):
            for method, probe in (
                ("ivfpq", ivfpq_index_probe_topk),
                ("ivf", ivf_index_probe_topk),
            ):
                t0 = time.perf_counter()
                approx = topk_sets(
                    probe(
                        spark, f"{base}/{method}", queries, k=k,
                        nprobe=nprobe, where=f"{col} = 0",
                    ),
                    k,
                )
                secs = round(time.perf_counter() - t0, 2)
                short = sum(
                    1 for q in truth
                    if len(approx.get(q, set())) < min(k, len(truth[q]))
                )
                filtered[method][f"sel={frac},nprobe={nprobe}"] = {
                    "recall_at_k": recall(approx, truth),
                    "short_queries": short,
                    "seconds": secs,
                }
    shutil.rmtree(base, ignore_errors=True)

    # ------------------------------------------------------------------
    # Late-interaction (maxsim) pruned-vs-exact recall (r8): the
    # candidate-pruned two-stage path against the exact maxsim truth,
    # 4x16-dim token split, swept over candidates_per_token x nprobe.
    # ------------------------------------------------------------------
    from vector_io_spark.operators.multivector import (
        maxsim_topk,
        maxsim_topk_pruned,
        write_token_index,
    )

    def _tok(df, id_alias):
        return df.select(
            F.col("vec_id").alias(id_alias),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("qpos"),
            "embedding",
        ).select(
            id_alias, "qpos",
            F.expr("slice(embedding, qpos*16+1, 16)").alias("vec"),
        )

    dt = _tok(emb, "doc_id").select("doc_id", "vec")
    mq = _tok(emb.where(F.col("vec_id") < 32), "query_id")
    tok_base = tempfile.mkdtemp(prefix="ann_recall_maxsim_")
    write_token_index(
        dt, f"{tok_base}/idx", num_cells=64, max_train_rows=50_000,
    )
    def doc_sets(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["doc_id"])
        return out

    maxsim_truth = doc_sets(maxsim_topk(dt, mq, k=k, metric="dot"))
    maxsim_res: dict = {}
    for c, np_ in ((32, 8), (64, 8), (128, 16)):
        t0 = time.perf_counter()
        approx = doc_sets(maxsim_topk_pruned(
            spark, f"{tok_base}/idx", dt, mq, k=k, metric="dot",
            candidates_per_token=c, nprobe=np_,
        ))
        maxsim_res[f"c={c},nprobe={np_}"] = {
            "recall_at_k": recall(approx, maxsim_truth),
            "seconds": round(time.perf_counter() - t0, 2),
        }
    shutil.rmtree(tok_base, ignore_errors=True)

    print(json.dumps(
        {"sf_dir": sf_dir, "k": k, "methods": results,
         "filtered": filtered, "maxsim_pruned": maxsim_res}
    ))


if __name__ == "__main__":
    main()
