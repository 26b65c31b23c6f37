"""Connected components + survivor selection + remote connector registry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.operators.dedup import (
    connected_components,
    dedup_survivors,
    minhash_lsh_dup_pairs,
)


def test_connected_components_chain(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    comps = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_cc_driver_path_restores_arrow_conf(spark):
    """The driver-local CC fast path flips the session Arrow conf for
    its collect/createDataFrame; it must RESTORE it before returning —
    a query path may not leave session-global conf drift behind
    (VERDICT r12 What's-wrong #4 / Next #8)."""
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key, "true")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    try:
        for forced in ("false", "true"):
            spark.conf.set(key, forced)
            out = {
                (r["id"], r["component"])
                for r in connected_components(pairs).collect()
            }
            assert out == {(1, 1), (2, 1), (3, 1)}
            assert spark.conf.get(key) == forced, "conf drift leaked"
    finally:
        spark.conf.set(key, prev)


def test_dedup_survivors_end_to_end(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(80).select("doc_id", "text")
    dup1 = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    dup2 = docs.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    corpus = docs.unionByName(dup1).unionByName(dup2)
    pairs = minhash_lsh_dup_pairs(
        corpus, "doc_id", "text", num_hashes=16, bands=8, threshold=0.99
    )
    survivors = dedup_survivors(corpus, pairs, "doc_id")
    # every row is in some pair (3 exact copies each), so survivors ==
    # one per component; distinct original docs may legitimately merge if
    # their texts are near-identical, so compare against the component
    # count rather than assuming 80
    n_components = (
        connected_components(pairs).select("component").distinct().count()
    )
    assert survivors.count() == n_components <= 80
    # each survivor is its component's min id — always an original
    assert survivors.agg(F.max("doc_id")).collect()[0][0] < 100000


def test_remote_connector_registry_importable():
    from vector_io_spark.sources.remote import CONNECTORS

    assert set(CONNECTORS) == {
        "qdrant", "pinecone", "milvus", "chroma", "lancedb", "turbopuffer",
        "vertexai_vectorsearch", "astradb", "astradb_cql", "kdbai",
        "vespa", "weaviate", "txtai", "azureai",
    }
    # constructors are import-gated with a clear message
    with pytest.raises(ImportError, match="qdrant_client"):
        CONNECTORS["qdrant"]("http://localhost:6333")


def test_hf_source_import_gated(spark):
    from vector_io_spark.sources.hf import push_to_hub, read_hf_dataset

    with pytest.raises(ImportError, match="huggingface_hub"):
        read_hf_dataset(spark, "user/ds")
    with pytest.raises(ImportError, match="huggingface_hub"):
        push_to_hub("/tmp/nope", "user/ds")


def test_hf_source_root_level_splits_and_empty_snapshot(
    spark, tmp_path, monkeypatch
):
    """ADVICE r6: '**/'-only allow_patterns download ZERO files from
    repos storing split shards at the repo ROOT (fnmatch '**/' needs a
    literal '/'), and the subsequent spark.read failed with an
    unrelated schema error. Pin (a) root-level patterns are requested,
    (b) an empty filtered snapshot raises a CLEAR error, (c) a
    root-level train-*.parquet snapshot reads fine."""
    import os
    import sys
    import types

    captured = {}
    snap = str(tmp_path / "snapshot")
    os.makedirs(snap)

    fake = types.ModuleType("huggingface_hub")

    def snapshot_download(repo_id, repo_type, allow_patterns):
        captured["patterns"] = allow_patterns
        return snap

    fake.snapshot_download = snapshot_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)
    # reimport-free: read_hf_dataset does a local import each call
    from vector_io_spark.sources.hf import read_hf_dataset

    # (b) empty snapshot -> clear error, not a schema-inference crash
    with pytest.raises(FileNotFoundError, match="no parquet files"):
        read_hf_dataset(spark, "user/ds", split="train")
    # (a) both nested and ROOT-level layouts are requested
    assert "train/*.parquet" in captured["patterns"]
    assert "train-*.parquet" in captured["patterns"]
    assert "**/train/*.parquet" in captured["patterns"]

    # (c) a root-level shard layout reads
    spark.range(5).toDF("id").coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "stage")
    )
    import glob
    import shutil

    src = glob.glob(str(tmp_path / "stage" / "*.parquet"))[0]
    shutil.copy(src, os.path.join(snap, "train-00000-of-00001.parquet"))
    got = read_hf_dataset(spark, "user/ds", split="train", max_num_rows=3)
    assert got.count() == 3

    # r7 review fix: the snapshot dir is a SHARED cache — the read and
    # the guard must be scoped to the requested split's patterns, or a
    # warm cache silently serves another split's rows
    spark.range(5, 7).toDF("id").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "stage2"))
    src2 = glob.glob(str(tmp_path / "stage2" / "*.parquet"))[0]
    shutil.copy(src2, os.path.join(snap, "test-00000-of-00001.parquet"))
    assert read_hf_dataset(spark, "user/ds", split="train").count() == 5
    assert read_hf_dataset(spark, "user/ds", split="test").count() == 2
    with pytest.raises(FileNotFoundError, match="no parquet files"):
        read_hf_dataset(spark, "user/ds", split="tset")  # typo'd split


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 300-link path graph: plain min-propagation needs 300 rounds;
    pointer jumping must converge within max_iter=12 (2^12 >> 300) and
    label every node with the chain's min id. collect_max=0 forces the
    DISTRIBUTED kernel — the r12 driver fast path would otherwise
    absorb a graph this small."""
    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    labels = connected_components(pairs, max_iter=12, collect_max=0)
    distinct = labels.select("component").distinct().collect()
    assert [r["component"] for r in distinct] == [0]
    assert labels.count() == n + 1


def test_connected_components_three_kernels_agree(spark):
    """r12 A/B (VERDICT r11 Next #3) + driver fast path: the driver
    numpy kernel (the default for bounded graphs), the distributed
    pointer-jumping loop, and the alternating large-star/small-star
    kernel must produce the identical (id, component) labeling on the
    adversarial shapes — a chain, a star with a high-id hub, and a
    self-pair-only frame (the dense random graph is pinned driver-side
    against a brute-force union-find in
    test_connected_components_driver_path_deep_shapes).

    Distributed kernels run on FEW-ROUND graphs only: each distributed
    round costs seconds of fixed job latency at local[32], and the r11
    shapes (300-chain, dense 200-node random graph — 10-20 rounds) ran
    this one test past 10 minutes; the 300-chain distributed pin lives
    in test_connected_components_long_chain_pointer_jumping, and the
    driver kernel covers the deep shapes here (chain300 + dense random
    against the chain's known labeling / pj on a trimmed variant)."""
    cases = {
        "chain24": [(i, i + 1) for i in range(24)],
        "hub_star": [(999, i) for i in range(20)],
        "self_pairs": [(5, 5), (9, 9), (5, 9)],
    }
    for name, rows in cases.items():
        pairs = spark.createDataFrame(rows, "id_a long, id_b long")
        dr = {
            (r["id"], r["component"])
            for r in connected_components(pairs).collect()
        }
        pj = {
            (r["id"], r["component"])
            for r in connected_components(pairs, collect_max=0).collect()
        }
        tp = {
            (r["id"], r["component"])
            for r in connected_components(
                pairs, algorithm="two_phase", collect_max=0
            ).collect()
        }
        assert dr == pj, f"driver vs pointer_jump diverge on {name}"
        assert pj == tp, f"labelings diverge on {name}"


def test_connected_components_driver_path_deep_shapes(spark):
    """Driver-kernel coverage of the shapes too deep to re-run
    distributed here: a 300-link chain labels to all-zero, and the
    dense 200-node random graph's labeling is invariant under adding
    reversed duplicate pairs (set semantics) and matches a brute-force
    union-find computed in the test."""
    import random

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "id_a long, id_b long"
    )
    labels = connected_components(pairs)
    assert {r["component"] for r in labels.collect()} == {0}
    assert labels.count() == 301

    rng = random.Random(7)
    rand_pairs = [
        (rng.randrange(0, 200), rng.randrange(0, 200)) for _ in range(150)
    ]
    rows = rand_pairs + [(b, a) for a, b in rand_pairs[:40]]
    # brute-force reference union-find
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for n in parent:
        want[n] = find(n)
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(rows, "id_a long, id_b long")
        ).collect()
    }
    assert got == want


def test_connected_components_driver_cap_falls_back_distributed(spark):
    """collect_max smaller than the pair count must route to the
    distributed kernel (same labeling); int ids and the empty frame
    round-trip the driver path with matching dtypes."""
    rows = [(1, 2), (2, 3), (10, 11)]
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    over_cap = {
        (r["id"], r["component"])
        for r in connected_components(pairs, collect_max=2).collect()
    }
    driver = {
        (r["id"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert over_cap == driver == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}

    p32 = spark.createDataFrame(rows, "id_a int, id_b int")
    out32 = connected_components(p32)
    assert dict(out32.dtypes) == {"id": "int", "component": "int"}
    assert {(r["id"], r["component"]) for r in out32.collect()} == over_cap

    empty = spark.createDataFrame([], "id_a long, id_b long")
    out_e = connected_components(empty)
    assert out_e.collect() == []
    assert dict(out_e.dtypes) == {"id": "bigint", "component": "bigint"}


def test_connected_components_two_phase_nonconvergence_raises(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(600)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="two_phase.*did not converge"):
        connected_components(
            pairs, max_iter=1, algorithm="two_phase", collect_max=0
        )


def test_connected_components_unknown_algorithm_refuses(spark):
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="algorithm"):
        connected_components(pairs, algorithm="frontier")


def test_connected_components_nonconvergence_raises(spark):
    """With max_iter too small for the diameter, raise instead of
    returning a partially merged labeling."""
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2, collect_max=0)


def test_lsh_max_bucket_cap_drops_mega_bucket_only(spark):
    """max_bucket_size excludes boilerplate mega-buckets from pair
    generation while pairs from small buckets survive — the worst-case
    guard for template/empty-page clusters whose band bucket would
    otherwise self-join quadratically."""
    from vector_io_spark.operators.dedup import minhash_lsh_dup_pairs

    # 30 identical boilerplate docs (one mega bucket) + 2 distinct
    # near-dup docs that share a small bucket
    boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit")
              for i in range(30)]
    near = [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "the quick brown fox jumps over the lazy dog today"),
    ]
    df = spark.createDataFrame(boiler + near, "doc_id long, text string")

    uncapped = minhash_lsh_dup_pairs(df, "doc_id", "text", threshold=0.4)
    capped = minhash_lsh_dup_pairs(
        df, "doc_id", "text", threshold=0.4, max_bucket_size=10
    )
    un_pairs = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cap_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in un_pairs and (100, 101) in cap_pairs
    # the 30-doc boilerplate cluster contributes C(30,2)=435 pairs
    # uncapped and zero capped (every band bucket holds all 30)
    assert len(un_pairs) == 435 + 1
    assert cap_pairs == {(100, 101)}


def test_incremental_lsh_equals_symmetric_restricted_to_new(spark, sf_dir):
    """Contract: the asymmetric incremental pass returns EXACTLY the
    symmetric operator's pairs restricted to pairs involving the new
    batch — and never an old x old pair."""
    from vector_io_spark.operators.dedup import (
        minhash_lsh_dup_pairs,
        minhash_lsh_incremental_pairs,
    )

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 300)
    )
    new = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(F.reverse("text"))
        .alias("text"),
    )
    inc = minhash_lsh_incremental_pairs(
        d, new, "doc_id", "text", threshold=0.5
    )
    full = minhash_lsh_dup_pairs(
        d.unionByName(new), "doc_id", "text", threshold=0.5
    )
    got = {(r["id_a"], r["id_b"], r["est_jaccard"]) for r in inc.collect()}
    want = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in full.collect()
        if r["id_a"] >= 1000000 or r["id_b"] >= 1000000
    }
    assert got == want and got
    assert all(a >= 1000000 or b >= 1000000 for a, b, _ in got)


def test_incremental_lsh_with_persisted_signature_index(spark, sf_dir, tmp_path):
    """The persisted signature index replaces the resident-side text
    scan: loading (id, minhash) from parquet must produce the identical
    pair set as recomputing signatures."""
    from vector_io_spark.operators.dedup import (
        minhash_lsh_incremental_pairs,
        write_signature_index,
    )

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 200)
    )
    new = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    idx = str(tmp_path / "sig_index")
    write_signature_index(d, idx, "doc_id", "text")
    from_idx = minhash_lsh_incremental_pairs(
        None, new, "doc_id", "text",
        old_sigs=spark.read.parquet(idx),
    )
    recomputed = minhash_lsh_incremental_pairs(d, new, "doc_id", "text")
    a = {tuple(r) for r in from_idx.collect()}
    b = {tuple(r) for r in recomputed.collect()}
    assert a == b and a


def test_incremental_components_match_full_recompute(spark):
    """Contract: contracting old endpoints to their component ids and
    running components over the NEW pairs only yields exactly the full
    old∪new recompute for every touched node — including a new doc
    merging two previously separate old clusters."""
    from vector_io_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    # resident graph: {1,2,3} (comp 1), {10,11} (comp 10), {20,21} (comp
    # 20), singleton 30 implicitly absent from comp_old
    old_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    comp_old = connected_components(old_pairs)

    # new batch: 100 joins cluster 1; 101 MERGES clusters 10 and 20;
    # 102-103 form a brand-new cluster
    new_pairs = spark.createDataFrame(
        [(2, 100), (11, 101), (21, 101), (102, 103)],
        "id_a long, id_b long",
    )
    inc = {
        r["id"]: r["component"]
        for r in incremental_components(comp_old, new_pairs).collect()
    }
    full = {
        r["id"]: r["component"]
        for r in connected_components(
            old_pairs.unionByName(new_pairs)
        ).collect()
    }
    # new docs get exactly the full-recompute assignment
    for nid in (100, 101, 102, 103):
        assert inc[nid] == full[nid], (nid, inc.get(nid), full.get(nid))
    # the merge is visible: old component ids 10 and 20 relabel to 10
    assert inc[10] == 10 and inc[20] == 10
    assert full[21] == 10 and full[11] == 10
    # untouched resident cluster 1's supernode maps to itself
    assert inc[1] == 1


def _unique_words(i: int, n: int) -> str:
    """n letter-only pseudo-random words unique to doc i — documents
    built from these share zero shingles (the tokenizer is [a-z]+, so
    words must avoid digits)."""
    import hashlib

    tr = str.maketrans("0123456789", "ghijklmnop")
    return " ".join(
        hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8].translate(tr)
        for j in range(n)
    )


def test_lsh_auto_bucket_guard_is_default_and_data_sized(spark):
    """Round-4 contract: the hot-bucket guard is ON by default
    ("auto"), sized from the corpus's own occupancy stats — a
    boilerplate mega-bucket larger than the derived cap is excluded
    from pair generation WITHOUT the caller knowing the knob exists,
    while true near-dup pairs in ordinary buckets survive. Explicit
    None restores exact banding (the oracle carve-out)."""
    from vector_io_spark.operators.dedup import (
        AUTO_BUCKET_CAP_FLOOR,
        minhash_lsh_dup_pairs,
    )

    # 200 identical boilerplate docs -> one 200-deep bucket per band
    # (> the 64 floor); 100 truly LSH-distinct docs (per-doc random
    # letter-only words, so NO shared shingles — shared template words
    # would capture the min-hash and inflate mean occupancy) keep mean
    # occupancy ~3 so the auto cap lands on the floor; one true
    # near-dup pair must survive the guard.
    boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit")
              for i in range(200)]
    distinct = [(1000 + i, _unique_words(i, 8)) for i in range(100)]
    near = [
        (2000, "the quick brown fox jumps over the lazy dog tonight"),
        (2001, "the quick brown fox jumps over the lazy dog today"),
    ]
    df = spark.createDataFrame(
        boiler + distinct + near, "doc_id long, text string"
    )

    default_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dup_pairs(
            df, "doc_id", "text", threshold=0.4
        ).collect()
    }
    exact_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dup_pairs(
            df, "doc_id", "text", threshold=0.4, max_bucket_size=None
        ).collect()
    }
    # exact banding sees the full C(200,2) boilerplate blowup
    assert len(exact_pairs) >= 200 * 199 // 2
    # the default guard drops the mega-bucket (its 200 > 64-floor cap)
    # but keeps the ordinary near-dup pair — bounded recall cost
    assert (2000, 2001) in default_pairs
    assert all(not (a < 200 and b < 200) for a, b in default_pairs)
    assert AUTO_BUCKET_CAP_FLOOR == 64


def test_lsh_auto_guard_noop_on_unskewed_corpus(spark, sf_dir):
    """On a corpus without mega-buckets the auto cap never binds:
    default results are IDENTICAL to exact banding — the guard costs
    recall only where occupancy is pathological."""
    from vector_io_spark.operators.dedup import minhash_lsh_dup_pairs

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 400)
    )
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    auto = {
        tuple(r)
        for r in minhash_lsh_dup_pairs(
            corpus, "doc_id", "text", threshold=0.5
        ).collect()
    }
    exact = {
        tuple(r)
        for r in minhash_lsh_dup_pairs(
            corpus, "doc_id", "text", threshold=0.5, max_bucket_size=None
        ).collect()
    }
    assert auto == exact and auto


def test_minhash_bucket_occupancy_reports_skew(spark):
    """The occupancy report must expose a mega-bucket (max_bucket far
    above auto_cap, rows_over_cap > 0) so an operator sees the skew
    BEFORE the pair join, and its auto_cap column must equal the cap
    the "auto" guard derives."""
    from vector_io_spark.operators.dedup import minhash_bucket_occupancy

    boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit")
              for i in range(200)]
    distinct = [(1000 + i, _unique_words(i, 8)) for i in range(100)]
    df = spark.createDataFrame(boiler + distinct, "doc_id long, text string")
    rows = minhash_bucket_occupancy(df, "doc_id", "text", bands=8).collect()
    assert len(rows) == 8
    by_band = {r["band_id"]: r for r in rows}
    for r in rows:
        assert r["max_bucket"] >= 200          # the boilerplate bucket
        assert r["rows_over_cap"] >= 200       # ...exceeds the cap
        assert r["max_bucket"] > r["auto_cap"]
        # candidate volume is dominated by the mega-bucket: C(200,2)
        assert r["candidate_pairs"] >= 200 * 199 // 2
        assert r["n_rows"] == 300
    assert len(by_band) == 8


def test_triangle_counts_degree_orientation_bounds_hub_wedges(spark):
    """Star graph with a LOW-KEYED hub (key-order orientation would
    anchor every wedge at the hub → C(n,2) wedges): degree ordering
    must orient every spoke edge spoke→hub, so the hub anchors ZERO
    wedges and total wedge volume stays O(n) — while the triangle
    counts remain exact."""
    from vector_io_spark.operators.graph import (
        degree_oriented_edges,
        oriented_wedges,
        triangle_counts,
    )

    n = 50
    # hub = 0 (smallest key), spokes 1..n; plus one triangle 1-2 and
    # one triangle among spokes 3-4 closed through the hub
    edges = [(0, i) for i in range(1, n + 1)] + [(1, 2), (3, 4)]
    df = spark.createDataFrame(edges, "part_a long, part_b long")

    oriented = degree_oriented_edges(df, "part_a", "part_b")
    rows = oriented.collect()
    # every spoke edge points INTO the hub (hub has max degree)
    assert all(r["dst"] == 0 for r in rows if 0 in (r["src"], r["dst"]))
    wedges = oriented_wedges(oriented.localCheckpoint(eager=True))
    n_wedges = wedges.count()
    # key-order orientation would give C(52,2)+... wedges at the hub;
    # degree order: each spoke has out-degree <= 2 -> O(n) wedges
    assert n_wedges <= 3 * n, n_wedges

    got = {
        r["p_partkey"]: r["n_triangles"]
        for r in triangle_counts(df, "part_a", "part_b").collect()
    }
    # triangles: (0,1,2) and (0,3,4)
    assert got == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}


def test_triangle_counts_matches_bruteforce_on_random_graph(spark):
    """Degree-ordered wedge counting is exact: equals a brute-force
    enumeration on a deterministic pseudo-random graph."""
    from itertools import combinations

    from vector_io_spark.operators.graph import triangle_counts

    import hashlib

    nodes = list(range(20))
    edges = []
    for u, v in combinations(nodes, 2):
        h = int(hashlib.md5(f"{u}-{v}".encode()).hexdigest()[:4], 16)
        if h % 4 == 0:  # ~25% density
            edges.append((u, v))
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    want: dict[int, int] = {}
    for x, y, z in combinations(nodes, 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for p in (x, y, z):
                want[p] = want.get(p, 0) + 1

    df = spark.createDataFrame(edges, "part_a long, part_b long")
    got = {
        r["p_partkey"]: r["n_triangles"]
        for r in triangle_counts(df, "part_a", "part_b").collect()
    }
    assert got == want and want


def test_embedding_incremental_equals_symmetric_restricted_to_new(spark, sf_dir):
    """Embedding-side incremental contract (mirrors the minhash one):
    the asymmetric new-vs-corpus pass returns EXACTLY the symmetric
    LSH operator's pairs restricted to pairs involving the new batch —
    never an old x old pair — for matching explicit cap settings."""
    from vector_io_spark.operators.dedup import (
        dedup_embedding_cosine,
        embedding_cosine_incremental_pairs,
    )

    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < 300)
    )
    # new batch: exact copies of even ids (cosine 1.0 vs resident),
    # plus negated odd ids (cosine -1.0 — must NOT pair)
    new = emb.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.when(
            F.col("vec_id") % 2 == 0, F.col("embedding")
        ).otherwise(F.transform("embedding", lambda x: -x)).alias("embedding"),
    )
    inc = embedding_cosine_incremental_pairs(
        emb, new, "vec_id", "embedding", threshold=0.995,
        max_bucket_size=None,
    )
    full = dedup_embedding_cosine(
        emb.unionByName(new), "vec_id", "embedding", threshold=0.995,
        method="lsh", max_bucket_size=None,
    )
    got = {(r["id_a"], r["id_b"], r["cos_sim"]) for r in inc.collect()}
    want = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in full.collect()
        if r["id_a"] >= 1000000 or r["id_b"] >= 1000000
    }
    assert got == want and got
    assert all(a >= 1000000 or b >= 1000000 for a, b, _ in got)


def test_embedding_incremental_with_persisted_signature_index(
    spark, sf_dir, tmp_path
):
    """Loading (id, sig) from the persisted embedding signature index
    must produce the identical pair set as re-signing the resident
    corpus."""
    from vector_io_spark.operators.dedup import (
        embedding_cosine_incremental_pairs,
        write_embedding_signature_index,
    )

    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < 200)
    )
    new = emb.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    idx = str(tmp_path / "emb_sig_index")
    write_embedding_signature_index(emb, idx, "vec_id", "embedding")
    from_idx = embedding_cosine_incremental_pairs(
        emb, new, "vec_id", "embedding", threshold=0.995,
        old_sigs=spark.read.parquet(idx), max_bucket_size=None,
    )
    recomputed = embedding_cosine_incremental_pairs(
        emb, new, "vec_id", "embedding", threshold=0.995,
        max_bucket_size=None,
    )
    a = {tuple(r) for r in from_idx.collect()}
    b = {tuple(r) for r in recomputed.collect()}
    assert a == b and a


def test_duplication_matrix_hot_fingerprint_no_pair_enumeration(spark):
    """Round-5 contract for the cross-source duplication matrix: a
    fingerprint duplicated m times must cost O(sources) counts rows,
    never O(m²) pair rows. A 30k-copy boilerplate text (20k in 'web',
    10k in 'mirror') would be ~4.5e8 join rows under pair enumeration;
    the count-based operator must (a) produce the exact combinatorial
    pair counts and (b) show a plan whose ONLY join runs over
    pre-aggregated (fp, source) counts — both join children aggregate
    before the join, so no per-document rows ever meet."""
    from vector_io_spark.operators.dedup import duplication_matrix

    n_web, n_mirror = 20_000, 10_000
    hot = spark.range(n_web + n_mirror).select(
        F.lit("aaaa").alias("fp"),
        F.when(F.col("id") < n_web, "web").otherwise("mirror").alias("source"),
    )
    # plus an ordinary shared text and a single-copy (no-pair) text
    extra = spark.createDataFrame(
        [("bbbb", "web"), ("bbbb", "mirror"), ("cccc", "web")],
        "fp string, source string",
    )
    result = duplication_matrix(hot.unionByName(extra))

    plan = result._jdf.queryExecution().optimizedPlan().toString()
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    assert len(join_lines) == 1, plan
    join_subtree = plan[plan.index(join_lines[0]) :]
    # both children of the join are aggregates: per-document rows never
    # participate in any join
    assert join_subtree.count("Aggregate") >= 2, plan

    rows = {(r["source_a"], r["source_b"]): r for r in result.collect()}
    assert rows[("mirror", "web")]["n_dup_pairs"] == n_web * n_mirror + 1
    assert rows[("mirror", "web")]["n_shared_texts"] == 2
    assert rows[("web", "web")]["n_dup_pairs"] == n_web * (n_web - 1) // 2
    assert rows[("web", "web")]["n_shared_texts"] == 1  # 'cccc' has no pair
    assert rows[("mirror", "mirror")]["n_dup_pairs"] == (
        n_mirror * (n_mirror - 1) // 2
    )
    assert set(rows) == {("mirror", "web"), ("web", "web"), ("mirror", "mirror")}


def test_incremental_lsh_auto_cap_equality_when_cap_binds(spark):
    """Round-5 contract: the restriction-equality (incremental pairs ==
    symmetric pairs on old ∪ new restricted to new-involving ones)
    holds at the DEFAULT max_bucket_size="auto" even when the guard
    BINDS. The incremental path derives ONE cap from the union-side
    banding — the same stats the symmetric auto guard sees. The r4
    per-side derivation broke this: a 110-member template cluster
    (100 copies in new) is under the union cap (high union occupancy →
    cap ≫ 110) but over the probe-side floor cap (probe occupancy ~2 →
    cap 64), so the probe side silently dropped all its pairs."""
    from vector_io_spark.operators.dedup import (
        minhash_lsh_dup_pairs,
        minhash_lsh_incremental_pairs,
    )

    tmpl_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    big_tmpls = [
        _unique_words(90000 + t, 10) for t in range(4)
    ]  # four 475-copy mega-clusters in old: push union occupancy up
    old_rows = (
        [(i, tmpl_a) for i in range(10)]
        + [(100 + t * 1000 + i, big_tmpls[t]) for t in range(4) for i in range(475)]
    )
    new_rows = (
        [(1_000_000 + i, tmpl_a) for i in range(100)]
        + [(2_000_000 + i, _unique_words(i, 8)) for i in range(100)]
    )
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    inc = minhash_lsh_incremental_pairs(old, new, "doc_id", "text", threshold=0.99)
    full = minhash_lsh_dup_pairs(
        old.unionByName(new), "doc_id", "text", threshold=0.99
    )
    got = {(r["id_a"], r["id_b"]) for r in inc.collect()}
    want = {
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_a"] >= 1_000_000 or r["id_b"] >= 1_000_000
    }
    assert got == want
    # the equality must be non-trivial: the kept-under-union-cap
    # template-A cluster contributes new-involving pairs...
    assert any(a < 100 or (1_000_000 <= a < 2_000_000) for a, b in got)
    # ...while the over-cap mega-clusters are excluded by both paths
    assert all(not (100 <= a < 5000 and 100 <= b < 5000) for a, b in got)


def test_embedding_incremental_auto_cap_equality_when_cap_binds(spark):
    """Same round-5 shared-cap contract for the embedding-vector
    incremental path: default-"auto" results equal the symmetric
    operator's restriction even when the guard binds."""
    from vector_io_spark.operators.dedup import (
        dedup_embedding_cosine,
        embedding_cosine_incremental_pairs,
    )
    import hashlib

    def vec(seed: str):
        h = hashlib.md5(seed.encode()).digest()
        return [float(b) / 255.0 + 0.01 for b in h[:8]]

    v_a = vec("cluster_a")
    big = [vec(f"big_{t}") for t in range(4)]
    old_rows = (
        [(i, v_a) for i in range(10)]
        + [(100 + t * 1000 + i, big[t]) for t in range(4) for i in range(475)]
    )
    new_rows = (
        [(1_000_000 + i, v_a) for i in range(100)]
        + [(2_000_000 + i, vec(f"unique_{i}")) for i in range(100)]
    )
    old = spark.createDataFrame(old_rows, "vec_id long, embedding array<double>")
    new = spark.createDataFrame(new_rows, "vec_id long, embedding array<double>")

    inc = embedding_cosine_incremental_pairs(
        old, new, "vec_id", "embedding", threshold=0.999
    )
    full = dedup_embedding_cosine(
        old.unionByName(new), "vec_id", "embedding",
        threshold=0.999, method="lsh",
    )
    got = {(r["id_a"], r["id_b"]) for r in inc.collect()}
    want = {
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_a"] >= 1_000_000 or r["id_b"] >= 1_000_000
    }
    assert got == want
    assert any(a < 100 or (1_000_000 <= a < 2_000_000) for a, b in got)
