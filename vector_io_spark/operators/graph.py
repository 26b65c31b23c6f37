"""Distributed PageRank with an engine-exact fixed-point iteration.

Graph centrality is a standard data-curation signal (rank documents /
entities by link structure, weight training samples by influence). The
textbook float power-iteration accumulates in engine-specific order, so
it could only ever get rows-only checks; this implementation is exact:

- ranks live in integer PICO-RANK units (scale 1e12);
- each per-edge share is ``floor(rank / out_degree)`` — integer floor
  division, identical everywhere;
- the damping multiply happens once per node per iteration on a sum
  < 2^53 (one IEEE double multiply + round — bit-identical across
  engines), so iteration T is reproducible bit-for-bit and the DuckDB
  replay (:func:`pagerank_sql`, unrolled MATERIALIZED CTE rounds) must
  match hash-exactly.

Dangling nodes (no out-edges) leak their rank mass — the standard
simplification; totals then sum below 1, deterministically. Every
iteration is one edges⋈ranks shuffle + one dst-grouped aggregate
(map-side combined) — the classic distributed-PageRank shape; the rank
table is node-sized, never corpus-sized.

Reference context: vector-io has no graph operators; this extends the
curation surface (SURVEY north-star) following the published PageRank
formulation (Page et al. 1999).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # pico-rank units


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Exact fixed-point PageRank over a (src, dst) edge list (edges are
    deduplicated — simple-graph semantics). Returns (node, rank_q,
    rank): integer pico-rank and its double rendering."""
    import math

    from pyspark.sql import Window

    # r12 build (guide §2.4 remove shuffles outright): ONE edge-wide
    # exchange. hash-partitioning on src satisfies clustered-by-(src,
    # dst), so the dedup aggregate runs in-partition on the repartition
    # output with no second exchange, and the out-degree is a window
    # count over the same src clustering — the old distinct + degree
    # aggregate + edges⋈degree join + repartition chain (two edge-wide
    # exchanges, one node-wide exchange, one join) collapses into
    # repartition + in-stage dedup + in-stage window. A hot src key
    # concentrates in one partition either way (the loop's join needs
    # src clustering); the window only adds that partition's sort.
    # Interleaved A/B at sf0.1: warm 4.37 -> 3.84 s, equal results.
    ej = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition(F.col("src"))
        .dropDuplicates(["src", "dst"])
        .withColumn(
            "d", F.count("*").over(Window.partitionBy("src")).cast("long")
        )
        .persist()
    )
    nodes = (
        ej.select(F.col("src").alias("node"))
        .union(ej.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    m = ej.count()

    # r13 (guide §2.2 fewer/larger partitions, scale-adaptive): every
    # round re-scans both caches, and their partition count — the static
    # shuffle-partition setting — is what the per-round map stage
    # inherits (cached plans are exempt from AQE coalescing; profiled:
    # 64 near-empty tasks per round at bench scale, ~190 ms of pure
    # scheduling overhead each). After the counts are known, RE-PERSIST
    # each loop-side relation compacted to a byte-derived partition
    # count (~48 B/row in-memory, 64 MB/task target) and drop the wide
    # cache. The compaction is a shuffle-free coalesce and a no-op
    # whenever the data actually fills the partitions (at 100 TB the
    # byte-derived count exceeds the cache's), so the build's 32-way
    # parallelism for the window/dedup/distinct is untouched. The JOIN
    # SUBTREE still sees a plain InMemoryRelation probe side, keeping
    # the round's BroadcastHashJoin(ranks) shape (coalescing inside the
    # join subtree instead was measured to flip it to a per-round
    # edge-side shuffle — rejected). Integer arithmetic throughout, so
    # partitioning/order changes cannot move a bit.
    def _compacted(df: DataFrame, rows: int) -> DataFrame:
        have = df.rdd.getNumPartitions()
        want = max(1, min(have, (rows * 48 + (64 << 20) - 1) // (64 << 20)))
        if want >= have:
            return df
        small = df.coalesce(want).persist()
        small.count()
        df.unpersist()
        return small

    ej = _compacted(ej, m)
    nodes = _compacted(nodes, n)
    # half-away-from-zero on the SAME double the SQL replay computes —
    # Python's round() is banker's and would diverge on .5 boundaries
    r0q = int(math.floor(SCALE / n + 0.5))
    baseq = int(math.floor((1.0 - damping) * SCALE / n + 0.5))
    ranks = nodes.select("node", F.lit(r0q).cast("long").alias("rq"))
    zero = nodes.select(
        F.col("node").alias("dst"), F.lit(0).cast("long").alias("sh")
    )
    for _ in range(iters):
        # dangling/receiving-nothing nodes are kept by unioning a
        # zero-share row per node INTO the aggregation instead of a
        # nodes-side LEFT JOIN after it: sum(shares ∪ {0}) ==
        # coalesce(sum(shares), 0) exactly (integer arithmetic), and
        # each round drops from join+agg+join (3 exchanges) to
        # join+agg (2) — the union is shuffle-free
        ranks = (
            ej.join(ranks, ej["src"] == ranks["node"])
            .select(
                "dst",
                F.floor(F.col("rq") / F.col("d")).cast("long").alias("sh"),
            )
            .unionByName(zero)
            .groupBy("dst")
            .agg(F.sum("sh").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (
                    F.lit(baseq)
                    + F.round(F.lit(damping) * F.col("s")).cast("long")
                ).alias("rq"),
            )
        )
        # per-round materialization is LOAD-BEARING for the join
        # strategy, not just lineage: a checkpointed node-sized ranks
        # frame has a known (small) size, so every round plans
        # BroadcastHashJoin against the cached edge relation and the
        # edge list is never re-shuffled (plans/r12/
        # pagerank_round_after.txt). The lazy T-round chain was
        # measured marginally faster at sf0.1 (3.84 -> 3.69 s warm —
        # five fewer job boundaries) but plans SortMergeJoin with BOTH
        # sides exchanged per round — re-shuffling the corpus-scale
        # edge list T times at 100 TB (plans/r12/
        # supplier_pagerank_lazychain_rejected.txt shows the rejected shape) —
        # so the checkpoint stays.
        ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select(
        "node", "rq", F.round(F.col("rq") / F.lit(float(SCALE)), 9).alias("rank")
    )
    out = out.localCheckpoint(eager=True)
    ej.unpersist()
    nodes.unpersist()
    return out


def pagerank_sql(
    edges_sql: str,
    iters: int = 5,
    damping: float = 0.85,
) -> str:
    """DuckDB replay: ``edges_sql`` is a SELECT producing (src, dst);
    the power iteration unrolls into MATERIALIZED CTE rounds that must
    reproduce :func:`pagerank` bit-for-bit."""
    parts = [
        f"""
    edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})),
    nodes AS MATERIALIZED (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    deg AS MATERIALIZED (
        SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src
    ),
    r0 AS MATERIALIZED (
        SELECT node,
               CAST(round({SCALE} / (SELECT n FROM nn)) AS BIGINT) AS rq
        FROM nodes
    )"""
    ]
    for t in range(1, iters + 1):
        parts.append(f"""
    c{t} AS MATERIALIZED (
        SELECT e.dst AS node,
               CAST(sum(CAST(floor(r.rq / g.d) AS BIGINT)) AS BIGINT) AS s
        FROM edges e
        JOIN r{t - 1} r ON e.src = r.node
        JOIN deg g ON e.src = g.src
        GROUP BY e.dst
    ),
    r{t} AS MATERIALIZED (
        SELECT n.node,
               CAST(round((1.0 - {damping}) * {SCALE} / (SELECT n FROM nn))
                    AS BIGINT)
               + CAST(round({damping} * coalesce(c.s, 0)) AS BIGINT) AS rq
        FROM nodes n LEFT JOIN c{t} c ON n.node = c.node
    )""")
    select = (
        f"SELECT node, rq, round(rq / {float(SCALE)}, 9) AS rank "
        f"FROM r{iters}"
    )
    return "WITH " + ",".join(parts) + "\n    " + select


def degree_oriented_edges(
    edges: DataFrame, a_col: str = "part_a", b_col: str = "part_b"
) -> DataFrame:
    """Orient each undirected edge low-degree → high-degree endpoint
    (tie-break by key): returns (src, dst, deg_dst) where (deg(src),
    src) < (deg(dst), dst) lexicographically.

    This is the skew-proof canonical orientation for wedge-based
    triangle counting (Suri & Vassilvitskii's MR-triangles / Chiba-
    Nishizeki degree ordering): every vertex's OUT-degree in the
    oriented graph is bounded by O(√|E|) (more precisely by the graph's
    arboricity-related h-index), so the wedge join Σ outdeg² never
    quadratically explodes on a hot hub — a key-order orientation makes
    a low-keyed hub the wedge join key with C(deg,2) wedges, the
    classic triangle-counting skew blowup. The triangle SET is
    orientation-invariant, so results are identical to any other
    canonical orientation.

    Scale shape: one degree rollup (map-combined) + two hash joins on
    the endpoint keys — the same keys the wedge join shuffles on; the
    degree table is |V|-sized and stays distributed (no broadcast
    assumption, parts can be billions at 100 TB).
    """
    deg = (
        edges.select(F.col(a_col).alias("v"))
        .unionAll(edges.select(F.col(b_col).alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    ed = edges.join(
        deg.select(F.col("v").alias(a_col), F.col("deg").alias("__da")), a_col
    ).join(
        deg.select(F.col("v").alias(b_col), F.col("deg").alias("__db")), b_col
    )
    a_first = F.struct(F.col("__da"), F.col(a_col)) < F.struct(
        F.col("__db"), F.col(b_col)
    )
    return ed.select(
        F.when(a_first, F.col(a_col)).otherwise(F.col(b_col)).alias("src"),
        F.when(a_first, F.col(b_col)).otherwise(F.col(a_col)).alias("dst"),
        F.when(a_first, F.col("__db")).otherwise(F.col("__da")).alias("deg_dst"),
    )


def oriented_wedges(oriented: DataFrame) -> DataFrame:
    """Open wedges (u → v, u → w) over a degree-oriented edge frame,
    with v before w in the (deg, key) total order — each candidate
    triangle generates exactly ONE wedge, anchored at its
    lowest-ordered vertex. Exposed separately so tests can pin the
    wedge-count bound on skewed fixtures.

    r13 shape (guide §2.4): grouped neighbor-list expansion instead of
    the w1 ⋈ w2 self-join on src. The self-join exchanged the SAME
    cached frame twice and sorted both sides (profiled: the two
    heaviest stages of copurchase_triangles); the groupBy exchanges it
    once and the ordered (i < j) pairs stream out of a nested explode.
    Same pair set: neighbors sorted by (deg, key) == the old
    struct(__dv, v) < struct(__dw, w) predicate. Peak memory is the
    per-src neighbor LIST, O(out-degree) = the orientation's O(√|E|)
    cap — the C(out-degree, 2) pair set is never materialized at once
    (outer posexplode streams, inner explode sees a ≤ out-degree
    slice)."""
    nbrs = (
        oriented.groupBy("src")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("deg_dst"), F.col("dst")))
            ).alias("__ns")
        )
        .where(F.size("__ns") >= 2)
    )
    return (
        nbrs.select(
            "src", F.posexplode("__ns").alias("__i", "__v"), "__ns"
        )
        .select(
            "src",
            F.col("__v.dst").alias("v"),
            F.explode(
                F.slice(F.col("__ns"), F.col("__i") + 2, F.size("__ns"))
            ).alias("__w"),
        )
        .select("src", "v", F.col("__w.dst").alias("w"))
    )


def triangle_counts(
    edges: DataFrame, a_col: str = "part_a", b_col: str = "part_b"
) -> DataFrame:
    """Per-vertex triangle participation counts over an undirected edge
    list (each edge once, any orientation): (p_partkey, n_triangles).

    Wedge-join algorithm on the degree-ordered orientation
    (:func:`degree_oriented_edges`): wedges anchored at the
    lowest-(deg,key) vertex, closed by an equi-join against the
    oriented edge (v → w) — which is how the closing edge MUST be
    oriented, since v precedes w in the same total order. Each triangle
    materializes exactly once; exploding its three vertices and
    counting gives the per-vertex tally.

    Scale shape: degree rollup + two degree-attach joins + one wedge
    self-join on src + one closing join on (v, w) — all hash joins on
    vertex keys, wedge volume bounded by the orientation (no hub
    blowup), nothing driver-side. The oriented frame persists once
    (feeds the wedge pair + the closing probe) and is released after
    the (triangle-set-sized) result materializes."""
    oriented = degree_oriented_edges(edges, a_col, b_col).persist()
    oriented.count()  # eager fill: three readers race otherwise
    closed = oriented_wedges(oriented).join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
    )
    out = (
        closed.select(F.explode(F.array("src", "v", "w")).alias("p_partkey"))
        .groupBy("p_partkey")
        .agg(F.count("*").alias("n_triangles"))
    )
    out = out.localCheckpoint(eager=True)
    oriented.unpersist()
    return out
