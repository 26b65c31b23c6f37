"""Semantic deduplication (SemDeDup-style): cluster the embedding space,
then prune near-duplicate members within each cluster.

Reference behavior contract: the reference engine has no semantic dedup —
this is a north-star extension (SURVEY.md extensions; Abbas et al.,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540). The paper's recipe is k-means clusters
+ within-cluster pairwise-cosine pruning keeping the member least similar
to the cluster centroid; we keep that exact prune rule but replace k-means
with DETERMINISTIC random-hyperplane cells (sign bits of
``functions.vectors.random_projection``) so the whole operator — cell
assignment, centroids, prune decisions — is reproducible bit-for-bit by a
SQL oracle (k-means cell assignment would be seed/implementation-defined
and unverifiable).

100 TB plan shape:
- cell assignment: codegen'd projection chain per row, zero shuffle;
- centroids: one partial-aggregated shuffle of (cell, dim, sum) — at most
  2^num_planes × dim rows survive the map-side combine, so the exchange
  is tiny no matter the corpus size; the centroid table (≤ 2^num_planes
  rows) is broadcast back, never the corpus;
- prune: an equi-join of the corpus with itself ON cell — the quadratic
  term is per-cell, so ``num_planes`` is the knob: size it so the
  expected cell population stays bounded (≈ log2(N / target_cell_size)),
  exactly how SemDeDup sizes its k-means k ∝ N. Only (id, cell, c2c)
  triples plus the candidate pairs shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from vector_io_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    random_projection,
)


def auto_num_planes(n_rows: int, target_cell_size: int = 64) -> int:
    """The SemDeDup plane-count rule as pure INTEGER arithmetic (so an
    oracle can replay it without float-log tie hazards): enough sign
    bits that the expected cell population is ≤ ``target_cell_size``,
    floored at 8. Equals max(8, bit_length(ceil(n/target) - 1)) — the
    SQL replica is ``greatest(8, length(bin((n + t - 1) // t - 1)))``
    (the bin('0')-has-length-1 edge lands below the floor, so both
    forms agree everywhere)."""
    cells_needed = (n_rows + target_cell_size - 1) // target_cell_size
    return max(8, (cells_needed - 1).bit_length())


def semdedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dims: int = 64,
    num_planes: int | str = 8,
    threshold: float = 0.95,
    seed: str = "s",
    target_cell_size: int = 64,
) -> DataFrame:
    """Semantic-dedup decision per row: (id, cell, c2c, keep).

    ``num_planes="auto"`` (round 6) sizes the cell grid from the
    corpus's own non-null count via :func:`auto_num_planes` — the knob
    the module docstring prescribes (planes ≈ log2(N / cell_size)),
    applied automatically so the within-cell quadratic term stays
    bounded at ANY corpus size instead of exploding when a caller
    forgets to re-derive it (the fixed-8 sf10 bench median was 444 s on
    a 400k corpus — ~1.5k-member cells; auto picks 13 planes there).
    Costs one extra count() scan at build time.

    - ``cell``: bit-string of hyperplane sign bits (deterministic
      md5-seeded axes — engine-portable).
    - ``c2c``: cosine of the row's vector to its cell centroid (the mean
      vector of the cell), rounded to 6 decimals.
    - ``keep``: False iff some other member of the same cell has cosine
      ≥ ``threshold`` with this row AND is strictly "more keepable" —
      lower centroid-similarity (SemDeDup keeps the member least similar
      to the centroid: it is the least redundant representative), ties
      broken on lower id. Exactly one member of every mutually-duplicate
      group survives.

    Rows with NULL vectors are excluded (they have no position in
    embedding space; route them to exact dedup instead — same guard as
    the LSH band paths in operators/dedup.py).
    """
    if num_planes == "auto":
        n = corpus.where(F.col(vec_col).isNotNull()).count()
        num_planes = auto_num_planes(n, target_cell_size)
    proj = random_projection(vec_col, in_dims, num_planes, seed=seed)
    cell = F.array_join(
        F.transform(proj, lambda x: F.when(x > 0, "1").otherwise("0")), ""
    )
    base = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(F.col(id_col), F.col(vec_col), cell.alias("cell"))
    )

    # per-cell centroid: posexplode -> (cell, pos) mean -> re-assemble the
    # array in pos order. Partial aggregation collapses the exchange to
    # ≤ cells × dim rows; the result is broadcast (≤ 2^num_planes rows).
    cent = (
        base.select("cell", F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("cv"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s["cv"],
            ).alias("centroid")
        )
    )

    scored = base.join(broadcast(cent), "cell").select(
        id_col,
        "cell",
        F.col(vec_col),
        cosine_similarity(F.col(vec_col), F.col("centroid")).alias("c2c"),
        # hoisted norm: computed once per row here instead of re-derived
        # inside every within-cell pair check (bit-identical — the pair
        # cosine below uses the same sqrt(dot(x,x)) subexpression)
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    # SHARED RELATION (r13, guide §5): scored feeds THREE consumers —
    # both sides of the within-cell pair join and the final keep join.
    # Uncached, Spark plans the whole subtree per reference (measured:
    # 12 parquet scans, the exploded-corpus centroid aggregation run
    # 3×, zero ReusedExchange). One materialization of (id, cell, vec,
    # c2c, norm) — the same pass the algorithm needs anyway — replaces
    # two full recomputes; released at the next query build via the
    # cache registry (query-scoped, not a session leak). The eager
    # count blocks the pair join's concurrent build/probe stages from
    # racing to fill the cache.
    scored = scored.persist()
    scored.count()
    from vector_io_spark.cache_registry import register

    register(scored)

    a, b = scored.alias("a"), scored.alias("b")
    pair_den = F.col("a.__n") * F.col("b.__n")
    pair_cos = F.when(
        pair_den != 0.0,
        dot_product(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / pair_den,
    )
    dropped = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .where(
            (pair_cos >= threshold)
            & (
                (F.col("b.c2c") < F.col("a.c2c"))
                | (
                    (F.col("b.c2c") == F.col("a.c2c"))
                    & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
                )
            )
        )
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )

    return (
        scored.join(dropped, id_col, "left")
        .select(
            id_col,
            "cell",
            F.round("c2c", 6).alias("c2c"),
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("keep"),
        )
    )
