"""Property-based tests (hypothesis): round-trip fidelity and coercion
rules hold for arbitrary inputs, not just the fixture tables."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vector_io_spark.format.consolidate import consolidate
from vector_io_spark.functions.vectors import coerce_vector_column
from vector_io_spark.meta import canonicalize, config_hash

_settings = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_floats = st.floats(
    allow_nan=False, allow_infinity=False, width=32, min_value=-1e6, max_value=1e6
)


@_settings
@given(
    vecs=st.lists(
        st.one_of(st.none(), st.lists(finite_floats, min_size=1, max_size=8)),
        min_size=1,
        max_size=30,
    )
)
def test_stringified_vector_roundtrip(spark, vecs):
    """str(list) -> coerce_vector_column == the original floats (the
    ast.literal_eval path, vdf_import_cls.py:203-206)."""
    rows = [(i, repr(v) if v is not None else None) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id int, v string")
    got = {
        r["id"]: r["v"] for r in coerce_vector_column(df, "v").collect()
    }
    for i, v in enumerate(vecs):
        if v is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(v, rel=1e-6, abs=1e-6)


@_settings
@given(
    data=st.lists(
        st.tuples(st.integers(-1000, 1000), st.text(max_size=10)),
        min_size=1,
        max_size=20,
    )
)
def test_consolidate_preserves_rows(spark, data):
    """Consolidation of disjoint column subsets: row count is the sum, and
    every original value survives (null-padded union semantics)."""
    df = spark.createDataFrame(data, "k int, s string")
    a = df.select("k")
    b = df.select("s")
    out = consolidate([a, b])
    assert out.count() == 2 * len(data)
    ks = sorted(r["k"] for r in out.select("k").collect() if r["k"] is not None)
    assert ks == sorted(d[0] for d in data)


json_scalars = st.one_of(
    st.integers(-100, 100), st.text(max_size=6), st.booleans(), st.none()
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.text(max_size=4), children, max_size=3),
    ),
    max_leaves=10,
)


@given(obj=json_values)
@settings(max_examples=50, deadline=None)
def test_config_hash_invariant_under_key_order(obj):
    """config_hash is invariant under dict key reordering at every level."""

    def shuffle_keys(o):
        if isinstance(o, dict):
            return {k: shuffle_keys(o[k]) for k in reversed(list(o))}
        if isinstance(o, list):
            return [shuffle_keys(x) for x in o]
        return o

    assert config_hash(obj) == config_hash(shuffle_keys(obj))
    assert canonicalize(obj) == canonicalize(shuffle_keys(obj))


@_settings
@given(
    gaps=st.lists(st.integers(min_value=1, max_value=7200), min_size=1, max_size=40),
)
def test_sessionize_session_count_matches_gap_count(spark, gaps):
    """For one user with events at cumulative offsets, the number of
    sessions is exactly 1 + #(gaps > threshold), and session ids are
    contiguous starting at 1."""
    from vector_io_spark.operators.sessions import sessionize

    threshold = 1800.0
    ts, acc = [], 0
    for g in gaps:
        acc += g
        ts.append(acc)
    rows = [(1, float(t)) for t in ts]
    df = spark.createDataFrame(rows, "user_id long, sec double").select(
        "user_id", F.timestamp_seconds("sec").alias("ts")
    )
    got = sessionize(df, "user_id", "ts", gap_seconds=threshold)
    session_ids = sorted(r["session_id"] for r in got.collect())
    expected_sessions = 1 + sum(1 for g in gaps[1:] if g > threshold)
    assert session_ids[-1] == expected_sessions
    assert set(session_ids) == set(range(1, expected_sessions + 1))


@_settings
@given(
    vecs=st.lists(
        st.lists(finite_floats, min_size=8, max_size=8),
        min_size=4,
        max_size=24,
    )
)
def test_pq_encode_codes_in_range_and_deterministic(spark, vecs):
    from vector_io_spark.operators.similarity import pq_encode, train_pq_codebooks

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = train_pq_codebooks(df, num_subspaces=4, codebook_size=4,
                            max_train_rows=100)
    assert cb.shape[0] == 4 and cb.shape[2] == 2
    a = {r["vec_id"]: list(r["pq_code"]) for r in pq_encode(df, cb).collect()}
    b = {r["vec_id"]: list(r["pq_code"]) for r in pq_encode(df, cb).collect()}
    assert a == b
    assert all(len(c) == 4 and all(0 <= x < 4 for x in c) for c in a.values())


def test_hll_error_within_bound_across_tables(spark, sf_dir):
    """HLL at m=256 has standard error ~1.04/sqrt(256) = 6.5%; require
    the estimate within 3 sigma (20%) of exact on several key columns —
    a property the fixed oracle value can't express."""
    from tests.conftest import load
    from vector_io_spark.operators.sketches import hll_estimate

    for table, col in (
        ("events", "user_id"),
        ("orders", "o_custkey"),
        ("lineitem", "l_partkey"),
    ):
        row = hll_estimate(load(spark, sf_dir, table), col).collect()[0]
        assert row["rel_err"] <= 0.20, (table, col, dict(row.asDict()))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=0, max_value=300),
    mod=st.integers(min_value=1, max_value=50),
    buckets=st.integers(min_value=1, max_value=12),
    parts=st.integers(min_value=1, max_value=40),
)
def test_attach_global_rank_property_matches_window(
    spark, n, mod, buckets, parts
):
    """PROPERTY: for arbitrary sizes, tie densities, bucket counts and
    partition counts, the distributed two-pass rank + arithmetic ntile/
    percent_rank/cume_dist equal the single-partition window functions
    bit-for-bit (ranks.py's entire correctness claim)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vector_io_spark.operators.ranks import (
        attach_global_rank,
        exact_cume_dist,
        exact_ntile,
        exact_percent_rank,
    )

    df = spark.range(0, n).select(
        F.col("id"), ((F.col("id") * 131) % mod).alias("key")
    )
    order = [F.col("key").desc(), F.col("id").asc()]
    got = (
        attach_global_rank(
            df, order, rank_col="rk", total_col="tot", num_partitions=parts
        )
        .select(
            "id",
            "rk",
            exact_ntile(buckets, "rk", "tot").alias("nt"),
            F.round(exact_percent_rank("rk", "tot"), 9).alias("pr"),
            F.round(exact_cume_dist("rk", "tot"), 9).alias("cd"),
        )
        .orderBy("id")
        .collect()
    )
    w = Window.orderBy(*order)
    want = (
        df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rk"),
            F.ntile(buckets).over(w).cast("long").alias("nt"),
            F.round(F.percent_rank().over(w), 9).alias("pr"),
            F.round(F.cume_dist().over(w), 9).alias("cd"),
        )
        .orderBy("id")
        .collect()
    )
    assert got == want


@_settings
@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_categories=("Cs",)
                ),
                max_size=60,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_kept_window_fingerprints_matches_catalyst_formulation(spark, texts):
    """The vectorized pandas fingerprint kernel must produce EXACTLY the
    (pos, fp) set of the original Catalyst posexplode+md5+nibble-filter
    formulation on arbitrary unicode text — the equivalence that makes
    the 1.8x kernel swap a pure optimization (same oracle, same
    results)."""
    from vector_io_spark.functions.text import char_ngrams, kept_window_fingerprints

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    kernel = {
        (r["id"], r["s"]["pos"], r["s"]["fp"])
        for r in df.select(
            "id", F.explode(kept_window_fingerprints("text", 8, 4)).alias("s")
        ).collect()
    }
    catalyst = {
        (r["id"], r["pos0"] + 1, r["fp"])
        for r in df.select(
            "id", F.posexplode(char_ngrams(F.col("text"), 8)).alias("pos0", "gram")
        )
        .select("id", "pos0", F.md5("gram").alias("fp"))
        .where(F.substring("fp", 32, 1).isin("0", "1", "2", "3"))
        .collect()
    }
    assert kernel == catalyst
