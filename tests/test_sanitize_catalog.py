"""Sanitization-rule tests (SURVEY.md §1.3 / FIXTURES.md vdf_dirty) and
catalog utilities (§2.8/§2.11)."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_io_spark.functions.names import create_new_name, deterministic_uuid_expr
from vector_io_spark.functions.sanitize import (
    clean_nan_inf,
    cleanup_df,
    decode_bytes,
    fill_nat_epoch,
    parse_json_metadata,
    scalar_metadata_only,
    stringify_nonconforming,
)
from vector_io_spark.functions.vectors import coerce_vector_column, vector_dim
from vector_io_spark.meta import (
    canonicalize,
    check_version_compatibility,
    config_hash,
    dataset_dir_name,
    standardize_metric,
    standardize_metric_reverse,
)


@pytest.fixture(scope="module")
def dirty(spark):
    """vdf_dirty-style frame: every §1.3 pathology in one table."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("vector_list", T.ArrayType(T.DoubleType())),
            T.StructField("vector_str", T.StringType()),
            T.StructField("vector_bytes", T.BinaryType()),
            T.StructField("f_nan", T.DoubleType()),
            T.StructField("f_inf", T.DoubleType()),
            T.StructField("ts_nat", T.TimestampType()),
            T.StructField("meta_json", T.StringType()),
            T.StructField("img", T.BinaryType()),
        ]
    )
    rows = [
        ("1", [0.1, 0.2], "[0.1, 0.2]", b"[0.1, 0.2]", 1.5, 2.5, None, '{"a": "1"}', b"\x89PNG"),
        ("2", None, None, None, float("nan"), float("inf"), None, '{"a": "2"}', None),
        ("abc", [0.3, 0.4], "[0.3, 0.4]", b"[0.3, 0.4]", 0.0, float("-inf"), None, "not json", b"JPEG"),
    ]
    return spark.createDataFrame(rows, schema)


def test_vector_coercion_all_forms(dirty):
    for col in ["vector_list", "vector_str", "vector_bytes"]:
        out = coerce_vector_column(dirty, col, "v")
        assert dict(out.dtypes)["v"] == "array<float>"
        got = {r["id"]: r["v"] for r in out.collect()}
        assert got["1"] == pytest.approx([0.1, 0.2], abs=1e-6)
        assert got["2"] is None
        assert got["abc"] == pytest.approx([0.3, 0.4], abs=1e-6)


def test_vector_coercion_unparseable_is_null(spark):
    df = spark.createDataFrame([("x", "not a vector")], "id string, v string")
    out = coerce_vector_column(df, "v")
    assert out.collect()[0]["v"] is None


def test_nan_inf_rules(dirty):
    rows = dirty.select(
        "id",
        clean_nan_inf("f_nan").alias("nan_null"),
        clean_nan_inf("f_nan", nan_to_zero=True).alias("nan_zero"),
        clean_nan_inf("f_inf").alias("inf_null"),
        clean_nan_inf("f_inf", nan_to_zero=True).alias("inf_zero"),
    ).collect()
    by_id = {r["id"]: r for r in rows}
    assert by_id["2"]["nan_null"] is None and by_id["2"]["nan_zero"] == 0.0
    assert by_id["2"]["inf_null"] is None and by_id["2"]["inf_zero"] == 0.0
    assert by_id["abc"]["inf_null"] is None  # -inf cleaned too
    assert by_id["1"]["nan_null"] == 1.5  # clean values pass through


def test_nat_epoch_rule(dirty):
    rows = dirty.select("id", F.unix_timestamp(fill_nat_epoch("ts_nat")).alias("e")).collect()
    assert all(r["e"] == 0 for r in rows)  # all NaT -> epoch 0


def test_json_and_bytes(dirty):
    rows = dirty.select(
        "id",
        parse_json_metadata("meta_json")["a"].alias("a"),
        decode_bytes("vector_bytes").alias("s"),
    ).collect()
    by_id = {r["id"]: r for r in rows}
    assert by_id["1"]["a"] == "1"
    assert by_id["abc"]["a"] is None  # unparseable -> NULL
    assert by_id["1"]["s"] == "[0.1, 0.2]"


def test_cleanup_df_drops_binary_warns(dirty):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = cleanup_df(dirty)
    assert "img" not in out.columns  # image column dropped (util.py:363-367)
    assert "vector_bytes" not in out.columns
    assert any("binary" in str(x.message) for x in w)
    row = out.where(F.col("id") == "2").collect()[0]
    assert row["f_nan"] is None  # NaN cleaned
    assert row["ts_nat"] is not None  # NaT filled


def test_scalar_metadata_and_stringify(dirty):
    out = scalar_metadata_only(dirty)
    assert "vector_list" not in out.columns  # arrays dropped (chroma rule)
    assert "id" in out.columns and "f_nan" in out.columns
    s = stringify_nonconforming(dirty.select("id", "vector_list", "ts_nat"),
                                ["vector_list", "ts_nat"])
    assert dict(s.dtypes)["vector_list"] == "array<string>"
    assert dict(s.dtypes)["ts_nat"] == "string"


def test_lazy_dim_inference(dirty):
    # dimensions=-1 in meta -> first non-null vector length (§1.2)
    assert vector_dim(coerce_vector_column(dirty, "vector_str", "v"), "v") == 2
    empty = dirty.where("id = 'nope'")
    assert vector_dim(coerce_vector_column(empty, "vector_str", "v"), "v") == -1


def test_uuid_passthrough_and_derivation(spark):
    df = spark.createDataFrame(
        [("f47ac10b-58cc-4372-a567-0e02b2c3d479",), ("plain-id",)], "id string"
    )
    rows = df.select("id", deterministic_uuid_expr("id").alias("u")).collect()
    by_id = {r["id"]: r["u"] for r in rows}
    assert by_id["f47ac10b-58cc-4372-a567-0e02b2c3d479"] == "f47ac10b-58cc-4372-a567-0e02b2c3d479"
    import hashlib

    h = hashlib.md5(b"plain-id").hexdigest()
    expected = f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
    assert by_id["plain-id"] == expected


# --- catalog utilities -----------------------------------------------------

def test_create_new_name():
    assert create_new_name([], "idx") == "idx"
    assert create_new_name(["idx"], "idx") == "idx-2"
    assert create_new_name(["idx", "idx-2", "idx-7"], "idx") == "idx-8"
    assert create_new_name(["other"], "idx") == "idx"


def test_metric_standardization_roundtrip():
    assert standardize_metric("cosine", "pinecone") == "Cosine"
    assert standardize_metric("L2", "milvus") == "Euclid"
    assert standardize_metric("IP", "milvus") == "Dot"
    assert standardize_metric_reverse("Cosine", "pinecone") == "cosine"
    assert standardize_metric_reverse("Euclid", "milvus") == "L2"
    with pytest.warns(UserWarning):
        assert standardize_metric("weird", "pinecone") == "Cosine"


def test_config_hash_key_order_insensitive():
    a = {"x": 1, "y": {"b": [1, 2], "a": 3}}
    b = {"y": {"a": 3, "b": [1, 2]}, "x": 1}
    assert canonicalize(a) == canonicalize(b)
    assert config_hash(a) == config_hash(b)
    assert len(config_hash(a)) == 5
    assert config_hash(a) != config_hash({"x": 2})
    from datetime import datetime

    name = dataset_dir_name({"k": 1}, now=datetime(2026, 1, 2, 3, 4, 5))
    assert name.startswith("vdf_20260102_030405_")


def test_version_compatibility():
    assert check_version_compatibility("0.0.9", "0.1.0")
    assert check_version_compatibility("0.1.0", "0.1.0")
    with pytest.warns(UserWarning):
        assert not check_version_compatibility("9.9.9", "0.1.0")
    assert check_version_compatibility(None, "0.1.0")


def test_compression_ratio_orders_by_redundancy(spark):
    """zlib ratio: repeated text << natural prose < random-ish; empty/
    null -> null."""
    from vector_io_spark.functions.text import compression_ratio

    import random

    rng = random.Random(7)
    randomish = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(2000))
    rows = [
        (1, "spam " * 400),
        (2, ("the quick brown fox jumps over the lazy dog. " * 5
             + "a market survey of distributed query engines shows "
             "varied shuffle strategies. ") * 4),
        (3, randomish),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["r"] for r in df.select("id", compression_ratio("text").alias("r")).collect()}
    assert got[4] is None and got[5] is None
    assert got[1] < 0.05                   # pure repetition
    assert got[1] < got[2] < got[3]        # redundancy ordering
    assert got[3] > 0.5                    # high-entropy text barely compresses
    # deterministic
    again = {r["id"]: r["r"] for r in df.select("id", compression_ratio("text").alias("r")).collect()}
    assert got == again
