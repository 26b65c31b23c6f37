"""JSONL ingest (sources/jsonl.py) — plain + gzip shards, explicit
schema, corrupt-line handling, vector casting, and the full
jsonl_to_vdf commit. Parity target: the reference's
jsonl_to_parquet / jsonltgz_to_parquet notebook workflows."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from vector_io_spark.sources.jsonl import jsonl_to_vdf, read_jsonl


@pytest.fixture()
def jsonl_dir(tmp_path):
    rows = [
        {"id": i, "vector": [float(i), float(i) + 0.5], "tag": f"t{i % 3}"}
        for i in range(40)
    ]
    d = tmp_path / "shards"
    d.mkdir()
    with open(d / "part-0.jsonl", "w") as fh:
        for r in rows[:20]:
            fh.write(json.dumps(r) + "\n")
    with gzip.open(d / "part-1.jsonl.gz", "wt") as fh:
        for r in rows[20:]:
            fh.write(json.dumps(r) + "\n")
    return str(d), rows


def test_read_jsonl_plain_and_gzip_with_schema(spark, jsonl_dir):
    d, rows = jsonl_dir
    df = read_jsonl(
        spark, d,
        schema="id bigint, vector array<double>, tag string",
        vector_columns=("vector",),
    )
    assert df.schema["vector"].dataType.simpleString() == "array<float>"
    got = {r["id"]: (list(r["vector"]), r["tag"]) for r in df.collect()}
    assert len(got) == 40  # both shards read
    assert got[25] == ([25.0, 25.5], "t1")


def test_read_jsonl_drops_corrupt_lines(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    with open(p, "w") as fh:
        fh.write('{"id": 1, "v": 2}\n')
        fh.write("NOT JSON AT ALL {{{\n")
        fh.write('{"id": 3, "v": 4}\n')
    df = read_jsonl(
        spark, str(p), schema="id bigint, v bigint", drop_corrupt=True
    )
    assert sorted(r["id"] for r in df.collect()) == [1, 3]


def test_jsonl_to_vdf_commits_dataset(spark, jsonl_dir, tmp_path):
    d, rows = jsonl_dir
    ds = str(tmp_path / "vdf")
    meta = jsonl_to_vdf(
        spark, d, ds,
        index_name="docs",
        id_column="id",
        vector_columns=("vector",),
        schema="id bigint, vector array<double>, tag string",
        metric="cosine",
    )
    m = json.load(open(os.path.join(ds, "VDF_META.json")))
    assert m["exported_from"] == "vdf_spark_jsonl"
    ns = m["indexes"]["docs"][0]
    assert ns["total_vector_count"] == 40
    assert ns["dimensions"] == 2
    back = spark.read.parquet(os.path.join(ds, "docs"))
    assert back.count() == 40

    with pytest.raises(ValueError, match="id column"):
        jsonl_to_vdf(
            spark, d, str(tmp_path / "x"), id_column="nope",
            schema="id bigint, vector array<double>, tag string",
        )
    with pytest.raises(ValueError, match="select columns"):
        jsonl_to_vdf(
            spark, d, str(tmp_path / "y"), id_column="id",
            schema="id bigint, vector array<double>, tag string",
            select=("id", "ghost"),
        )
