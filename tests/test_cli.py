"""CLI surface: list-dbs, embedded import/export round-trip, per-DB flag
generation from connector signatures."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.cli import build_parser, main
from vector_io_spark.format.writer import write_vdf
from vector_io_spark.sources.embedded import EmbeddedVectorDB


def test_list_dbs(capsys):
    assert main(["list-dbs"]) == 0
    out = capsys.readouterr().out.split()
    for slug in ("pinecone", "qdrant", "vertexai_vectorsearch", "astradb",
                 "kdbai", "vespa", "weaviate", "embedded"):
        assert slug in out


def test_parser_generates_per_db_flags():
    parser = build_parser()
    ns = parser.parse_args(
        ["export", "qdrant", "--url", "http://q:6333",
         "--collections", "c1", "--out", "/tmp/x"]
    )
    assert ns.url == "http://q:6333" and ns.db == "qdrant"
    ns = parser.parse_args(
        ["import", "kdbai", "--endpoint", "http://k", "--api-key", "s",
         "--dataset", "/tmp/d"]
    )
    assert ns.endpoint == "http://k"
    assert ns.batch_size == 10_000  # connector's UPSERT_BATCH default
    ns = parser.parse_args(
        ["import", "vertexai_vectorsearch", "--project-id", "p",
         "--dataset", "/tmp/d"]
    )
    assert ns.rate_limit_per_minute == 6000  # REQUESTS_PER_MINUTE default


def test_cli_import_then_export_roundtrip(spark, sf_dir, tmp_path, capsys):
    """VDF dataset --import--> embedded store --export--> VDF dataset,
    entirely through the CLI entry point."""
    src = str(tmp_path / "src_vdf")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out_vdf")

    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("vector"),
        "label",
    )
    write_vdf({("emb", ""): emb}, src, vector_columns=["vector"])

    rc = main([
        "import", "embedded", "--root", store,
        "--dataset", src, "--create-collections", "--batch-size", "128",
    ])
    assert rc == 0
    assert f"total imported: {emb.count()}" in capsys.readouterr().out
    db = EmbeddedVectorDB(store)
    assert db.count("emb") == emb.count()
    assert db.collection_config("emb")["dimensions"] == 64

    rc = main([
        "export", "embedded", "--root", store,
        "--collections", "emb", "--out", out, "--parallelism", "4",
    ])
    assert rc == 0
    from vector_io_spark.format.reader import read_vdf

    ds = read_vdf(spark, out)
    back = ds.df("emb")
    assert back.count() == emb.count()
    orig = {r["id"]: r["label"] for r in emb.collect()}
    got = {r["id"]: r["label"] for r in back.collect()}
    assert got == orig
    assert ds.meta.exported_from == "embedded"
