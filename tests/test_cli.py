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


def test_cli_reembed_consolidate_count_idlist(spark, sf_dir, tmp_path, capsys):
    """The four dataset-local CLI entry points (reference reembed_vdf /
    consolidate_parquet_vdf / count_vdf / get_id_list_vdf)."""
    src = str(tmp_path / "src")
    docs = load(spark, sf_dir, "documents").limit(50).select(
        F.col("doc_id").cast("string").alias("id"), "text"
    )
    write_vdf({("docs", ""): docs}, src, vector_columns=[])

    out2 = str(tmp_path / "reembedded")
    assert main(["reembed", "--dataset", src, "--out", out2,
                 "--text-column", "text", "--dims", "8"]) == 0
    assert "reembedded docs" in capsys.readouterr().out
    from vector_io_spark.format.reader import read_vdf
    ds2 = read_vdf(spark, out2)
    ns = ds2.meta.indexes["docs"][0]
    assert ns.dimensions == 8 and len(ns.vector_columns) == 1
    vec_col = ns.vector_columns[0]
    assert ns.model_map[vec_col]["text_column"] == "text"
    assert ds2.df("docs").where(F.col(vec_col).isNull()).count() == 0

    out3 = str(tmp_path / "consolidated")
    assert main(["consolidate", "--dataset", out2, "--out", out3]) == 0
    assert spark.read.parquet(out3).count() == 50

    assert main(["count", "--dataset", out2]) == 0
    out = capsys.readouterr().out
    assert "docs/-: 50" in out and "total: 50" in out

    out4 = str(tmp_path / "ids")
    assert main(["get-id-list", "--dataset", out2, "--out", out4]) == 0
    ids = spark.read.csv(out4).count()
    assert ids == 50


def test_cli_query_list_run_and_explain(capsys):
    assert main(["query", "--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "q1_pricing_summary" in names and len(names) > 150

    assert main(["query", "vector_dim_inference",
                 "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"]) == 0
    out = capsys.readouterr().out
    assert "dim" in out

    assert main(["explain", "id_range_filter",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    plan = capsys.readouterr().out
    assert "Physical Plan" in plan and "PushedFilters" in plan

    assert main(["query", "no_such_query"]) == 2
    assert main(["explain", "no_such_query"]) == 2


def test_cli_hf_surface_parses_and_dispatches(monkeypatch, capsys, tmp_path):
    """HF CLI parity (reference export_vdf_cli.py:168-169,
    import_vdf_cli.py:161-210, push_to_hub_vdf.py:9-78): the
    push-to-hub subcommand, the export --push-to-hub flag, and the
    import --hf-dataset source all parse and dispatch to sources/hf.py
    (monkeypatched — huggingface_hub is not installed here)."""
    parser = build_parser()

    ns = parser.parse_args(
        ["push-to-hub", "--dataset", "/tmp/d", "--repo-id", "org/name"]
    )
    assert ns.repo_id == "org/name" and not ns.public

    ns = parser.parse_args(
        ["export", "embedded", "--root", "/tmp/e", "--collections", "c",
         "--out", "/tmp/x", "--push-to-hub", "org/name", "--public"]
    )
    assert ns.push_to_hub == "org/name" and ns.public

    ns = parser.parse_args(
        ["import", "embedded", "--root", "/tmp/e", "--hf-dataset",
         "org/data", "--index", "c", "--max-num-rows", "100"]
    )
    assert ns.hf_dataset == "org/data" and ns.max_num_rows == 100
    assert ns.dataset is None

    calls = {}

    def fake_push(dataset_dir, repo_id, private=True):
        calls["args"] = (dataset_dir, repo_id, private)
        return f"https://huggingface.co/datasets/{repo_id}"

    import vector_io_spark.sources.hf as hf

    monkeypatch.setattr(hf, "push_to_hub", fake_push)
    assert main(["push-to-hub", "--dataset", str(tmp_path),
                 "--repo-id", "org/name", "--public"]) == 0
    assert calls["args"] == (str(tmp_path), "org/name", False)
    assert "pushed to" in capsys.readouterr().out


def test_cli_import_hf_requires_index(capsys):
    """--hf-dataset without --index is a usage error (exit 2), not a
    crash inside the reader."""
    rc = main(["import", "embedded", "--root", "/tmp/e",
               "--hf-dataset", "org/data"])
    assert rc == 2
    assert "--index" in capsys.readouterr().err


def test_cli_import_requires_some_source(capsys):
    rc = main(["import", "embedded", "--root", "/tmp/e"])
    assert rc == 2
    assert "--dataset" in capsys.readouterr().err
