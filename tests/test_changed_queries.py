"""Pin the --changed-since mapper (tools/changed_queries.py): precise
attribution where safe, widen-to-full on anything un-attributable. Git
interaction is monkeypatched; the registry + import-graph scans are
real, so these tests catch convention drift (a query importing an
operator some way the regex can't see would surface as a missing
mapping here)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.changed_queries as cq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _with_files(monkeypatch, files, spans=None):
    monkeypatch.setattr(cq, "_git_changed_files", lambda repo, ref: files)
    if spans is not None:
        monkeypatch.setattr(
            cq, "_queries_py_changed_spans", lambda repo, ref: spans
        )


def test_module_refs_include_ancestor_packages():
    refs = cq._module_refs("from vector_io_spark.operators.dedup import x")
    assert "vector_io_spark.operators.dedup" in refs
    assert "vector_io_spark.operators" in refs
    assert "vector_io_spark" not in refs  # single-segment root excluded


def test_irrelevant_files_affect_nothing(monkeypatch):
    _with_files(monkeypatch, [
        "bench.py", "tests/test_hybrid.py", "tools/make_replica.py",
        "README.md", "BENCH_LOCAL.json", ".claude/skills/verify/SKILL.md",
    ])
    assert cq.changed_queries(REPO, "HEAD") == set()


def test_operator_module_maps_to_its_queries(monkeypatch):
    _with_files(monkeypatch, ["vector_io_spark/operators/hybrid.py"])
    names = cq.changed_queries(REPO, "HEAD")
    assert names is not None
    assert {"hybrid_indexed_search", "hybrid_indexed_batch",
            "hybrid_indexed_sq8"} <= names
    assert "q1_pricing_summary" not in names


def test_deep_dependency_widens_through_import_closure(monkeypatch):
    # similarity.py is imported by sq8/hybrid/pq paths — a change there
    # must reach the hybrid and sq8 queries through the closure
    _with_files(monkeypatch, ["vector_io_spark/operators/similarity.py"])
    names = cq.changed_queries(REPO, "HEAD")
    assert names is not None
    assert "ann_topk_bruteforce" in names
    assert "hybrid_indexed_search" in names  # via _dense_probe -> similarity


def test_entry_contract_change_forces_full_walk(monkeypatch):
    _with_files(monkeypatch, ["__spark_entry__.py"])
    assert cq.changed_queries(REPO, "HEAD") is None


def test_unknown_repo_py_forces_full_walk(monkeypatch):
    _with_files(monkeypatch, ["mystery_helper.py"])
    assert cq.changed_queries(REPO, "HEAD") is None


def test_queries_py_span_attribution(monkeypatch):
    import inspect

    from vector_io_spark.queries import QUERIES

    _lines, start = inspect.getsourcelines(QUERIES["q1_pricing_summary"])
    _with_files(
        monkeypatch, ["vector_io_spark/queries.py"], spans=[start + 2]
    )
    assert cq.changed_queries(REPO, "HEAD") == {"q1_pricing_summary"}


def test_queries_py_shared_helper_edit_forces_full_walk(monkeypatch):
    # line 1 of queries.py is the module docstring — outside every
    # registered-function span
    _with_files(monkeypatch, ["vector_io_spark/queries.py"], spans=[1])
    assert cq.changed_queries(REPO, "HEAD") is None
