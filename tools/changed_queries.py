"""Map changed files to the registered queries they can affect, so
`oracle_check.py --changed-since <ref>` walks only the impacted slice
while iterating (VERDICT r11 Next #7 — the full 233-query walk is tens
of minutes and gates every commit; the FULL walk remains the
pre-push / pre-round rule, see CLAUDE.md).

Safety posture: CONSERVATIVE. Anything this module cannot attribute
precisely (module-level edits to queries.py, changes to the session
factory or the entry contract, a parse failure) widens to "run the full
walk" (returned as ``None``). The mapping can only ever run EXTRA
queries, never skip an impacted one, as long as query functions follow
the repo convention of importing their operators via
``vector_io_spark.<pkg>.<mod>`` dotted paths (enforced de facto: every
registered query does, and the pytest pins representative mappings).
"""

from __future__ import annotations

import ast
import os
import re
import subprocess

_MOD_RE = re.compile(r"\bvector_io_spark(?:\.\w+)+")

# files that can never change query semantics
_IRRELEVANT_PREFIXES = ("tests/", "tools/", "docs/", ".claude/")
_IRRELEVANT_FILES = {"bench.py", "conftest.py"}


def _git_changed_files(repo_dir: str, ref: str) -> list[str]:
    """Changed paths vs ``ref``, including uncommitted working-tree
    edits (the common iterate-then-gate flow)."""
    out = subprocess.run(
        ["git", "diff", "--name-only", ref],
        cwd=repo_dir, capture_output=True, text=True, check=True,
    ).stdout
    return [ln.strip() for ln in out.splitlines() if ln.strip()]


def _file_to_module(path: str) -> str | None:
    """vector_io_spark/operators/dedup.py -> vector_io_spark.operators.dedup"""
    if not path.endswith(".py") or not path.startswith("vector_io_spark/"):
        return None
    return path[: -len(".py")].replace("/", ".")


def _module_refs(src: str) -> set[str]:
    """Every dotted vector_io_spark module path a source blob mentions,
    including all ancestor packages (a ref to a.b.c also depends on a.b
    and a — package __init__ changes propagate)."""
    refs: set[str] = set()
    for m in _MOD_RE.findall(src):
        parts = m.split(".")
        for i in range(2, len(parts) + 1):
            refs.add(".".join(parts[:i]))
    return refs


def _import_closure(repo_dir: str, changed_mods: set[str]) -> set[str]:
    """Reverse transitive closure of 'references' over the package's
    modules: start from the changed modules, add every module whose
    source mentions an affected module, iterate to fixpoint."""
    pkg_dir = os.path.join(repo_dir, "vector_io_spark")
    sources: dict[str, set[str]] = {}
    for root, _dirs, files in os.walk(pkg_dir):
        for f in files:
            if not f.endswith(".py"):
                continue
            full = os.path.join(root, f)
            rel = os.path.relpath(full, repo_dir)
            mod = _file_to_module(rel)
            if mod is None:
                continue
            try:
                with open(full) as fh:
                    sources[mod] = _module_refs(fh.read())
            except OSError:
                sources[mod] = set()
    affected = set(changed_mods)
    grew = True
    while grew:
        grew = False
        for mod, refs in sources.items():
            if mod not in affected and refs & affected:
                affected.add(mod)
                grew = True
    return affected


def _toplevel_imported_names(repo_dir: str) -> dict[str, str]:
    """queries.py's MODULE-LEVEL ``from vector_io_spark.x import a, b as
    c`` statements, as bound-name -> source-module. Queries that call
    such a name never mention the dotted module path in their own
    source, so attribution must follow the name (caught live in r12:
    ann_topk_bruteforce uses module-level ``brute_force_topk``)."""
    path = os.path.join(repo_dir, "vector_io_spark", "queries.py")
    with open(path) as fh:
        tree = ast.parse(fh.read())
    names: dict[str, str] = {}
    for node in tree.body:  # module level only, by construction
        if isinstance(node, ast.ImportFrom) and node.module and \
                node.module.startswith("vector_io_spark"):
            for alias in node.names:
                names[alias.asname or alias.name] = node.module
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith("vector_io_spark"):
                    names[alias.asname or alias.name.split(".")[0]] = \
                        alias.name
    return names


def _queries_py_changed_spans(repo_dir: str, ref: str) -> list[int] | None:
    """Changed line numbers (new-file coordinates) in
    vector_io_spark/queries.py vs ref; None on any parse trouble."""
    out = subprocess.run(
        ["git", "diff", "-U0", ref, "--", "vector_io_spark/queries.py"],
        cwd=repo_dir, capture_output=True, text=True, check=True,
    ).stdout
    lines: list[int] = []
    for m in re.finditer(r"^@@ [^+]*\+(\d+)(?:,(\d+))? @@", out, re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        # pure deletions report count 0 at the line BEFORE the cut; the
        # surrounding function still changed, so widen to that line
        lines.extend(range(start, start + max(count, 1)))
    return lines


def changed_queries(repo_dir: str, ref: str) -> set[str] | None:
    """Names of registered queries affected by the diff vs ``ref``.

    Returns ``None`` to demand the FULL walk (un-attributable change),
    or a (possibly empty) set of names safe to gate in isolation.
    Imports the registry, so pyspark must be importable (no session is
    built)."""
    import inspect

    from vector_io_spark.queries import QUERIES

    files = _git_changed_files(repo_dir, ref)
    changed_mods: set[str] = set()
    queries_py_changed = False
    for f in files:
        if f.startswith(_IRRELEVANT_PREFIXES) or f in _IRRELEVANT_FILES:
            continue
        if not f.endswith(".py"):
            continue  # docs / json records
        if f == "vector_io_spark/queries.py":
            queries_py_changed = True
            continue
        if f == "__spark_entry__.py":
            return None  # the contract itself moved — full walk
        mod = _file_to_module(f)
        if mod is None:
            # a .py outside the package that isn't known-irrelevant
            return None
        changed_mods.add(mod)

    affected_mods = (
        _import_closure(repo_dir, changed_mods) if changed_mods else set()
    )
    if "vector_io_spark.queries" in affected_mods:
        # an operator module queries.py itself imports at module level
        # changed — per-function attribution below still applies, but
        # module-level registry machinery may also have moved; the
        # per-query source scan covers semantics, so drop the marker
        affected_mods.discard("vector_io_spark.queries")

    names: set[str] = set()

    # 1) operator-module attribution: a query is affected when its
    #    source references any affected module — either by dotted path
    #    (in-body imports, the repo convention) or through a name bound
    #    by a queries.py module-level import of an affected module
    if affected_mods:
        imported = _toplevel_imported_names(repo_dir)
        hot_names = [
            re.compile(rf"\b{re.escape(n)}\b")
            for n, mod in imported.items() if mod in affected_mods
        ]
        for name, fn in QUERIES.items():
            try:
                src = inspect.getsource(fn)
            except (OSError, TypeError):
                return None
            if _module_refs(src) & affected_mods or any(
                rx.search(src) for rx in hot_names
            ):
                names.add(name)

    # 2) queries.py edits: map changed lines to registered-function
    #    spans (decorator lines included); a changed line OUTSIDE every
    #    span is shared helper / registry machinery -> full walk
    if queries_py_changed:
        spans: list[tuple[int, int, str]] = []
        for name, fn in QUERIES.items():
            try:
                src_lines, start = inspect.getsourcelines(fn)
            except (OSError, TypeError):
                return None
            mod = getattr(fn, "__module__", "")
            if mod != "vector_io_spark.queries":
                continue
            spans.append((start, start + len(src_lines) - 1, name))
        lines = _queries_py_changed_spans(repo_dir, ref)
        if lines is None:
            return None
        for ln in lines:
            hits = [n for (a, b, n) in spans if a <= ln <= b]
            if hits:
                names.update(hits)
            else:
                return None  # shared-helper edit: widen to full

    return names
