#!/usr/bin/env python
"""Dump .explain('formatted') for registered/bench queries to files.

Usage: python tools/explain_query.py <out_dir> <suffix> <name> [name ...]
       python tools/explain_query.py plans/r12 before ivfpq_index_build

Writes <out_dir>/<name>_<suffix>.txt per query. Builds the DataFrame
only (no action), so catalog-backed queries that READ a previously
written index will build it lazily on explain if missing — run after a
bench/profile pass when in doubt.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from vector_io_spark.queries import QUERIES
    from vector_io_spark.session import get_spark

    registry = dict(QUERIES)
    registry.update(bench._extra_queries())
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain_query")
    for name in names:
        if name not in registry:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        df = registry[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
