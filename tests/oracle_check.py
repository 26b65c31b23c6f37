"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count, schema (column names + dtypes), and order-insensitive values.

Usage:  python tests/oracle_check.py [sf_dir] [query ...]
        python tests/oracle_check.py [sf_dir] --changed-since <git-ref>

--changed-since maps the diff vs <git-ref> (committed + working tree)
to the registered queries it can affect (tools/changed_queries.py) and
walks only those — the iterate-loop gate. The FULL walk (no filter)
remains the pre-push / pre-round rule; un-attributable changes
(registry machinery, shared helpers, the entry contract) automatically
widen back to the full walk.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: repr(v))
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].map(
                lambda v: "nan" if (v is None or (isinstance(v, float) and math.isnan(v)))
                else f"{v:.10g}"
            )
        else:
            df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark, con, sf_dir: str) -> list[str]:
    from vector_io_spark.queries import ORACLE, QUERIES

    problems: list[str] = []
    sdf = QUERIES[name](spark, sf_dir)
    spark_pd = sdf.toPandas()
    duck_pd = con.sql(ORACLE[name]).df()
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        problems.append(
            f"schema names: spark={sorted(spark_pd.columns)} duck={sorted(duck_pd.columns)}"
        )
        return problems
    s_types = {c: str(spark_pd[c].dtype) for c in spark_pd.columns}
    d_types = {c: str(duck_pd[c].dtype) for c in duck_pd.columns}
    for c in s_types:
        if s_types[c] != d_types[c]:
            problems.append(f"dtype[{c}]: spark={s_types[c]} duck={d_types[c]}")
    if len(spark_pd) != len(duck_pd):
        problems.append(f"rowcount: spark={len(spark_pd)} duck={len(duck_pd)}")
        return problems
    a, b = _norm(spark_pd), _norm(duck_pd)
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        idx = list(a.index[neq])[:3]
        for i in idx:
            problems.append(f"row diff @{i}:\n  spark={a.loc[i].to_dict()}\n  duck ={b.loc[i].to_dict()}")
        problems.append(f"value rows differing: {int(neq.sum())}/{len(a)}")
    return problems


def main() -> int:
    from pyspark.sql import SparkSession

    from vector_io_spark.queries import ORACLE, QUERIES

    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and not args[0].startswith("--") else \
        "/root/testdata/sf0.01"
    if args[:1] == ["--changed-since"]:
        if len(args) != 2:
            raise SystemExit("--changed-since requires exactly one git ref")
        from tools.changed_queries import changed_queries

        repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        picked = changed_queries(repo_dir, args[1])
        if picked is None:
            print("# changed-since: un-attributable change -> FULL walk")
            names = list(QUERIES)
        elif not picked:
            print(f"# changed-since {args[1]}: no registered query affected")
            return 0
        else:
            names = [n for n in QUERIES if n in picked]  # registry order
            print(f"# changed-since {args[1]}: {len(names)} affected")
    else:
        names = args or list(QUERIES)
    # BARE session, not our session factory: the external driver builds
    # its own SparkSession, so this gate must prove every query
    # self-configures (queries._ensure_session_conf) with no help
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("oracle_check")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    con = duck_con(sf_dir)
    failures = 0
    for name in names:
        if name not in ORACLE:
            print(f"SKIP  {name} (no oracle — rows-only)")
            try:
                n = QUERIES[name](spark, sf_dir).count()
                print(f"      rows={n}")
            except Exception as e:
                failures += 1
                print(f"FAIL  {name}: {e}")
            continue
        try:
            problems = compare(name, spark, con, sf_dir)
        except Exception as e:
            failures += 1
            print(f"ERROR {name}: {str(e)[:300]}")
            continue
        if problems:
            failures += 1
            print(f"FAIL  {name}")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name}")
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
