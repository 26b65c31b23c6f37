"""Command-line surface: ``python -m vector_io_spark <command>``.

Mirrors the reference's CLI shape (export_vdf_cli.py:33-56: discover every
connector, give each its own argparse subparser named by DB_NAME_SLUG;
import_vdf_cli.py likewise) minus the interactive prompting the SURVEY
scoped out — every option is a flag, so the CLI is scriptable/CI-safe.

Commands:
  list-dbs                      print registered connector slugs
  export <db> [db flags] --collections a,b --out DIR
                                distributed scan -> VDF parquet dataset
  import <db> [db flags] --dataset DIR [--index NAME]
                                VDF dataset -> distributed batched upserts
  reembed --dataset DIR --out DIR --text-column COL [--model-name ...]
                                VDF -> VDF' with a new embedding column
                                (reference reembed_vdf entry point)
  consolidate --dataset DIR --out FILE_DIR
                                union every namespace (schema-widening)
                                into one parquet dir (consolidate_parquet)
  count --dataset DIR           per-namespace + total row counts (count_vdf)
  get-id-list --dataset DIR --out DIR [--id-column id]
                                sorted distinct ids as CSV (get_id_list_vdf)

Per-DB flags are generated from each connector's constructor signature
(--url, --api-key, ...); injectable test doubles (client/session/module
params) are excluded. The embedded file-backed store is registered too,
so the whole CLI is exercisable without any SDK.
"""

from __future__ import annotations

import argparse
import inspect
import sys

from vector_io_spark.session import get_spark


def _registry() -> dict:
    from vector_io_spark.sources.embedded import EmbeddedVectorDB
    from vector_io_spark.sources.remote import CONNECTORS

    return {**CONNECTORS, "embedded": EmbeddedVectorDB}


_SKIP_PARAMS = {
    "self", "client", "session", "http_client", "pymilvus_module",
    "tpuf_module",
}


def _add_connector_flags(parser: argparse.ArgumentParser, cls: type) -> list[str]:
    """One flag per constructor parameter (reference: make_parser per DB,
    e.g. pinecone_export.py's --api-key/--index)."""
    names = []
    for name, p in inspect.signature(cls.__init__).parameters.items():
        if name in _SKIP_PARAMS or p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        flag = "--" + name.replace("_", "-")
        required = p.default is inspect.Parameter.empty
        parser.add_argument(flag, required=required, default=(
            None if required else p.default
        ))
        names.append(name)
    return names


def build_parser() -> argparse.ArgumentParser:
    top = argparse.ArgumentParser(prog="vector_io_spark")
    sub = top.add_subparsers(dest="command", required=True)

    sub.add_parser("list-dbs", help="print registered connector slugs")

    for command in ("export", "import"):
        cmd = sub.add_parser(command)
        db_sub = cmd.add_subparsers(dest="db", required=True)
        for slug, cls in sorted(_registry().items()):
            p = db_sub.add_parser(slug)
            ctor_params = _add_connector_flags(p, cls)
            p.set_defaults(_cls=cls, _ctor_params=ctor_params)
            if command == "export":
                p.add_argument("--collections", required=True,
                               help="comma-separated collection names")
                p.add_argument("--out", required=True, help="VDF dataset dir")
                p.add_argument("--parallelism", type=int, default=32)
                p.add_argument("--max-file-rows", type=int, default=1_000_000)
                p.add_argument("--id-column", default="id")
                p.add_argument("--model-name", default=None)
                p.add_argument("--push-to-hub", default=None, metavar="REPO_ID",
                               help="after export, upload the VDF dir as a "
                               "HF dataset repo (reference "
                               "export_vdf_cli.py:168-169)")
                p.add_argument("--public", action="store_true",
                               help="with --push-to-hub: create the repo "
                               "public (default private)")
            else:
                p.add_argument("--dataset", default=None, help="VDF dataset dir")
                p.add_argument("--hf-dataset", default=None, metavar="NAME",
                               help="import from a HuggingFace dataset "
                               "instead of a local VDF dir (reference "
                               "import_vdf_cli.py:161-210); requires "
                               "--index for the target collection")
                p.add_argument("--hf-split", default="train")
                p.add_argument("--max-num-rows", type=int, default=None,
                               help="with --hf-dataset: row cap on the read")
                p.add_argument("--index", default=None,
                               help="only import this index (default: all)")
                p.add_argument("--batch-size", type=int,
                               default=getattr(cls, "UPSERT_BATCH", 1000))
                p.add_argument("--rate-limit-per-minute", type=float,
                               default=getattr(cls, "REQUESTS_PER_MINUTE", None))
                p.add_argument("--num-partitions", type=int, default=None)
                p.add_argument("--create-collections", action="store_true",
                               help="create target collections from VDF meta")

    re_p = sub.add_parser("reembed", help="VDF -> VDF' with a new embedding column")
    re_p.add_argument("--dataset", required=True)
    re_p.add_argument("--out", required=True)
    re_p.add_argument("--text-column", required=True)
    re_p.add_argument("--model-name", default="hash-embedder")
    re_p.add_argument("--dims", type=int, default=16)
    re_p.add_argument("--backend", default="hash",
                      help="hash | litellm | sentence-transformers")
    re_p.add_argument("--batch-size", type=int, default=96)

    co_p = sub.add_parser("consolidate",
                          help="union all namespaces into one parquet dir")
    co_p.add_argument("--dataset", required=True)
    co_p.add_argument("--out", required=True)

    ct_p = sub.add_parser("count", help="per-namespace + total row counts")
    ct_p.add_argument("--dataset", required=True)

    il_p = sub.add_parser("get-id-list", help="sorted distinct ids as CSV")
    il_p.add_argument("--dataset", required=True)
    il_p.add_argument("--out", required=True)
    il_p.add_argument("--id-column", default="id")

    q_p = sub.add_parser(
        "query",
        help="run a registered analytics query against a table dir "
        "(list names with --list)",
    )
    q_p.add_argument("name", nargs="?", help="query name from the registry")
    q_p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                     help="directory holding the parquet tables")
    q_p.add_argument("--limit", type=int, default=20,
                     help="rows to show (default 20)")
    q_p.add_argument("--out", help="optionally write the FULL result as parquet")
    q_p.add_argument("--list", action="store_true", dest="list_queries",
                     help="print all registered query names and exit")

    ex_p = sub.add_parser(
        "explain",
        help="print a query's physical plan (the 100 TB shape audit)",
    )
    ex_p.add_argument("name")
    ex_p.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    ph_p = sub.add_parser(
        "push-to-hub",
        help="upload a VDF dataset dir as a HuggingFace dataset repo "
        "(reference push_to_hub_vdf.py:9-78; requires huggingface_hub)",
    )
    ph_p.add_argument("--dataset", required=True, help="VDF dataset dir")
    ph_p.add_argument("--repo-id", required=True, help="org/name on the Hub")
    ph_p.add_argument("--public", action="store_true",
                      help="create the repo public (default private)")
    return top


def _connector_factory(args):
    cls = args._cls
    kwargs = {name: getattr(args, name) for name in args._ctor_params}
    return lambda: cls(**kwargs)


def cmd_export(args) -> int:
    from vector_io_spark.format.writer import write_vdf
    from vector_io_spark.sources.connectors import paginated_read

    spark = get_spark(app_name="vector_io_spark_export")
    factory = _connector_factory(args)
    probe = factory()
    df_map = {}
    for coll in args.collections.split(","):
        # schema probe: read the first cursor's first batch driver-side
        cursors = probe.plan_cursors(coll, 1)
        first = None
        for cur in cursors:
            for pdf in probe.read_cursor(coll, cur):
                first = pdf
                break
            if first is not None:
                break
        if first is None:
            print(f"collection {coll} is empty; skipping", file=sys.stderr)
            continue
        sdf = paginated_read(
            spark, factory, coll,
            schema=spark.createDataFrame(first).schema,
            parallelism=args.parallelism,
        )
        df_map[(coll, "")] = sdf
    if not df_map:
        print("nothing to export", file=sys.stderr)
        return 1
    meta = write_vdf(
        df_map,
        args.out,
        exported_from=args._cls.DB_NAME_SLUG,
        id_column=args.id_column,
        max_records_per_file=args.max_file_rows,
        model_name=args.model_name,
    )
    for index, namespaces in meta.indexes.items():
        for ns in namespaces:
            print(f"exported {index}/{ns.namespace or '-'}: "
                  f"{ns.exported_vector_count} rows -> {ns.data_path}")
    if getattr(args, "push_to_hub", None):
        from vector_io_spark.sources.hf import push_to_hub

        url = push_to_hub(args.out, args.push_to_hub, private=not args.public)
        print(f"pushed to {url}")
    return 0


def cmd_import(args) -> int:
    from vector_io_spark.format.reader import read_vdf
    from vector_io_spark.sources.connectors import partitioned_upsert

    spark = get_spark(app_name="vector_io_spark_import")
    factory = _connector_factory(args)
    if getattr(args, "hf_dataset", None):
        # reference import_vdf_cli.py:161-210: --hf_dataset as the source
        from vector_io_spark.sources.hf import read_hf_dataset

        if not args.index:
            print("--hf-dataset requires --index (target collection)",
                  file=sys.stderr)
            return 2
        df = read_hf_dataset(
            spark, args.hf_dataset, split=args.hf_split,
            max_num_rows=args.max_num_rows,
        )
        n = partitioned_upsert(
            df, factory, args.index,
            batch_size=args.batch_size,
            rate_limit_per_minute=args.rate_limit_per_minute,
            num_partitions=args.num_partitions,
        )
        print(f"imported {args.index} from hf:{args.hf_dataset}: {n} rows")
        return 0
    if not args.dataset:
        print("one of --dataset / --hf-dataset is required", file=sys.stderr)
        return 2
    ds = read_vdf(spark, args.dataset)
    total = 0
    for index, namespaces in ds.meta.indexes.items():
        if args.index and index != args.index:
            continue
        for ns in namespaces:
            df = ds.df(index, ns.namespace)
            if args.create_collections:
                factory().create_collection(
                    index, ns.dimensions, ns.metric or "Cosine",
                    index_config=ns.index_config,
                )
            n = partitioned_upsert(
                df, factory, index,
                batch_size=args.batch_size,
                rate_limit_per_minute=args.rate_limit_per_minute,
                num_partitions=args.num_partitions,
            )
            print(f"imported {index}/{ns.namespace or '-'}: {n} rows")
            total += n
    print(f"total imported: {total}")
    return 0


def cmd_reembed(args) -> int:
    from vector_io_spark.embed import reembed_vdf
    from vector_io_spark.format.reader import read_vdf

    spark = get_spark(app_name="vector_io_spark_reembed")
    ds = read_vdf(spark, args.dataset)
    meta = reembed_vdf(
        ds, args.out, args.text_column,
        model_name=args.model_name, dims=args.dims,
        backend=args.backend, batch_size=args.batch_size,
    )
    for index, namespaces in meta.indexes.items():
        for ns in namespaces:
            print(f"reembedded {index}/{ns.namespace or '-'}: "
                  f"{ns.exported_vector_count} rows -> {args.out}")
    return 0


def cmd_consolidate(args) -> int:
    from vector_io_spark.format.consolidate import consolidate
    from vector_io_spark.format.reader import read_vdf

    spark = get_spark(app_name="vector_io_spark_consolidate")
    ds = read_vdf(spark, args.dataset)
    frames = [ds.df(i, ns.namespace)
              for i, ns_list in ds.meta.indexes.items() for ns in ns_list]
    if not frames:
        print("dataset has no namespaces", file=sys.stderr)
        return 1
    out = consolidate(frames)
    out.write.mode("overwrite").parquet(args.out)
    print(f"consolidated {len(frames)} namespace(s) -> {args.out}")
    return 0


def cmd_count(args) -> int:
    from vector_io_spark.format.reader import read_vdf

    spark = get_spark(app_name="vector_io_spark_count")
    ds = read_vdf(spark, args.dataset)
    total = 0
    for index, ns_list in ds.meta.indexes.items():
        for ns in ns_list:
            n = ds.df(index, ns.namespace).count()
            total += n
            print(f"{index}/{ns.namespace or '-'}: {n}")
    print(f"total: {total}")
    return 0


def cmd_id_list(args) -> int:
    from vector_io_spark.sources.parquet_util import get_id_list

    spark = get_spark(app_name="vector_io_spark_id_list")
    ids = get_id_list(spark, args.dataset, id_column=args.id_column)
    ids.coalesce(1).write.mode("overwrite").csv(args.out)
    print(f"{ids.count()} distinct ids -> {args.out}")
    return 0


def cmd_query(args) -> int:
    from vector_io_spark.queries import QUERIES

    if args.list_queries:
        print("\n".join(sorted(QUERIES)))
        return 0
    if not args.name:
        print("query: name required (or --list)")
        return 2
    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; see `query --list`")
        return 2
    spark = get_spark(app_name=f"vector_io_spark_query_{args.name}")
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.out:
        # write once, show from the written files — never execute the
        # query twice
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
        df = spark.read.parquet(args.out)
    df.show(args.limit, truncate=False)
    return 0


def cmd_explain(args) -> int:
    from vector_io_spark.queries import QUERIES

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; see `query --list`")
        return 2
    spark = get_spark(app_name=f"vector_io_spark_explain_{args.name}")
    QUERIES[args.name](spark, args.sf_dir).explain("formatted")
    return 0


def cmd_push_to_hub(args) -> int:
    from vector_io_spark.sources.hf import push_to_hub

    url = push_to_hub(args.dataset, args.repo_id, private=not args.public)
    print(f"pushed to {url}")
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "list-dbs":
        print("\n".join(sorted(_registry())))
        return 0
    if args.command == "export":
        return cmd_export(args)
    if args.command == "reembed":
        return cmd_reembed(args)
    if args.command == "consolidate":
        return cmd_consolidate(args)
    if args.command == "count":
        return cmd_count(args)
    if args.command == "get-id-list":
        return cmd_id_list(args)
    if args.command == "query":
        return cmd_query(args)
    if args.command == "explain":
        return cmd_explain(args)
    if args.command == "push-to-hub":
        return cmd_push_to_hub(args)
    return cmd_import(args)


if __name__ == "__main__":
    raise SystemExit(main())
