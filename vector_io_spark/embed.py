"""Re-embed pipeline (reference reembed.py, SURVEY.md §2.9).

The reference iterates parquet files, embeds ``text_column`` in batches of
96, appends a ``vec_<text>_<model>[_<quant>]_dim<d>`` column and rewrites
files in place. Spark-first this is one ``mapInPandas`` pass:

- per-executor lazy model init (one model per Python worker, not per batch)
- Arrow batch size is the embedding batch knob
  (``spark.sql.execution.arrow.maxRecordsPerBatch``)
- output is a *new* VDF version directory (immutability) instead of an
  in-place rewrite

Backends:
- ``hash``  — deterministic fake embedder (md5-seeded), for tests/oracles;
  no model dependency, bit-reproducible everywhere
- ``litellm`` / ``sentence_transformers`` — gated behind import-try; the
  container has neither, so they raise with a clear message (the Spark
  plumbing — batching, schema evolution, meta update — is identical and
  is what the tests cover)
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEFAULT_BATCH_SIZE = 96  # reference reembed.py:427-431


def derived_column_name(
    text_column: str, model_name: str, dims: int, quant: str | None = None
) -> str:
    """vec_<text>_<model>[_<quant>]_dim<d> (reembed.py:111-124)."""
    model_slug = model_name.split("/")[-1].replace("-", "_").replace(".", "_")
    quant_part = f"_{quant}" if quant and quant != "float32" else ""
    return f"vec_{text_column}_{model_slug}{quant_part}_dim{dims}"


def hash_embed_batch(texts: list[str], dims: int) -> list[list[float]]:
    """Deterministic fake embedder: dimension d of text t is a uniform
    [-1,1] float derived from md5(f"{t}|{d}") — stable across engines,
    languages and runs, so oracle SQL can reproduce it."""
    out = []
    for t in texts:
        vec = []
        for d in range(dims):
            h = hashlib.md5(f"{t}|{d}".encode()).hexdigest()[:8]
            vec.append(int(h, 16) / float(0xFFFFFFFF) * 2.0 - 1.0)
        out.append(vec)
    return out


def _make_batch_embedder(
    backend: str, model_name: str, dims: int
) -> Callable[[list[str]], list[list[float]]]:
    if backend == "hash":
        return lambda texts: hash_embed_batch(texts, dims)
    if backend == "sentence_transformers":
        try:
            from sentence_transformers import SentenceTransformer  # type: ignore
        except ImportError as e:  # pragma: no cover - not installed here
            raise NotImplementedError(
                "sentence_transformers backend requires the package; "
                "use backend='hash' for deterministic local runs"
            ) from e
        model = SentenceTransformer(model_name)
        return lambda texts: model.encode(texts).tolist()
    if backend == "litellm":
        try:
            import litellm  # type: ignore
        except ImportError as e:  # pragma: no cover - not installed here
            raise NotImplementedError(
                "litellm backend requires the package; "
                "use backend='hash' for deterministic local runs"
            ) from e
        return lambda texts: [
            d["embedding"]
            for d in litellm.embedding(model=model_name, input=texts)["data"]
        ]
    raise ValueError(f"unknown embedding backend {backend!r}")


def reembed(
    df: DataFrame,
    text_column: str,
    model_name: str = "hash-embedder",
    dims: int = 16,
    backend: str = "hash",
    batch_size: int = DEFAULT_BATCH_SIZE,
    quant: str | None = None,
    new_column: str | None = None,
) -> tuple[DataFrame, str]:
    """Append an embedding column for ``text_column``; returns
    (DataFrame, new_column_name).

    Composite text columns ("title|body", reembed.py:211-216) are supported
    by passing a pre-concatenated column (build with
    ``concat_ws(' ', ...)`` + coalesce — see queries.reembed_composite).

    Scale design: ``mapInPandas`` with the model held in a per-worker
    global — embedding at 100 TB is embarrassingly parallel, and the
    Arrow batch size bounds peak memory per worker. Null/empty texts get
    null vectors (the reference drops them; null keeps row alignment and
    lets the caller decide).
    """
    out_col = new_column or derived_column_name(text_column, model_name, dims, quant)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()), True)]
    )
    # capture only plain values in the closure, never the DataFrame
    b_backend, b_model, b_dims, b_batch = backend, model_name, dims, batch_size

    def embed_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        embedder = _make_batch_embedder(b_backend, b_model, b_dims)
        for pdf in batches:
            texts = pdf[text_column]
            vectors: list[list[float] | None] = [None] * len(pdf)
            todo_idx = [
                i
                for i, t in enumerate(texts)
                if isinstance(t, str) and len(t) > 0
            ]
            for start in range(0, len(todo_idx), b_batch):
                chunk = todo_idx[start : start + b_batch]
                embs = embedder([texts.iloc[i] for i in chunk])
                for i, v in zip(chunk, embs):
                    vectors[i] = [float(x) for x in v]
            out = pdf.copy()
            out[out_col] = vectors
            yield out

    return df.mapInPandas(embed_partition, schema=out_schema), out_col


def reembed_vdf(
    dataset,  # VDFDataset
    dataset_dir_out: str,
    text_column: str,
    model_name: str = "hash-embedder",
    dims: int = 16,
    backend: str = "hash",
    batch_size: int = DEFAULT_BATCH_SIZE,
):
    """VDF -> VDF' with a new embedding column: re-embeds every namespace
    and writes a new dataset version (meta updated: new column *prepended*
    to vector_columns, model_map entry added — reembed.py:176-205)."""
    from vector_io_spark.format.writer import write_vdf

    new_map = {}
    out_col = None
    for key, df in dataset.namespaces.items():
        new_df, out_col = reembed(
            df, text_column, model_name, dims, backend, batch_size
        )
        new_map[key] = new_df
    vec_cols = [out_col] + [
        c
        for ns_list in dataset.meta.indexes.values()
        for ns in ns_list
        for c in ns.vector_columns
    ]
    seen: set[str] = set()
    vec_cols = [c for c in vec_cols if not (c in seen or seen.add(c))]
    meta = write_vdf(
        new_map,
        dataset_dir_out,
        exported_from=dataset.meta.exported_from,
        id_column=dataset.id_column,
        vector_columns=vec_cols,
        model_name=model_name,
    )
    for ns_list in meta.indexes.values():
        for ns in ns_list:
            ns.model_map = {
                out_col: {
                    "model_name": model_name,
                    "text_column": text_column,
                    "dimensions": dims,
                }
            }
    from vector_io_spark.meta import write_meta

    write_meta(dataset_dir_out, meta)
    return meta
