"""HuggingFace Hub source/sink (reference util.py:266-341,
push_to_hub_vdf.py:9-78).

Both are driver-side orchestration around network services that are
unavailable in this environment, so the entry points are import-gated; the
Spark-facing contract (a parquet path in, a DataFrame out) is what the rest
of the engine consumes and is covered by the local parquet paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_hf_dataset(
    spark: SparkSession,
    dataset: str,
    split: str = "train",
    max_num_rows: int | None = None,
) -> DataFrame:
    """HF dataset -> DataFrame (util.py:424-435 resolves hf:// to cached
    parquet; ``max_num_rows`` mirrors the stream-take-N path,
    util.py:291-332). The repo's parquet files are LOCALIZED first via
    ``snapshot_download`` and the local snapshot feeds
    ``spark.read.parquet`` — Spark's JVM readers resolve paths through
    Hadoop FileSystems, which have no ``hf`` scheme (fsspec's hf
    protocol is Python-side only), so handing an hf:// URI to
    spark.read always failed. ``split`` filters the downloaded files to
    that split's directory/prefix (HF's parquet layout conventions);
    ``max_num_rows=0`` returns an empty frame, not the full dataset."""
    try:
        from huggingface_hub import snapshot_download  # type: ignore
    except ImportError as e:
        raise ImportError(
            "huggingface_hub is required for hf:// sources; not installed "
            "in this environment — use a local parquet path instead"
        ) from e
    local = snapshot_download(
        repo_id=dataset,
        repo_type="dataset",
        # every parquet layout convention: <split>/*.parquet and
        # <config>/<split>-xxxxx-of-yyyyy.parquet, nested OR at the
        # repo root — fnmatch's '**/' requires a literal '/', so the
        # nested patterns alone download ZERO files from repos that
        # keep train-00000-of-....parquet at the root (ADVICE r6), and
        # spark.read.parquet then failed with an unrelated
        # schema-inference error.
        allow_patterns=[
            f"**/{split}/*.parquet",
            f"**/{split}-*.parquet",
            f"{split}/*.parquet",
            f"{split}-*.parquet",
        ],
    )
    import glob
    import os as _os

    # Scope BOTH the existence check and the read to THIS split's file
    # patterns (r7 review): snapshot_download returns a shared cached
    # dir, so a whole-dir glob/scan after an earlier different-split
    # call would silently return the OTHER split's rows (or a union)
    # instead of raising on a typo'd or parquet-less split.
    files = sorted(
        {
            f
            for pat in (
                _os.path.join(local, "**", split, "*.parquet"),
                _os.path.join(local, "**", f"{split}-*.parquet"),
                _os.path.join(local, split, "*.parquet"),
                _os.path.join(local, f"{split}-*.parquet"),
            )
            for f in glob.glob(pat, recursive=True)
        }
    )
    if not files:
        raise FileNotFoundError(
            f"read_hf_dataset: dataset {dataset!r} has no parquet files "
            f"for split {split!r} in its snapshot — check the split name "
            "and that the repo stores parquet (not arrow/jsonl) shards"
        )
    df = spark.read.parquet(*files)
    return df.limit(max_num_rows) if max_num_rows is not None else df


def push_to_hub(dataset_dir: str, repo_id: str, private: bool = True) -> str:
    """Upload a VDF dataset dir as a HF dataset repo with a README card
    (push_to_hub_vdf.py:9-78). Driver-side post-write step."""
    try:
        from huggingface_hub import HfApi  # type: ignore
    except ImportError as e:
        raise ImportError(
            "huggingface_hub is required for push_to_hub; not installed"
        ) from e
    api = HfApi()
    api.create_repo(repo_id, repo_type="dataset", private=private, exist_ok=True)
    api.upload_folder(folder_path=dataset_dir, repo_id=repo_id, repo_type="dataset")
    return f"https://huggingface.co/datasets/{repo_id}"
