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
    """hf://datasets/... parquet read (util.py:424-435 resolves hf:// to
    cached parquet; here fsspec's hf protocol feeds spark.read directly;
    ``max_num_rows`` mirrors the stream-take-N path, util.py:291-332)."""
    try:
        import huggingface_hub  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "huggingface_hub is required for hf:// sources; not installed "
            "in this environment — use a local parquet path instead"
        ) from e
    df = spark.read.parquet(f"hf://datasets/{dataset}/**/*.parquet")
    return df.limit(max_num_rows) if max_num_rows else df


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
