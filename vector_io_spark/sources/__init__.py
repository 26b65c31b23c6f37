"""Connector framework: paginated scans -> DataFrames, batched upsert sinks."""

from vector_io_spark.sources.connectors import (  # noqa: F401
    BatchShrinkPolicy,
    RateLimiter,
    RetryPolicy,
    VectorDBConnector,
    paginated_read,
    partitioned_upsert,
)
from vector_io_spark.sources.embedded import EmbeddedVectorDB  # noqa: F401
from vector_io_spark.sources.parquet_util import (  # noqa: F401
    count_rows_dataset,
    get_id_list,
    get_parquet_files,
    missing_ids,
)
