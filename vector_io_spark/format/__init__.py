"""VDF dataset format: Parquet directories cataloged by VDF_META.json."""

from vector_io_spark.format.reader import VDFDataset, read_vdf  # noqa: F401
from vector_io_spark.format.writer import write_vdf  # noqa: F401
from vector_io_spark.format.consolidate import consolidate, unify_schemas  # noqa: F401
