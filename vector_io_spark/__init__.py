"""vector_io_spark — a PySpark-native vector-dataset analytics engine.

Re-expresses the query and data-processing capabilities of the reference
``vector-io`` tool (single-process pandas ETL; see SURVEY.md) as Spark
DataFrame operators, designed for 100 TB scale:

- ``format``    — VDF dataset reader/writer (Parquet dirs + VDF_META.json)
- ``functions`` — scalar/column functions: vector coercion, sanitization,
                  name compliance, metric standardization, text analysis
- ``operators`` — relational + vector operators: filters, joins, dedup
                  (exact / MinHash-LSH / SimHash / n-gram Jaccard /
                  embedding cosine), similarity search, aggregates,
                  multimodal column plumbing
- ``sources``   — parquet discovery and the connector read/write framework
                  (paginated scans -> mapInPandas, batched upserts ->
                  foreachPartition with shrink/retry/rate-limit)
- ``plans``     — plan-inspection helpers used by tests to assert pushdown,
                  broadcast, and codegen properties
- ``streaming`` — incremental-export skeleton (Structured Streaming)

Everything is built on the public PySpark DataFrame API; no RDDs in hot
paths, Python UDFs only as Arrow-batched pandas UDFs where built-in
expressions cannot express the semantics.
"""

__version__ = "0.1.0"

from vector_io_spark.session import get_spark  # noqa: F401
