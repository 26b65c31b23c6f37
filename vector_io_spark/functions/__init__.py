"""Column-level functions: vector coercion, sanitization, naming, text."""

from vector_io_spark.functions.vectors import (  # noqa: F401
    coerce_vector_column,
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
    quantize_embeddings,
    vector_dim,
)
from vector_io_spark.functions.sanitize import (  # noqa: F401
    clean_nan_inf,
    cleanup_df,
    fill_nat_epoch,
    parse_json_metadata,
)
from vector_io_spark.functions.names import (  # noqa: F401
    compliant_name_astra,
    compliant_name_kdbai,
    compliant_name_milvus,
    compliant_name_pinecone,
    deterministic_uuid_expr,
)
from vector_io_spark.functions.text import (  # noqa: F401
    char_ngrams,
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    tokens,
    word_shingles,
)
