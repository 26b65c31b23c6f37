"""Relational + vector operators over DataFrames."""

from vector_io_spark.operators.filters import (  # noqa: F401
    filter_id_in_list,
    filter_id_range,
    filter_nonnull_vector,
    limit_rows,
)
from vector_io_spark.operators.joins import (  # noqa: F401
    anti_join_missing_ids,
    key_union_join,
    semi_join_id_list,
    vectors_metadata_outer_join,
)
from vector_io_spark.operators.dedup import (  # noqa: F401
    dedup_by_id,
    dedup_exact_content,
    dedup_embedding_cosine,
    minhash_bucket_occupancy,
    minhash_signatures,
    minhash_lsh_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_dup_pairs,
)
from vector_io_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    delete_from_index,
    ivf_index_probe_topk,
    ivfpq_index_probe_topk,
    lsh_bucketed_topk,
    write_ivf_index,
    write_ivfpq_index,
)
from vector_io_spark.operators.snapshot import (  # noqa: F401
    restore_index,
    snapshot_index,
    verify_snapshot,
)
from vector_io_spark.operators.export_catalog import (  # noqa: F401
    export_index_to_vdf,
    import_vdf_to_index,
    read_index_vectors,
    read_sparse_vectors,
    read_sq8_reconstructed,
)
from vector_io_spark.operators.hybrid import (  # noqa: F401
    hybrid_indexed_topk,
    hybrid_indexed_topk_batch,
)
from vector_io_spark.operators.sparse_index import (  # noqa: F401
    rebuild_sparse_if_drifted,
    sparse_index_probe_topk,
    sparse_index_probe_topk_batch,
    write_sparse_index,
)
from vector_io_spark.operators.sq8 import (  # noqa: F401
    rebuild_sq8_if_drifted,
    sq8_bounds_drift_stats,
    sq8_index_probe_topk,
    write_sq8_index,
)
from vector_io_spark.operators.vectorquery import (  # noqa: F401
    distance_matrix,
    grouped_topk,
    range_search,
    recommend_topk,
)
from vector_io_spark.operators.aggregates import (  # noqa: F401
    count_rows,
    distinct_id_count,
    vector_range_stats,
)
