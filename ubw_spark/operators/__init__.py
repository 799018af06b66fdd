from ubw_spark.operators.dedup import (
    exact_dedup,
    word_shingles,
    minhash_signature,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_contamination_pairs,
    simhash_signature,
    simhash_near_pairs,
    cap_buckets,
    oversized_buckets,
    banded_minhash,
)
from ubw_spark.operators.bloom import (
    bloom_positions,
    build_bloom,
    bloom_probe,
    bloom_audit,
    write_bloom_store,
    append_bloom_store,
    probe_bloom_store,
    load_bloom,
)
from ubw_spark.operators.lsh_index import (
    write_minhash_index,
    probe_minhash_index,
    append_minhash_batch,
    compact_minhash_index,
)
from ubw_spark.operators.semdedup import (
    assign_cells,
    semantic_dup_pairs,
    semantic_dedup_report,
)
from ubw_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select,
    hashed_ngram_features,
)
from ubw_spark.operators.similarity import (
    cosine_col,
    brute_force_topk,
    hyperplane_lsh_buckets,
    lsh_ann_topk,
    embedding_near_dup_pairs,
)
from ubw_spark.operators.pq import (
    seed_pq_codebooks,
    train_pq_codebooks,
    pq_encode,
    pq_adc_topk,
    ivf_pq_topk,
    write_ivfpq_index,
    probe_ivfpq_index,
)
from ubw_spark.operators.spans import (
    duplicate_spans,
    duplicated_token_fraction,
    cut_duplicate_spans,
    write_gram_index,
    probe_gram_index,
    append_gram_index,
    compact_gram_index,
    grams_of,
)
from ubw_spark.operators.layout import (
    with_zvalue,
    zorder_layout,
    zorder_write,
    file_bounds,
    footer_bounds,
    compact_parquet,
    read_pruned,
)
from ubw_spark.operators.chunking import chunk_documents
from ubw_spark.operators.splits import weighted_sample_per_group
from ubw_spark.operators.curation import quantile_gate
from ubw_spark.operators.expectations import validate_expectations
from ubw_spark.operators.temporal import asof_join, range_join
from ubw_spark.operators.multimodal import (
    with_payload_metadata,
    decode_batches,
    extract_features,
    resize_images,
    sample_frames,
)
from ubw_spark.operators.skew import salted_groupby_agg, salted_join
from ubw_spark.operators.winnow import (
    winnow_fingerprints_df,
    fingerprint_index,
    winnow_overlap_pairs,
)
from ubw_spark.operators.cdc import scd2_init, scd2_merge, snapshot_diff
from ubw_spark.operators.ivf import (
    train_ivf_centroids,
    assign_ivf_cells,
    ivf_ann_topk,
    append_ivf_batch,
    compact_ivf_index,
)
from ubw_spark.operators.pq import compact_ivfpq_index
from ubw_spark.operators.versioned import store_stats, current_version, resolve_root
from ubw_spark.operators.splits import assign_split, split_column
from ubw_spark.operators.stats import grouped_robust_stats
from ubw_spark.operators.components import (
    connected_components,
    dedup_keep_list,
)

__all__ = [
    "exact_dedup",
    "word_shingles",
    "minhash_signature",
    "lsh_candidate_pairs",
    "minhash_dedup_pairs",
    "minhash_contamination_pairs",
    "banded_minhash",
    "bloom_positions",
    "build_bloom",
    "bloom_probe",
    "bloom_audit",
    "write_bloom_store",
    "append_bloom_store",
    "probe_bloom_store",
    "load_bloom",
    "write_minhash_index",
    "probe_minhash_index",
    "append_minhash_batch",
    "compact_minhash_index",
    "assign_cells",
    "semantic_dup_pairs",
    "semantic_dedup_report",
    "dsir_log_weights",
    "dsir_select",
    "hashed_ngram_features",
    "compact_gram_index",
    "grams_of",
    "seed_pq_codebooks",
    "train_pq_codebooks",
    "validate_expectations",
    "pq_encode",
    "pq_adc_topk",
    "ivf_pq_topk",
    "write_ivfpq_index",
    "probe_ivfpq_index",
    "simhash_signature",
    "simhash_near_pairs",
    "cap_buckets",
    "oversized_buckets",
    "cosine_col",
    "brute_force_topk",
    "hyperplane_lsh_buckets",
    "lsh_ann_topk",
    "embedding_near_dup_pairs",
    "asof_join",
    "range_join",
    "with_payload_metadata",
    "decode_batches",
    "extract_features",
    "resize_images",
    "sample_frames",
    "salted_groupby_agg",
    "salted_join",
    "grouped_robust_stats",
    "winnow_fingerprints_df",
    "fingerprint_index",
    "winnow_overlap_pairs",
    "scd2_init",
    "scd2_merge",
    "snapshot_diff",
    "train_ivf_centroids",
    "assign_ivf_cells",
    "ivf_ann_topk",
    "append_ivf_batch",
    "compact_ivf_index",
    "compact_ivfpq_index",
    "store_stats",
    "current_version",
    "resolve_root",
    "assign_split",
    "split_column",
    "connected_components",
    "dedup_keep_list",
    "duplicate_spans",
    "duplicated_token_fraction",
    "cut_duplicate_spans",
    "write_gram_index",
    "probe_gram_index",
    "append_gram_index",
    "with_zvalue",
    "zorder_layout",
    "zorder_write",
    "file_bounds",
    "footer_bounds",
    "compact_parquet",
    "read_pruned",
    "chunk_documents",
    "weighted_sample_per_group",
    "quantile_gate",
]
