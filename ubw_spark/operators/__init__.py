from ubw_spark.operators.dedup import (
    exact_dedup,
    word_shingles,
    minhash_signature,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    simhash_signature,
    simhash_near_pairs,
)
from ubw_spark.operators.similarity import (
    cosine_col,
    brute_force_topk,
    hyperplane_lsh_buckets,
    lsh_ann_topk,
)
from ubw_spark.operators.temporal import asof_join, range_join
from ubw_spark.operators.multimodal import (
    with_payload_metadata,
    decode_batches,
    extract_features,
)

__all__ = [
    "exact_dedup",
    "word_shingles",
    "minhash_signature",
    "lsh_candidate_pairs",
    "minhash_dedup_pairs",
    "simhash_signature",
    "simhash_near_pairs",
    "cosine_col",
    "brute_force_topk",
    "hyperplane_lsh_buckets",
    "lsh_ann_topk",
    "asof_join",
    "range_join",
    "with_payload_metadata",
    "decode_batches",
    "extract_features",
]
