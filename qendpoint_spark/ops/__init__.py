from qendpoint_spark.ops.textstats import (
    text_stats,
    lang_id,
    doc_fingerprint,
    token_counts,
)
from qendpoint_spark.ops.dedup import (
    exact_dedup,
    shingle_table,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_table,
    embedding_dup_pairs,
)
from qendpoint_spark.ops.similarity import brute_force_topk, lsh_bucketed_topk

__all__ = [
    "text_stats", "lang_id", "doc_fingerprint", "token_counts",
    "exact_dedup", "shingle_table", "ngram_jaccard_pairs",
    "minhash_signatures", "minhash_lsh_pairs", "simhash_table",
    "embedding_dup_pairs", "brute_force_topk", "lsh_bucketed_topk",
]
