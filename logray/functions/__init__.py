from logray.functions.textstats import TextStatsBatch, text_stats
from logray.functions.dedup import (
    connected_components,
    connected_components_distributed,
    dedup_keep_min,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
    embedding_dedup,
)
from logray.functions.ann import ann_topk, ann_lsh_topk, ann_ivf_topk
from logray.functions.fingerprint import FingerprintBatch

__all__ = [
    "TextStatsBatch",
    "text_stats",
    "connected_components",
    "connected_components_distributed",
    "ann_ivf_topk",
    "dedup_keep_min",
    "exact_dedup",
    "minhash_lsh_dedup",
    "ngram_jaccard_pairs",
    "simhash_dedup",
    "embedding_dedup",
    "ann_topk",
    "ann_lsh_topk",
    "FingerprintBatch",
]
