from .text import doc_fingerprints, lang_id, text_stats, tokens_col
from .dedup import dedup_exact, minhash_candidates, ngram_jaccard_pairs, simhash
from .similarity import brute_force_topk, lsh_topk
from .multimodal import decode_image_metadata, with_blob_column

__all__ = [
    "tokens_col",
    "text_stats",
    "lang_id",
    "doc_fingerprints",
    "dedup_exact",
    "minhash_candidates",
    "simhash",
    "ngram_jaccard_pairs",
    "brute_force_topk",
    "lsh_topk",
    "with_blob_column",
    "decode_image_metadata",
]
