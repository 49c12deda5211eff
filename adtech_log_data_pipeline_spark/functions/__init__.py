from .text import (
    contamination_check,
    curated_corpus,
    doc_fingerprints,
    lang_id,
    stratified_sample,
    text_stats,
    tokens_col,
    train_split,
)
from .dedup import (
    dedup_exact,
    dedup_keep_best,
    minhash_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from .similarity import brute_force_topk, ivf_topk, lsh_topk
from .multimodal import (
    decode_image_metadata,
    frame_sample_manifest,
    image_embed,
    resize_plan,
    with_blob_column,
)
from .export import export_training_shards
from .sketch import kmv_distinct, kmv_keep, kmv_report
from .expectations import Expectation, enforce_expectations, run_expectations

__all__ = [
    "tokens_col",
    "text_stats",
    "lang_id",
    "doc_fingerprints",
    "train_split",
    "stratified_sample",
    "contamination_check",
    "curated_corpus",
    "dedup_exact",
    "dedup_keep_best",
    "minhash_candidates",
    "simhash",
    "ngram_jaccard_pairs",
    "brute_force_topk",
    "lsh_topk",
    "ivf_topk",
    "with_blob_column",
    "decode_image_metadata",
    "resize_plan",
    "frame_sample_manifest",
    "image_embed",
    "export_training_shards",
    "kmv_distinct",
    "kmv_keep",
    "kmv_report",
    "Expectation",
    "run_expectations",
    "enforce_expectations",
]
