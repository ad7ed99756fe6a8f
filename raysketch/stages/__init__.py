from .dedup import (
    MinHasher,
    SimHasher,
    embedding_dedup,
    exact_dedup_keep_ids,
    lsh_candidate_pairs,
    minhash_dedup,
    ngram_jaccard,
    ngram_jaccard_join,
    prefix_filter_candidates,
    simhash_candidate_pairs,
    simhash_dedup,
    union_find_components,
    word_ngram_jaccard,
)
from .incremental import ExactDedupIndex, MinHashBandIndex
from .multimodal import (AudioFrameSample, ImageDecode, ImageFeatures,
                         ImageResize, VideoFrameSample)
from .similarity import IVFIndex, brute_force_topk
from .textstats import Fingerprint, LangId, QualityScore, TokenCount

__all__ = [
    "MinHasher", "SimHasher", "embedding_dedup", "exact_dedup_keep_ids",
    "lsh_candidate_pairs", "minhash_dedup", "ngram_jaccard",
    "ngram_jaccard_join", "prefix_filter_candidates",
    "simhash_candidate_pairs", "simhash_dedup", "union_find_components",
    "word_ngram_jaccard",
    "ExactDedupIndex", "MinHashBandIndex",
    "AudioFrameSample", "ImageDecode", "ImageFeatures", "ImageResize",
    "VideoFrameSample",
    "IVFIndex", "brute_force_topk",
    "Fingerprint", "LangId", "QualityScore", "TokenCount",
]
