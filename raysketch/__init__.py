"""raysketch — a Ray-Data-native data-processing engine with the query
capabilities of the reference shabbyrobe/phphll HyperLogLog library,
generalized to six mergeable sketch families (HLL, Count-Min, t-digest,
KLL, Bloom, bottom-k) expressed as Ray Data UDAFs over zero-copy Arrow
batches, plus the dedup / similarity / text-analysis / multimodal
pipelines a large-scale training-data stack needs.

Sketch classes import eagerly (numpy-only); the Ray aggregation layer
loads lazily on first use so ``import raysketch`` stays cheap and never
touches Ray.
"""

from .sketches.hll import HLL

__all__ = [
    "HLL",
    "BloomFilter",
    "CountMin",
    "KLL",
    "TDigest",
    "BottomK",
    "ExactSet",
    "sketch_aggregate",
    "multi_sketch_aggregate",
    "fold_partials",
    "SketchMerge",
    "sketch_aggregate_files",
    "canonical_sketch_reduce",
    "actor_pool_fold",
    "multi_sketch_aggregate_files",
]
__version__ = "0.1.0"

_LAZY = {
    "BloomFilter": ("raysketch.sketches.bloom", "BloomFilter"),
    "CountMin": ("raysketch.sketches.cms", "CountMin"),
    "KLL": ("raysketch.sketches.kll", "KLL"),
    "TDigest": ("raysketch.sketches.tdigest", "TDigest"),
    "BottomK": ("raysketch.sketches.bottomk", "BottomK"),
    "ExactSet": ("raysketch.sketches.setsketch", "ExactSet"),
    "sketch_aggregate": ("raysketch.agg", "sketch_aggregate"),
    "multi_sketch_aggregate": ("raysketch.agg", "multi_sketch_aggregate"),
    "fold_partials": ("raysketch.agg", "fold_partials"),
    "SketchMerge": ("raysketch.agg", "SketchMerge"),
    "sketch_aggregate_files": ("raysketch.agg", "sketch_aggregate_files"),
    "canonical_sketch_reduce": ("raysketch.agg", "canonical_sketch_reduce"),
    "actor_pool_fold": ("raysketch.agg", "actor_pool_fold"),
    "multi_sketch_aggregate_files": ("raysketch.agg", "multi_sketch_aggregate_files"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'raysketch' has no attribute {name!r}")
