from .base import MergeableSketch, hash_column, hash_composite
from .bloom import BloomFilter
from .cms import CountMin
from .hll import HLL
from .kll import KLL
from .tdigest import TDigest

#: name → class registry used by the Ray aggregation layer and checkpoints
SKETCHES = {
    "hll": HLL,
    "bloom": BloomFilter,
    "countmin": CountMin,
    "kll": KLL,
    "tdigest": TDigest,
}

__all__ = [
    "HLL",
    "BloomFilter",
    "CountMin",
    "KLL",
    "TDigest",
    "MergeableSketch",
    "SKETCHES",
    "hash_column",
    "hash_composite",
]
