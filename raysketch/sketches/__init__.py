from .base import MergeableSketch, hash_column, hash_composite
from .bloom import BloomFilter
from .bottomk import BottomK, set_op_estimates
from .cms import CountMin
from .countsketch import CountSketch
from .cuckoo import CuckooFilter
from .ddsketch import DDSketch
from .fd import FrequentDirections
from .hll import HLL
from .setsketch import ExactSet
from .kll import KLL
from .misragries import MisraGries
from .moments import MomentsSketch
from .req import REQ
from .tdigest import TDigest

#: name → class registry used by the Ray aggregation layer and checkpoints
SKETCHES = {
    "hll": HLL,
    "bottomk": BottomK,
    "bloom": BloomFilter,
    "countmin": CountMin,
    "countsketch": CountSketch,
    "cuckoo": CuckooFilter,
    "ddsketch": DDSketch,
    "fd": FrequentDirections,
    "kll": KLL,
    "tdigest": TDigest,
    "set": ExactSet,
    "misragries": MisraGries,
    "moments": MomentsSketch,
    "req": REQ,
}

__all__ = [
    "HLL",
    "BottomK", "set_op_estimates",
    "BloomFilter",
    "CountMin",
    "CountSketch",
    "CuckooFilter",
    "DDSketch",
    "FrequentDirections",
    "KLL",
    "TDigest",
    "ExactSet",
    "MisraGries",
    "MomentsSketch",
    "REQ",
    "MergeableSketch",
    "SKETCHES",
    "hash_column",
    "hash_composite",
]
