from .hll import HLL
from .base import MergeableSketch, hash_column, hash_composite

__all__ = ["HLL", "MergeableSketch", "hash_column", "hash_composite"]
