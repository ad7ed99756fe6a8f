"""raysketch — a Ray-Data-native distributed sketch / approximate
aggregation engine with the query capabilities of the reference
shabbyrobe/phphll HyperLogLog library, generalized to five mergeable
sketch families (HLL, Count-Min, t-digest, KLL, Bloom) expressed as
Ray Data UDAFs over zero-copy Arrow batches.
"""

from .sketches.hll import HLL

__all__ = ["HLL"]
__version__ = "0.1.0"
