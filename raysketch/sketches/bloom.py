"""Bloom filter as a mergeable aggregation state.

Not present in the reference (SURVEY.md §2.5) — required by the north
rule ("membership / seen conv_id" queries). Classic partitioned-free
Bloom filter with Kirsch–Mitzenmacher double hashing: the k probe
positions for an element are ``(h1 + i·h2) mod m`` for i in 0..k-1,
which preserves the standard false-positive bound with only two base
hashes per element (Kirsch & Mitzenmacher, "Less Hashing, Same
Performance", ESA 2006).

Element canonicalization and the base hash reuse the reference's
MurmurHash64A pipeline (seed 0xadc83b19 for h1, a distinct fixed seed
for h2) so int 100 ≡ "100" here too.

Merge = bitwise OR: associative, commutative, idempotent — safe under
any tree-reduction order and partition re-execution.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..hashing import murmur64a, HLL_SEED
from ..keys import canonical_flat_bytes

__all__ = ["BloomFilter"]

_SEED2 = np.uint64(0x9747B28C)  # independent second base hash
_MAGIC = b"RSBL"


class BloomFilter:
    IDEMPOTENT_MERGE = True
    __slots__ = ("m", "k", "words")

    def __init__(self, num_bits: int = 1 << 23, num_hashes: int | None = None,
                 capacity: int | None = None, fp_rate: float = 0.01):
        """Either pass (num_bits, num_hashes) directly or (capacity, fp_rate)
        to size optimally: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2)."""
        if capacity is not None:
            num_bits = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
            num_hashes = max(1, round((num_bits / capacity) * math.log(2)))
        num_bits = (num_bits + 63) & ~63  # round up to whole words
        self.m = num_bits
        self.k = num_hashes if num_hashes is not None else 7
        self.words = np.zeros(self.m // 64, dtype=np.uint64)

    @classmethod
    def empty(cls, **params) -> "BloomFilter":
        return cls(**params)

    def _positions(self, h1: np.ndarray, h2: np.ndarray):
        m = np.uint64(self.m)
        for i in range(self.k):
            yield (h1 + np.uint64(i) * h2) % m

    def add_batch(self, column) -> None:
        data, offsets = canonical_flat_bytes(column)
        h1 = murmur64a(data, offsets, HLL_SEED)
        h2 = murmur64a(data, offsets, _SEED2)
        self.add_hash_pairs(h1, h2)

    def add_hash_pairs(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Fold pre-hashed elements (the batch fold computes the two base
        hashes once and shares them across per-key groups)."""
        h2 = h2 | np.uint64(1)  # odd → full period
        one = np.uint64(1)
        for pos in self._positions(h1, h2):
            np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                             one << (pos & np.uint64(63)))

    def contains_batch(self, column) -> np.ndarray:
        """Vectorized membership probe → bool[n]. No false negatives."""
        data, offsets = canonical_flat_bytes(column)
        h1 = murmur64a(data, offsets, HLL_SEED)
        h2 = murmur64a(data, offsets, _SEED2) | np.uint64(1)
        out = np.ones(len(h1), dtype=bool)
        one = np.uint64(1)
        for pos in self._positions(h1, h2):
            bit = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
                   >> (pos & np.uint64(63))) & one
            out &= bit.astype(bool)
        return out

    def contains(self, element) -> bool:
        return bool(self.contains_batch([element])[0])

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("cannot merge Bloom filters with different (m, k)")
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def bits_set(self) -> int:
        return int(np.unpackbits(self.words.view(np.uint8)).sum())

    def finalize(self) -> dict:
        """Summary: bits set, fill ratio, and the standard cardinality
        estimate n ≈ -(m/k)·ln(1 - X/m)."""
        x = self.bits_set()
        fill = x / self.m
        est = 0 if x == 0 else -(self.m / self.k) * math.log(max(1e-300, 1.0 - fill))
        return {"bits_set": x, "fill_ratio": fill, "estimated_items": int(est),
                "num_bits": self.m, "num_hashes": self.k}

    def fp_rate_estimate(self) -> float:
        return (self.bits_set() / self.m) ** self.k

    # -- wire format -----------------------------------------------------
    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<BxxxQI", 1, self.m, self.k) + self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        if data[:4] != _MAGIC:
            raise ValueError("invalid Bloom dump: bad magic")
        _, m, k = struct.unpack_from("<BxxxQI", data, 4)
        out = cls(num_bits=m, num_hashes=k)
        out.words = np.frombuffer(data[20:], dtype=np.uint64).copy()
        if len(out.words) != m // 64:
            raise ValueError("invalid Bloom dump: truncated bit array")
        return out

    def __reduce__(self):
        return (BloomFilter.from_bytes, (self.to_bytes(),))
