"""Count-Min sketch as a mergeable aggregation state.

Not present in the reference (SURVEY.md §2.5) — required by the north
rule (heavy-hitter tool counts). Standard Cormode–Muthukrishnan CM
sketch ("An Improved Data Stream Summary: The Count-Min Sketch and its
Applications", J. Algorithms 2005): d rows × w counters; element e adds
``weight`` to ``row[i][h_i(e) mod w]``; point query = min over rows.
Guarantee: est ≤ true + ε·N with probability ≥ 1-δ for w = ⌈e/ε⌉,
d = ⌈ln(1/δ)⌉.

Row hashes come from Kirsch–Mitzenmacher double hashing over the
reference's MurmurHash64A pipeline (same canonical element coercion as
HLL so int 100 ≡ "100").

Merge = element-wise add: associative and commutative but NOT
idempotent — resume-after-failure must be exactly-once per partition
(see raysketch.state.checkpoint).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..hashing import murmur64a, HLL_SEED
from ..keys import canonical_flat_bytes

__all__ = ["CountMin"]

_SEED2 = np.uint64(0x9747B28C)
_MAGIC = b"RSCM"


class CountMin:
    IDEMPOTENT_MERGE = False
    __slots__ = ("d", "w", "table", "total")

    def __init__(self, width: int = 1 << 15, depth: int = 5,
                 eps: float | None = None, delta: float | None = None):
        """Either (width, depth) directly, or (eps, delta) for the published
        sizing w=⌈e/ε⌉, d=⌈ln(1/δ)⌉."""
        if eps is not None:
            width = int(math.ceil(math.e / eps))
        if delta is not None:
            depth = int(math.ceil(math.log(1.0 / delta)))
        self.w = width
        self.d = depth
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.total = 0  # N = total weight folded (travels with the state)

    @classmethod
    def empty(cls, **params) -> "CountMin":
        return cls(**params)

    def _row_positions(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        h1 = murmur64a(data, offsets, HLL_SEED)
        h2 = murmur64a(data, offsets, _SEED2) | np.uint64(1)
        w = np.uint64(self.w)
        pos = np.empty((self.d, len(h1)), dtype=np.int64)
        for i in range(self.d):
            pos[i] = ((h1 + np.uint64(i) * h2) % w).astype(np.int64)
        return pos

    def add_batch(self, column, weights=None) -> None:
        data, offsets = canonical_flat_bytes(column)
        h1 = murmur64a(data, offsets, HLL_SEED)
        h2 = murmur64a(data, offsets, _SEED2)
        self.add_hash_pairs(h1, h2, weights)

    def add_hash_pairs(self, h1: np.ndarray, h2: np.ndarray, weights=None) -> None:
        """Fold pre-hashed elements (shared base hashes per batch)."""
        h2 = h2 | np.uint64(1)
        w = np.uint64(self.w)
        pos = np.empty((self.d, len(h1)), dtype=np.int64)
        for i in range(self.d):
            pos[i] = ((h1 + np.uint64(i) * h2) % w).astype(np.int64)
        # bincount is ~10x faster than np.add.at for scatter-add
        if weights is None:
            for i in range(self.d):
                self.table[i] += np.bincount(pos[i], minlength=self.w)
            self.total += pos.shape[1]
        else:
            wts = np.asarray(weights, dtype=np.int64)
            for i in range(self.d):
                self.table[i] += np.bincount(pos[i], weights=wts, minlength=self.w).astype(np.int64)
            self.total += int(wts.sum())

    def estimate_batch(self, column) -> np.ndarray:
        """Vectorized point queries → int64[n] (est ≥ true, ≤ true + εN w.h.p.)."""
        data, offsets = canonical_flat_bytes(column)
        pos = self._row_positions(data, offsets)
        ests = self.table[np.arange(self.d)[:, None], pos]
        return ests.min(axis=0)

    def estimate(self, element) -> int:
        return int(self.estimate_batch([element])[0])

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError("cannot merge CountMin sketches with different (d, w)")
        self.table += other.table
        self.total += other.total
        return self

    def inner_product(self, other: "CountMin") -> int:
        """Join-size / inner-product estimate (Cormode–Muthukrishnan §4.2):
        ``est = min_i Σ_j A[i][j]·B[i][j]`` over the d rows. Never
        under-estimates (every row's dot sums true-count products plus
        non-negative collision cross terms); over by ≤ ε·N_A·N_B with
        probability ≥ 1−δ. Exact big-int accumulation (object-dtype dot,
        d·w driver-side multiply-adds) so counter products can't silently
        overflow int64 at stream scale."""
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError(
                "cannot inner_product CountMin sketches with different (d, w)")
        return int(min(
            int(np.dot(self.table[i].astype(object), other.table[i]))
            for i in range(self.d)))

    def finalize(self) -> dict:
        return {"total": self.total, "width": self.w, "depth": self.d,
                "eps_bound": math.e / self.w, "delta_bound": math.exp(-self.d)}

    # -- wire format -----------------------------------------------------
    def to_bytes(self) -> bytes:
        return (_MAGIC + struct.pack("<BxxxIIq", 1, self.d, self.w, self.total)
                + self.table.tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMin":
        if data[:4] != _MAGIC:
            raise ValueError("invalid CountMin dump: bad magic")
        _, d, w, total = struct.unpack_from("<BxxxIIq", data, 4)
        out = cls(width=w, depth=d)
        out.table = np.frombuffer(data[24:], dtype=np.int64).reshape(d, w).copy()
        out.total = total
        return out

    def __reduce__(self):
        return (CountMin.from_bytes, (self.to_bytes(),))
