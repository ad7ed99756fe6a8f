"""Count-Sketch (AMS) as a mergeable aggregation state.

Not present in the reference (SURVEY.md §2.5) — added for the one
streaming statistic the existing families can't answer: the **second
frequency moment** F₂ = Σᵥ freq(v)², i.e. the SELF-JOIN SIZE of a key
column — the number every join planner wants before it picks a
strategy, and the classic result of Alon–Matias–Szegedy ("The space
complexity of approximating the frequency moments", STOC 1996).

Structure (Charikar–Chen–Farach-Colton "Finding frequent items in data
streams", ICALP 2002): d rows × w signed int64 counters; element e adds
``sign_i(e) · weight`` to ``row[i][h_i(e) mod w]``.

- **point query**: median over rows of ``sign_i(e) · row[i][h_i(e)]``
  — unbiased, |err| ≤ √(F₂/w) per row w.h.p. (two-sided, unlike CMS's
  one-sided overestimate).
- **F₂ estimate**: median over rows of ``Σⱼ row[i][j]²`` — each row is
  an unbiased AMS estimator with Var ≤ 2F₂²/w; the median over d
  independent rows gives the standard (ε, δ) guarantee.

Row/sign hashes derive from the reference's MurmurHash64A pipeline
(same canonical element coercion as HLL so int 100 ≡ "100"):
positions via Kirsch–Mitzenmacher double hashing like CountMin, signs
from the top bit of an offset lane of the same double-hash family so
the fold reuses the two per-batch hash vectors the aggregation layer
already computes.

Merge = element-wise add of the counter tables: associative and
commutative but NOT idempotent — resume-after-failure must be
exactly-once per partition (see raysketch.state.checkpoint). Because
the state is a pure integer sum of per-row contributions, the merged
table — and therefore every estimate — is bit-identical at ANY batch
partitioning or merge order (no canonical-reduce needed).
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import murmur64a, HLL_SEED
from ..keys import canonical_flat_bytes

__all__ = ["CountSketch"]

_SEED2 = np.uint64(0x9747B28C)  # shared with bloom/countmin double hashing
_MAGIC = b"RSCS"


class CountSketch:
    IDEMPOTENT_MERGE = False
    __slots__ = ("d", "w", "table", "total")

    def __init__(self, width: int = 1 << 13, depth: int = 5):
        if depth % 2 == 0:
            raise ValueError("depth must be odd (median over rows)")
        self.w = width
        self.d = depth
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.total = 0  # N = total weight folded (travels with the state)

    @classmethod
    def empty(cls, **params) -> "CountSketch":
        return cls(**params)

    def _pos_sign(self, h1: np.ndarray, h2: np.ndarray):
        h2 = h2 | np.uint64(1)
        w = np.uint64(self.w)
        pos = np.empty((self.d, len(h1)), dtype=np.int64)
        sgn = np.empty((self.d, len(h1)), dtype=np.int64)
        for i in range(self.d):
            pos[i] = ((h1 + np.uint64(i) * h2) % w).astype(np.int64)
            # an independent lane of the same double-hash family: the
            # top bit of lane d+i never feeds a position lane (< d)
            sgn[i] = 1 - 2 * ((h1 + np.uint64(self.d + i) * h2)
                              >> np.uint64(63)).astype(np.int64)
        return pos, sgn

    def add_batch(self, column, weights=None) -> None:
        data, offsets = canonical_flat_bytes(column)
        h1 = murmur64a(data, offsets, HLL_SEED)
        h2 = murmur64a(data, offsets, _SEED2)
        self.add_hash_pairs(h1, h2, weights)

    def add_hash_pairs(self, h1: np.ndarray, h2: np.ndarray, weights=None) -> None:
        """Fold pre-hashed elements (shared base hashes per batch)."""
        pos, sgn = self._pos_sign(h1, h2)
        if weights is None:
            wts = None
            self.total += pos.shape[1]
        else:
            wts = np.asarray(weights, dtype=np.int64)
            self.total += int(wts.sum())
        for i in range(self.d):
            contrib = sgn[i] if wts is None else sgn[i] * wts
            # bincount-with-weights returns float64; contributions are
            # ±1·weight sums ≪ 2^53 per batch, so the cast back is exact
            self.table[i] += np.bincount(
                pos[i], weights=contrib, minlength=self.w).astype(np.int64)

    def estimate_batch(self, column) -> np.ndarray:
        """Vectorized point queries → int64[n] (unbiased, two-sided)."""
        data, offsets = canonical_flat_bytes(column)
        h1 = murmur64a(data, offsets, HLL_SEED)
        h2 = murmur64a(data, offsets, _SEED2)
        pos, sgn = self._pos_sign(h1, h2)
        ests = self.table[np.arange(self.d)[:, None], pos] * sgn
        return np.median(ests, axis=0).astype(np.int64)

    def estimate(self, element) -> int:
        return int(self.estimate_batch([element])[0])

    def f2_estimate(self) -> int:
        """Self-join size: median over rows of Σⱼ counterⱼ² (exact
        Python-int row sums — counters² of a 100-TB fold overflow
        int64)."""
        row_sums = sorted(sum(int(v) * int(v) for v in row)
                          for row in self.table)
        return row_sums[self.d // 2]

    def merge(self, other: "CountSketch") -> "CountSketch":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError(
                "cannot merge CountSketch sketches with different (d, w)")
        self.table += other.table
        self.total += other.total
        return self

    def finalize(self) -> dict:
        return {"f2_estimate": self.f2_estimate(), "total": self.total,
                "width": self.w, "depth": self.d}

    # -- wire format -----------------------------------------------------
    def to_bytes(self) -> bytes:
        return (_MAGIC + struct.pack("<BxxxIIq", 1, self.d, self.w, self.total)
                + self.table.tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountSketch":
        if data[:4] != _MAGIC:
            raise ValueError("invalid CountSketch dump: bad magic")
        _, d, w, total = struct.unpack_from("<BxxxIIq", data, 4)
        sk = cls(width=w, depth=d)
        sk.total = total
        sk.table = np.frombuffer(
            data, dtype=np.int64, count=d * w,
            offset=4 + struct.calcsize("<BxxxIIq")).reshape(d, w).copy()
        return sk
