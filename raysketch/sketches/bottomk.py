"""Bottom-k sketch: deterministic mergeable uniform sample + distinct
estimate.

Not in the reference (SURVEY.md §2.5) — added for the training-data
toolkit: every element gets the 64-bit MurmurHash64A key used everywhere
else in this engine; the state is the k smallest (hash, element) pairs.
Properties (Cohen & Kaplan, "Summarizing data using bottom-k sketches",
PODC 2007):

- **Mergeable & idempotent**: union = k smallest of the concatenation —
  associative, commutative, duplicate-safe (same element ⇒ same hash).
- **Deterministic**: unlike reservoir sampling, the sample is a pure
  function of the element *set*, so distributed runs reproduce exactly.
- **Distinct estimate**: with the k-th smallest hash normalized to
  v ∈ (0,1), distinct ≈ (k-1)/v.
- The sample is uniform over the *distinct* elements — exactly what
  training-data inspection ("show me 1000 random documents") wants.
"""

from __future__ import annotations

import struct

import numpy as np

from ..keys import canonical_flat_bytes
from ..hashing import murmur64a

__all__ = ["BottomK", "set_op_estimates"]

_MAGIC = b"RSBK"
_MAX64 = float(2**64)


class BottomK:
    IDEMPOTENT_MERGE = True
    __slots__ = ("k", "hashes", "elements")

    def __init__(self, k: int = 1024):
        self.k = k
        self.hashes = np.empty(0, dtype=np.uint64)
        self.elements: list[bytes] = []

    @classmethod
    def empty(cls, **params) -> "BottomK":
        return cls(**params)

    def _shrink(self, h: np.ndarray, elems: list[bytes]) -> None:
        h, idx = np.unique(h, return_index=True)  # dedupe by hash, sorted
        if len(h) > self.k:
            keep = np.argsort(h, kind="stable")[: self.k]
            keep.sort()
            h = h[keep]
            idx = idx[keep]
        self.hashes = h
        self.elements = [elems[i] for i in idx]

    def add_batch(self, column) -> None:
        data, offsets = canonical_flat_bytes(column)
        h = murmur64a(data, offsets)
        if len(h) == 0:
            return
        # pre-filter: only candidates below the current k-th hash matter
        if len(self.hashes) >= self.k:
            mask = h < self.hashes[-1]
            h = h[mask]
            rows = np.nonzero(mask)[0]
        else:
            rows = np.arange(len(h))
        if len(h) == 0:
            return
        new_elems = [
            bytes(data[offsets[r] : offsets[r + 1]]) for r in rows
        ]
        self._shrink(np.concatenate([self.hashes, h]),
                     self.elements + new_elems)

    def merge(self, other: "BottomK") -> "BottomK":
        if self.k != other.k:
            raise ValueError("cannot merge BottomK sketches with different k")
        self._shrink(np.concatenate([self.hashes, other.hashes]),
                     self.elements + other.elements)
        return self

    def sample(self) -> list[bytes]:
        return list(self.elements)

    def distinct_estimate(self) -> float:
        if len(self.hashes) < self.k:
            return float(len(self.hashes))  # exact below k
        v = (float(self.hashes[self.k - 1]) + 1.0) / _MAX64
        return (self.k - 1) / v

    def finalize(self) -> dict:
        return {"sample_size": len(self.hashes),
                "distinct_estimate": self.distinct_estimate()}

    # -- wire format -----------------------------------------------------
    def to_bytes(self) -> bytes:
        parts = [_MAGIC, struct.pack("<BxxxII", 1, self.k, len(self.hashes)),
                 self.hashes.tobytes()]
        for e in self.elements:
            parts.append(struct.pack("<I", len(e)))
            parts.append(e)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "BottomK":
        if data[:4] != _MAGIC:
            raise ValueError("invalid BottomK dump: bad magic")
        _, k, n = struct.unpack_from("<BxxxII", data, 4)
        out = cls(k=k)
        off = 16
        out.hashes = np.frombuffer(data, dtype=np.uint64, count=n, offset=off).copy()
        off += 8 * n
        elems = []
        for _ in range(n):
            (ln,) = struct.unpack_from("<I", data, off)
            off += 4
            elems.append(data[off : off + ln])
            off += ln
        out.elements = elems
        return out

    def __reduce__(self):
        return (BottomK.from_bytes, (self.to_bytes(),))


def set_op_estimates(a: "BottomK", b: "BottomK") -> dict:
    """KMV set-operation estimates from two bottom-k sketches
    (Beyer et al., "On synopses for distinct-value estimation under
    multiset operations", SIGMOD 2007).

    Uses the COMBINED sketch trick: let τ be the k-th smallest hash of
    the union sample; restricted to hashes < τ both sketches hold their
    side's complete distinct sample, so Jaccard ≈ |A∩B below τ| / k and
    |A∩B| ≈ J · |A∪B|. Direct (not inclusion-exclusion), so the error
    stays proportional to the UNION estimate — tighter than HLL's
    |A|+|B|−|A∪B| when the overlap is small.

    Returns {union, intersection, jaccard, difference_a} estimates
    (difference_a = |A \\ B|)."""
    if a.k != b.k:
        raise ValueError("set_op_estimates requires equal k")
    u = BottomK(a.k)
    u.merge(a).merge(b)  # u now holds the union's bottom-k
    union_est = u.distinct_estimate()
    if not len(u.hashes):
        return {"union": 0.0, "intersection": 0.0, "jaccard": 0.0,
                "difference_a": 0.0}
    ha = np.sort(np.asarray(a.hashes, dtype=np.uint64))
    hb = np.sort(np.asarray(b.hashes, dtype=np.uint64))
    uh = np.sort(np.asarray(u.hashes, dtype=np.uint64))
    tau = uh[-1]
    # union sample = hashes ≤ τ; count those present in BOTH sketches
    both = np.intersect1d(ha, hb, assume_unique=True)
    inter_in_sample = int((both <= tau).sum())
    jacc = inter_in_sample / len(uh)
    inter_est = jacc * union_est
    return {
        "union": union_est,
        "intersection": inter_est,
        "jaccard": jacc,
        "difference_a": max(a.distinct_estimate() - inter_est, 0.0),
    }
