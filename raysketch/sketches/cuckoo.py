"""Cuckoo filter — DELETABLE approximate membership (Fan, Andersen,
Kaminsky & Mitzenmacher, "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT 2014).

Not present in the reference (SURVEY.md §2.5); completes the membership
family: a Bloom filter cannot delete (clearing a bit corrupts every
element sharing it), a cuckoo filter stores small FINGERPRINTS in
4-slot buckets and removes one fingerprint copy exactly. Partial-key
cuckoo hashing: an element's two candidate buckets are

    i1 = h(x) mod m,   i2 = i1 XOR (h'(fp) mod m)

with m a power of two, so either bucket + the fingerprint recovers the
other (the XOR involution) — relocation, lookup, deletion and MERGE all
work from stored state alone.

Properties (all pytest-locked in tests/test_sketches.py):
- NO false negatives for inserted-and-not-deleted elements, provided
  deletes only target elements known inserted (the standard cuckoo
  deletion contract: deleting a never-inserted element may evict a
  colliding fingerprint).
- False-positive rate ≈ 2·4·load / 2^16 with 16-bit fingerprints.
- Lookup results are INSERT-ORDER-INDEPENDENT: the stored fingerprint
  multiset is the inserted multiset regardless of eviction history, and
  a lookup only probes the element's two buckets — so distributed folds
  with nondeterministic batch boundaries still answer identically (only
  a capacity failure could differ; sizing guards it).
- merge() re-inserts the other filter's (bucket, fingerprint) pairs —
  associative in the multiset sense; duplicates accumulate copies, and
  delete removes one copy (multiset semantics).

Element canonicalization reuses the reference's MurmurHash64A pipeline
(int 100 ≡ "100" here too, like every other family).
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import HLL_SEED, murmur64a
from ..keys import canonical_flat_bytes

__all__ = ["CuckooFilter"]

_SEED2 = np.uint64(0xC3A5C85C97CB3127)
_MAGIC = b"RSCK"
_SLOTS = 4
_MAX_KICKS = 500

# fingerprint-position hash: splitmix64 finalizer over the fingerprint
_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)


def _fp_mix(fp: np.ndarray) -> np.ndarray:
    z = fp.astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * _SM1
    z = (z ^ (z >> np.uint64(27))) * _SM2
    return z ^ (z >> np.uint64(31))


class CuckooFilter:
    IDEMPOTENT_MERGE = False  # multiset copies accumulate
    __slots__ = ("nb", "buckets", "_kick_seed")

    def __init__(self, capacity: int = 1 << 16):
        """Sized so `capacity` items sit at ≤84% load (4-way cuckoo
        tables fill past 95%; the margin keeps bulk placement cheap and
        relocation failures out of reach)."""
        nb = 1
        while nb * _SLOTS * 0.84 < capacity:
            nb <<= 1
        self.nb = nb
        self.buckets = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self._kick_seed = 0

    @classmethod
    def empty(cls, **params) -> "CuckooFilter":
        return cls(**params)

    # -- hashing ---------------------------------------------------------
    def _fp_i1(self, column):
        data, offsets = canonical_flat_bytes(column)
        h1 = murmur64a(data, offsets, HLL_SEED)
        h2 = murmur64a(data, offsets, _SEED2)
        fp = (h2 % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
        i1 = (h1 % np.uint64(self.nb)).astype(np.int64)
        return fp, i1

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mask = np.uint64(self.nb - 1)
        return (i.astype(np.uint64) ^ (_fp_mix(fp) & mask)).astype(np.int64)

    # -- insert ----------------------------------------------------------
    def add_batch(self, column) -> None:
        fp, i1 = self._fp_i1(column)
        self._bulk_place(fp, i1, self._alt(i1, fp))

    def _bulk_place(self, fp, i1, i2) -> None:
        """Vectorized bulk placement: rounds of first-claimant-per-bucket
        empty-slot fills on either side; the small remainder (full or
        contended buckets) walks the per-item cuckoo kick loop."""
        pending = np.arange(len(fp))
        for _ in range(8):
            if not len(pending):
                return
            for side in (i1, i2):
                if not len(pending):
                    break
                b = side[pending]
                order = np.argsort(b, kind="stable")
                first = np.r_[True, b[order][1:] != b[order][:-1]]
                cand = pending[order[first]]  # one claimant per bucket
                bkt = side[cand]
                rows = self.buckets[bkt]
                has_empty = (rows == 0).any(axis=1)
                slot = (rows == 0).argmax(axis=1)
                place = cand[has_empty]
                self.buckets[side[place], slot[has_empty]] = fp[place]
                placed = np.zeros(len(fp), dtype=bool)
                placed[place] = True
                pending = pending[~placed[pending]]
        for j in pending.tolist():
            self._insert_one(int(i1[j]), np.uint16(fp[j]))

    def _insert_one(self, i: int, f: np.uint16) -> None:
        for _ in range(_MAX_KICKS):
            for b in (i, int(self._alt(np.array([i]), np.array([f]))[0])):
                row = self.buckets[b]
                empt = np.flatnonzero(row == 0)
                if len(empt):
                    row[empt[0]] = f
                    return
            # deterministic victim: counter-mixed slot choice
            self._kick_seed += 1
            s = int(_fp_mix(np.array([self._kick_seed], dtype=np.uint64))[0]
                    % np.uint64(_SLOTS))
            f, self.buckets[i, s] = self.buckets[i, s], f
            i = int(self._alt(np.array([i]), np.array([f]))[0])
        raise RuntimeError("cuckoo filter full: raise capacity")

    # -- lookup ----------------------------------------------------------
    def contains_batch(self, column) -> np.ndarray:
        fp, i1 = self._fp_i1(column)
        i2 = self._alt(i1, fp)
        col = fp[:, None]
        return ((self.buckets[i1] == col).any(axis=1)
                | (self.buckets[i2] == col).any(axis=1))

    def contains(self, element) -> bool:
        return bool(self.contains_batch([element])[0])

    # -- delete ----------------------------------------------------------
    def delete_batch(self, column) -> np.ndarray:
        """Remove ONE stored copy per element; returns bool[n] (found?).
        Only call on elements known inserted — the cuckoo contract."""
        fp, i1 = self._fp_i1(column)
        i2 = self._alt(i1, fp)
        out = np.zeros(len(fp), dtype=bool)
        for j in range(len(fp)):  # deletes are small sets by contract
            f = fp[j]
            for b in (int(i1[j]), int(i2[j])):
                row = self.buckets[b]
                hit = np.flatnonzero(row == f)
                if len(hit):
                    row[hit[0]] = 0
                    out[j] = True
                    break
        return out

    # -- merge -----------------------------------------------------------
    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        if self.nb != other.nb:
            raise ValueError("cannot merge cuckoo filters of different size")
        occ = np.nonzero(other.buckets)
        fps = other.buckets[occ]
        i1 = occ[0].astype(np.int64)  # stored bucket IS a valid candidate
        self._bulk_place(fps, i1, self._alt(i1, fps))
        return self

    # -- summary / wire ----------------------------------------------------
    def items_stored(self) -> int:
        return int((self.buckets != 0).sum())

    def finalize(self) -> dict:
        n = self.items_stored()
        load = n / (self.nb * _SLOTS)
        return {"items_stored": n, "load_factor": load,
                "num_buckets": self.nb,
                "fp_rate_estimate": 2 * _SLOTS * load / 65535}

    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<BxxxQ", 1, self.nb) \
            + self.buckets.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        if data[:4] != _MAGIC:
            raise ValueError("invalid cuckoo dump: bad magic")
        try:
            (_, nb) = struct.unpack_from("<BxxxQ", data, 4)
        except struct.error as e:
            raise ValueError(f"invalid cuckoo dump: {e}") from None
        out = cls.__new__(cls)
        out.nb = int(nb)
        out._kick_seed = 0
        arr = np.frombuffer(data[16:], dtype=np.uint16).copy()
        if len(arr) != out.nb * _SLOTS:
            raise ValueError("invalid cuckoo dump: truncated table")
        out.buckets = arr.reshape(out.nb, _SLOTS)
        return out

    def __reduce__(self):
        return (CuckooFilter.from_bytes, (self.to_bytes(),))
