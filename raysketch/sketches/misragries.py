"""Misra–Gries heavy-hitter summary as a mergeable aggregation state.

Not in the reference (SURVEY.md §2.5) — added to close the scale gap in
the heavy-hitter candidate pass: `ExactSet` collects the WHOLE
vocabulary (hard cap, raises past 1M), while Misra–Gries keeps at most
``k`` counters with the classic deterministic-coverage guarantee:

- **under-estimates only**: ``est(x) ≤ freq(x)``;
- **bounded error**: ``freq(x) − est(x) ≤ decr ≤ n/(k+1)`` where
  ``decr`` is the summary's cumulative decrement (tracked exactly);
- **coverage**: any element with ``freq(x) > n/(k+1)`` is guaranteed
  present — regardless of stream order or batch partitioning, which is
  what makes a two-pass exact-recount top-k deterministic end to end.

Merge is the Agarwal–Cormode–Huang–Phillips–Wei–Yi construction
("Mergeable Summaries", PODS 2012, §3): sum counters pairwise, then
subtract the (k+1)-th largest count and drop non-positives — the error
bounds add, so distributed folds keep the n/(k+1) guarantee.

Vectorized fold: Arrow ``value_counts`` per batch (one C pass), only
the ≤ batch-distinct values cross into Python dict arithmetic.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["MisraGries"]

_MAGIC = b"RSMG"


class MisraGries:
    IDEMPOTENT_MERGE = False  # counts are additive

    __slots__ = ("k", "counters", "n", "decr")

    def __init__(self, k: int = 256):
        self.k = k
        self.counters: dict[bytes, int] = {}
        self.n = 0
        self.decr = 0

    @classmethod
    def empty(cls, **params) -> "MisraGries":
        return cls(**params)

    def _prune(self) -> None:
        if len(self.counters) <= self.k:
            return
        counts = np.fromiter(self.counters.values(), dtype=np.int64,
                             count=len(self.counters))
        # (k+1)-th largest value — subtracting it leaves ≤ k positive
        d = int(np.partition(counts, len(counts) - self.k - 1)
                [len(counts) - self.k - 1])
        self.decr += d
        self.counters = {e: c - d for e, c in self.counters.items() if c > d}

    def add_batch(self, column) -> None:
        from ..keys import canonical_flat_bytes

        if isinstance(column, pa.ChunkedArray):
            column = column.combine_chunks()
        vc = pc.value_counts(column)
        if not len(vc):
            return
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        data, offsets = canonical_flat_bytes(vc.field("values"))
        get = self.counters.get
        for i in range(len(counts)):
            e = bytes(data[offsets[i]: offsets[i + 1]])
            self.counters[e] = get(e, 0) + int(counts[i])
        self.n += int(counts.sum())
        self._prune()

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError("cannot merge MisraGries with different k")
        get = self.counters.get
        for e, c in other.counters.items():
            self.counters[e] = get(e, 0) + c
        self.n += other.n
        self.decr += other.decr
        self._prune()
        return self

    def candidates(self) -> list[tuple[bytes, int]]:
        """(element, lower-bound count) sorted by count desc, element asc
        — every element with true freq > n/(k+1) is present."""
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))

    def error_bound(self) -> int:
        """Exact cumulative decrement: freq(x) − est(x) ≤ this for every
        tracked x (≤ n/(k+1) by construction)."""
        return self.decr

    def finalize(self) -> dict:
        return {"n": self.n, "error_bound": self.decr,
                "candidates": [(e.decode("utf-8", "replace"), c)
                               for e, c in self.candidates()]}

    # ------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        out = [_MAGIC, struct.pack("<IqqI", self.k, self.n, self.decr,
                                   len(self.counters))]
        for e, c in sorted(self.counters.items()):
            out.append(struct.pack("<Iq", len(e), c))
            out.append(e)
        return b"".join(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "MisraGries":
        if data[:4] != _MAGIC:
            raise ValueError("not a MisraGries dump")
        k, n, decr, m = struct.unpack_from("<IqqI", data, 4)
        s = cls(k=k)
        s.n, s.decr = n, decr
        pos = 4 + struct.calcsize("<IqqI")
        for _ in range(m):
            ln, c = struct.unpack_from("<Iq", data, pos)
            pos += struct.calcsize("<Iq")
            s.counters[data[pos: pos + ln]] = c
            pos += ln
        return s

    def __reduce__(self):
        return (MisraGries.from_bytes, (self.to_bytes(),))
