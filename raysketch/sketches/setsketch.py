"""ExactSet: exact distinct-value collector with a hard cap — the
``collect_set`` UDAF as a mergeable aggregation state.

Not in the reference (SURVEY.md §2.5) — added so small-vocabulary
discovery (candidate sets for heavy-hitter queries, enum audits) can
ride the same single-pass ``multi_sketch_aggregate`` as the approximate
sketches instead of a second read of the input. Values are canonical
element bytes (the same coercion every sketch in this engine hashes —
int 5 ≡ "5"); per-batch folds dedupe vectorized via Arrow before any
Python-object materialization.

State: a set of element byte strings, capped at ``max_items``. Crossing
the cap sets an explicit ``truncated`` flag (never silent) and keeps the
lexicographically smallest ``max_items`` elements — a deterministic rule,
so merges stay associative and order-independent: any merge order yields
"smallest max_items of the union, truncated flag = union overflowed".
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["ExactSet"]

_MAGIC = b"RSXS"


class ExactSet:
    IDEMPOTENT_MERGE = True
    __slots__ = ("max_items", "items", "truncated")

    def __init__(self, max_items: int = 1 << 16):
        self.max_items = max_items
        self.items: set[bytes] = set()
        self.truncated = False

    @classmethod
    def empty(cls, **params) -> "ExactSet":
        return cls(**params)

    def _cap(self) -> None:
        if len(self.items) > self.max_items:
            self.truncated = True
            self.items = set(sorted(self.items)[: self.max_items])

    def add_batch(self, column) -> None:
        """Fold an Arrow array: vectorized unique first, then only the
        (few) distinct values cross into Python."""
        from ..keys import canonical_flat_bytes

        if isinstance(column, pa.ChunkedArray):
            column = column.combine_chunks()
        u = pc.unique(column)
        data, offsets = canonical_flat_bytes(u)
        self.items.update(
            bytes(data[offsets[i]: offsets[i + 1]]) for i in range(len(offsets) - 1)
        )
        self._cap()

    def add(self, value) -> None:
        self.add_batch(pa.array([value]))

    def merge(self, other: "ExactSet") -> "ExactSet":
        if self.max_items != other.max_items:
            raise ValueError("cannot merge ExactSet states with different max_items")
        self.items |= other.items
        self.truncated |= other.truncated
        self._cap()
        return self

    def values(self) -> list[bytes]:
        """Sorted distinct element bytes."""
        return sorted(self.items)

    def values_str(self) -> list[str]:
        return [v.decode("utf-8", "replace") for v in self.values()]

    def finalize(self) -> dict:
        return {"n_distinct": len(self.items), "truncated": self.truncated}

    # -- wire format -----------------------------------------------------
    def to_bytes(self) -> bytes:
        parts = [_MAGIC,
                 struct.pack("<BBxxII", 1, int(self.truncated),
                             self.max_items, len(self.items))]
        for e in self.values():
            parts.append(struct.pack("<I", len(e)))
            parts.append(e)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "ExactSet":
        if data[:4] != _MAGIC:
            raise ValueError("invalid ExactSet dump: bad magic")
        _, trunc, max_items, n = struct.unpack_from("<BBxxII", data, 4)
        out = cls(max_items=max_items)
        out.truncated = bool(trunc)
        off = 16
        items = set()
        for _ in range(n):
            (ln,) = struct.unpack_from("<I", data, off)
            off += 4
            items.add(data[off: off + ln])
            off += ln
        out.items = items
        return out

    def __reduce__(self):
        return (ExactSet.from_bytes, (self.to_bytes(),))
