"""The ``MergeableSketch`` protocol — the engine's UDAF contract.

The reference demonstrates exactly one instance of this shape
(fold elements → merge states associatively → finalize to an estimate;
/root/reference/hyperloglog.c:1038-1077 merge, :961-1018 finalize). Every
sketch in this library implements the same five methods, which is all
the Ray layer (raysketch.agg) needs to turn it into a distributed
groupby-aggregate:

- ``empty()``            — identity element: merge(empty, x) == x
- ``add_hashes(h)`` / ``add_batch(column)`` — per-batch fold
- ``merge(other)``       — associative + commutative combine
- ``finalize()``         — state → answer
- ``to_bytes()/from_bytes()`` — wire format (crosses the object store /
  checkpoint files)

Merge for HLL/Bloom is also idempotent (max / or), so re-running a
partition after failure is harmless; CMS/KLL/t-digest merges are NOT
idempotent — checkpointed resume must be exactly-once per partition for
those (see raysketch.state.checkpoint).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import numpy as np


@runtime_checkable
class MergeableSketch(Protocol):
    IDEMPOTENT_MERGE: bool

    @classmethod
    def empty(cls, **params) -> "MergeableSketch": ...

    def add_batch(self, column) -> None:
        """Fold a column (Arrow array / numpy / list) of elements."""
        ...

    def merge(self, other: "MergeableSketch") -> "MergeableSketch":
        """In-place associative merge; returns self."""
        ...

    def finalize(self):
        ...

    def to_bytes(self) -> bytes: ...

    @classmethod
    def from_bytes(cls, data: bytes) -> "MergeableSketch": ...


def hash_column(column, seed=None) -> np.ndarray:
    """Canonicalize + hash a column to uint64 with the reference's hash."""
    from ..hashing import HLL_SEED, murmur64a
    from ..keys import canonical_flat_bytes

    data, offsets = canonical_flat_bytes(column)
    return murmur64a(data, offsets, HLL_SEED if seed is None else seed)


def hash_composite(columns, seed=None) -> np.ndarray:
    """Hash an injective length-delimited tuple encoding of columns."""
    from ..hashing import HLL_SEED, murmur64a
    from ..keys import composite_flat_bytes

    data, offsets = composite_flat_bytes(columns)
    return murmur64a(data, offsets, HLL_SEED if seed is None else seed)
