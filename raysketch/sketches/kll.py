"""KLL quantile sketch as a mergeable aggregation state.

Not present in the reference (SURVEY.md §2.5) — required by the north
rule (per-turn text-length quantiles). Implements the compactor-stack
algorithm of Karnin, Lang & Liberty, "Optimal Quantile Approximation in
Streams" (FOCS 2016; see also PAPERS.md): H levels of compactors where
level h holds items of weight 2^h; a full level is sorted and every
other item (random even/odd offset) is promoted to level h+1. Level
capacities shrink geometrically, cap(h) = max(2, ⌈k·c^(H-1-h)⌉) with
c = 2/3, giving O(k·log n) space... actually O(k) space and additive
rank error ε ≈ O(1/k) with high probability.

Merge = concatenate levels pairwise then re-compact: associative in
distribution (rank-error guarantees compose), NOT idempotent —
exactly-once fold per partition required on resume.

Determinism (VERDICT r01 item 9): the compaction coin is derived from a
hash of the full level's contents (bottom-k-style deterministic coin)
instead of an RNG, and every level is kept SORTED as an invariant — so
a sketch state is a pure function of the level multisets, serialization
is canonical, and ``merge(a, b)`` is byte-identical to ``merge(b, a)``.
Same folds + same reduce structure ⇒ byte-identical distributed
results (reruns of ``kll_text_len`` reproduce exactly). The trade,
documented: coins are data-derived rather than independent randomness,
so the FOCS'16 probabilistic error analysis no longer formally applies
(adversarial inputs could correlate with the coin); measured error on
real/benchmark data is indistinguishable, and the determinism sweep now
covers every sketch family.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

__all__ = ["KLL"]

_MAGIC = b"RSKL"
_C = 2.0 / 3.0


class KLL:
    IDEMPOTENT_MERGE = False
    __slots__ = ("k", "levels", "n")

    def __init__(self, k: int = 200, seed: int = 0x5EED):
        # ``seed`` retained for API compatibility; compaction coins are
        # content-derived (see module docstring), not RNG-driven
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0

    @classmethod
    def empty(cls, **params) -> "KLL":
        return cls(**params)

    def _capacity(self, h: int) -> int:
        height = len(self.levels)
        return max(2, int(math.ceil(self.k * _C ** (height - 1 - h))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(l) for l in self.levels)

    def _compact(self) -> None:
        while self._size() > self._total_capacity():
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._capacity(h):
                    lvl = self.levels[h]  # sorted invariant
                    # promote every other item; the even/odd offset is a
                    # deterministic coin hashed from the level's contents
                    # (order-free since the level is sorted), so the
                    # compaction outcome is a pure function of the state
                    off = zlib.crc32(lvl.tobytes()) & 1
                    promoted = lvl[off::2]
                    self.levels[h] = np.empty(0, dtype=np.float64)
                    if h + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self._extend_sorted(h + 1, promoted)
                    break
            else:
                break

    def _extend_sorted(self, h: int, sorted_vals: np.ndarray) -> None:
        """Merge already-sorted values into (sorted) level h."""
        cur = self.levels[h]
        if not len(cur):
            self.levels[h] = sorted_vals.copy()
            return
        merged = np.concatenate([cur, sorted_vals])
        merged.sort(kind="stable")
        self.levels[h] = merged

    def add_batch(self, values) -> None:
        v = _as_float_values(values)
        if len(v) == 0:
            return
        self.n += len(v)
        # feed level 0 in capacity-sized chunks so compaction cascades
        chunk = max(self.k, 1024)
        for i in range(0, len(v), chunk):
            self._extend_sorted(0, np.sort(v[i : i + chunk]))
            self._compact()

    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("cannot merge KLL sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lvl in enumerate(other.levels):
            if len(lvl):
                self._extend_sorted(h, lvl)
        self.n += other.n
        self._compact()
        return self

    # -- queries ---------------------------------------------------------
    def _items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, lvl in enumerate(self.levels):
            if len(lvl):
                items.append(lvl)
                weights.append(np.full(len(lvl), 1 << h, dtype=np.float64))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q) -> float | np.ndarray:
        """Value(s) at normalized rank(s) q ∈ [0,1]."""
        it, wt = self._items_weights()
        if len(it) == 0:
            return float("nan") if np.isscalar(q) else np.full(len(np.atleast_1d(q)), np.nan)
        cum = np.cumsum(wt) - 0.5 * wt
        total = wt.sum()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        out = np.interp(qs * total, cum, it)
        return float(out[0]) if np.isscalar(q) else out

    def rank(self, x) -> float | np.ndarray:
        """Normalized rank(s) of value(s) x."""
        it, wt = self._items_weights()
        if len(it) == 0:
            return float("nan")
        cum = np.concatenate(([0.0], np.cumsum(wt)))
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        r = cum[np.searchsorted(it, xs, side="right")] / wt.sum()
        return float(r[0]) if np.isscalar(x) else r

    def finalize(self, quantiles=(0.5, 0.9, 0.99)) -> dict:
        vals = self.quantile(np.asarray(quantiles))
        return {"n": self.n, **{f"p{int(q*100)}": float(v) for q, v in zip(quantiles, vals)}}

    # -- wire format -----------------------------------------------------
    def to_bytes(self) -> bytes:
        parts = [_MAGIC, struct.pack("<BxxxIqI", 1, self.k, self.n, len(self.levels))]
        for lvl in self.levels:
            parts.append(struct.pack("<I", len(lvl)))
            parts.append(np.ascontiguousarray(lvl, dtype=np.float64).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLL":
        if data[:4] != _MAGIC:
            raise ValueError("invalid KLL dump: bad magic")
        _, k, n, nlev = struct.unpack_from("<BxxxIqI", data, 4)
        out = cls(k=k)
        out.n = n
        out.levels = []
        off = 24
        for _ in range(nlev):
            (cnt,) = struct.unpack_from("<I", data, off)
            off += 4
            lvl = np.frombuffer(data, dtype=np.float64, count=cnt, offset=off).copy()
            lvl.sort()  # restore the sorted-level invariant (old dumps)
            out.levels.append(lvl)
            off += 8 * cnt
        if not out.levels:
            out.levels = [np.empty(0, dtype=np.float64)]
        return out

    def __reduce__(self):
        return (KLL.from_bytes, (self.to_bytes(),))


def _as_float_values(values) -> np.ndarray:
    """Column (Arrow/numpy/list) → float64 values, nulls dropped."""
    try:
        import pyarrow as pa

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array):
            if values.null_count:
                values = values.drop_null()
            return values.to_numpy(zero_copy_only=False).astype(np.float64)
    except ImportError:
        pass
    v = np.asarray(values, dtype=np.float64)
    return v[~np.isnan(v)] if np.isnan(v).any() else v
