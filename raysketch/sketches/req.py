"""REQ — relative-rank-error quantile sketch (Cormode, Karnin,
Liberty, Thaler & Veselý, "Relative Error Streaming Quantiles",
PODS 2021; the one retrieved PAPERS.md entry in engine scope not yet
carried by a sketch family).

KLL (FOCS'16) bounds ADDITIVE rank error ε·n — useless at the extreme
tail: at n=10⁶, ε=1% smears p99.99 across the top 10⁴ items. The
relative compactor bounds error by ε·R(x) where R(x) is the rank from
the TOP, so tail quantiles (p99.9, p99.99 — the latency/length-outlier
questions) stay sharp while the bulk pays more.

ENGINEERING VARIANT, documented honestly: the paper's compactor grows
protected sections on a doubling schedule; this implementation uses
the fixed-schedule core of that idea — each level is a sorted buffer
whose TOP k items are never compacted; when a level overflows, only
the prefix below the protected suffix is compacted (every other item
promoted to the next level, weight 2^(h+1)). Items near the maximum
are therefore never touched at level 0, and only enter compaction at
level h once ≥ k·2^h items exceed them — giving the relative-error
SHAPE of PODS'21 without its full section accounting; the formal
ε·R(x) constant of the paper does not transfer, so the pytest suite
asserts the MEASURED tail behavior instead (relative rank error at
p99/p99.9/p99.99 over 10⁶ uniform/zipf items, and strictly better
tail error than additive-KLL at equal state size).

Determinism follows the engine's KLL discipline: compaction coins are
content-derived (crc32 of the sorted level), every level keeps the
sorted invariant, so the state is a pure function of the level
multisets and grouped/distributed folds are byte-reproducible via
per-file partials (sketch_aggregate_files) exactly like KLL/t-digest.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .kll import _as_float_values

__all__ = ["REQ"]

_MAGIC = b"RSRQ"


class REQ:
    IDEMPOTENT_MERGE = False
    __slots__ = ("k", "levels", "n")

    def __init__(self, k: int = 128):
        if k < 4 or k % 2:
            raise ValueError("k must be an even integer >= 4")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0

    @classmethod
    def empty(cls, **params) -> "REQ":
        return cls(**params)

    # ------------------------------------------------------------ internals
    def _cap(self) -> int:
        return 2 * self.k

    def _compact(self) -> None:
        changed = True
        while changed:
            changed = False
            for h in range(len(self.levels)):
                lvl = self.levels[h]
                if len(lvl) <= self._cap():
                    continue
                # protect the TOP k items (the relative-error side);
                # compact only the prefix below them
                head, tail = lvl[:-self.k], lvl[-self.k:]
                if len(head) < 2:
                    continue
                off = zlib.crc32(lvl.tobytes()) & 1
                promoted = head[off::2]
                self.levels[h] = tail.copy()
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self._extend_sorted(h + 1, promoted)
                changed = True
                break

    def _extend_sorted(self, h: int, sorted_vals: np.ndarray) -> None:
        cur = self.levels[h]
        if not len(cur):
            self.levels[h] = np.array(sorted_vals, dtype=np.float64)
            return
        merged = np.concatenate([cur, sorted_vals])
        merged.sort(kind="stable")
        self.levels[h] = merged

    # -------------------------------------------------------------- ingest
    def add_batch(self, values) -> None:
        v = _as_float_values(values)
        if len(v) == 0:
            return
        self.n += len(v)
        chunk = max(self._cap(), 1024)
        for i in range(0, len(v), chunk):
            self._extend_sorted(0, np.sort(v[i: i + chunk]))
            self._compact()

    def merge(self, other: "REQ") -> "REQ":
        if self.k != other.k:
            raise ValueError("cannot merge REQ sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lvl in enumerate(other.levels):
            if len(lvl):
                self._extend_sorted(h, lvl)
        self.n += other.n
        self._compact()
        return self

    # ------------------------------------------------------------- queries
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
        it, wt = self._items_weights()
        if len(it) == 0:
            return float("nan")
        cum = np.cumsum(wt) - 0.5 * wt
        total = wt.sum()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        out = np.interp(qs * total, cum, it)
        return float(out[0]) if np.isscalar(q) else out

    def rank(self, x) -> float | np.ndarray:
        it, wt = self._items_weights()
        if len(it) == 0:
            return float("nan")
        cum = np.concatenate(([0.0], np.cumsum(wt)))
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        r = cum[np.searchsorted(it, xs, side="right")] / wt.sum()
        return float(r[0]) if np.isscalar(x) else r

    def finalize(self, quantiles=(0.5, 0.99, 0.999, 0.9999)) -> dict:
        vals = np.atleast_1d(self.quantile(np.asarray(quantiles)))
        names = {0.5: "p50", 0.9: "p90", 0.99: "p99",
                 0.999: "p999", 0.9999: "p9999"}
        return {"n": self.n, **{names.get(q, f"q{q}"): float(v)
                                for q, v in zip(quantiles, vals)}}

    # --------------------------------------------------------------- wire
    def to_bytes(self) -> bytes:
        parts = [_MAGIC, struct.pack("<IqI", self.k, self.n,
                                     len(self.levels))]
        for lvl in self.levels:
            parts.append(struct.pack("<I", len(lvl)))
            parts.append(np.ascontiguousarray(lvl,
                                              dtype=np.float64).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "REQ":
        if data[:4] != _MAGIC:
            raise ValueError("invalid REQ dump: bad magic")
        k, n, nlev = struct.unpack_from("<IqI", data, 4)
        out = cls(k=k)
        out.n = n
        out.levels = []
        off = 4 + struct.calcsize("<IqI")
        for _ in range(nlev):
            (cnt,) = struct.unpack_from("<I", data, off)
            off += 4
            lvl = np.frombuffer(data, dtype=np.float64, count=cnt,
                                offset=off).copy()
            lvl.sort()
            out.levels.append(lvl)
            off += 8 * cnt
        if not out.levels:
            out.levels = [np.empty(0, dtype=np.float64)]
        return out

    def __reduce__(self):
        return (REQ.from_bytes, (self.to_bytes(),))
