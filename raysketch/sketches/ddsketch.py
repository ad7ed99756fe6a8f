"""DDSketch — relative-error quantiles as a mergeable aggregation
state (Masson, Rim & Lee, "DDSketch: A Fast and Fully-Mergeable
Quantile Sketch with Relative-Error Guarantees", VLDB 2019).

Not in the reference (SURVEY.md §2.5) — added as the third quantile
family because its guarantee is RELATIVE (est within α·true of the
true quantile VALUE, any distribution) where KLL/t-digest bound RANK
error, and because its merge is a plain bucket-count SUM — commutative
and associative — so distributed results are **bit-deterministic at
any parallelism and any batch order** with no per-file-fold crutch
(KLL/t-digest compaction is order-sensitive; CLAUDE.md "Ray's dynamic
batcher draws batch boundaries nondeterministically").

Bucketing is EXACT INTEGER arithmetic, no libm: α = a_num/a_den,
γ = (a_den+a_num)/(a_den−a_num), and the bucket boundaries are the
precomputed Python-int thresholds t_k = ⌊γ^k⌋ (exact rational powers,
arbitrary precision), so positive integer v lands in bucket
k = min{k : v ≤ t_k} via one vectorized ``searchsorted`` — the same
bucket for the same value on every task, every platform. Bucket count
is log-bounded (~2.2k buckets cover all of int64 at α=1%), so no
collapse pass is ever needed — which is what keeps ingestion
order-independent (standard implementations' lowest-bucket collapse
depends on arrival order).

Estimate: the textbook representative 2γ^(k+1)/(γ+1) of the bucket's
REAL range (γ^k, γ^(k+1)] — relative error exactly ≤ (γ−1)/(γ+1) = α
against every value in the bucket (an integer midpoint does NOT make
the bound for small values — see _tables). Quantile rank convention:
lower element at rank ⌈q·n⌉ (1-based), matching the engine's
PERCENTILE_DISC convention. Zeros (and negatives, via a mirrored
store) are tracked exactly / symmetrically.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

__all__ = ["DDSketch"]

_MAGIC = b"RSDD"

#: (thresholds, representatives) cache keyed by (a_num, a_den) —
#: process-local, pure
_TABLES: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _tables(a_num: int, a_den: int) -> tuple[np.ndarray, np.ndarray]:
    """(T, R): T[k] = ⌊γ^(k+1)⌋ (bucket k holds integer values in
    (T[k−1], T[k]] ⊂ (γ^k, γ^(k+1)], since ⌊γ^k⌋+1 > γ^k), and R[k] =
    the textbook representative 2γ^(k+1)/(γ+1), whose relative error
    vs ANY v in the real bucket is exactly ≤ (γ−1)/(γ+1) = α — an
    integer/arithmetic midpoint does NOT satisfy the bound for small
    values (bucket {63,64}: mid 63 errs 1 > α·64). Exact big-int
    arithmetic throughout; R materialized via correctly-rounded
    Fraction→float."""
    key = (a_num, a_den)
    got = _TABLES.get(key)
    if got is not None:
        return got
    from fractions import Fraction

    p, q = a_den + a_num, a_den - a_num
    ts, rs = [], []
    num, den = p, q  # γ^(k+1) as num/den, starting at k=0
    lim = (1 << 63) - 1
    while True:
        t = num // den
        ts.append(min(t, lim))
        # 2·γ^(k+1)/(γ+1) = 2·num/(den·(p+q)/q) = 2·num·q/(den·(p+q))
        rs.append(float(Fraction(2 * num * q, den * (p + q))))
        if t >= lim:
            break
        num *= p
        den *= q
    out = (np.array(ts, dtype=np.int64), np.array(rs, dtype=np.float64))
    _TABLES[key] = out
    return out


def _thresholds(a_num: int, a_den: int) -> np.ndarray:
    return _tables(a_num, a_den)[0]


class DDSketch:
    IDEMPOTENT_MERGE = False  # bucket counts are additive

    __slots__ = ("a_num", "a_den", "zero", "pos", "neg", "n")

    def __init__(self, a_num: int = 1, a_den: int = 100):
        if not (0 < a_num < a_den):
            raise ValueError("need 0 < a_num < a_den (alpha in (0,1))")
        self.a_num = a_num
        self.a_den = a_den
        self.zero = 0
        self.pos: dict[int, int] = {}
        self.neg: dict[int, int] = {}
        self.n = 0

    @classmethod
    def empty(cls, **params) -> "DDSketch":
        return cls(**params)

    # ------------------------------------------------------------ ingest
    def _fold(self, vals: np.ndarray, store: dict) -> None:
        t = _thresholds(self.a_num, self.a_den)
        k = np.searchsorted(t, vals, side="left")
        idx, cnt = np.unique(k, return_counts=True)
        get = store.get
        for i, c in zip(idx.tolist(), cnt.tolist()):
            store[i] = get(i, 0) + c

    def add_batch(self, column) -> None:
        if isinstance(column, pa.ChunkedArray):
            column = column.combine_chunks()
        if isinstance(column, (pa.Array, pa.ChunkedArray)):
            v = column.to_numpy(zero_copy_only=False)
        else:
            v = np.asarray(column)
        v = v[~pd_isnan(v)] if v.dtype.kind == "f" else v
        if v.dtype.kind == "f":
            if not np.all(v == np.floor(v)):
                raise TypeError("DDSketch integer-exact path needs "
                                "integral values")
            v = v.astype(np.int64)
        elif v.dtype.kind not in "iu":
            raise TypeError("DDSketch accepts numeric columns")
        v = v.astype(np.int64)
        if not len(v):
            return
        self.n += int(len(v))
        self.zero += int((v == 0).sum())
        p = v[v > 0]
        if len(p):
            self._fold(p, self.pos)
        m = v[v < 0]
        if len(m):
            self._fold(-m, self.neg)

    # ------------------------------------------------------------- merge
    def merge(self, other: "DDSketch") -> "DDSketch":
        if (self.a_num, self.a_den) != (other.a_num, other.a_den):
            raise ValueError("cannot merge DDSketch with different alpha")
        for mine, theirs in ((self.pos, other.pos), (self.neg, other.neg)):
            get = mine.get
            for k, c in theirs.items():
                mine[k] = get(k, 0) + c
        self.zero += other.zero
        self.n += other.n
        return self

    # ----------------------------------------------------------- queries
    def _bucket_rep(self, k: int) -> float:
        return float(_tables(self.a_num, self.a_den)[1][k])

    def quantile(self, q: float) -> float:
        """Value at 1-based rank ⌈q·n⌉ (lower element, PERCENTILE_DISC
        convention), within relative error α for nonzero values."""
        if self.n == 0:
            raise ValueError("empty sketch")
        rank = max(1, int(-(-q * self.n // 1)))  # ceil without float fuzz
        acc = 0
        for k in sorted(self.neg, reverse=True):
            acc += self.neg[k]
            if acc >= rank:
                return float(-self._bucket_rep(k))
        acc += self.zero
        if acc >= rank:
            return 0.0
        for k in sorted(self.pos):
            acc += self.pos[k]
            if acc >= rank:
                return float(self._bucket_rep(k))
        return float(self._bucket_rep(max(self.pos)))  # pragma: no cover

    def finalize(self) -> dict:
        return {"n": self.n,
                "p50": self.quantile(0.5) if self.n else None,
                "p90": self.quantile(0.9) if self.n else None,
                "p99": self.quantile(0.99) if self.n else None}

    # ------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        out = [_MAGIC, struct.pack("<IIqqII", self.a_num, self.a_den,
                                   self.zero, self.n,
                                   len(self.pos), len(self.neg))]
        for store in (self.pos, self.neg):
            for k in sorted(store):
                out.append(struct.pack("<Iq", k, store[k]))
        return b"".join(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "DDSketch":
        if data[:4] != _MAGIC:
            raise ValueError("not a DDSketch dump")
        a_num, a_den, zero, n, np_, nn = struct.unpack_from(
            "<IIqqII", data, 4)
        s = cls(a_num=a_num, a_den=a_den)
        s.zero, s.n = zero, n
        pos = 4 + struct.calcsize("<IIqqII")
        sz = struct.calcsize("<Iq")
        for store, cnt in ((s.pos, np_), (s.neg, nn)):
            for _ in range(cnt):
                k, c = struct.unpack_from("<Iq", data, pos)
                store[k] = c
                pos += sz
        return s

    def __reduce__(self):
        return (DDSketch.from_bytes, (self.to_bytes(),))


def pd_isnan(v: np.ndarray) -> np.ndarray:
    return np.isnan(v)
