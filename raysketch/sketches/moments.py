"""Moments sketch — quantiles from exact power sums as a mergeable
aggregation state (Gan, Ding, Tai, Sharan & Bailis, "Moment-Based
Quantile Sketches for Efficient High Cardinality Aggregation Queries",
VLDB 2018).

Not in the reference (SURVEY.md §2.5) — added as the fourth quantile
family because its state is the SMALLEST possible (k integers + n +
min/max: ~150 bytes at k=8 vs KBs for KLL/t-digest/DDSketch buckets)
and its merge is plain integer addition — commutative, associative and
EXACT — so like DDSketch (and unlike KLL/t-digest) distributed results
are bit-deterministic at any parallelism and any batch order with no
per-file-fold crutch.

The state is exact: power sums S_p = Σ v^p for p = 1..k are Python
big ints (v^8 of a 64-bit value needs 512 bits — no float drift, no
int64 overflow), which makes the DISTRIBUTED surface SQL-statable:
DuckDB computes the identical sums in HUGEINT and both engines compare
decimal strings (queries.moments_text_len). The per-batch fold is
vectorized via ``np.unique``: Σ_v count_v · v^p loops over the batch's
DISTINCT values only — the intended domain is bounded discrete
measures (text lengths, token counts, latencies), where distinct ≪
rows; the reference representation in the paper is float sums, traded
here for exactness.

Quantile estimation follows the paper's maximum-entropy principle:
among all densities on [min, max] matching the k observed moments,
take f(x) = exp(Σ θ_j T_j(x)) (Chebyshev basis, the paper's §4.2
conditioning choice) and read quantiles off its CDF. θ is solved by
damped Newton on the convex dual with fixed Gauss–Legendre quadrature
— a driver-side computation on k+3 numbers, deterministic for a given
state. The estimate carries NO worst-case rank guarantee (the paper's
is distribution-dependent); tests assert measured accuracy on smooth
distributions and exactness of the moment state itself.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

__all__ = ["MomentsSketch"]

_MAGIC = b"RSMO"


def _int_to_bytes(v: int) -> bytes:
    """Signed big int → minimal two's-complement little-endian bytes."""
    return v.to_bytes((v.bit_length() + 8) // 8 or 1, "little",
                      signed=True)


def _int_from_bytes(b: bytes) -> int:
    return int.from_bytes(b, "little", signed=True)


def _cheb_coeffs(k: int) -> list[list[int]]:
    """T_j(x) power-basis coefficients for j=0..k (exact ints via the
    recurrence T_{j+1} = 2x·T_j − T_{j−1})."""
    cs = [[1], [0, 1]]
    while len(cs) <= k:
        a, b = cs[-1], cs[-2]
        nxt = [0] + [2 * c for c in a]
        for i, c in enumerate(b):
            nxt[i] -= c
        cs.append(nxt)
    return cs[: k + 1]


class MomentsSketch:
    IDEMPOTENT_MERGE = False  # power sums are additive

    __slots__ = ("k", "n", "sums", "vmin", "vmax")

    def __init__(self, k: int = 8):
        if not (1 <= k <= 16):
            raise ValueError("need 1 <= k <= 16 moments")
        self.k = k
        self.n = 0
        self.sums: list[int] = [0] * k  # sums[p-1] = Σ v^p, exact
        self.vmin: int | None = None
        self.vmax: int | None = None

    @classmethod
    def empty(cls, **params) -> "MomentsSketch":
        return cls(**params)

    # ------------------------------------------------------------ ingest
    def add_batch(self, column) -> None:
        if isinstance(column, pa.ChunkedArray):
            column = column.combine_chunks()
        if isinstance(column, (pa.Array, pa.ChunkedArray)):
            v = column.to_numpy(zero_copy_only=False)
        else:
            v = np.asarray(column)
        if v.dtype.kind == "f":
            v = v[~np.isnan(v)]
            if not np.all(v == np.floor(v)):
                raise TypeError("MomentsSketch integer-exact path needs "
                                "integral values")
            v = v.astype(np.int64)
        elif v.dtype.kind not in "iu":
            raise TypeError("MomentsSketch accepts numeric columns")
        v = v.astype(np.int64)
        if not len(v):
            return
        uniq, cnt = np.unique(v, return_counts=True)
        self.n += int(len(v))
        lo, hi = int(uniq[0]), int(uniq[-1])
        self.vmin = lo if self.vmin is None else min(self.vmin, lo)
        self.vmax = hi if self.vmax is None else max(self.vmax, hi)
        sums = self.sums
        for u, c in zip(uniq.tolist(), cnt.tolist()):
            pw = 1
            for p in range(self.k):
                pw *= u
                sums[p] += c * pw

    # ------------------------------------------------------------- merge
    def merge(self, other: "MomentsSketch") -> "MomentsSketch":
        if self.k != other.k:
            raise ValueError("cannot merge MomentsSketch with different k")
        self.n += other.n
        self.sums = [a + b for a, b in zip(self.sums, other.sums)]
        if other.vmin is not None:
            self.vmin = other.vmin if self.vmin is None \
                else min(self.vmin, other.vmin)
            self.vmax = other.vmax if self.vmax is None \
                else max(self.vmax, other.vmax)
        return self

    # ----------------------------------------------------------- queries
    def _scaled_power_moments(self) -> np.ndarray:
        """μ_p = E[x^p] for x = (2v − (max+min))/(max − min) ∈ [−1, 1],
        p = 0..k — exact big-int binomial expansion of the raw sums,
        converted to float64 only at the very end (Fraction keeps the
        division exact until rounding)."""
        from fractions import Fraction
        from math import comb

        a, b = self.vmin, self.vmax
        w = b - a
        raw = [self.n] + list(self.sums)  # raw[p] = Σ v^p
        mu = np.empty(self.k + 1, dtype=np.float64)
        mu[0] = 1.0
        for p in range(1, self.k + 1):
            # (2v − (a+b))^p = Σ_i C(p,i)·(2v)^i·(−(a+b))^(p−i)
            s = 0
            for i in range(p + 1):
                s += (comb(p, i) * (2 ** i) * ((-(a + b)) ** (p - i))
                      * raw[i])
            mu[p] = float(Fraction(s, self.n * w ** p))
        return mu

    def _solve_maxent(self, quad_n: int = 512, iters: int = 60
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Fit f(x) = exp(Σ θ_j T_j(x)) on [−1,1] to the Chebyshev
        moments by damped Newton on the convex dual. Returns (nodes,
        weights, unnormalized density at nodes)."""
        mu = self._scaled_power_moments()
        cheb = _cheb_coeffs(self.k)
        cmom = np.array([sum(c * mu[i] for i, c in enumerate(cs))
                         for cs in cheb])  # E[T_j(x)], j = 0..k
        x, w = np.polynomial.legendre.leggauss(quad_n)
        # T_j at the nodes, stable via cos(j·arccos x)
        jj = np.arange(self.k + 1)
        T = np.cos(jj[:, None] * np.arccos(np.clip(x, -1.0, 1.0))[None, :])
        theta = np.zeros(self.k + 1)
        for _ in range(iters):
            expo = theta @ T
            expo -= expo.max()
            f = np.exp(expo)
            z = w @ f
            g = (T * f) @ w / z - cmom  # ∇: E_f[T_j] − c_j
            if np.max(np.abs(g)) < 1e-10:
                break
            H = (T * (f * w)) @ T.T / z - np.outer(g + cmom, g + cmom)
            H[np.diag_indices_from(H)] += 1e-9
            try:
                step = np.linalg.solve(H, g)
            except np.linalg.LinAlgError:  # pragma: no cover
                step = g
            # damp: keep the exponent change bounded
            mx = np.max(np.abs(step @ T))
            if mx > 3.0:
                step *= 3.0 / mx
            theta = theta - step
        expo = theta @ T
        expo -= expo.max()
        return x, w, np.exp(expo)

    def quantile(self, q: float) -> float:
        """Maximum-entropy quantile estimate (no worst-case guarantee —
        see module docstring). Exact for constant data; clamped to the
        exact [min, max]."""
        if self.n == 0:
            raise ValueError("empty sketch")
        a, b = self.vmin, self.vmax
        if a == b:
            return float(a)
        x, w, f = self._solve_maxent()
        cdf = np.cumsum(w * f)
        cdf /= cdf[-1]
        xi = float(np.interp(q, cdf, x))
        v = (xi * (b - a) + (a + b)) / 2.0
        return float(min(max(v, a), b))

    def finalize(self) -> dict:
        out = {"n": self.n, "vmin": self.vmin, "vmax": self.vmax}
        for p in range(1, self.k + 1):
            out[f"m{p}"] = str(self.sums[p - 1])
        return out

    # ------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        has = self.vmin is not None
        parts = [_MAGIC, struct.pack("<BBq", self.k, int(has), self.n)]
        if has:
            parts.append(struct.pack("<qq", self.vmin, self.vmax))
        for s in self.sums:
            sb = _int_to_bytes(s)
            parts.append(struct.pack("<I", len(sb)))
            parts.append(sb)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "MomentsSketch":
        if data[:4] != _MAGIC:
            raise ValueError("not a MomentsSketch dump")
        k, has, n = struct.unpack_from("<BBq", data, 4)
        s = cls(k=k)
        s.n = n
        pos = 4 + struct.calcsize("<BBq")
        if has:
            s.vmin, s.vmax = struct.unpack_from("<qq", data, pos)
            pos += 16
        for p in range(k):
            (ln,) = struct.unpack_from("<I", data, pos)
            pos += 4
            s.sums[p] = _int_from_bytes(data[pos:pos + ln])
            pos += ln
        return s

    def __reduce__(self):
        return (MomentsSketch.from_bytes, (self.to_bytes(),))
