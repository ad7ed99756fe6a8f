"""Merging t-digest as a mergeable aggregation state.

Not present in the reference (SURVEY.md §2.5) — required by the north
rule (per-turn text-length quantiles). Implements Dunning & Ertl,
"Computing Extremely Accurate Quantiles Using t-Digests"
(arXiv:1902.04023): centroids (mean, weight) whose sizes are bounded by
the scale function k₁(q) = (δ/2π)·asin(2q−1), which concentrates
resolution at the tails.

Compression here is the *vectorized k-index clustering* formulation:
sort all points (existing centroids + buffered raw values), compute each
point's left cumulative quantile, and group points whose k₁-index falls
in the same unit interval — a batch-friendly equivalent of the paper's
greedy merge that keeps ≤ ~2δ centroids and the per-cluster k-span ≤ 1.

Merge = concatenate centroid lists then compress: order-insensitive in
distribution, NOT idempotent — exactly-once fold per partition on
resume.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .kll import _as_float_values

__all__ = ["TDigest"]

_MAGIC = b"RSTD"


class TDigest:
    IDEMPOTENT_MERGE = False
    __slots__ = ("delta", "means", "weights", "n", "min", "max", "_buf")

    def __init__(self, compression: float = 100.0):
        self.delta = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0
        self.min = math.inf
        self.max = -math.inf
        self._buf: list[np.ndarray] = []

    @classmethod
    def empty(cls, **params) -> "TDigest":
        return cls(**params)

    # -- fold ------------------------------------------------------------
    def add_batch(self, values) -> None:
        v = _as_float_values(values)
        if len(v) == 0:
            return
        self.n += len(v)
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self._buf.append(v)
        if sum(len(b) for b in self._buf) >= 32 * self.delta:
            self._compress()

    def _compress(self) -> None:
        if not self._buf and len(self.means) <= 2 * self.delta:
            return
        xs = np.concatenate([self.means] + self._buf) if self._buf else self.means
        ws = np.concatenate(
            [self.weights] + [np.ones(len(b)) for b in self._buf]
        ) if self._buf else self.weights
        self._buf = []
        if len(xs) == 0:
            return
        order = np.argsort(xs, kind="stable")
        xs, ws = xs[order], ws[order]
        total = ws.sum()
        q_left = (np.cumsum(ws) - ws) / total
        # k1 scale function; clip argument for fp safety
        k = (self.delta / (2 * math.pi)) * np.arcsin(np.clip(2 * q_left - 1, -1, 1))
        cid = np.floor(k - k[0]).astype(np.int64)
        # group by cluster id → weighted means
        nclusters = int(cid[-1]) + 1
        wsum = np.bincount(cid, weights=ws, minlength=nclusters)
        xsum = np.bincount(cid, weights=ws * xs, minlength=nclusters)
        keep = wsum > 0
        self.weights = wsum[keep]
        self.means = xsum[keep] / self.weights

    # -- merge -----------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("cannot merge t-digests with different compression")
        other_flushed = other._flushed()
        self._compress()
        self.means = np.concatenate([self.means, other_flushed[0]])
        self.weights = np.concatenate([self.weights, other_flushed[1]])
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress()
        return self

    def _flushed(self):
        if self._buf:
            self._compress()
        return self.means, self.weights

    # -- queries ---------------------------------------------------------
    def quantile(self, q) -> float | np.ndarray:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        centers = np.cumsum(w) - 0.5 * w
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        out = np.interp(qs * total, centers, m)
        out = np.clip(out, self.min, self.max)
        return float(out[0]) if np.isscalar(q) else out

    def rank(self, x) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        centers = np.cumsum(w) - 0.5 * w
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        r = np.interp(xs, m, centers / w.sum(), left=0.0, right=1.0)
        return float(r[0]) if np.isscalar(x) else r

    def finalize(self, quantiles=(0.5, 0.9, 0.99)) -> dict:
        vals = np.atleast_1d(self.quantile(np.asarray(quantiles)))
        return {"n": self.n, **{f"p{int(q*100)}": float(v) for q, v in zip(quantiles, vals)}}

    # -- wire format -----------------------------------------------------
    def to_bytes(self) -> bytes:
        self._compress()
        c = len(self.means)
        return (_MAGIC
                + struct.pack("<Bxxxdqddi", 1, self.delta, self.n, self.min, self.max, c)
                + self.means.tobytes() + self.weights.tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        if data[:4] != _MAGIC:
            raise ValueError("invalid TDigest dump: bad magic")
        _, delta, n, mn, mx, c = struct.unpack_from("<Bxxxdqddi", data, 4)
        out = cls(compression=delta)
        out.n, out.min, out.max = n, mn, mx
        off = 4 + struct.calcsize("<Bxxxdqddi")
        out.means = np.frombuffer(data, dtype=np.float64, count=c, offset=off).copy()
        out.weights = np.frombuffer(data, dtype=np.float64, count=c, offset=off + 8 * c).copy()
        return out

    def __reduce__(self):
        return (TDigest.from_bytes, (self.to_bytes(),))
