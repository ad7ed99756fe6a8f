"""Frequent Directions — a mergeable MATRIX sketch (Liberty, "Simple
and Deterministic Matrix Sketching", KDD 2013; Ghashami, Liberty,
Phillips & Woodruff, SICOMP 2016).

Not in the reference (SURVEY.md §2.5) — added as the first LINEAR-
ALGEBRA state family: where every other family summarizes a multiset
of scalars, FD summarizes the row space of a tall n×d matrix (the
embedding table) in ℓ rows, with the deterministic spectral guarantee

    0 ⪯ AᵀA − BᵀB   and   ‖AᵀA − BᵀB‖₂ ≤ 2‖A‖²_F / ℓ

(SICOMP'16 Thm 1.1 for sketch size ℓ with a 2ℓ working buffer) — so
singular values, PCA energy and low-rank structure of a 100-TB
embedding corpus are readable from an ℓ×d state without ever forming
the n×n or shuffling rows. Merging is the paper's own reduction:
append the other sketch's rows and re-shrink — the bound composes
(GLPW §3), which is exactly the map_batches-partials → tree-merge
shape every other family here uses.

Shrink is order-sensitive (like KLL/t-digest compaction), so
distributed byte-reproducibility uses the established crutch: one
partial per input FILE + canonical_sketch_reduce (content-addressed
lexicographic merge order) — see queries.fd_embedding_spectrum.
``fro2`` (the exact accumulated ‖A‖²_F) rides the state so the bound
is computable at read time.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

__all__ = ["FrequentDirections"]

_MAGIC = b"RSFD"


class FrequentDirections:
    IDEMPOTENT_MERGE = False

    __slots__ = ("ell", "d", "buf", "rows", "n", "fro2", "shed")

    def __init__(self, ell: int = 32, d: int | None = None):
        if ell < 2:
            raise ValueError("need ell >= 2")
        self.ell = ell
        self.d = d
        self.buf: np.ndarray | None = None  # (2ℓ, d) working buffer
        self.rows = 0  # filled rows in buf
        self.n = 0  # total input rows folded
        self.fro2 = 0.0  # exact Σ‖a_i‖² of everything folded
        self.shed = 0.0  # Σ δ shed by shrinks (error audit)

    @classmethod
    def empty(cls, **params) -> "FrequentDirections":
        return cls(**params)

    def _ensure(self, d: int) -> None:
        if self.d is None:
            self.d = d
            self.buf = np.zeros((2 * self.ell, d), dtype=np.float64)
        elif d != self.d:
            raise ValueError(f"dimension mismatch: {d} != {self.d}")

    def _shrink(self) -> None:
        """SVD the full buffer, subtract σ_ℓ² from every direction and
        keep the top ℓ (the ℓ-th zeroes out) — Liberty's Algorithm 1
        step with the 2ℓ buffer."""
        _, s, vt = np.linalg.svd(self.buf[: self.rows], full_matrices=False)
        s2 = s * s
        delta = float(s2[self.ell - 1]) if len(s2) >= self.ell else 0.0
        keep = np.sqrt(np.maximum(s2 - delta, 0.0))[: self.ell]
        self.buf[:] = 0.0
        nz = int(np.count_nonzero(keep))
        self.buf[:len(keep)] = keep[:, None] * vt[: len(keep)]
        self.rows = max(nz, 0)
        self.shed += delta

    def _append(self, m: np.ndarray) -> None:
        i = 0
        cap = 2 * self.ell
        while i < len(m):
            take = min(cap - self.rows, len(m) - i)
            self.buf[self.rows : self.rows + take] = m[i : i + take]
            self.rows += take
            i += take
            if self.rows >= cap:
                self._shrink()

    # ------------------------------------------------------------ ingest
    def add_batch(self, column) -> None:
        """Fold a fixed-size-list / list<float> Arrow column (or a 2-D
        numpy array) of d-dimensional rows."""
        if isinstance(column, pa.ChunkedArray):
            column = column.combine_chunks()
        if isinstance(column, pa.Array):
            if isinstance(column, pa.FixedSizeListArray):
                d = column.type.list_size
                m = np.asarray(column.flatten().to_numpy(
                    zero_copy_only=False), dtype=np.float64).reshape(-1, d)
            else:  # variable list: offsets must be uniform
                offs = column.offsets.to_numpy()
                widths = np.diff(offs)
                if len(widths) == 0:
                    return
                d = int(widths[0])
                if not np.all(widths == d):
                    raise ValueError("ragged list column — need uniform "
                                     "vector width")
                # flatten() trims child values to the slice, so the
                # reshape is alignment-safe for sliced arrays too
                flat = np.asarray(column.flatten().to_numpy(
                    zero_copy_only=False), dtype=np.float64)
                m = flat.reshape(-1, d)
        else:
            m = np.asarray(column, dtype=np.float64)
            if m.ndim != 2:
                raise ValueError("need a 2-D array of rows")
            d = m.shape[1]
        if not len(m):
            return
        self._ensure(d)
        self.n += len(m)
        self.fro2 += float((m * m).sum())
        self._append(m)

    # ------------------------------------------------------------- merge
    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if self.ell != other.ell:
            raise ValueError("cannot merge FD sketches with different ell")
        if other.d is None:
            return self
        if self.d is None:
            self.d = other.d
            self.buf = np.zeros((2 * self.ell, other.d), dtype=np.float64)
        elif self.d != other.d:
            raise ValueError("cannot merge FD sketches with different d")
        self.n += other.n
        self.fro2 += other.fro2
        self.shed += other.shed
        self._append(other.buf[: other.rows].copy())
        return self

    # ----------------------------------------------------------- queries
    def _final_rows(self) -> np.ndarray:
        return self.buf[: self.rows] if self.buf is not None \
            else np.zeros((0, 0))

    def singular_values(self) -> np.ndarray:
        """σ(B) descending — each σᵢ(B)² lower-bounds σᵢ(A)² and is
        within error_bound() of it (Weyl + the FD guarantee)."""
        if self.rows == 0:
            return np.zeros(0)
        return np.linalg.svd(self._final_rows(), compute_uv=False)

    def error_bound(self) -> float:
        """Worst-case ‖AᵀA − BᵀB‖₂: the a-priori 2‖A‖²_F/ℓ."""
        return 2.0 * self.fro2 / self.ell

    def cov_error_actual(self) -> float:
        """The tighter a-posteriori bound: the total shed δ (≥ the true
        spectral error; ≤ the a-priori bound)."""
        return self.shed

    def finalize(self) -> dict:
        sv = self.singular_values()
        out = {"n": self.n, "d": self.d or 0,
               "fro2": self.fro2, "bound": self.error_bound(),
               "shed": self.shed}
        for i in range(8):
            out[f"sv{i + 1}"] = float(sv[i]) if i < len(sv) else 0.0
        return out

    # ------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        d = self.d or 0
        head = struct.pack("<IIIqdd", self.ell, d, self.rows, self.n,
                           self.fro2, self.shed)
        body = self.buf[: self.rows].tobytes() if self.buf is not None \
            else b""
        return _MAGIC + head + body

    @classmethod
    def from_bytes(cls, data: bytes) -> "FrequentDirections":
        if data[:4] != _MAGIC:
            raise ValueError("not a FrequentDirections dump")
        ell, d, rows, n, fro2, shed = struct.unpack_from("<IIIqdd", data, 4)
        s = cls(ell=ell, d=d if d else None)
        s.n, s.fro2, s.shed, s.rows = n, fro2, shed, rows
        if d:
            s.buf = np.zeros((2 * ell, d), dtype=np.float64)
            off = 4 + struct.calcsize("<IIIqdd")
            s.buf[:rows] = np.frombuffer(
                data, dtype=np.float64, count=rows * d, offset=off
            ).reshape(rows, d)
        return s

    def __reduce__(self):
        return (FrequentDirections.from_bytes, (self.to_bytes(),))
