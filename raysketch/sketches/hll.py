"""HyperLogLog with the reference's exact wire format and estimator.

Semantics match /root/reference/hyperloglog.c:

- 2^p six-bit registers (p=14 default ⇒ 16384 registers, :188-192);
  register = max leading-zero-run+1 of the hashed element (:438-492).
- Estimator: ``E = alpha·m²/Σ2^-reg`` with alpha = 0.7213/(1+1.079/m)
  (:963), LinearCounting ``m·log(m/ez)`` when E < 2.5m and zero
  registers exist (:999-1000), quartic bias polynomial for p=14 when
  E < 72000 (:1001-1012), no 2^32 correction (64-bit hash, :1013-1016).
- Wire format: 16-byte header (magic "HYLL", encoding byte, 3 reserved,
  8-byte LE cached cardinality with MSB-of-last-byte = stale flag,
  :65-87, :184-186) + dense 6-bit packed registers (:88-98) or sparse
  ZERO/XZERO/VAL run-length opcodes (:100-143, macros :355-380).
  Dumps from the reference load here and vice versa (validated against
  golden dumps produced by running the reference binary).
- Sparse→dense promotion at encoded size > 3000 bytes
  (/root/reference/redis.c:32) or any register value > 32 (:643).

Unlike the reference's per-element in-place byte surgery
(hllSparseAdd, :632-876), the working state here is always a dense
``np.uint8[m]`` folded with vectorized scatter-max over whole Arrow
batches; "sparse" is purely a (de)serialization encoding — the right
trade for a batch engine where millions of per-group states travel
through shuffles but each state sees thousands of elements at a time.

Merge = element-wise max (:1038-1077): associative, commutative,
idempotent ⇒ safe under any tree-reduction order and under partition
re-execution.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import hll_patlen
from .base import hash_column, hash_composite

__all__ = ["HLL"]

HDR_SIZE = 16
MAGIC = b"HYLL"
ENC_DENSE = 0
ENC_SPARSE = 1
SPARSE_MAX_BYTES = 3000  # /root/reference/redis.c:32
SPARSE_VAL_MAX = 32  # /root/reference/hyperloglog.c:369

# precomputed 2^-j lookup, PE[0] = 1 (hyperloglog.c:973-982)
_PE = np.concatenate(([1.0], 1.0 / (2.0 ** np.arange(1, 64))))


def _dense_pack(regs: np.ndarray) -> bytes:
    """uint8[m] (values ≤ 63) → 6-bit LSB-first packed bytes (m*6/8)."""
    r = regs.reshape(-1, 4).astype(np.uint16)
    out = np.empty((r.shape[0], 3), dtype=np.uint8)
    out[:, 0] = (r[:, 0] | (r[:, 1] << 6)) & 0xFF
    out[:, 1] = ((r[:, 1] >> 2) | (r[:, 2] << 4)) & 0xFF
    out[:, 2] = ((r[:, 2] >> 4) | (r[:, 3] << 2)) & 0xFF
    return out.tobytes()


def _dense_unpack(data: bytes, m: int) -> np.ndarray:
    b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.uint16)
    out = np.empty((b.shape[0], 4), dtype=np.uint8)
    out[:, 0] = b[:, 0] & 63
    out[:, 1] = ((b[:, 0] >> 6) | (b[:, 1] << 2)) & 63
    out[:, 2] = ((b[:, 1] >> 4) | (b[:, 2] << 4)) & 63
    out[:, 3] = (b[:, 2] >> 2) & 63
    return out.reshape(-1)[:m].copy()


def _sparse_encode(regs: np.ndarray) -> bytes | None:
    """Canonical run-length encoding; None if any register > 32 (cannot be
    sparse-represented, hyperloglog.c:369)."""
    if regs.max(initial=0) > SPARSE_VAL_MAX:
        return None
    change = np.nonzero(np.diff(regs))[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(regs)]))
    vals = regs[starts]
    out = bytearray()
    for v, s, e in zip(vals.tolist(), starts.tolist(), ends.tolist()):
        run = e - s
        if v == 0:
            while run > 0:
                if run > 64:
                    chunk = min(run, 16384)
                    l = chunk - 1
                    out.append(0x40 | (l >> 8))
                    out.append(l & 0xFF)
                else:
                    out.append(run - 1)
                    chunk = run
                run -= chunk
        else:
            while run > 0:
                chunk = min(run, 4)
                out.append(0x80 | ((v - 1) << 2) | (chunk - 1))
                run -= chunk
    return bytes(out)


def _sparse_decode(data: bytes, m: int) -> np.ndarray:
    """Opcode stream → dense uint8[m] (hyperloglog.c:562-614 semantics)."""
    regs = np.zeros(m, dtype=np.uint8)
    idx = 0
    i = 0
    n = len(data)
    while i < n:
        op = data[i]
        if op & 0x80:  # VAL 1vvvvvxx
            val = ((op >> 2) & 0x1F) + 1
            runlen = (op & 0x3) + 1
            regs[idx : idx + runlen] = val
            idx += runlen
            i += 1
        elif op & 0x40:  # XZERO 01xxxxxx yyyyyyyy
            runlen = (((op & 0x3F) << 8) | data[i + 1]) + 1
            idx += runlen
            i += 2
        else:  # ZERO 00xxxxxx
            idx += (op & 0x3F) + 1
            i += 1
    if idx != m:
        raise ValueError(f"corrupt sparse HLL: covers {idx} of {m} registers")
    return regs


class HLL:
    """Mergeable HyperLogLog sketch (see module docstring)."""

    IDEMPOTENT_MERGE = True
    __slots__ = ("p", "m", "regs", "encoding")

    def __init__(self, p: int = 14, sparse: bool = False):
        if not 4 <= p <= 18:
            raise ValueError(f"p must be in [4, 18], got {p}")
        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8)
        # reference default is dense (php/hll.c:76-83 promotes immediately
        # unless allowSparse); "sparse" here only selects the dump encoding
        self.encoding = "sparse" if sparse else "dense"

    # -- construction ----------------------------------------------------
    @classmethod
    def empty(cls, p: int = 14, sparse: bool = False) -> "HLL":
        return cls(p=p, sparse=sparse)

    @classmethod
    def union(cls, sketches) -> "HLL":
        """Non-destructive union of many sketches
        (pfCountMerged shape, hyperloglog.c:1274-1304)."""
        sketches = list(sketches)
        if not sketches:
            return cls()
        out = cls(p=sketches[0].p)
        out.encoding = sketches[0].encoding
        for s in sketches:
            out.merge(s)
        return out

    # -- fold ------------------------------------------------------------
    def add_hashes(self, hashes: np.ndarray) -> None:
        idx, count = hll_patlen(hashes, self.p)
        np.maximum.at(self.regs, idx, count)
        self._maybe_promote()

    def add_batch(self, column) -> None:
        """Fold a column of elements (Arrow/numpy/list; canonical
        string coercion applied — int 100 ≡ "100")."""
        self.add_hashes(hash_column(column))

    def add_composite_batch(self, columns) -> None:
        """Fold tuples across columns with the injective length-delimited
        encoding (distinct-(role,tool) style queries)."""
        self.add_hashes(hash_composite(columns))

    def add(self, element) -> "HLL":
        """Single-element convenience (tests / tiny control flows only —
        hot paths use add_batch)."""
        self.add_batch([element])
        return self

    def _maybe_promote(self) -> None:
        if self.encoding == "sparse" and self.regs.max(initial=0) > SPARSE_VAL_MAX:
            self.encoding = "dense"

    # -- merge -----------------------------------------------------------
    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p:
            raise ValueError(f"cannot merge HLL(p={other.p}) into HLL(p={self.p})")
        np.maximum(self.regs, other.regs, out=self.regs)
        if other.encoding == "dense":
            self.encoding = "dense"  # pfMerge promotes the target (:1306-1342)
        self._maybe_promote()
        return self

    # -- finalize --------------------------------------------------------
    def finalize(self) -> int:
        """Bias-corrected cardinality estimate (hyperloglog.c:961-1018)."""
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        counts = np.bincount(self.regs, minlength=64).astype(np.float64)
        ez = int(counts[0])
        E = float(counts @ _PE)
        E = (1.0 / E) * alpha * m * m
        if E < m * 2.5 and ez != 0:
            E = m * np.log(m / ez)  # LINEARCOUNTING
        elif self.m == 16384 and E < 72000:
            bias = (
                5.9119e-18 * (E**4)
                - 1.4253e-12 * (E**3)
                + 1.2940e-7 * (E**2)
                - 5.2921e-3 * E
                + 83.3216
            )
            E -= E * (bias / 100)
        return int(E)

    count = finalize  # reference API name (php/hll.c:660-668)

    # -- introspection ---------------------------------------------------
    def info(self) -> dict:
        """Mirrors HyperLogLog::info() (php/hll.c:734-747) plus extras."""
        return {
            "encoding": self.encoding,
            "p": self.p,
            "registers": self.m,
            "nonzero_registers": int(np.count_nonzero(self.regs)),
            "serialized_bytes": len(self.to_bytes()),
        }

    def promote(self) -> "HLL":
        """Force dense encoding; idempotent (php/hll.c:707-718)."""
        self.encoding = "dense"
        return self

    @classmethod
    def intersection_estimate(cls, a: "HLL", b: "HLL") -> float:
        """Inclusion-exclusion |A∩B| ≈ |A| + |B| − |A∪B| (clipped at 0).

        Standard HLL set-operation estimate: the error is additive in
        the union's error (≈1.04/√m · |A∪B|), so small intersections of
        large sets are noisy — callers needing tight small-intersection
        bounds should use MinHash signatures instead."""
        u = cls.union([a, b]).finalize()
        return float(max(0, a.finalize() + b.finalize() - u))

    @classmethod
    def jaccard_estimate(cls, a: "HLL", b: "HLL") -> float:
        """|A∩B| / |A∪B| via inclusion-exclusion (same caveat)."""
        u = cls.union([a, b]).finalize()
        if u <= 0:
            return 1.0
        return float(max(0, a.finalize() + b.finalize() - u)) / u

    # -- PFDEBUG-style introspection (hyperloglog.c:1695-1771) ----------
    def getreg(self, i: int) -> int:
        """Register i's value — PFDEBUG GETREG element access."""
        if not 0 <= i < self.m:
            raise IndexError(f"register index {i} out of range [0, {self.m})")
        return int(self.regs[i])

    def getregs(self) -> list[int]:
        """All m register values — PFDEBUG GETREG returns the full
        register vector."""
        return self.regs.tolist()

    def decode(self) -> list[tuple[str, int, int]]:
        """Sparse-opcode run listing — PFDEBUG DECODE: [(op, arg, len)]
        where op ∈ {"z" (ZERO), "Z" (XZERO), "v" (VAL)}, arg is the VAL
        register value (0 for zero runs) and len the run length, matching
        the reference's debug output shape (hyperloglog.c:1723-1754).
        Raises if the current state has a register > 32 (not sparse-
        representable), like PFDEBUG DECODE on a dense key."""
        enc = _sparse_encode(self.regs)
        if enc is None:
            raise ValueError("HLL encoding is not sparse-representable")
        out: list[tuple[str, int, int]] = []
        i = 0
        while i < len(enc):
            op = enc[i]
            if op & 0x80:
                out.append(("v", ((op >> 2) & 0x1F) + 1, (op & 0x3) + 1))
                i += 1
            elif op & 0x40:
                out.append(("Z", 0, (((op & 0x3F) << 8) | enc[i + 1]) + 1))
                i += 2
            else:
                out.append(("z", 0, (op & 0x3F) + 1))
                i += 1
        return out

    def todense(self) -> "HLL":
        """PFDEBUG TODENSE alias for :meth:`promote`."""
        return self.promote()

    # -- wire format -----------------------------------------------------
    def to_bytes(self) -> bytes:
        """Serialize in the reference's HYLL format. Cached-cardinality
        field is written as stale (MSB of byte 15 set) exactly like a
        freshly-mutated reference sketch, so byte-level golden comparisons
        hold; readers ignore it."""
        if self.p != 14:
            # HYLL wire format is pinned to p=14 (dense length check at
            # hyperloglog.c:1129-1133); other precisions use a tagged
            # private extension header.
            return b"RSK1" + struct.pack("<BB10x", ENC_DENSE, self.p) + _dense_pack(
                np.pad(self.regs, (0, (-self.m) % 4))
            )
        hdr = MAGIC + bytes([0, 0, 0, 0]) + bytes(7) + bytes([0x80])
        enc = None
        if self.encoding == "sparse":
            enc = _sparse_encode(self.regs)
            if enc is not None and HDR_SIZE + len(enc) > SPARSE_MAX_BYTES:
                enc = None  # promote on size (redis.c:32)
        if enc is not None:
            hdr = MAGIC + bytes([ENC_SPARSE, 0, 0, 0]) + bytes(7) + bytes([0x80])
            return hdr + enc
        return hdr + _dense_pack(self.regs)

    dump = to_bytes  # reference API name (php/hll.c:766-777)

    @classmethod
    def from_bytes(cls, data: bytes) -> "HLL":
        """Load a dump; validates like isHLLObjectOrReply
        (hyperloglog.c:1115-1139)."""
        if len(data) >= 16 and data[:4] == b"RSK1":
            p = data[5]
            out = cls(p=p)
            out.regs = _dense_unpack(data[16:], 1 << p)
            return out
        if len(data) < HDR_SIZE or data[:4] != MAGIC:
            raise ValueError("invalid HLL dump: bad magic")
        enc = data[4]
        out = cls(p=14)
        body = data[HDR_SIZE:]
        if enc == ENC_DENSE:
            if len(body) != (out.m * 6 + 7) // 8:
                raise ValueError(
                    f"invalid dense HLL dump: body {len(body)} bytes, "
                    f"expected {(out.m * 6 + 7) // 8}"
                )
            out.regs = _dense_unpack(body, out.m)
            out.encoding = "dense"
        elif enc == ENC_SPARSE:
            out.regs = _sparse_decode(body, out.m)
            out.encoding = "sparse"
            out._maybe_promote()
        else:
            raise ValueError(f"invalid HLL dump: unknown encoding {enc}")
        return out

    load = from_bytes

    # -- pickling (crosses the Ray object store) -------------------------
    def __reduce__(self):
        return (HLL.from_bytes, (self.to_bytes(),))

    def __eq__(self, other):
        return (
            isinstance(other, HLL)
            and self.p == other.p
            and bool(np.array_equal(self.regs, other.regs))
        )

    def __repr__(self):
        return f"HLL(p={self.p}, encoding={self.encoding}, est={self.finalize()})"
