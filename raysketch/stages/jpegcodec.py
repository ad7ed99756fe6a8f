"""Minimal real baseline-JPEG codec (pure numpy) for the multimodal
decode path (VERDICT r04 item 5).

This container ships no image libraries; PNG/WAV/Y4M already have
pure-numpy codecs, but a real multimodal corpus is mostly JPEG — this
closes that gap with the same discipline as ``pngcodec.py``: a real
encoder + decoder pair in-module, round-trip tests against fixtures
encoded by the same module, corrupt-stream rejection, and
``ImageDecode`` consuming the decoder for ``format == "jpeg"``.

Scope: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
1×1 (4:4:4) or 2×2 (4:2:0) luma sampling, standard JPEG Annex K
quantization + Huffman tables on encode (quality-scaled per the
libjpeg 5000/q | 200−2q rule), restart-interval (DRI/RSTn) handling on
decode. Progressive (SOF2), arithmetic coding, and 12-bit precision
are rejected with ``ValueError`` — this is a correctness baseline, not
a performance library; swap in pillow/turbojpeg for production
throughput (the stage contract is identical).

Format reference: ITU-T T.81 / ISO 10918-1 (the public JPEG spec),
Annex K for the example tables.

JPEG is lossy: round-trip tests assert bounded per-pixel error at high
quality, not bit equality (decode itself is deterministic).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# ----------------------------------------------------------- constants
_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.1 / K.2 example quantization tables (natural order)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 example Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II basis: forward F = C A Cᵀ, inverse A = Cᵀ F C
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else 0.5
    _C[_k] = _a * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) canonical Huffman assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], vals: list[int]):
    """(min_code, max_code, first_index) per length for canonical decode."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    i = 0
    for ln in range(1, 17):
        n = bits[ln - 1]
        if n:
            valptr[ln] = i
            mincode[ln] = code
            maxcode[ln] = code + n - 1
            code += n
            i += n
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = int(np.clip(quality, 1, 100))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qy = np.clip((_Q_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((_Q_CHROMA * scale + 50) // 100, 1, 255)
    return qy, qc


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255) \
        .round().astype(np.uint8)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) → (n, 8, 8) blocks in
    raster MCU order."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)


def _planes_of(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    nb_h, nb_w = h8 // 8, w8 // 8
    return blocks.reshape(nb_h, nb_w, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(h8, w8)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size category, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = int(a).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_plane_blocks(qblocks: np.ndarray, dc_codes, ac_codes,
                         writer: _BitWriter, dc_pred: int) -> int:
    """Huffman-encode quantized zigzag blocks (n, 64); returns new DC
    predictor."""
    for blk in qblocks:
        dc = int(blk[0])
        size, bits = _magnitude(dc - dc_pred)
        code, ln = dc_codes[size]
        writer.write(code, ln)
        if size:
            writer.write(bits, size)
        dc_pred = dc
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            size, bits = _magnitude(v)
            code, ln = ac_codes[(run << 4) | size]
            writer.write(code, ln)
            writer.write(bits, size)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]  # EOB
            writer.write(code, ln)
    return dc_pred


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB → baseline JFIF bytes.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2×2 luma
    sampling, chroma at quarter resolution — the common camera
    default)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H,W) or (H,W,3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy, qc = _quality_tables(quality)

    if gray:
        comps = [(1, 1, 1, 0)]  # (id, hsamp, vsamp, qtab)
        planes = [a.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(a)
        if subsampling == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        else:
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            # chroma at quarter resolution: 2×2 box mean over an
            # even-padded frame
            he, we = h + (h & 1), w + (w & 1)
            pad = np.empty((he, we, 3))
            pad[:h, :w] = ycc
            pad[h:, :w] = ycc[h - 1:, :]
            pad[:h, w:] = ycc[:, w - 1:]
            pad[h:, w:] = ycc[h - 1:, w - 1:]
            cb = pad[..., 1].reshape(he // 2, 2, we // 2, 2).mean((1, 3))
            cr = pad[..., 2].reshape(he // 2, 2, we // 2, 2).mean((1, 3))
            planes = [ycc[..., 0], cb, cr]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    # pad each plane to its MCU-aligned size by edge replication
    padded = []
    for (cid, hs, vs, qt), pl in zip(comps, planes):
        ph = mcus_y * vs * 8
        pw = mcus_x * hs * 8
        src_h, src_w = pl.shape
        yi = np.minimum(np.arange(ph), src_h - 1)
        xi = np.minimum(np.arange(pw), src_w - 1)
        padded.append(pl[yi[:, None], xi[None, :]])

    # forward DCT + quantize per component, blocks in raster order
    qtabs = [qy, qc]
    qblocks = []
    for (cid, hs, vs, qt), pl in zip(comps, padded):
        blocks = _blocks_of(pl - 128.0)
        coeff = np.einsum("kn,bnm,lm->bkl", _C, blocks, _C)
        q = qtabs[qt].reshape(8, 8).astype(np.float64)
        qz = np.round(coeff / q).astype(np.int64)
        qblocks.append(qz.reshape(-1, 64)[:, _ZIGZAG])

    # interleave blocks in MCU order and entropy-code
    writer = _BitWriter()
    dc_tabs = [_huff_codes(*_DC_LUMA), _huff_codes(*_DC_CHROMA)]
    ac_tabs = [_huff_codes(*_AC_LUMA), _huff_codes(*_AC_CHROMA)]
    dc_pred = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (cid, hs, vs, qt) in enumerate(comps):
                bw = mcus_x * hs  # blocks per row in this component
                for by in range(vs):
                    for bx in range(hs):
                        bi = (my * vs + by) * bw + (mx * hs + bx)
                        dc_pred[ci] = _encode_plane_blocks(
                            qblocks[ci][bi:bi + 1],
                            dc_tabs[min(qt, 1)], ac_tabs[min(qt, 1)],
                            writer, dc_pred[ci])
    data = writer.flush()

    out = bytearray(b"\xFF\xD8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytes([0]) + bytes(qy[_ZIGZAG].astype(np.uint8))
    out += _seg(0xDB, dqt)
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qc[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, qt in comps:
        sof += bytes([cid, (hs << 4) | vs, qt])
    out += _seg(0xC0, sof)
    for cls, tid, (bits, vals) in ((0, 0, _DC_LUMA), (1, 0, _AC_LUMA),
                                   (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)):
        if gray and tid == 1:
            continue
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                    + bytes(vals))
    sos = bytes([len(comps)])
    for cid, hs, vs, qt in comps:
        t = min(qt, 1)
        sos += bytes([cid, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += data
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; stops at any
    real marker (leaves it for the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None:
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            if self.pos >= len(self.d):
                raise ValueError("truncated JPEG entropy stream")
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) \
                    else None
                if nxt == 0x00:
                    self.pos += 2
                elif nxt is None:
                    raise ValueError("truncated JPEG entropy stream")
                else:
                    self.marker = nxt  # real marker: stop consuming
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def restart(self) -> None:
        """Consume an RSTn marker at the current byte boundary."""
        self.acc = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None
            return
        raise ValueError("expected RST marker in JPEG stream")


def _decode_huff(reader: _BitReader, table) -> int:
    mincode, maxcode, valptr, vals = table
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.bit()
        if maxcode[ln] >= 0 and code <= maxcode[ln]:
            return vals[valptr[ln] + code - mincode[ln]]
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 (H, W, C) array (C = 1 or 3)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple] = {}
    comps: list[tuple[int, int, int, int]] = []
    h = w = 0
    restart_interval = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG segment")
        ln = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + ln]
        if len(seg) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                tbl = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8) \
                    .astype(np.int64)
                qtabs[tq] = tbl[_UNZIGZAG]
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                htabs[(tc, th)] = _huff_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0}); "
                "only baseline sequential (SOF0) is implemented")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0xF))
            pos += ln
            break
        pos += ln
    if scan is None or not comps or h == 0:
        raise ValueError("corrupt JPEG: missing SOF/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("corrupt JPEG: zero sampling factor")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    comp_by_id = {c[0]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        if cs not in comp_by_id:
            raise ValueError("scan references unknown component")
        cid, hs, vs, tq = comp_by_id[cs]
        order.append((cid, hs, vs, tq, td, ta))

    qcoef = {cid: np.zeros((mcus_y * vs * mcus_x * hs, 64), dtype=np.int64)
             for cid, hs, vs, tq, td, ta in order}
    reader = _BitReader(data, pos)
    dc_pred = {cid: 0 for cid, *_ in order}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                reader.restart()
                dc_pred = {cid: 0 for cid, *_ in order}
            mcu_count += 1
            for cid, hs, vs, tq, td, ta in order:
                if (0, td) not in htabs or (1, ta) not in htabs:
                    raise ValueError("scan references missing Huffman table")
                bw = mcus_x * hs
                for by in range(vs):
                    for bx in range(hs):
                        blk = np.zeros(64, dtype=np.int64)
                        s = _decode_huff(reader, htabs[(0, td)])
                        diff = _extend(reader.bits(s), s) if s else 0
                        dc_pred[cid] += diff
                        blk[0] = dc_pred[cid]
                        k = 1
                        while k <= 63:
                            rs = _decode_huff(reader, htabs[(1, ta)])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG: AC index overflow")
                            blk[k] = _extend(reader.bits(s), s)
                            k += 1
                        bi = (my * vs + by) * bw + (mx * hs + bx)
                        qcoef[cid][bi] = blk

    # dequantize + IDCT per component, then upsample to full size
    planes = []
    for cid, hs, vs, tq, td, ta in order:
        if tq not in qtabs:
            raise ValueError("frame references missing quant table")
        q = qtabs[tq].astype(np.float64).reshape(8, 8)
        coeff = qcoef[cid][:, _UNZIGZAG].reshape(-1, 8, 8) * q
        blocks = np.einsum("kn,bkl,lm->bnm", _C, coeff, _C) + 128.0
        ph, pw = mcus_y * vs * 8, mcus_x * hs * 8
        plane = _planes_of(blocks, ph, pw)
        # upsample by sample-replication to the full padded frame
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).round().astype(np.uint8)
        return y[:, :, None]
    if len(planes) != 3:
        raise ValueError("only 1- or 3-component JPEGs supported")
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
