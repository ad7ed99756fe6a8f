"""Minimal real WAV (RIFF/PCM) codec — pure numpy + struct.

The audio twin of :mod:`.pngcodec`: this container ships no audio
libraries, but canonical PCM WAV is a trivial container, so the real
decode path can be exercised in CI instead of stubbed. Supports 8/16/32
bit integer PCM and 32-bit float, mono or interleaved multichannel.
Swap in soundfile/av for compressed formats in production; the stage
contract is identical.

Format reference: the public RIFF/WAVE specification (fmt chunk
audio_format 1 = PCM, 3 = IEEE float; data chunk = interleaved frames).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav"]

_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def encode_wav(samples: np.ndarray, sample_rate: int = 16000,
               bits: int = 16) -> bytes:
    """float samples in [-1, 1] (n,) or (n, channels) → PCM WAV bytes."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    a = np.clip(a, -1.0, 1.0)
    if bits == 8:
        pcm = ((a * 127.0) + 128.0).round().astype(np.uint8)  # unsigned
        fmt = 1
    elif bits == 16:
        pcm = (a * 32767.0).round().astype(np.int16)
        fmt = 1
    elif bits == 32:
        pcm = a.astype(np.float32)
        fmt = 3  # IEEE float
    else:
        raise ValueError("bits must be 8, 16 or 32")
    data = np.ascontiguousarray(pcm).tobytes()
    block = ch * bits // 8
    fmt_chunk = struct.pack("<HHIIHH", fmt, ch, sample_rate,
                            sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 samples in [-1, 1] shaped (n, channels),
    sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos: pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8: pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            if len(payload) < 16:
                raise ValueError("corrupt WAV: short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", payload)
        elif tag == b"data":
            raw = payload
    if fmt is None or raw is None:
        raise ValueError("corrupt WAV: missing fmt or data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format == 1 and bits in _DTYPES:
        pcm = np.frombuffer(raw, dtype=_DTYPES[bits])
        if bits == 8:
            out = (pcm.astype(np.float64) - 128.0) / 127.0
        else:
            out = pcm.astype(np.float64) / float(2 ** (bits - 1) - 1)
    elif audio_format == 3 and bits == 32:
        out = np.frombuffer(raw, dtype=np.float32).astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV variant: format={audio_format} bits={bits}")
    n = len(out) // ch
    return out[: n * ch].reshape(n, ch), rate
