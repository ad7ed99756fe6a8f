"""Minimal real YUV4MPEG2 (.y4m) video codec — pure numpy.

The video twin of :mod:`.pngcodec` / :mod:`.wavcodec`: this container
ships no video libraries, but Y4M is a public, headers-plus-raw-planes
format (the interchange format of mjpegtools/ffmpeg pipelines), so the
real video decode path can be exercised in CI instead of stubbed. Swap
in av/ffmpeg for compressed containers in production; the stage
contract (:class:`..multimodal.VideoFrameSample`) is identical.

Format reference: the public YUV4MPEG2 specification (mjpegtools
yuv4mpeg(5)): one ASCII stream header
``YUV4MPEG2 W<w> H<h> F<num>:<den> I<p|t|b> A<n>:<d> C<space>\\n``,
then per frame an ASCII ``FRAME\\n`` marker followed by raw planes.
Supported colourspaces: ``Cmono`` (one Y plane), ``C444`` (full-size
Y,U,V) and the ``C420``/``C420jpeg``/``C420mpeg2``/``C420paldv``
family (U,V subsampled 2×2 — chroma siting differences do not change
the byte layout).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_y4m", "decode_y4m"]


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """uint8 frames → Y4M bytes.

    ``frames``: (n, h, w) → Cmono, or (n, h, w, 3) full-resolution YUV
    planes → C444."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim == 3:
        n, h, w = a.shape
        cs = "mono"
    elif a.ndim == 4 and a.shape[3] == 3:
        n, h, w, _ = a.shape
        cs = "444"
    else:
        raise ValueError(f"frames must be (n,h,w) or (n,h,w,3), got {a.shape}")
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cs}\n".encode()]
    for i in range(n):
        out.append(b"FRAME\n")
        if cs == "mono":
            out.append(a[i].tobytes())
        else:  # planar Y, U, V
            out.append(np.ascontiguousarray(
                a[i].transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[np.ndarray, dict]:
    """Y4M bytes → (luma frames (n, h, w) uint8, header dict).

    Chroma planes are parsed (sizes per colourspace) but only luma is
    returned — the stage surface is luma statistics; extend here if a
    pipeline needs chroma."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    header = data[:nl].decode("ascii", errors="replace")
    params: dict[str, str] = {}
    for tok in header.split()[1:]:
        params[tok[0]] = tok[1:]
    try:
        w, h = int(params["W"]), int(params["H"])
    except (KeyError, ValueError) as e:
        raise ValueError(f"missing/invalid W/H in Y4M header {header!r}") from e
    cs = params.get("C", "420jpeg")
    if cs == "mono":
        chroma = 0
    elif cs == "444":
        chroma = 2 * h * w
    elif cs.startswith("420"):
        if h % 2 or w % 2:
            raise ValueError(f"C{cs} needs even dimensions, got {w}x{h}")
        chroma = 2 * (h // 2) * (w // 2)
    else:
        raise ValueError(f"unsupported Y4M colourspace C{cs}")
    ysize = h * w
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = fnl + 1
        if pos + ysize + chroma > len(data):
            raise ValueError("truncated Y4M frame payload")
        frames.append(np.frombuffer(data, dtype=np.uint8, count=ysize,
                                    offset=pos).reshape(h, w))
        pos += ysize + chroma
    meta = {"width": w, "height": h, "colourspace": cs,
            "fps": params.get("F", "25:1"), "n_frames": len(frames)}
    return (np.stack(frames) if frames
            else np.empty((0, h, w), dtype=np.uint8)), meta
