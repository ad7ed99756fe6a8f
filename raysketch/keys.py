"""Canonical element encoding and injective composite keys.

The reference coerces every input to a byte string before hashing
(/root/reference/php/hll.c:265-353): int 100 and string "100" are the
*same* element (php/tests/hll_add_int_conversion.phpt), floats use their
short decimal form ("100.1"), true → "1", false/null → "" (PHP string
casts). We reproduce that contract for Arrow columns so estimates are
insensitive to the physical column type.

Composite keys (e.g. the (role, tool) distinct-pair query) are encoded
*length-delimited* so ("a","bc") ≠ ("ab","c") — an injective encoding the
separator-join trick cannot guarantee.
"""

from __future__ import annotations

import numpy as np

__all__ = ["canonical_string_array", "canonical_flat_bytes",
           "composite_flat_bytes", "php_float_str"]


def php_float_str(x: float) -> str:
    """PHP float→string coercion (precision=14, zend smart_str %.*H):
    ``%.14G`` with PHP's exponent form — mantissa always carries a
    decimal point ("1.0E-5", not "1E-05") and the exponent drops
    leading zeros. THE single implementation: the scalar compat path
    and the vectorized column path below both call this, so they can
    never drift apart (a drift would make HLL.add(x) and a column fold
    hash the same float as different elements)."""
    if x != x:
        return "NAN"
    if x == float("inf"):
        return "INF"
    if x == float("-inf"):
        return "-INF"
    s = "%.14G" % x
    if "E" in s:
        mant, exp = s.split("E")
        if "." not in mant:
            mant += ".0"
        s = f"{mant}E{exp[0]}{exp[1:].lstrip('0') or '0'}"
    return s


def canonical_string_array(arr):
    """Cast any Arrow array to its canonical string form (PHP-coercion
    parity): integers → decimal, floats → shortest repr, bool → "1"/"",
    null → ""."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr)
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        out = arr
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return arr
    elif pa.types.is_boolean(t):
        out = pc.if_else(arr, "1", "")
    elif pa.types.is_floating(t):
        # PHP precision=14 form, not Arrow's shortest-roundtrip repr —
        # 1/3 must hash as "0.33333333333333" for cross-language parity
        # (ADVICE r01). Floats-as-elements are rare; the subset needing
        # E-notation fixup is rarer still.
        vals = arr.to_numpy(zero_copy_only=False)
        s = np.char.mod("%.14G", vals)
        has_e = np.char.find(s, "E") >= 0
        if has_e.any():
            # NOTE: do NOT assign the fixups back into `s` — numpy's
            # fixed-width string dtype would silently truncate them
            # (e.g. '1.0E-5' → '1.0E-' in a <U5 array), colliding
            # distinct floats; build a Python list via the shared helper
            out_list = s.tolist()
            for i in np.nonzero(has_e)[0]:
                out_list[i] = php_float_str(float(vals[i]))
            out = pa.array(out_list, type=pa.string())
        else:
            out = pa.array(s.tolist(), type=pa.string())
        if arr.null_count:
            out = pc.if_else(pc.is_null(arr), pa.scalar("", pa.string()), out)
        return out
    elif pa.types.is_integer(t) or pa.types.is_decimal(t):
        out = pc.cast(arr, pa.string())
    elif pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
        out = pc.cast(arr, pa.string())
    else:
        out = pc.cast(arr, pa.string())
    if out.null_count:
        out = out.fill_null("")
    return out


def canonical_flat_bytes(arr) -> tuple[np.ndarray, np.ndarray]:
    """Column → (flat uint8, int64 offsets) after canonical coercion."""
    from .hashing import arrow_to_flat_bytes

    return arrow_to_flat_bytes(canonical_string_array(arr))


def ragged_copy(dst: np.ndarray, dst_starts: np.ndarray, src: np.ndarray,
                src_starts: np.ndarray, lens: np.ndarray) -> None:
    """Copy n variable-length byte runs src[src_starts[i]:+lens[i]] to
    dst[dst_starts[i]:]. Fully vectorized."""
    total = int(lens.sum())
    if total == 0:
        return
    cum = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total, dtype=np.int64)
    dst_idx = pos + np.repeat(dst_starts - cum, lens)
    src_idx = pos + np.repeat(src_starts - cum, lens)
    dst[dst_idx] = src[src_idx]


def _ragged_copy(dst, dst_starts, src, src_offsets):
    ragged_copy(dst, dst_starts, src, src_offsets[:-1],
                src_offsets[1:] - src_offsets[:-1])


def composite_flat_bytes(columns) -> tuple[np.ndarray, np.ndarray]:
    """Injective length-delimited encoding of a tuple of columns.

    Each field is written as ``uint32-LE length || payload``; the encodings
    are concatenated per row. Returns (flat uint8, int64 offsets) ready
    for :func:`raysketch.hashing.murmur64a`.
    """
    parts = [canonical_flat_bytes(c) for c in columns]
    n = len(parts[0][1]) - 1
    field_lens = [off[1:] - off[:-1] for _, off in parts]
    row_lens = np.zeros(n, dtype=np.int64)
    for fl in field_lens:
        row_lens += 4 + fl
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(row_lens, out=out_offsets[1:])
    out = np.zeros(int(out_offsets[-1]), dtype=np.uint8)

    field_start = out_offsets[:-1].copy()
    for (data, off), fl in zip(parts, field_lens):
        # 4-byte little-endian length prefix
        fl_u = fl.astype(np.uint32)
        for b in range(4):
            out[field_start + b] = ((fl_u >> np.uint32(8 * b)) & np.uint32(0xFF)).astype(np.uint8)
        _ragged_copy(out, field_start + 4, data, off)
        field_start += 4 + fl
    return out, out_offsets
