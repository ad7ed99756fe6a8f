"""Golden-vector and property tests for the hash pipeline.

Golden vectors in tests/golden/hash_vectors.tsv were produced by running
the *reference binary* (MurmurHash64A + hllPatLen compiled from
/root/reference/hyperloglog.c) — they lock bit-compatibility of the
vectorized NumPy kernels to the C implementation.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from raysketch.hashing import (
    arrow_to_flat_bytes,
    hll_patlen,
    murmur64a,
    murmur64a_scalar,
)

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def load_golden():
    rows = []
    with open(os.path.join(GOLD, "hash_vectors.tsv"), encoding="utf-8") as f:
        for line in f:
            if line.startswith("#"):
                continue
            ele, h, idx, count = line.rstrip("\n").split("\t")
            rows.append((ele, int(h, 16), int(idx), int(count)))
    return rows


GOLDEN = load_golden()


def flat(items):
    data = b"".join(x.encode() if isinstance(x, str) else x for x in items)
    offsets = np.zeros(len(items) + 1, dtype=np.int64)
    np.cumsum([len(x.encode() if isinstance(x, str) else x) for x in items], out=offsets[1:])
    return np.frombuffer(data, dtype=np.uint8), offsets


def test_golden_hashes_vectorized():
    eles = [r[0] for r in GOLDEN]
    data, offsets = flat(eles)
    h = murmur64a(data, offsets)
    expected = np.array([r[1] for r in GOLDEN], dtype=np.uint64)
    assert np.array_equal(h, expected)


def test_golden_hashes_scalar():
    for ele, hexp, _, _ in GOLDEN[:20]:
        assert murmur64a_scalar(ele.encode()) == hexp


def test_golden_patlen():
    eles = [r[0] for r in GOLDEN]
    data, offsets = flat(eles)
    idx, count = hll_patlen(murmur64a(data, offsets))
    assert np.array_equal(idx, np.array([r[2] for r in GOLDEN]))
    assert np.array_equal(count, np.array([r[3] for r in GOLDEN]))


def test_vectorized_matches_scalar_random():
    rng = np.random.default_rng(123)
    items = [rng.bytes(int(n)) for n in rng.integers(0, 200, size=500)]
    items += [rng.bytes(int(n)) for n in rng.integers(1000, 5000, size=5)]
    data, offsets = flat(items)
    h = murmur64a(data, offsets)
    for i in [0, 1, 17, 100, 499, 501, 504]:
        assert int(h[i]) == murmur64a_scalar(items[i])


def test_arrow_extraction_string_and_binary():
    arr = pa.array(["abc", None, "", "hello world"])
    data, offsets = arrow_to_flat_bytes(arr)
    h = murmur64a(data, offsets)
    assert int(h[0]) == murmur64a_scalar(b"abc")
    assert int(h[1]) == murmur64a_scalar(b"")  # null → ""
    assert int(h[2]) == murmur64a_scalar(b"")
    assert int(h[3]) == murmur64a_scalar(b"hello world")

    # sliced arrays must respect offsets
    sl = arr.slice(2, 2)
    data, offsets = arrow_to_flat_bytes(sl)
    h2 = murmur64a(data, offsets)
    assert int(h2[1]) == murmur64a_scalar(b"hello world")

    lrg = pa.array([b"xy", b"z"], type=pa.large_binary())
    data, offsets = arrow_to_flat_bytes(lrg)
    assert int(murmur64a(data, offsets)[0]) == murmur64a_scalar(b"xy")


def test_numeric_canonicalization_matches_string_form():
    """int 100 and "100" are the same element (php/tests/hll_add_int_conversion.phpt)."""
    ints = pa.array([100, 0, -5], type=pa.int64())
    strs = pa.array(["100", "0", "-5"])
    di, oi = arrow_to_flat_bytes(ints)
    ds, os_ = arrow_to_flat_bytes(strs)
    assert np.array_equal(murmur64a(di, oi), murmur64a(ds, os_))


def test_empty_input():
    assert len(murmur64a(np.empty(0, np.uint8), np.zeros(1, np.int64))) == 0


def test_patlen_range():
    rng = np.random.default_rng(1)
    h = rng.integers(0, 2**64, size=10000, dtype=np.uint64)
    idx, count = hll_patlen(h)
    assert idx.min() >= 0 and idx.max() < 16384
    assert count.min() >= 1 and count.max() <= 51


def test_float_canonicalization_php_precision14():
    """PHP precision=14 float→string parity (ADVICE r01): both the scalar
    compat coercion and the Arrow column path must emit %.14G with PHP's
    exponent form, not repr / shortest-roundtrip."""
    from raysketch.compat import _php_float_str
    from raysketch.keys import canonical_string_array

    cases = {
        1 / 3: "0.33333333333333",
        100.1: "100.1",
        1.5: "1.5",
        5.0: "5",
        -0.0: "-0",
        1e-5: "1.0E-5",
        1.23e20: "1.23E+20",
        -4.5e-7: "-4.5E-7",
        float("nan"): "NAN",
        float("inf"): "INF",
        float("-inf"): "-INF",
    }
    for x, want in cases.items():
        assert _php_float_str(x) == want, (x, _php_float_str(x))
    col = canonical_string_array(pa.array(list(cases), type=pa.float64()))
    assert col.to_pylist() == list(cases.values())
    # null → "" (PHP null cast), distinct from actual NaN → "NAN"
    col2 = canonical_string_array(pa.array([None, float("nan")], type=pa.float64()))
    assert col2.to_pylist() == ["", "NAN"]


def test_float_e_notation_no_truncation():
    """Code-review r02: assigning E-notation fixups into a fixed-width
    numpy string array truncated them ('1.0E-5' → '1.0E-'), colliding
    DISTINCT floats. The column path must match the scalar path even
    when every value in the batch is short E-notation."""
    from raysketch.compat import _php_float_str
    from raysketch.keys import canonical_string_array

    vals = [1e-5, 1e-55, 2.5e-300, 1e20]
    got = canonical_string_array(pa.array(vals, type=pa.float64())).to_pylist()
    assert got == [_php_float_str(v) for v in vals]
    assert len(set(got)) == len(vals)  # all distinct
