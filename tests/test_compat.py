"""Procedural hll_* API parity (SURVEY.md §2.3) + hllcnt CLI twin."""

import io

import pytest

from raysketch.compat import (
    HyperLogLog,
    hll_add,
    hll_count,
    hll_create,
    hll_dump,
    hll_info,
    hll_load,
    hll_merge,
    hll_promote,
)


def test_lifecycle():
    h = hll_create()
    assert hll_info(h)["encoding"] == "dense"
    hs = hll_create(allow_sparse=True)
    assert hll_info(hs)["encoding"] == "sparse"
    hll_promote(hs)
    assert hll_info(hs)["encoding"] == "dense"


def test_add_forms_and_coercion():
    h = hll_create()
    hll_add(h, "abc")
    hll_add(h, ["def", "ghi", "jkl"])  # array form
    assert hll_count(h) == 4
    # int/float/bool/None coerce to string forms (phpt coercion suite)
    a, b = hll_create(), hll_create()
    hll_add(a, [100, 100.1, True, False, None])
    hll_add(b, ["100", "100.1", "1", "", ""])
    assert hll_dump(a) == hll_dump(b)

    class Stringable:
        def __str__(self):
            return "abc"

    c = hll_create()
    hll_add(c, Stringable())
    d = hll_create()
    hll_add(d, "abc")
    assert hll_dump(c) == hll_dump(d)

    with pytest.raises(TypeError):
        hll_add(h, object())  # non-stringable rejected (php/hll.c:176-187)


def test_multi_count_nondestructive():
    h1 = hll_add(hll_create(), ["abc", "def"])
    h2 = hll_add(hll_create(), ["def", "ghi"])
    before = hll_dump(h1)
    assert hll_count(h1, h2) == 3
    assert hll_dump(h1) == before  # inputs untouched (pfCountMerged)


def test_merge_mixed_args():
    h = hll_add(hll_create(), ["a"])
    other = hll_add(hll_create(), ["b"])
    dump = hll_dump(hll_add(hll_create(), ["c"]))
    hll_merge(h, other, [dump])
    assert hll_count(h) == 3
    with pytest.raises(TypeError):
        hll_merge(h, 42)


def test_dump_load_roundtrip():
    h = hll_add(hll_create(), [str(i) for i in range(1000)])
    assert hll_count(hll_load(hll_dump(h))) == hll_count(h)


def test_class_alias():
    assert HyperLogLog is type(hll_create())


def test_hllcnt_cli():
    from raysketch.hllcnt import main

    out = io.StringIO()
    stream = io.BytesIO(b"abc\ndef\nghi\njkl\nabc\n")
    main(stream, out)
    assert out.getvalue().strip() == "5 4"

    out = io.StringIO()
    main(io.BytesIO(b""), out)
    assert out.getvalue().strip() == "0 0"

    # 10k unique → the reference binary's exact estimate (golden: 9976)
    out = io.StringIO()
    main(io.BytesIO("\n".join(str(i) for i in range(10000)).encode() + b"\n"), out)
    assert out.getvalue().strip() == "10000 9976"
