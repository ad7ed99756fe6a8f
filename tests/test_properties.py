"""Hypothesis property tests: codec round-trips, hash equivalence,
composite-key injectivity, merge algebra — the randomized analog of the
reference's compiled-in self test (hyperloglog.c:1576-1676)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from raysketch import HLL
from raysketch.hashing import murmur64a, murmur64a_scalar
from raysketch.keys import composite_flat_bytes
from raysketch.sketches.hll import _dense_pack, _dense_unpack, _sparse_decode, _sparse_encode


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=40))
def test_vectorized_hash_equals_scalar(items):
    data = np.frombuffer(b"".join(items), dtype=np.uint8)
    offsets = np.zeros(len(items) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in items], out=offsets[1:])
    h = murmur64a(data, offsets)
    for i, it in enumerate(items):
        assert int(h[i]) == murmur64a_scalar(it)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_sparse_codec_roundtrip(data):
    n_set = data.draw(st.integers(0, 300))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    regs = np.zeros(16384, dtype=np.uint8)
    if n_set:
        pos = rng.choice(16384, size=n_set, replace=False)
        regs[pos] = rng.integers(1, 33, size=n_set)
    enc = _sparse_encode(regs)
    assert np.array_equal(_sparse_decode(enc, 16384), regs)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31))
def test_dense_codec_roundtrip(seed):
    regs = np.random.default_rng(seed).integers(0, 64, size=16384, dtype=np.uint8)
    assert np.array_equal(_dense_unpack(_dense_pack(regs), 16384), regs)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.tuples(st.text(max_size=8), st.text(max_size=8)),
             min_size=2, max_size=30, unique=True)
)
def test_composite_key_injective(pairs):
    """Distinct (a, b) tuples must get distinct encodings — the property
    the separator-join trick lacks (("a","bc") vs ("ab","c"))."""
    import pyarrow as pa

    a = pa.array([p[0] for p in pairs])
    b = pa.array([p[1] for p in pairs])
    data, offsets = composite_flat_bytes([a, b])
    encs = {bytes(data[offsets[i]:offsets[i + 1]]) for i in range(len(pairs))}
    assert len(encs) == len(pairs)


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_merge_partition_invariance(data):
    """Any partition of any element multiset merges to byte-identical
    registers (the distributed-correctness property)."""
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    n = data.draw(st.integers(1, 2000))
    elements = [f"x{rng.integers(0, 500)}" for _ in range(n)]
    whole = HLL()
    whole.add_batch(elements)
    k = data.draw(st.integers(1, 6))
    parts = [elements[i::k] for i in range(k)]
    sketches = []
    for p in parts:
        s = HLL()
        if p:
            s.add_batch(p)
        sketches.append(s)
    rng.shuffle(sketches)
    merged = HLL.union(sketches)
    assert np.array_equal(merged.regs, whole.regs)


@given(
    st.lists(st.integers(0, 30), min_size=0, max_size=300),
    st.lists(st.integers(0, 30), min_size=0, max_size=300),
)
def test_cms_inner_product_bounds(xs, ys):
    """CMS join-size estimate: NEVER below the exact inner product of
    the two frequency vectors (every row's dot adds only non-negative
    collision cross terms), and exact when width ≥ universe (no
    collisions possible... width 64 > 31 keys here with shared row
    hashes still collides mod w, so only the lower bound + the εN₁N₂
    ceiling are asserted; the ceiling is deterministic given fixed
    hashes, so a failure is a real bug, not flake)."""
    import math
    from collections import Counter

    from raysketch.sketches.cms import CountMin

    a = CountMin(width=1024, depth=4)
    b = CountMin(width=1024, depth=4)
    a.add_batch([f"k{v}" for v in xs])
    b.add_batch([f"k{v}" for v in ys])
    ca, cb = Counter(xs), Counter(ys)
    exact = sum(ca[k] * cb[k] for k in ca)
    est = a.inner_product(b)
    assert est >= exact
    assert est <= exact + math.e / 1024 * len(xs) * len(ys) + 1
